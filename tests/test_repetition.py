"""Repetition statistics + Gopher repetition gate (functions/repetition.py).

The oracle equality for the seven counts runs in test_queries_oracle /
check_oracles (q_repetition_stats vs the full SQL restatement); here we pin
hand-computed kernel cases, the gate decisions, and the plan shape."""

import pyspark.sql.functions as F

from anycrawl_spark.functions.repetition import (
    gopher_repetition_gate,
    repetition_stats_row,
    with_repetition_stats,
)


def test_kernel_hand_cases():
    # n, distinct, top_tok, top_big, top_tri, n5, d5
    assert repetition_stats_row("a a a b") == (4, 2, 3, 2, 1, 0, 0)
    assert repetition_stats_row("a b a b a b a b") == (8, 2, 4, 4, 3, 4, 2)
    assert repetition_stats_row("one two three four five six") == (6, 6, 1, 1, 1, 2, 2)
    assert repetition_stats_row("") == (0, 0, 0, 0, 0, 0, 0)
    assert repetition_stats_row("  Mixed   CASE mixed case  ") == (4, 2, 2, 2, 1, 0, 0)
    assert repetition_stats_row(None) == (0, 0, 0, 0, 0, 0, 0)


def test_kernel_5gram_duplicate_mass():
    # "x y x y x y x y x y": 5-grams at offsets 0..5 alternate between two
    # patterns -> 6 grams, 2 distinct
    assert repetition_stats_row("x y x y x y x y x y")[5:] == (6, 2)


def test_gate_decisions(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),       # top token
            (2, "buy now buy now buy now buy now buy now"),       # top bigram
            (3, "the quick brown fox jumps over the lazy dog while birds sing"),
            (4, ""),                                              # empty passes
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["keep"] for r in gopher_repetition_gate(df).collect()}
    assert rows == {1: False, 2: False, 3: True, 4: True}


def test_gate_threshold_override(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j a b")], ["doc_id", "text"]
    )  # top bigram 'a b' = 2/11 ~ 0.18
    strict = gopher_repetition_gate(df, thresholds={"top_bigram_frac": 0.1})
    assert strict.collect()[0]["keep"] is False
    default = gopher_repetition_gate(df)
    assert default.collect()[0]["keep"] is True


def test_plan_one_arrow_pass_no_exchange(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = with_repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert p.count("ArrowEvalPython") == 1
    assert "Exchange" not in p, "repetition stats must stay in the scan stage"
