"""BPE tokenizer (functions/bpe.py).

Oracle equality (hand-derived golden piece sequences) runs in
test_queries_oracle via q_bpe_encode. Here: the Sennrich paper merge
trace, encode properties (lossless concat, greedy rank order, determinism),
distributed-vs-sequential word counts, end-to-end training on corpus
counts, and the Arrow plan shape."""

import pyspark.sql.functions as F
import pytest

from anycrawl_spark.functions.bpe import (
    BPE_FIXTURES,
    END,
    SENNRICH_CORPUS,
    bpe_pieces,
    encode_word,
    merge_ranks,
    train_bpe,
    word_counts,
)


def test_sennrich_paper_merges():
    # the textbook trace (module docstring): es, est, est</w>, lo, low
    assert train_bpe(SENNRICH_CORPUS, 5) == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ]


def test_fixture_goldens_match_kernel():
    ranks = merge_ranks(train_bpe(SENNRICH_CORPUS, 5))
    for word, exp in BPE_FIXTURES:
        assert " ".join(encode_word(word, ranks)) == exp, word


def test_encode_lossless_and_deterministic():
    # concatenating pieces (minus the end marker) always reproduces the word
    ranks = merge_ranks(train_bpe(SENNRICH_CORPUS, 5))
    for word in ["lowest", "newest", "esses", "zoo", "wilder", "sestet"]:
        pieces = encode_word(word, ranks)
        assert "".join(pieces).replace(END, "") == word
        assert pieces == encode_word(word, ranks)
    assert encode_word("", ranks) == []


def test_training_ties_are_lexicographic():
    # {"ab","ba"}: every pair counts 1; ('a','</w>') is the lexicographic
    # minimum because '<' (0x3C) sorts before any letter
    assert train_bpe({"ab": 1, "ba": 1}, 1)[0] == ("a", END)
    # marker-free tie: counts (a,b)=1 (b,c)=1 (c,d)=1 ... (a,b) wins
    assert train_bpe({"abcd": 1}, 1)[0] == ("a", "b")
    # higher count beats lexicographic order: (z,z) counts 10 in z·z·z·</w>
    assert train_bpe({"zzz": 5, "ab": 1}, 1)[0] == ("z", "z")


def test_train_until_exhaustion_stops():
    m = train_bpe({"ab": 3}, 100)
    # a·b·</w> has at most 2 merges to fully fuse
    assert len(m) == 2
    assert encode_word("ab", merge_ranks(m)) == ["ab" + END]


def test_distributed_word_counts_match_sequential(spark):
    rows = [(i, f"alpha beta beta gamma{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = word_counts(df)
    exp = {}
    for _i, t in rows:
        for w in t.lower().split():
            exp[w] = exp.get(w, 0) + 1
    assert got == exp
    # trained merges from distributed counts == from sequential counts
    assert train_bpe(got, 8) == train_bpe(exp, 8)


def test_max_vocab_caps_by_count_then_word(spark):
    df = spark.createDataFrame(
        [(0, "aa aa aa bb bb cc")], ["doc_id", "text"]
    )
    assert word_counts(df, max_vocab=2) == {"aa": 3, "bb": 2}


def test_spark_kernel_matches_python(spark):
    merges = train_bpe(SENNRICH_CORPUS, 5)
    ranks = merge_ranks(merges)
    rows = [(0, "lowest newest"), (1, "slow esses zoo"), (2, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["p"]
        for r in df.select("doc_id", bpe_pieces(F.col("text"), merges).alias("p")).collect()
    }
    for i, t in rows:
        if t is None:
            assert got[i] is None
        else:
            exp = [p for w in t.lower().split() for p in encode_word(w, ranks)]
            assert got[i] == exp


def test_plan_single_arrow_stage(spark):
    merges = train_bpe(SENNRICH_CORPUS, 5)
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = df.select(
        "doc_id", bpe_pieces(F.col("text"), merges).alias("p")
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, "encode must be ONE Arrow stage"
    assert "Exchange" not in plan, "encoding never shuffles"
