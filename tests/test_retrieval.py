"""BM25 keyword retrieval (operators/retrieval.py).

Oracle equality (full SQL restatement) runs in test_queries_oracle via
q_bm25_topk. Here: hand-computed integer scoring on a 3-doc corpus,
differential equality vs the sequential reference, ranking sanity (TF
saturation, IDF ordering, length normalization), determinism across
partitionings, and plan shape."""

import pyspark.sql.functions as F

from anycrawl_spark.operators.retrieval import (
    IDF_SCALE,
    SAT_SCALE,
    bm25_topk,
    bm25_topk_sequential,
    inverted_index,
)

CORPUS = [
    (0, "spark join window spark spark"),
    (1, "join the table and the table again"),
    (2, "window window window window window window"),
    (3, "nothing relevant here at all"),
]


def test_inverted_index(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    post = {(r["term"], r["doc_id"]): r["tf"] for r in inverted_index(df).collect()}
    assert post[("spark", 0)] == 3
    assert post[("window", 2)] == 6
    assert post[("the", 1)] == 2
    assert ("spark", 1) not in post


def test_hand_computed_single_term(spark):
    # corpus: N=4 docs, T=5+7+6+5=23 tokens; query {spark}: df=1, only doc 0,
    # tf=3, dl=5.
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = bm25_topk(df, ["spark"], k=5).collect()
    assert len(got) == 1
    n, t, tf, dl = 4, 23, 3, 5
    idf = ((2 * (n - 1) + 1) * IDF_SCALE) // (2 * 1 + 1)
    sat = (44 * tf * t * SAT_SCALE) // (20 * tf * t + 6 * t + 18 * dl * n)
    assert got[0]["doc_id"] == 0
    assert got[0]["bm25_scaled"] == (idf * sat) // SAT_SCALE
    assert got[0]["matched_terms"] == 1


def test_differential_vs_sequential(spark):
    rows = [
        (i, " ".join(f"w{(i * 7 + j * 3) % 11}" for j in range(5 + i % 9)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    q = ["w0", "w3", "w7"]
    got = [
        (r["doc_id"], r["bm25_scaled"], r["matched_terms"])
        for r in bm25_topk(df, q, k=15).collect()
    ]
    assert got == bm25_topk_sequential(rows, q, k=15)
    # partition invariance: exact integers, same top-k in the same order
    got2 = [
        (r["doc_id"], r["bm25_scaled"], r["matched_terms"])
        for r in bm25_topk(df.repartition(17), q, k=15).collect()
    ]
    assert got2 == got


def test_ranking_sanity(spark):
    # rarer term outranks a common one at equal tf/dl (IDF ordering), and
    # the same tf in a SHORTER doc scores higher (length normalization).
    rows = [(i, "common filler") for i in range(20)]
    rows += [(100, "rare common pad1 pad2"), (101, "common only pad1 pad2")]
    rows += [(200, "rare short"), (201, "rare with much longer padding text here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s = {
        r["doc_id"]: r["bm25_scaled"]
        for r in bm25_topk(df, ["rare", "common"], k=50).collect()
    }
    assert s[100] > s[101]          # matching the rare term adds more
    assert s[200] > s[201]          # shorter doc, same tf -> higher score
    # TF saturation: tf=6 scores less than 6x the tf=1 score
    rows2 = [(0, "x a b c d e"), (1, "x x x x x x")] + [
        (i + 10, "filler junk words") for i in range(10)
    ]
    df2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    s2 = {r["doc_id"]: r["bm25_scaled"] for r in bm25_topk(df2, ["x"], k=5).collect()}
    assert s2[1] < 6 * s2[0]
    assert s2[1] > s2[0]


def test_plan_shape(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = bm25_topk(df, ["spark", "join"], k=10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "top-k must be a bounded heap, not a sort"
    assert "Cartesian" not in plan
    assert "InPandas" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, "df join must broadcast (O(query terms))"
