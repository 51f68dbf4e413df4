"""Anchor-text aggregation (operators/anchors.py) and curriculum buckets
(operators/curriculum.py).

Oracle equality runs in test_queries_oracle via q_anchor_terms /
q_curriculum_buckets. Here: hand-computed cases, tie-break determinism,
bucket-balance invariants, equivalence to the naive window form,
partition invariance, and plan shapes (map-side WindowGroupLimit; no
whole-source sort window in curriculum's heavy path)."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from anycrawl_spark.operators.anchors import edge_anchors_from_docs, top_anchor_terms
from anycrawl_spark.operators.curriculum import curriculum_buckets


def test_top_anchor_terms_hand_case(spark):
    rows = [
        (7, "buy cheap widgets"), (7, "cheap widgets here"), (7, "widgets"),
        (8, "zebra apple"),
    ]
    df = spark.createDataFrame(rows, ["target_id", "anchor"])
    got = {
        (r["target_id"], r["rnk"]): (r["term"], r["cnt"])
        for r in top_anchor_terms(df, k=2).collect()
    }
    assert got[(7, 1)] == ("widgets", 3)
    assert got[(7, 2)] == ("cheap", 2)
    # target 8: counts tie at 1 -> lexicographic: apple before zebra
    assert got[(8, 1)] == ("apple", 1)
    assert got[(8, 2)] == ("zebra", 1)
    assert (7, 3) not in got


def test_edge_anchors_excerpt(spark):
    docs = spark.createDataFrame(
        [(0, "Alpha Beta Gamma Delta"), (1, "solo")], ["doc_id", "text"]
    )
    edges = spark.createDataFrame([(0, 1), (1, 0)], ["src", "dst"])
    got = {r["target_id"]: r["anchor"] for r in
           edge_anchors_from_docs(edges, docs, n_words=3).collect()}
    assert got[1] == "alpha beta gamma"   # lowercased, first 3 tokens
    assert got[0] == "solo"               # shorter doc -> whole text


def test_anchor_plan_windowgrouplimit(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from anycrawl_spark.operators.linkrank import synthetic_link_graph

    edges = synthetic_link_graph(docs, n_nodes=50, fanout=3)
    plan = top_anchor_terms(
        edge_anchors_from_docs(edges, docs), k=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, "rank cut must push below the shuffle"
    assert "Cartesian" not in plan and "InPandas" not in plan


def test_curriculum_hand_case(spark):
    # one source, 5 docs, lengths 1,2,2,3,9 -> ranks follow (len, doc_id)
    rows = [(0, "s", 2), (1, "s", 1), (2, "s", 2), (3, "s", 9), (4, "s", 3)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    got = {r["doc_id"]: (r["rank"], r["bucket"]) for r in
           curriculum_buckets(df, "n_tokens", n_buckets=5).collect()}
    assert got == {1: (1, 0), 0: (2, 1), 2: (3, 2), 4: (4, 3), 3: (5, 4)}


def test_curriculum_matches_naive_window_and_partitioning(spark):
    rows = [(i, f"s{i % 3}", (i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    got = {r["doc_id"]: (r["rank"], r["bucket"]) for r in
           curriculum_buckets(df, "n_tokens", n_buckets=10).collect()}
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    naive = df.select(
        "doc_id",
        F.row_number().over(w).alias("rank"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    ).collect()
    for r in naive:
        assert got[r["doc_id"]][0] == r["rank"]
        assert got[r["doc_id"]][1] == ((r["rank"] - 1) * 10) // r["n"]
    got2 = {r["doc_id"]: (r["rank"], r["bucket"]) for r in
            curriculum_buckets(df.repartition(17), "n_tokens").collect()}
    assert got2 == got


def test_curriculum_buckets_balanced(spark):
    rows = [(i, "s", i % 4) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "k"])
    sizes = [
        r["c"] for r in curriculum_buckets(df, "k", n_buckets=10)
        .groupBy("bucket").agg(F.count("*").alias("c")).collect()
    ]
    assert len(sizes) == 10 and max(sizes) - min(sizes) <= 1


def test_curriculum_plan_no_whole_source_sort(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from anycrawl_spark.functions.text import token_count

    d = docs.select("doc_id", "source", token_count(F.col("text")).alias("n_tokens"))
    plan = curriculum_buckets(d, "n_tokens")._jdf.queryExecution() \
        .executedPlan().toString()
    # the row-level window partitions by (source, key) — never by source
    # alone; only the tiny histogram window may partition on bare source
    import re

    row_windows = re.findall(
        r"Window \[row_number\(\) windowspecdefinition\(([^)]*?)\bASC\b", plan
    )
    assert row_windows, "expected a row_number window in the plan"
    for spec in row_windows:
        assert "source#" in spec and "n_tokens#" in spec, (
            f"row-level window must partition on (source, key), got: {spec}"
        )
