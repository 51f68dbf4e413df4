"""Cross-source duplication matrix (operators/dedup.py source_overlap).

Layer 1: hand-built pair streams → matrix (unordered pairs, self-source
         diagonal).
Layer 2: composition with the planted near-dup fixture — every planted
         pair crosses into 'recrawl'.
Layer 3: plan guard.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from anycrawl_spark.operators.dedup import near_duplicates, source_overlap


def test_matrix_hand_case(spark):
    docs = spark.createDataFrame(
        [(1, "cc"), (2, "web"), (3, "cc"), (4, "books")], ["doc_id", "source"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1 + 2), (1, 3), (2, 4), (3, 4)], ["id_a", "id_b"]
    )
    got = {
        (r["src_lo"], r["src_hi"]): r["n_pairs"]
        for r in source_overlap(pairs, docs).collect()
    }
    # (1,2) cc-web, (2,3) cc-web, (1,3) cc-cc, (2,4) books-web, (3,4) books-cc
    assert got == {
        ("cc", "web"): 2,
        ("cc", "cc"): 1,
        ("books", "web"): 1,
        ("books", "cc"): 1,
    }


def test_planted_pairs_all_cross_into_recrawl(spark):
    base = spark.createDataFrame(
        [
            (i, " ".join(f"w{(i * 5 + j) % 31}" for j in range(12)), f"src{i % 3}")
            for i in range(12)
        ],
        ["doc_id", "text", "source"],
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    mutated = base.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, 9)).alias("text"),
        F.lit("recrawl").alias("source"),
    )
    alldocs = base.unionByName(mutated)
    pairs = near_duplicates(
        alldocs.select("doc_id", "text"), threshold=0.5, bands=12
    ).select("id_a", "id_b")
    m = source_overlap(pairs, alldocs).collect()
    crossed = {(r["src_lo"], r["src_hi"]): r["n_pairs"] for r in m}
    # every original source must show overlap with recrawl
    for s in ("src0", "src1", "src2"):
        assert crossed.get((s, "recrawl"), 0) + crossed.get(("recrawl", s), 0) > 0, s


def test_plan_shape(spark):
    from anycrawl_spark.queries import q_source_overlap

    p = q_source_overlap(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "partial_count" in p
