"""Incremental index maintenance (operators/index_maintenance.py).

Layer 1: hand-computed delta effects (pure add, delete, update,
         term-drops-to-zero cleanup).
Layer 2: incremental_rollup == postings_rollup(merge_postings(...)) on
         a generated corpus (the internal equivalence; the ORACLE for
         q_index_delta separately proves incremental == batch rebuild).
Layer 3: plan guards (broadcast tombstone joins, no cartesian).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from anycrawl_spark.operators.index_maintenance import (
    incremental_rollup,
    merge_postings,
    postings_rollup,
)
from anycrawl_spark.operators.retrieval import inverted_index


def _roll(spark, base_rows, delta_rows, tombstone_ids):
    base = inverted_index(spark.createDataFrame(base_rows, ["doc_id", "text"]))
    if delta_rows:
        delta = inverted_index(
            spark.createDataFrame(delta_rows, ["doc_id", "text"])
        )
    else:
        delta = base.filter(F.lit(False))
    tomb = spark.createDataFrame([(i,) for i in tombstone_ids], ["doc_id"]) \
        if tombstone_ids else \
        spark.createDataFrame([], "doc_id long")
    inc = {
        r["term"]: (r["df"], r["sum_tf"])
        for r in incremental_rollup(
            postings_rollup(base), base, delta, tomb
        ).collect()
    }
    batch = {
        r["term"]: (r["df"], r["sum_tf"])
        for r in postings_rollup(merge_postings(base, delta, tomb)).collect()
    }
    return inc, batch


def test_delete_drops_terms(spark):
    inc, batch = _roll(
        spark,
        [(1, "alpha beta"), (2, "alpha unique")],
        [],
        [2],
    )
    assert inc == batch == {"alpha": (1, 1), "beta": (1, 1)}
    assert "unique" not in inc  # df hit zero -> cleaned up


def test_update_semantics(spark):
    inc, batch = _roll(
        spark,
        [(1, "old old words"), (2, "stable")],
        [(1, "new words")],
        [1],
    )
    want = {"new": (1, 1), "words": (1, 1), "stable": (1, 1)}
    assert inc == batch == want


def test_pure_add(spark):
    inc, batch = _roll(
        spark,
        [(1, "alpha")],
        [(2, "alpha beta")],
        [],
    )
    assert inc == batch == {"alpha": (2, 2), "beta": (1, 1)}


def test_generated_equivalence(spark):
    base_rows = [
        (i, " ".join(f"t{(i * 7 + j) % 23}" for j in range(i % 12 + 1)))
        for i in range(80)
    ]
    delta_rows = [
        (i, " ".join(f"t{(i * 11 + j) % 23}" for j in range(i % 9 + 1)))
        for i in list(range(0, 80, 8)) + list(range(80, 100))
    ]
    tombstone_ids = list(range(0, 80, 4))  # includes every re-added id
    inc, batch = _roll(spark, base_rows, delta_rows, tombstone_ids)
    assert inc == batch
    assert all(df > 0 for df, _ in inc.values())


def test_plan_shapes(spark):
    from anycrawl_spark.queries import q_index_delta

    p = q_index_delta(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "Cartesian" not in p
    assert "BroadcastHashJoin" in p, "tombstone joins must broadcast"
