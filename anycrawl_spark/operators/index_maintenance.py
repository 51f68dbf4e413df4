"""Incremental inverted-index maintenance (delta docs + tombstones).

A standing BM25 index over a living crawl (`operators/retrieval.py`)
cannot be rebuilt per round: at 10^10 documents the rebuild rescans the
corpus to refresh statistics that one round changed by 10^-5. The
lakehouse answer (Delta/Iceberg merge-on-read, Lucene segment merges)
is delta maintenance: new/updated documents contribute ADDED postings,
deleted/updated documents contribute TOMBSTONES, and per-term
statistics adjust arithmetically — ``df' = df - removed + added`` —
without touching the base corpus text.

The correctness claim is exactly "incremental == batch": this module's
output is value-equal to rebuilding the index from the effective corpus
(base − tombstones + delta). The oracle (`sql_index_maintenance`) IS
that batch rebuild in SQL, so the driver's hash gate checks the
equivalence, not just internal consistency.

Scale shapes:

- merged postings: base anti-join tombstones (broadcast — tombstone
  sets are round-sized, not corpus-sized) union delta postings;
- statistic adjustment: removed postings are found by SEMI-join of the
  base POSTINGS against tombstones — O(removed docs × their terms), a
  round-sized slice; the adjustment aggregate and the final full-outer
  merge join shuffle O(touched terms), not O(vocabulary);
- terms whose df reaches zero drop out of the rollup (the batch side
  never sees them, so equality enforces the cleanup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def postings_rollup(postings: DataFrame) -> DataFrame:
    """Per-term index statistics: (term, df, sum_tf)."""
    return postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("sum_tf"),
    )


def merge_postings(
    base: DataFrame, delta: DataFrame, tombstones: DataFrame
) -> DataFrame:
    """The post-round postings: base minus tombstoned docs, plus delta.
    An updated document appears in BOTH (tombstone + new postings)."""
    kept = base.join(F.broadcast(tombstones), "doc_id", "left_anti")
    return kept.unionByName(delta)


def incremental_rollup(
    base_rollup: DataFrame,
    base_postings: DataFrame,
    delta_postings: DataFrame,
    tombstones: DataFrame,
) -> DataFrame:
    """Adjust (term, df, sum_tf) arithmetically from the round's delta —
    never re-aggregating the base postings. Value-equal to
    ``postings_rollup(merge_postings(...))`` (tested + oracle-checked)."""
    removed = base_postings.join(F.broadcast(tombstones), "doc_id", "semi")
    adj = (
        removed.select("term", F.lit(-1).alias("_d"), (-F.col("tf")).alias("_t"))
        .unionByName(
            delta_postings.select(
                "term", F.lit(1).alias("_d"), F.col("tf").alias("_t")
            )
        )
        .groupBy("term")
        .agg(
            F.sum("_d").cast("long").alias("d_df"),
            F.sum("_t").cast("long").alias("d_tf"),
        )
    )
    merged = base_rollup.join(adj, "term", "full_outer").select(
        "term",
        (F.coalesce(F.col("df"), F.lit(0)) + F.coalesce(F.col("d_df"), F.lit(0)))
        .cast("long")
        .alias("df"),
        (F.coalesce(F.col("sum_tf"), F.lit(0)) + F.coalesce(F.col("d_tf"), F.lit(0)))
        .cast("long")
        .alias("sum_tf"),
    )
    return merged.filter(F.col("df") > 0)
