"""Small-file compaction planning over snapshot manifests.

A crawl that appends per-round parquet (the engine's SnapshotStore,
`crawl/superstep.py` / per-partition lineage) accretes small files —
the classic lakehouse pathology: at 100 TB with 10^5 rounds the
documents table becomes millions of KB-scale files and every scan pays
per-file open/footer costs. Delta's OPTIMIZE and Iceberg's rewrite
action solve it by bin-packing small files into ~target-size outputs;
this operator plans the same rewrite over the store's (partition, file,
bytes) manifest, deterministically:

- files at/above ``small_kb`` pass through untouched (bin = -1; they
  are already well-sized — rewriting them wastes IO);
- small files pack NEXT-FIT in (bytes asc, file id asc) order: a file
  joins bin ``floor(cum_before / target_kb)`` where ``cum_before`` is
  the prefix sum of the small files ahead of it. Pure prefix math makes
  the plan partition-independent and window-expressible (a bin may
  overshoot by at most one file — the standard next-fit bound, same
  behavior as Delta's packer).

Scale shape: the manifest is METADATA — O(files), not O(bytes); the
cumsum window partitions by table-partition (bounded by files per
partition, which compaction itself keeps bounded). The plan never
touches data; executing it is one ``coalesce``-style rewrite per bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    manifest: DataFrame,
    target_kb: int,
    small_kb: int,
    partition_col: str = "partition",
    file_col: str = "file_id",
    bytes_col: str = "kb",
) -> DataFrame:
    """Adds ``cum_before`` (prefix KB of smaller small-files in the same
    partition) and ``bin`` (compaction group; -1 = leave in place)."""
    small = F.col(bytes_col) < small_kb
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col(bytes_col).asc(), F.col(file_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.when(small, F.col(bytes_col)).otherwise(F.lit(0))).over(w),
        F.lit(0),
    ).cast("long")
    return manifest.withColumn("cum_before", cum_before).withColumn(
        "bin",
        F.when(small, F.expr(f"cum_before div {target_kb}")).otherwise(F.lit(-1))
        .cast("long"),
    )


def compaction_rollup(plan: DataFrame, partition_col: str = "partition") -> DataFrame:
    """Per (partition, bin) rewrite units: file count and total KB —
    what the executor actually schedules (bin -1 rows = untouched)."""
    return plan.groupBy(partition_col, "bin").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("kb").cast("long").alias("total_kb"),
        F.min("file_id").cast("long").alias("first_file"),
    )
