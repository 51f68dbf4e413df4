"""Curriculum bucketing: exact per-group quantile bins without a global sort.

Curriculum schedules (Bengio et al. 2009, public) feed training from
easy to hard — in corpus terms, serve bucket 0 before bucket 9, where a
doc's bucket is its rank quantile within its source under some
difficulty key (length is the classic key; any exactly-ordered column
plugs in). The naive Spark form is ``row_number() OVER (PARTITION BY
source ORDER BY key)`` — which shuffles EVERY row of a source into one
reducer. With a handful of 10-TB sources that is the skew anti-pattern
this repo keeps out of engines (same reason `operators/packing.py`
rejects the single-partition global window).

Instead, ranks come from the two-phase histogram form:

1. histogram: groupBy(source, key) count — two-phase, fixed-width rows;
   cardinality = distinct keys per source, not rows.
2. offsets: a cumsum window PARTITIONed BY source over the HISTOGRAM —
   tiny input (distinct keys), so the per-source partition is fine here.
3. ranks: join the offsets back (broadcast when the histogram is small)
   and break ties inside each (source, key) cell by doc id with a
   row_number over that much finer cell.

rank and bucket = ``((rank-1) * n_buckets) div n_source`` are exact
integers, so results are deterministic, partition-independent, and
bit-equal to the oracle's plain-window restatement (which is the
sequential form — fine for an oracle, a scale trap for the engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curriculum_buckets(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 10,
    by: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Adds exact (rank, bucket) within each ``by`` group under the total
    order (key_col asc, id_col asc). rank is 1-based; bucket is in
    [0, n_buckets), balanced to within one row."""
    hist = df.groupBy(by, key_col).agg(F.count("*").alias("_c"))
    w_cum = (
        Window.partitionBy(by)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(by)
    offsets = hist.select(
        by,
        key_col,
        F.coalesce(F.sum("_c").over(w_cum), F.lit(0)).alias("_start"),
        F.sum("_c").over(w_tot).alias("_n"),
    )
    w_tie = Window.partitionBy(by, key_col).orderBy(id_col)
    return (
        df.join(offsets, [by, key_col])
        .withColumn("rank", (F.col("_start") + F.row_number().over(w_tie)).cast("long"))
        .withColumn(
            "bucket",
            F.expr(f"((rank - 1) * {n_buckets}) div _n").cast("long"),
        )
        .drop("_start", "_n")
    )
