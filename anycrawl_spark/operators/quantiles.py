"""Exact distributed quantiles without a global sort.

Crawl operations run on tail latencies — per-host p99 fetch time,
p90 payload size, scheduler round distributions. Spark's stock answers
are ``approxQuantile`` (Greenwald-Khanna, approximate, seed-dependent
error) or ``percentile`` (exact but interpolating doubles) — both
outside this repo's exact-integer/bit-reproducible policy. This
operator computes EXACT nearest-rank percentiles (the classic
definition: the smallest value whose cumulative frequency reaches
``ceil(p·n/100)``) through the same two-phase histogram trick
``operators/curriculum.py`` uses for rank quantiles:

1. histogram: groupBy(group, value) count — the only corpus-sized
   reduction, two-phase, fixed-width rows; cardinality is DISTINCT
   values per group (latencies in ms: thousands, not billions);
2. cumulative counts: a window over the tiny histogram;
3. rank lookup: explode the requested percentile list against the
   histogram rows that reach each threshold, take min(value) — the
   explode multiplies the HISTOGRAM (|P| small), never the data.

Integer end-to-end: ``ceil(p·n/100) = (p·n + 99) div 100``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    percentiles: list[int],
    group_col: str = "grp",
    value_col: str = "value",
) -> DataFrame:
    """(group, p, n, rank_needed, q_value) — exact nearest-rank
    percentile values per group for integer-valued columns."""
    if not percentiles or not all(1 <= p <= 100 for p in percentiles):
        raise ValueError("percentiles must be ints in [1, 100]")
    hist = df.groupBy(group_col, value_col).agg(
        F.count("*").cast("long").alias("_c")
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(group_col)
    cum = hist.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("value"),
        F.sum("_c").over(w_cum).cast("long").alias("cum"),
        F.sum("_c").over(w_tot).cast("long").alias("n"),
    )
    ps = F.explode(
        F.array(*[F.lit(p).cast("long") for p in sorted(set(percentiles))])
    )
    expanded = cum.withColumn("p", ps).withColumn(
        "rank_needed", F.expr("(p * n + 99) div 100").cast("long")
    )
    return (
        expanded.filter(F.col("cum") >= F.col("rank_needed"))
        .groupBy("grp", "p", "n", "rank_needed")
        .agg(F.min("value").cast("long").alias("q_value"))
    )
