"""Crawl-trap detection: per-host URL-pattern pathology signals.

Calendar pages that link to the next month forever, session-id URL
explosions, and self-referential path loops (``/a/b/a/b/a/...``) are
the classic crawler traps (Heydon & Najork's Mercator paper, 1999,
documents the family; every production crawler ships mitigations). The
reference caps per-job page counts (`limit`, rebuilt in
`operators/gates.py`) but has no pattern-level trap detection — this
module adds the per-host signal layer a frontier scheduler throttles
on, as pure JVM column math:

- ``max_depth`` — deepest path (segment count) seen on the host;
- ``n_repeat_urls`` — URLs where some path segment occurs ≥3 times
  (the loop signature), detected WITHOUT an explode: sort the segment
  array and test ``sorted[i] == sorted[i+2]`` via zip_with against the
  array shifted by two — three equal occurrences must land adjacent
  after the sort (the oracle uses the relational UNNEST + HAVING form,
  a different derivation that cross-checks this one);
- ``params_x100`` — average query-parameter count ×100 (session-id /
  cartesian-filter explosions show up here);
- boolean gates + an integer ``trap_score`` for the scheduler.

Scale shape: everything before the per-host aggregate is a projection
in the scan stage; the aggregate is one two-phase groupBy(host) of
fixed-width integers. No explode, no window, no python — at 10^10
frontier URLs the shuffle carries one partial row per (partition,
host).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEEP_DEPTH = 5  # path segments at/past which a host looks loop-prone
REPEAT_URL_RATIO = 5  # flag when repeat-segment URLs exceed 1/5 of the host
PARAMY_X100 = 200  # flag when the average URL carries >= 2 query params


def _path(url: Column) -> Column:
    return F.regexp_extract(url, "^[a-z]+://[^/?#]*([^?#]*)", 1)


def _query(url: Column) -> Column:
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def _segments(url: Column) -> Column:
    return F.filter(F.split(_path(url), "/"), lambda x: x != "")


def has_repeated_segment(url: Column, min_repeats: int = 3) -> Column:
    """True when any path segment occurs >= min_repeats times. Sorted
    adjacency: k equal elements are contiguous after array_sort, so
    some i has sorted[i] == sorted[i + k - 1]."""
    s = F.array_sort(_segments(url))
    shift = min_repeats - 1
    shifted = F.slice(
        s, shift + 1, F.greatest(F.size(s) - shift, F.lit(0))
    )
    hit = F.zip_with(
        s, shifted, lambda a, b: F.when(a == b, F.lit(True)).otherwise(F.lit(False))
    )
    return F.when(F.size(s) >= min_repeats, F.exists(hit, lambda x: x)).otherwise(
        F.lit(False)
    )


def n_query_params(url: Column) -> Column:
    q = _query(url)
    return F.when(q != "", F.size(F.split(q, "&"))).otherwise(F.lit(0)).cast("long")


def trap_signals(urls: DataFrame, host_col: str = "host", url_col: str = "url") -> DataFrame:
    """Per-host trap statistics + gates + integer score."""
    u = F.col(url_col)
    per_url = urls.select(
        F.col(host_col).alias("host"),
        F.size(_segments(u)).cast("long").alias("_depth"),
        has_repeated_segment(u).cast("long").alias("_rep"),
        n_query_params(u).alias("_params"),
    )
    agg = per_url.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.max("_depth").cast("long").alias("max_depth"),
        F.sum("_rep").cast("long").alias("n_repeat_urls"),
        F.sum("_params").cast("long").alias("_sum_params"),
    )
    deep = (F.col("max_depth") >= DEEP_DEPTH).cast("long")
    repeaty = (
        F.col("n_repeat_urls") * REPEAT_URL_RATIO >= F.col("n_urls")
    ).cast("long")
    paramy = (F.col("params_x100") >= PARAMY_X100).cast("long")
    return (
        agg.withColumn(
            "params_x100", F.expr("(_sum_params * 100) div n_urls").cast("long")
        )
        .drop("_sum_params")
        .withColumn("deep", deep)
        .withColumn("repeaty", repeaty)
        .withColumn("paramy", paramy)
        .withColumn(
            "trap_score",
            (F.col("deep") + F.col("repeaty") * 2 + F.col("paramy") * 2).cast("long"),
        )
    )
