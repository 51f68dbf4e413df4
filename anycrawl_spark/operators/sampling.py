"""Deterministic sampling + source-mixture weighting.

The last stage of a training-data pipeline decides HOW MUCH of each
source to keep (The Pile's source weights; Dolma's mixing config). Two
requirements drive the design:

1. **Determinism without state**: the keep/drop decision must be a pure
   function of the row key — reproducible across runs, machines, resumes
   and engines, with no RNG sequence to coordinate. We use the classic
   hash-threshold: a row is kept iff the first 8 hex chars of
   ``md5(salt || key)`` are LEXICOGRAPHICALLY below a threshold string.
   Comparing hex strings avoids every float/integer-conversion dialect
   gap — the DuckDB oracle runs the identical comparison bit-exactly,
   and the threshold for rate r is just ``format(floor(r * 2^32), '08x')``.

2. **Scale**: sampling is a pure scan-stage filter (one md5 + one string
   compare per row, whole-stage codegen, zero exchanges). The mixture
   solver needs per-source counts — ONE groupBy over O(sources) groups,
   collected driver-side (a handful of rows), rates broadcast back inside
   the filter literal. Nothing else shuffles.

The mixture objective is the standard one: the LARGEST corpus whose
source proportions match the target shares in expectation, subject to
never up-sampling (rate <= 1). That is ``N* = min_s count_s / share_s``
and ``rate_s = N* * share_s / count_s``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: denominator of the hash-fraction space: first 8 md5 hex chars = 32 bits
_HASH_SPACE = 1 << 32


def rate_threshold(rate: float) -> str:
    """Keep-rate -> the 8-hex-char lexicographic threshold. rate=1.0 maps
    past the top of the space ('g...' sorts after every hex digit), so
    keep-all needs no special case."""
    if rate >= 1.0:
        return "g"
    return format(max(0, int(rate * _HASH_SPACE)), "08x")


def sample_hash(key: Column, salt: str = "") -> Column:
    """The 8-hex-char decision hash for a key column (salt lets callers
    draw independent samples from the same keys)."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~rate of rows, decided purely by md5(salt || key) — stable
    across runs/partitionings/engines, and NESTED for decreasing rates
    (the r=0.1 sample is a subset of the r=0.5 sample with the same salt,
    because the threshold only moves)."""
    return df.filter(sample_hash(F.col(key_col), salt) < rate_threshold(rate))


def mixture_rates(
    counts: dict[str, int], shares: dict[str, float]
) -> dict[str, float]:
    """Per-source keep rates for the largest proportioned corpus with no
    up-sampling: N* = min_s count_s/share_s; rate_s = N* * share_s /
    count_s. Sources absent from ``shares`` get rate 0; shares naming a
    source with zero rows force N* = 0 (nothing can be proportioned)."""
    limiting = min(
        counts.get(s, 0) / share for s, share in shares.items() if share > 0
    )
    rates = {}
    for s, c in counts.items():
        share = shares.get(s, 0.0)
        rates[s] = 0.0 if not c or not share else min(1.0, limiting * share / c)
    return rates


def mixture_sample(
    df: DataFrame,
    shares: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Sample each source at the rate that makes the kept corpus match
    ``shares`` (expected proportions) while keeping it as large as
    possible. One O(sources) groupBy-collect for the counts; the decision
    itself stays a scan-stage filter with the per-source thresholds as a
    broadcast literal map."""
    counts = {
        r[source_col]: r["c"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("c")).collect()
    }
    rates = mixture_rates(counts, shares)
    thresholds = F.create_map(
        *[x for s, r in sorted(rates.items())
          for x in (F.lit(s), F.lit(rate_threshold(r)))]
    )
    return df.filter(
        sample_hash(F.col(key_col), salt)
        < F.coalesce(thresholds[F.col(source_col)], F.lit("0"))
    )


def stratified_split(
    df: DataFrame,
    n_val: int,
    n_test: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    space_bits: int = 12,
) -> DataFrame:
    """EXACT-quota train/val/test split per stratum, deterministic in the
    row key: within each stratum, rows ordered by (md5(salt||key), key)
    take positions 1..N — the first ``n_val`` become 'val', the next
    ``n_test`` 'test', the rest 'train'. Hash order makes every split an
    unbiased stratum sample; exact quotas (not expected ones) are what
    eval sets need; determinism means re-runs, resumes and incremental
    rebuilds reproduce the SAME membership (no eval-set churn between
    snapshots).

    Scale shape — the naive per-stratum rank window is a mega-partition
    (one partition per SOURCE); instead the hash space is pre-bucketed
    (top ``space_bits`` of the 60-bit decision hash, 4096 buckets), so:

    - per-(stratum, bucket) counts are a two-phase aggregate of
      O(strata x buckets) fixed-width rows;
    - each bucket's starting POSITION is a cumulative sum over that tiny
      frame (windowed over O(strata x buckets) rows, never data);
    - the in-bucket rank window partitions by (stratum, bucket) — each
      partition is ~1/4096th of a stratum, restoring parallelism no
      matter how skewed the sources are.

    position = bucket_offset + in-bucket rank, labels by quota cut. The
    same decomposition is the repo's exact-percentile trick
    (operators/quantiles.py) applied to order statistics.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    bkt = F.shiftright(h, 60 - space_bits)
    rows = df.withColumn("_h", h).withColumn("_bkt", bkt)
    per_bucket = rows.groupBy(strata_col, "_bkt").agg(F.count("*").alias("_n"))
    from pyspark.sql import Window

    cum = (
        Window.partitionBy(strata_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.withColumn(
        "_off", F.coalesce(F.sum("_n").over(cum), F.lit(0))
    ).select(strata_col, "_bkt", "_off")
    in_bucket = Window.partitionBy(strata_col, "_bkt").orderBy(
        "_h", F.col(key_col)
    )
    pos = F.col("_off") + F.row_number().over(in_bucket)
    return (
        rows.join(F.broadcast(offsets), [strata_col, "_bkt"])
        .withColumn("_pos", pos)
        .withColumn(
            "split",
            F.when(F.col("_pos") <= n_val, F.lit("val"))
            .when(F.col("_pos") <= n_val + n_test, F.lit("test"))
            .otherwise(F.lit("train")),
        )
        .drop("_h", "_bkt", "_off", "_pos")
    )
