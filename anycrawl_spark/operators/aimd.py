"""AIMD per-host crawl-rate adaptation.

Additive-increase / multiplicative-decrease is THE classic feedback
controller for shared-resource probing (TCP congestion control, Chiu &
Jain 1989, public): raise the per-host request rate by a constant while
the host is happy, halve it the moment it throttles (429/503). The
reference's retry ladder backs off a single request
(`operators/rules.py` S3); AIMD is the HOST-level controller above it —
rebuild-added scheduling machinery.

Spark shape — the recurrence is sequential per host, but a host's round
history is a bounded array, so the whole evolution runs as ONE
``aggregate()`` higher-order fold over a sorted struct array: collect
the rounds (one two-phase groupBy), ``sort_array`` by round, fold the
(rate, halvings, min, max) accumulator struct. No iteration in the
plan, no python, exact integers (halving via ``shiftright`` — floor
division by 2 for the non-negative rates the floor clamp guarantees).

The oracle unrolls the same recurrence round-by-round as chained SQL
CTEs — a different computational shape proving the fold's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aimd_rates(
    rounds: DataFrame,
    init: int = 8,
    incr: int = 2,
    cap: int = 64,
    floor_min: int = 1,
    host_col: str = "host",
    round_col: str = "round",
    throttled_col: str = "throttled",
) -> DataFrame:
    """Per-host AIMD evolution over the (round asc) history:
    ``rate' = min(rate+incr, cap)`` on clean rounds,
    ``rate' = max(rate >> 1, floor_min)`` on throttled ones.
    Returns (host, n_rounds, final_rate, n_halvings, min_rate,
    max_rate)."""
    grouped = rounds.groupBy(F.col(host_col).alias("host")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(round_col).cast("long").alias("r"),
                    F.col(throttled_col).cast("long").alias("t"),
                )
            )
        ).alias("_rs")
    )
    flags = F.transform(F.col("_rs"), lambda x: x.getField("t"))
    zero = F.struct(
        F.lit(init).cast("long").alias("rate"),
        F.lit(0).cast("long").alias("halvings"),
        F.lit(init).cast("long").alias("minr"),
        F.lit(init).cast("long").alias("maxr"),
    )

    def step(acc, t):
        new_rate = F.when(
            t == 1,
            F.greatest(F.shiftright(acc.getField("rate"), 1), F.lit(floor_min).cast("long")),
        ).otherwise(
            F.least(acc.getField("rate") + incr, F.lit(cap).cast("long"))
        )
        return F.struct(
            new_rate.alias("rate"),
            (acc.getField("halvings") + (t == 1).cast("long")).alias("halvings"),
            F.least(acc.getField("minr"), new_rate).alias("minr"),
            F.greatest(acc.getField("maxr"), new_rate).alias("maxr"),
        )

    folded = F.aggregate(flags, zero, step)
    return grouped.select(
        "host",
        F.size("_rs").cast("long").alias("n_rounds"),
        folded.getField("rate").cast("long").alias("final_rate"),
        folded.getField("halvings").cast("long").alias("n_halvings"),
        folded.getField("minr").cast("long").alias("min_rate"),
        folded.getField("maxr").cast("long").alias("max_rate"),
    )


def aimd_rates_py(
    flags: list[int], init: int = 8, incr: int = 2, cap: int = 64, floor_min: int = 1
) -> tuple[int, int, int, int]:
    """Sequential reference kernel (tests + oracle derivation)."""
    rate, halvings, minr, maxr = init, 0, init, init
    for t in flags:
        rate = max(rate >> 1, floor_min) if t else min(rate + incr, cap)
        halvings += 1 if t else 0
        minr, maxr = min(minr, rate), max(maxr, rate)
    return rate, halvings, minr, maxr
