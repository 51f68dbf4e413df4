"""Frontier sharding: rendezvous (HRW) host→shard assignment.

A distributed frontier must pin every host to ONE worker shard
(politeness is per-host state), and must survive resizing the shard
count without re-shuffling the world. Modulo hashing moves
``1 - old/new`` of all hosts on resize (15/16 of the frontier going
16→17); rendezvous hashing (Highest Random Weight, Thaler & Ravishankar
1998, public) moves exactly the ``~1/new`` that the new shard wins —
every host not won by the new shard keeps its argmax, hence its
assignment. The reference's queue layer is single-node Redis
(`packages/libs/queue`), so shard assignment is rebuild-added
distribution machinery.

Spark shape — deliberately NOT the explode+groupBy form: the argmax
over shards is a ``greatest()`` of (weight, shard) STRUCTS, i.e. a pure
projection evaluated inside whole-stage codegen. Zero exchanges, zero
extra rows, composes with any scan; 10^8 hosts × 32 shards is just 32
md5 calls per row in the scan stage. (The oracle restates it as
UNNEST + arg_max — the relational form — proving the two agree.)

Weights are md5 hex strings compared lexicographically: deterministic,
engine-independent, and collision-free for any practical host set —
keeping the repo's no-floats/no-libm rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hrw_weight(host: Column, shard: int) -> Column:
    return F.md5(F.concat(host, F.lit(f":{shard}")))


def hrw_shard_col(host: Column, n_shards: int) -> Column:
    """argmax_s md5(host ':' s) as a greatest() of (weight, shard)
    structs — struct comparison is field-ordered, so ties (impossible in
    practice) would break on the higher shard id deterministically."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if n_shards == 1:
        return F.lit(0).cast("long")
    best = F.greatest(
        *[
            F.struct(
                hrw_weight(host, s).alias("w"),
                F.lit(s).cast("long").alias("shard"),
            )
            for s in range(n_shards)
        ]
    )
    return best.getField("shard")


def assign_shards(
    hosts: DataFrame, n_shards: int, host_col: str = "host", out_col: str = "shard"
) -> DataFrame:
    return hosts.withColumn(out_col, hrw_shard_col(F.col(host_col), n_shards))


def resize_stats(
    hosts: DataFrame, n_old: int, n_new: int, host_col: str = "host"
) -> DataFrame:
    """Per-new-shard resize accounting: how many hosts each shard holds
    under ``n_old`` and ``n_new``, and how many MOVED INTO it by the
    resize. HRW's guarantee: moved hosts land only on shards that did
    not exist before (grow) or redistribute only the removed shards'
    hosts (shrink). One small groupBy over (shard pairs) — the heavy
    per-host work stays in the projection."""
    h = F.col(host_col)
    assigned = hosts.select(
        h.alias("host"),
        hrw_shard_col(h, n_old).alias("shard_old"),
        hrw_shard_col(h, n_new).alias("shard_new"),
    )
    return (
        assigned.groupBy("shard_new")
        .agg(
            F.count("*").cast("long").alias("n_hosts_new"),
            F.sum((F.col("shard_old") == F.col("shard_new")).cast("long"))
            .cast("long")
            .alias("n_stayed"),
            F.sum((F.col("shard_old") != F.col("shard_new")).cast("long"))
            .cast("long")
            .alias("n_moved_in"),
        )
        .withColumnRenamed("shard_new", "shard")
    )


def hrw_shard_py(host: str, n_shards: int) -> int:
    """Sequential reference kernel (tests)."""
    import hashlib

    return max(
        range(n_shards),
        key=lambda s: (hashlib.md5(f"{host}:{s}".encode()).hexdigest(), s),
    )
