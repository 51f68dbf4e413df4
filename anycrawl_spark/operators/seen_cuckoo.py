"""URL-seen filter, cuckoo variant: delete-capable partitioned shards.

north_rule names a "partitioned bloom/cuckoo URL-seen filter"; `seen.py` is
the bloom half (append-only generations). This module is the cuckoo half
(Fan et al. 2014, "Cuckoo Filter: Practically Better Than Bloom", public),
and exists for the one capability bloom structurally lacks: **deletion**.
The expiry sweep (SURVEY §2.2 F11 — the reference re-queues URLs whose crawl
records expire) removes rows from the exact ``seen`` table, but a bloom
prefilter keeps answering "maybe seen" for them until a full generation
rebuild; a cuckoo shard deletes the fingerprint in place, so re-crawl
candidates pass the prefilter immediately.

Same sharding scheme as the bloom path: ``dedup_hash = xxhash64(job_id,
url_hash)`` bucketed by ``pmod(dedup_hash, num_buckets)``; one binary row per
bucket; probes ship 16 bytes/row through Arrow and return 1; positives are
re-checked with an exact anti-join, so the *output* of ``filter_fresh_cuckoo``
is exact regardless of the filter's false-positive rate (no false negatives:
a cuckoo filter stores every inserted fingerprint until deleted).

Per-shard layout (standard CF): ``nb`` buckets (power of two) x 4 slots of
16-bit fingerprints (uint16 numpy array; 0 = empty, fingerprints forced
nonzero). Partial-key cuckoo hashing: ``i1 = (splitmix(h) >> 32) & (nb-1)``
(scrambled — the raw low bits are the SHARD key and must not address the
table), ``i2 = i1 ^ scramble(fp)`` — the alternate index is derivable from (index,
fingerprint) alone, which is what makes deletion and eviction work without
the original key.

Scale accounting (docs/SCALE.md): ~2.4 bytes/key at 0.84 target load with
1.5x headroom (vs bloom's ~1.2), for fpp ~= 2*4/2^16 ~= 0.012%% (80x better
than the bloom generations' ~1%%) plus deletability. Growth: a cuckoo table
cannot be doubled losslessly from fingerprints (the high index bit of ``h``
is gone — known CF limitation), so an overflowing SHARD is rebuilt from that
bucket's slice of the exact seen table — O(bucket keys), the same cost class
as opening a bloom generation, never O(|seen|). Reference dedup semantics
mirrored: packages/scrape/src/engines/Base.ts:413-441 (jobId-scoped
uniqueKey), managers/Progress.ts expiry re-queue.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anycrawl_spark.operators.seen import (
    BROADCAST_SHARDS_MAX_BYTES,
    DEFAULT_BUCKETS,
    with_dedup_key,
)

SLOTS = 4                 # slots per cuckoo bucket (Fan et al. §5: 4 is the sweet spot)
TARGET_LOAD = 0.84        # max occupancy before insert failures spike (4-way figure)
HEADROOM = 1.5            # build-time growth room so early rounds merge in place
MAX_KICKS = 500           # eviction chain cap before declaring overflow
_FP_MUL = np.uint64(0x5BD1E995)  # MurmurHash2 multiplier (public) for fp scramble
# splitmix64 / golden-ratio multiplier (public) scrambles the key before the
# in-table index is taken: the SHARD key is pmod(dedup_hash, num_buckets) —
# the hash's LOW bits — so taking i1 from raw low bits would leave only
# 1/num_buckets of each table's rows addressable (8x load concentration,
# measured as spurious overflows). i1 therefore comes from the scrambled
# hash's HIGH bits, which are independent of the shard key.
_IDX_MUL = np.uint64(0x9E3779B97F4A7C15)

CUCKOO_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_keys", T.LongType()),
        T.StructField("table", T.BinaryType()),
    ]
)

MERGED_CUCKOO_SCHEMA = T.StructType(
    list(CUCKOO_SHARD_SCHEMA.fields)
    + [T.StructField("updated", T.BooleanType()), T.StructField("overflow", T.BooleanType())]
)


def _fp_i1_i2(hashes: np.ndarray, nb: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fingerprint + both candidate bucket indices, vectorized."""
    h = hashes.astype(np.uint64)
    fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty-slot marker
    mask = np.uint64(nb - 1)
    i1 = (((h * _IDX_MUL) >> np.uint64(32)) & mask).astype(np.int64)
    alt = ((fp.astype(np.uint64) * _FP_MUL) & mask).astype(np.int64)
    return fp, i1, i1 ^ alt


def _alt_index(i: int, fp: int, nb: int) -> int:
    return i ^ int((np.uint64(fp) * _FP_MUL) & np.uint64(nb - 1))


def _num_buckets_for(n_keys: int, headroom: float = HEADROOM) -> int:
    need = max(4, int(n_keys * headroom / TARGET_LOAD / SLOTS) + 1)
    nb = 1
    while nb < need:
        nb <<= 1
    return nb


def _insert_one(tbl: np.ndarray, nb: int, fp: int, i1: int, i2: int) -> bool:
    """Insert one fingerprint; eviction chain on full buckets. Deterministic
    (victim slot cycles with the kick count — no RNG, so shard blobs are
    reproducible run-to-run)."""
    for i in (i1, i2):
        base = i * SLOTS
        for s in range(SLOTS):
            if tbl[base + s] == 0:
                tbl[base + s] = fp
                return True
    i = i2
    for kick in range(MAX_KICKS):
        base = i * SLOTS
        s = kick % SLOTS
        victim = int(tbl[base + s])
        tbl[base + s] = fp
        fp = victim
        i = _alt_index(i, fp, nb)
        base = i * SLOTS
        for s2 in range(SLOTS):
            if tbl[base + s2] == 0:
                tbl[base + s2] = fp
                return True
    return False  # overflow: caller rebuilds this shard at 2x from source keys


def _delete_one(tbl: np.ndarray, fp: int, i1: int, i2: int) -> bool:
    """Clear ONE matching fingerprint (CF delete semantics: only safe for keys
    actually inserted — the engine deletes only rows it removes from the exact
    seen table, which guarantees that)."""
    for i in (i1, i2):
        base = i * SLOTS
        for s in range(SLOTS):
            if tbl[base + s] == fp:
                tbl[base + s] = 0
                return True
    return False


def _build_table(hashes: np.ndarray, nb: int | None = None) -> tuple[np.ndarray, int]:
    # The filter is a SET: duplicate keys add nothing, and >8 copies of one
    # key can never fit its 2 buckets x 4 slots — without this dedup the
    # grow-and-retry loop below would double nb forever on such input.
    hashes = np.unique(hashes)
    if nb is None:
        nb = _num_buckets_for(len(hashes))
    while True:
        tbl = np.zeros(nb * SLOTS, dtype=np.uint16)
        fps, i1s, i2s = _fp_i1_i2(hashes, nb)
        ok = all(
            _insert_one(tbl, nb, int(fps[j]), int(i1s[j]), int(i2s[j]))
            for j in range(len(hashes))
        )
        if ok:
            return tbl, nb
        nb <<= 1  # build-time overflow (duplicate-heavy input): just go bigger


def _probe_table(tbl: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership: 8 gathers (4 slots x 2 buckets), no per-key loop."""
    nb = len(tbl) // SLOTS
    fps, i1s, i2s = _fp_i1_i2(hashes, nb)
    hit = np.zeros(len(hashes), dtype=bool)
    for s in range(SLOTS):
        hit |= tbl[i1s * SLOTS + s] == fps
        hit |= tbl[i2s * SLOTS + s] == fps
    return hit


def _build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    hashes = np.unique(pdf["dedup_hash"].to_numpy())
    tbl, _ = _build_table(hashes)
    return pd.DataFrame(
        {
            "bucket": [int(pdf["bucket"].iloc[0])],
            "n_keys": [len(hashes)],
            "table": [tbl.tobytes()],
        }
    )


def build_cuckoo_shards(seen_keyed: DataFrame) -> DataFrame:
    """seen rows (with dedup_hash+bucket attached) -> one cuckoo row per bucket."""
    return (
        seen_keyed.select("bucket", "dedup_hash")
        .groupBy("bucket")
        .applyInPandas(_build_shard, schema=CUCKOO_SHARD_SCHEMA)
    )


def _merge_kernel(ops: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
    """One bucket: apply this round's deletes then inserts to the shard table.

    On insert overflow the ORIGINAL table is returned with ``overflow=True``
    (never a half-applied one); the caller rebuilds that bucket from the exact
    seen table at the next power of two (``rebuild_overflow_shards``).
    """
    # the cogroup's shard side is semi-joined to op buckets, so every group
    # carries at least one op row — ops is never empty here
    bucket = int(ops["bucket"].iloc[0])
    if shard.empty:
        ins = np.unique(ops.loc[ops["op"] > 0, "dedup_hash"].to_numpy())
        tbl, _ = _build_table(ins)
        return pd.DataFrame(
            {"bucket": [bucket], "n_keys": [len(ins)], "table": [tbl.tobytes()],
             "updated": [True], "overflow": [False]}
        )
    orig = shard["table"].iloc[0]
    n_keys = int(shard["n_keys"].iloc[0])
    tbl = np.frombuffer(orig, dtype=np.uint16).copy()
    nb = len(tbl) // SLOTS
    # set semantics: one stored copy per key, one delete per key (duplicated
    # rows in a round's batch must not insert multiple fingerprint copies)
    dels = np.unique(ops.loc[ops["op"] < 0, "dedup_hash"].to_numpy())
    ins = np.unique(ops.loc[ops["op"] > 0, "dedup_hash"].to_numpy())
    fps, i1s, i2s = _fp_i1_i2(dels, nb)
    for j in range(len(dels)):  # deletes first: they free slots for inserts
        if _delete_one(tbl, int(fps[j]), int(i1s[j]), int(i2s[j])):
            n_keys -= 1
    fps, i1s, i2s = _fp_i1_i2(ins, nb)
    for j in range(len(ins)):
        if not _insert_one(tbl, nb, int(fps[j]), int(i1s[j]), int(i2s[j])):
            return pd.DataFrame(
                {"bucket": [bucket], "n_keys": [int(shard["n_keys"].iloc[0])],
                 "table": [orig], "updated": [False], "overflow": [True]}
            )
    return pd.DataFrame(
        {"bucket": [bucket], "n_keys": [n_keys + len(ins)], "table": [tbl.tobytes()],
         "updated": [True], "overflow": [False]}
    )


def merge_cuckoo_shards(
    shards: DataFrame | None,
    fresh_keyed: DataFrame | None = None,
    delete_keyed: DataFrame | None = None,
) -> DataFrame:
    """Apply one round's inserts (fresh keys) and deletes (expired keys) to
    the persisted shard state — the Iceberg-MERGE analog, same dirty/clean
    split as the bloom path: buckets this round never touched pass through
    without their blobs crossing the Arrow boundary.
    """
    parts = []
    if fresh_keyed is not None:
        parts.append(
            fresh_keyed.select("bucket", "dedup_hash").withColumn("op", F.lit(1))
        )
    if delete_keyed is not None:
        parts.append(
            delete_keyed.select("bucket", "dedup_hash").withColumn("op", F.lit(-1))
        )
    if not parts:
        raise ValueError("merge_cuckoo_shards: nothing to merge")
    ops = parts[0]
    for p in parts[1:]:
        ops = ops.unionByName(p)
    if shards is None:
        shards = ops.sparkSession.createDataFrame([], CUCKOO_SHARD_SCHEMA)
    dirty_buckets = ops.select("bucket").distinct()
    dirty = shards.join(F.broadcast(dirty_buckets), "bucket", "semi")
    clean = (
        shards.join(F.broadcast(dirty_buckets), "bucket", "anti")
        .withColumn("updated", F.lit(False))
        .withColumn("overflow", F.lit(False))
        .select([f.name for f in MERGED_CUCKOO_SCHEMA.fields])
    )
    merged_dirty = (
        ops.groupBy("bucket")
        .cogroup(dirty.groupBy("bucket"))
        .applyInPandas(lambda o, s: _merge_kernel(o, s), schema=MERGED_CUCKOO_SCHEMA)
    )
    return merged_dirty.unionByName(clean)


def _rebuild_shard(keys: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
    hashes = np.unique(keys["dedup_hash"].to_numpy())
    nb_old = (len(shard["table"].iloc[0]) // 2 // SLOTS) if not shard.empty else None
    tbl, _ = _build_table(hashes, nb=nb_old * 2 if nb_old else None)
    bucket = int(keys["bucket"].iloc[0]) if len(keys) else int(shard["bucket"].iloc[0])
    return pd.DataFrame(
        {"bucket": [bucket], "n_keys": [len(hashes)], "table": [tbl.tobytes()],
         "updated": [True], "overflow": [False]}
    )


def rebuild_overflow_shards(merged: DataFrame, seen_keyed: DataFrame) -> DataFrame:
    """Rebuild the buckets ``merge_cuckoo_shards`` flagged ``overflow`` at 2x
    capacity from the exact seen table (post-round keys). Cost is O(keys of
    the overflowed buckets) — the seen table is bucketed on the same key, so
    this is a filtered scan + one applyInPandas over only those buckets.
    Returns the full merged state with overflow rows replaced.
    """
    over = merged.filter(F.col("overflow")).select("bucket")
    ok = merged.join(F.broadcast(over), "bucket", "anti")
    rebuilt = (
        seen_keyed.select("bucket", "dedup_hash")
        .join(F.broadcast(over), "bucket", "semi")
        .groupBy("bucket")
        .cogroup(merged.filter(F.col("overflow")).groupBy("bucket"))
        .applyInPandas(lambda k, s: _rebuild_shard(k, s), schema=MERGED_CUCKOO_SCHEMA)
    )
    return ok.unionByName(rebuilt)


def broadcast_cuckoo_shards(shards: DataFrame):
    """Collect + broadcast {bucket: table bytes} (single table per bucket —
    no generation lists here; deletes keep one table current forever)."""
    spark = shards.sparkSession
    return spark.sparkContext.broadcast(
        {r.bucket: r.table for r in shards.select("bucket", "table").collect()}
    )


# Table bytes per key at build time: 2 B/slot / TARGET_LOAD occupancy x
# HEADROOM growth room x <=2 power-of-two rounding. Used only to DECIDE
# broadcast-vs-cogroup, so it deliberately takes the rounding worst case —
# overestimating flips to cogroup early (safe); underestimating broadcasts
# a table that may not fit.
CUCKOO_EST_BYTES_PER_KEY = 2.0 / TARGET_LOAD * HEADROOM * 2.0


def _broadcast_probe_cuckoo(cand: DataFrame, shards: DataFrame | None, bc=None) -> DataFrame:
    """Attach ``maybe_seen`` via broadcast shards + scalar pandas UDF — the
    same 16-bytes-out / 1-byte-back Arrow shape as the bloom probe."""
    if bc is None:
        bc = broadcast_cuckoo_shards(shards)

    @F.pandas_udf(T.BooleanType())
    def probe(bucket: pd.Series, dedup_hash: pd.Series) -> pd.Series:
        local = bc.value
        bk = bucket.to_numpy()
        keys = dedup_hash.to_numpy()
        out = np.zeros(len(bk), dtype=bool)
        for b in np.unique(bk):
            blob = local.get(int(b))
            if blob is None:
                continue
            idxs = np.nonzero(bk == b)[0]
            out[idxs] = _probe_table(np.frombuffer(blob, dtype=np.uint16), keys[idxs])
        return pd.Series(out)

    return cand.withColumn("maybe_seen", probe(F.col("bucket"), F.col("dedup_hash")))


def _probe_cogroup_kernel(keys: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
    """One bucket's candidate KEYS + its (single) cuckoo table. Same two
    bandwidth rules as the bloom cogroup kernel (seen.py:_probe_cogroup):
    the table blob crosses the wire once per bucket, and only the 8-byte
    dedup_hash keys round-trip through Arrow."""
    if len(keys) == 0:
        return pd.DataFrame({"dedup_hash": [], "maybe_seen": []}).astype(
            {"dedup_hash": "int64", "maybe_seen": "bool"}
        )
    hs = keys["dedup_hash"].to_numpy()
    if shard.empty:
        hit = np.zeros(len(hs), dtype=bool)  # bucket never saw anything
    else:
        hit = _probe_table(np.frombuffer(shard["table"].iloc[0], dtype=np.uint16), hs)
    return pd.DataFrame({"dedup_hash": hs, "maybe_seen": hit})


def _cogroup_probe_cuckoo(cand: DataFrame, shards: DataFrame) -> DataFrame:
    """Co-partitioned scale path: shard blobs travel once per bucket through
    the shuffle, never collected to the driver or broadcast. This is the
    path past BROADCAST_SHARDS_MAX_BYTES — at 10^10 keys the table set is
    ~36 GB (CUCKOO_EST_BYTES_PER_KEY), structurally un-broadcastable
    (VERDICT r3 #3)."""
    verdicts = (
        cand.select("bucket", "dedup_hash")
        .distinct()
        .groupBy("bucket")
        .cogroup(shards.groupBy("bucket"))
        .applyInPandas(
            lambda k, s: _probe_cogroup_kernel(k, s),
            schema="dedup_hash long, maybe_seen boolean",
        )
    )
    return cand.join(verdicts, "dedup_hash")


def probe_cuckoo(
    cand: DataFrame,
    shards: DataFrame | None,
    bc=None,
    strategy: str = "auto",
    seen_count: int | None = None,
) -> DataFrame:
    """Attach ``maybe_seen``; ``strategy``: 'broadcast' | 'cogroup' | 'auto'
    (mirrors seen.filter_fresh — broadcast while the estimated table bytes
    fit under BROADCAST_SHARDS_MAX_BYTES, else cogroup). ``seen_count`` feeds
    the auto estimate without an O(|seen|) count; a live ``bc`` forces the
    broadcast path (the caller already paid the collect)."""
    if bc is not None:
        return _broadcast_probe_cuckoo(cand, shards, bc=bc)
    if strategy == "auto":
        if seen_count is not None:
            est_bytes = int(seen_count * CUCKOO_EST_BYTES_PER_KEY)
        else:
            # O(num_buckets) rows — the shard relation is one row per bucket
            row = shards.agg(F.sum(F.length("table")).alias("b")).collect()[0]
            est_bytes = int(row["b"] or 0)
        strategy = "broadcast" if est_bytes <= BROADCAST_SHARDS_MAX_BYTES else "cogroup"
    if strategy == "broadcast":
        return _broadcast_probe_cuckoo(cand, shards, bc=bc)
    return _cogroup_probe_cuckoo(cand, shards)


def filter_fresh_cuckoo(
    candidates: DataFrame,
    seen: DataFrame,
    num_buckets: int = DEFAULT_BUCKETS,
    shards: DataFrame | None = None,
    shards_bc=None,
    strategy: str = "auto",
    seen_count: int | None = None,
) -> DataFrame:
    """Exact fresh-candidate set via cuckoo prefilter + exact anti-join
    recheck of positives — drop-in alternative to ``seen.filter_fresh``,
    including its broadcast/cogroup/auto ``strategy`` switch (pass
    ``seen_count`` so auto never fires an O(|seen|) count action).
    ``seen`` must be the CURRENT exact key set (post-expiry), matching the
    shard state the caller maintained with ``merge_cuckoo_shards``.

    Broadcast lifecycle: when neither ``shards_bc`` nor a caller-held
    broadcast is supplied, ``probe_cuckoo`` allocates a NEW sc.broadcast
    whose blobs live until session end — fine for one-shot queries; a
    long-running crawl loop must hold/patch its own broadcast across rounds
    and destroy predecessors (the ``ShardBroadcast`` pattern in seen.py)."""
    cand = with_dedup_key(candidates, num_buckets)
    if shards_bc is None and shards is None:
        shards = build_cuckoo_shards(with_dedup_key(seen, num_buckets))
    probed = probe_cuckoo(cand, shards, bc=shards_bc, strategy=strategy, seen_count=seen_count)
    fresh = probed.filter(~F.col("maybe_seen"))
    maybe = probed.filter(F.col("maybe_seen")).join(
        seen.select("job_id", "url_hash"), ["job_id", "url_hash"], "left_anti"
    )
    return fresh.unionByName(maybe).drop("maybe_seen", "dedup_hash", "bucket")
