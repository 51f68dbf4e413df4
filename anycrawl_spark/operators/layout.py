"""Z-order (Morton) file-layout clustering for multidimensional pruning.

The documents table at 100 TB is partitioned `(bucket(url_hash),
days(ingest))`, which prunes perfectly on either key — but real reads
("host H over the last week") carry BOTH a host predicate and a time
predicate, and hash-bucketing scatters a host's rows across every time
partition's files. The standard lever (public: Morton 1966 ordering;
Iceberg's `write-ordered-by zorder(...)`, Delta's `OPTIMIZE ZORDER BY`)
is to sort-cluster each partition's files by the bit-interleave of the
dimension keys: files then cover small RECTANGLES of (host, time) space
instead of slabs, so min/max footer stats prune on both dimensions at
once.

Everything here is pure JVM integer column math — no python stage, no
global sort (file assignment is by fixed-width z-range via the top z
bits, not `ntile`, so there is no RangePartitioning exchange; at write
time you'd `repartitionByRange(zvalue)` + `sortWithinPartitions`, and
the Iceberg table property does exactly that for you). Deterministic
end-to-end: affine normalization is exact integer arithmetic, so DuckDB
reproduces every z-value bit-for-bit (q_zorder_layout).

The payoff is measurable without a cluster: per-file bounding boxes.
``layout_stats`` reports each file's (min, max) on both dimensions —
under z-order the average bbox AREA shrinks toward (rows/files)-sized
squares, under single-key or hash layout it stays a full-width slab;
tests/test_layout.py quantifies the gap on a planted grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton z-value: bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1. Inputs must be non-negative and < 2^bits. Pure column math —
    2*bits shift/mask/add terms, folded by codegen into one expression."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = z + F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
    return z


def normalize_dim(x: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Exact-integer affine map of ``x`` in [lo, hi] onto [0, 2^bits):
    floor((x - lo) * 2^bits / (hi - lo + 1)). Integer division keeps both
    engines bit-identical; a constant dimension maps everything to 0."""
    span = (hi.cast("long") - lo.cast("long") + 1)
    return F.floor(((x.cast("long") - lo.cast("long")) * F.lit(1 << bits)) / span).cast(
        "long"
    )


def with_zvalue(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    bits: int = 16,
    out_col: str = "zvalue",
) -> DataFrame:
    """Attach the z-value of (dim_a, dim_b), normalizing each dimension by
    its global min/max. The min/max aggregate is ONE O(1)-row frame,
    broadcast-joined back (a literal-sized build side) — the data-scale
    pass stays a narrow projection."""
    bounds = df.agg(
        F.min(dim_a).alias("_lo_a"),
        F.max(dim_a).alias("_hi_a"),
        F.min(dim_b).alias("_lo_b"),
        F.max(dim_b).alias("_hi_b"),
    )
    j = df.crossJoin(F.broadcast(bounds))
    na = normalize_dim(F.col(dim_a), F.col("_lo_a"), F.col("_hi_a"), bits)
    nb = normalize_dim(F.col(dim_b), F.col("_lo_b"), F.col("_hi_b"), bits)
    return j.withColumn(out_col, interleave_bits(na, nb, bits)).drop(
        "_lo_a", "_hi_a", "_lo_b", "_hi_b"
    )


def layout_stats(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    bits: int = 16,
    n_files: int = 16,
) -> DataFrame:
    """Assign rows to ``n_files`` files by fixed-width z-range (top log2
    bits of the z-value — no global sort, no RangePartitioning) and report
    each file's row count and per-dimension bounding box. The bbox widths
    are exactly what parquet footer min/max pruning sees."""
    if n_files & (n_files - 1):
        raise ValueError(f"n_files must be a power of two, got {n_files}")
    shift = 2 * bits - n_files.bit_length() + 1
    z = with_zvalue(df, dim_a, dim_b, bits)
    return (
        z.withColumn("file_id", F.shiftright(F.col("zvalue"), shift))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(dim_a).alias("min_a"),
            F.max(dim_a).alias("max_a"),
            F.min(dim_b).alias("min_b"),
            F.max(dim_b).alias("max_b"),
        )
    )


def py_interleave(a: int, b: int, bits: int = 16) -> int:
    """Sequential mirror for tests."""
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z
