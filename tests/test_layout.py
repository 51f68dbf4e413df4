"""Z-order layout clustering (operators/layout.py) — Morton math vs the
python mirror, and the pruning property the layout exists for: files
cover tiles of (a, b) space, not slabs or the whole grid."""

import pytest
from pyspark.sql import functions as F

from anycrawl_spark.operators.layout import (
    interleave_bits,
    layout_stats,
    py_interleave,
    with_zvalue,
)


def test_interleave_matches_python_mirror(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (65535, 1), (12345, 54321)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    out = df.select(
        "a", "b", interleave_bits(F.col("a"), F.col("b"), 16).alias("z")
    ).collect()
    for r in out:
        assert r.z == py_interleave(r.a, r.b, 16), (r.a, r.b)


def test_zvalue_normalization_is_min_max_affine(spark):
    """Values at the dimension extremes must land at grid 0 and 2^bits-1 —
    i.e. the z of (lo_a, lo_b) is 0 and of (hi_a, hi_b) is all-ones."""
    df = spark.createDataFrame(
        [(100, 2000), (228, 3000), (164, 2500)], "a: long, b: long"
    )
    z = {(r.a, r.b): r.zvalue for r in with_zvalue(df, "a", "b", bits=4).collect()}
    assert z[(100, 2000)] == 0
    assert z[(228, 3000)] == 255  # 8 interleaved ones


def test_files_are_square_tiles_not_slabs(spark):
    """64x64 planted grid, 16 files by top z-bits: every file must be one
    16x16 spatial tile (256 rows, bbox width 16 on BOTH dims). A hash
    layout gives every file the full 64-wide bbox on both dims; a
    single-key sort gives full width on the other dim — z-order is the
    only layout where both bbox widths shrink."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    stats = layout_stats(grid, "a", "b", bits=16, n_files=16).collect()
    assert len(stats) == 16
    for r in stats:
        assert r.n_rows == 256
        assert r.max_a - r.min_a == 15
        assert r.max_b - r.min_b == 15


def test_constant_dimension_degrades_to_slabs(spark):
    """All-b-equal input: never divide-by-zero on the empty span, and the
    split degrades to slabs on a — only the 2 a-bits among the top 4
    z-bits discriminate, so 4 equal slabs instead of 16 tiles."""
    df = spark.range(256).select(F.col("id").alias("a"), F.lit(7).alias("b"))
    stats = layout_stats(df, "a", "b", bits=16, n_files=16).collect()
    assert len(stats) == 4
    assert all(r.n_rows == 64 and r.min_b == 7 and r.max_b == 7 for r in stats)
    assert all(r.max_a - r.min_a == 63 for r in stats)


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "a: long, b: long")
    with pytest.raises(ValueError, match="power of two"):
        layout_stats(df, "a", "b", n_files=12)
    with pytest.raises(ValueError, match="bits"):
        with_zvalue(df, "a", "b", bits=40)
