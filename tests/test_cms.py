"""Count-min sketch (operators/cms.py) — python-mirror cell equality,
the never-underestimate guarantee, exact-additive merging across
windows, and point-query accuracy for heavy hitters."""

from pyspark.sql import functions as F

from anycrawl_spark.operators.cms import (
    cms_merge,
    cms_query,
    cms_sketch,
    py_cms,
)


def _events(spark, vals):
    return spark.createDataFrame([(v, "g") for v in vals], "val: long, g: string")


def test_sketch_matches_python_mirror(spark):
    vals = [i % 37 for i in range(1000)]
    row = cms_sketch(_events(spark, vals), ["g"], "val").collect()[0]
    sk, _ = py_cms(vals)
    assert [list(r) for r in row.sketch] == sk


def test_never_underestimates_and_heavy_hitters_exact(spark):
    """est >= exact for every key; with 200 distinct keys in 4x256 cells,
    collisions are rare enough that most keys read exactly."""
    vals = [i % 200 for i in range(2000)] + [7] * 500  # key 7 is hot: 510
    df = cms_sketch(_events(spark, vals), ["g"], "val")
    probes = df.select(
        *[cms_query(F.col("sketch"), F.lit(k)).alias(f"k{k}") for k in (0, 7, 199, 12345)]
    ).collect()[0]
    assert probes.k7 >= 510 and probes.k0 >= 10 and probes.k199 >= 10
    assert probes.k12345 >= 0  # absent key: only collision noise
    _, query = py_cms(vals)
    assert (probes.k0, probes.k7, probes.k199, probes.k12345) == (
        query(0), query(7), query(199), query(12345)
    )


def test_merge_is_exactly_additive(spark):
    """Sketch of the union == element-wise sum of per-window sketches —
    merging adds no approximation."""
    w1, w2, w3 = [1, 2, 2, 3], [2, 3, 3, 4, 4], [9] * 10
    whole = cms_sketch(_events(spark, w1 + w2 + w3), ["g"], "val").collect()[0]
    per_window = spark.createDataFrame(
        [(v, "g", i) for i, w in enumerate((w1, w2, w3)) for v in w],
        "val: long, g: string, w: int",
    )
    merged = cms_merge(
        cms_sketch(per_window, ["g", "w"], "val"), ["g"]
    ).collect()[0]
    assert [list(r) for r in merged.sketch] == [list(r) for r in whole.sketch]
    # and the merged sketch answers point queries over the union
    got = (
        cms_merge(cms_sketch(per_window, ["g", "w"], "val"), ["g"])
        .select(cms_query(F.col("sketch"), F.lit(9)).alias("e"))
        .collect()[0]
        .e
    )
    assert got >= 10
