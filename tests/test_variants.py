"""URL variant folding (operators/variants.py).

Layer 1: fold-rule cases (tracking params kept/dropped in order,
         host-label fold, index/amp fold, fragment drop, negatives).
Layer 2: cluster semantics on a crafted variant family.
Layer 3: plan guard (scan-stage fold, one groupBy).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from anycrawl_spark.operators.variants import variant_clusters, variant_key

CASES = {
    # tracking params drop, real ones keep ORIGINAL order
    "http://a.ex/p?utm_source=x&color=red&utm_b=2&size=9":
        "http://a.ex/p?color=red&size=9",
    "http://a.ex/p?gclid=1&fbclid=2&ref=x&mc_cid=3&mc_eid=4": "http://a.ex/p",
    "http://a.ex/p?refx=keep": "http://a.ex/p?refx=keep",  # prefix, not 'ref'
    # one leading marker label folds
    "http://www.a.ex/p": "http://a.ex/p",
    "http://m.a.ex/p": "http://a.ex/p",
    "http://amp.a.ex/p": "http://a.ex/p",
    "http://www.m.a.ex/p": "http://m.a.ex/p",     # one label only
    "http://mm.a.ex/p": "http://mm.a.ex/p",       # not a marker
    "https://www.a.ex/p": "https://a.ex/p",       # scheme preserved
    # index + amp folds
    "http://a.ex/d/index.html": "http://a.ex/d/",
    "http://a.ex/d/index.htm": "http://a.ex/d/",
    "http://a.ex/d/indexxhtml": "http://a.ex/d/indexxhtml",
    "http://a.ex/item/5/amp": "http://a.ex/item/5",
    "http://a.ex/lamp": "http://a.ex/lamp",       # 'amp' must be a segment
    # fragment drops
    "http://a.ex/p#sec": "http://a.ex/p",
    "http://a.ex/p?x=1#sec": "http://a.ex/p?x=1",
}


def test_fold_rules(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"])
    got = {
        r["url"]: r["k"]
        for r in df.select("url", variant_key(F.col("url")).alias("k")).collect()
    }
    for u, want in CASES.items():
        assert got[u] == want, u


def test_cluster_semantics(spark):
    rows = [
        "http://shop.ex/item/1",
        "http://www.shop.ex/item/1?utm_source=m",
        "http://m.shop.ex/item/1?gclid=9",
        "http://shop.ex/item/1/amp",
        "http://shop.ex/item/1?color=red",   # real param -> its own cluster
        "http://shop.ex/item/2",
    ]
    df = spark.createDataFrame([(u,) for u in rows], ["url"])
    got = {
        r["variant_key"]: (r["n_variants"], r["sample_url"])
        for r in variant_clusters(df).collect()
    }
    assert got["http://shop.ex/item/1"][0] == 4
    assert got["http://shop.ex/item/1?color=red"][0] == 1
    assert got["http://shop.ex/item/2"][0] == 1
    # sample_url is the lexicographic min of the cluster members
    assert got["http://shop.ex/item/1"][1] == "http://m.shop.ex/item/1?gclid=9"


def test_plan_shape(spark):
    from anycrawl_spark.queries import q_variant_clusters

    p = q_variant_clusters(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "Cartesian" not in p
    assert "partial_count" in p, "cluster rollup must be two-phase"
