"""Crawl-trap detection (operators/traps.py).

Layer 1: the repeat-segment detector against a sequential reference
         (Counter-based) over crafted and generated paths.
Layer 2: hand-computed per-host signals for each behavior class.
Layer 3: plan guards (no explode, no python, two-phase agg).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from anycrawl_spark.operators.traps import (
    has_repeated_segment,
    n_query_params,
    trap_signals,
)

URLS = [
    # no repeats
    "http://a.example/p/1",
    "http://a.example/x/y/z",
    "http://a.example/",
    "http://a.example",
    # pair but not triple
    "http://a.example/a/b/a/c",
    # exact triple, adjacent and spread
    "http://a.example/a/a/a",
    "http://a.example/a/x/a/y/a",
    # quadruple
    "http://a.example/b/b/b/b",
    # triple among others, deep path
    "http://a.example/q/w/e/r/t/q/x/q",
    # repeats only in query, not path
    "http://a.example/p?a=1&a=2&a=3",
    # empty segments collapse
    "http://a.example//a//a//a//",
]


def _ref_repeat(url: str) -> bool:
    path = url.split("://", 1)[1]
    path = path[path.find("/"):] if "/" in path else ""
    path = path.split("?", 1)[0].split("#", 1)[0]
    segs = [s for s in path.split("/") if s]
    return bool(segs) and Counter(segs).most_common(1)[0][1] >= 3


def test_repeat_detector_vs_reference(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = {
        r["url"]: r["rep"]
        for r in df.select(
            "url", has_repeated_segment(F.col("url")).alias("rep")
        ).collect()
    }
    for u in URLS:
        assert got[u] == _ref_repeat(u), u


def test_param_counter(spark):
    cases = {
        "http://a.example/p": 0,
        "http://a.example/p?": 0,
        "http://a.example/p?a=1": 1,
        "http://a.example/p?a=1&b=2&c=3": 3,
        "http://a.example/p?a=1#f": 1,
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {
        r["url"]: r["n"]
        for r in df.select("url", n_query_params(F.col("url")).alias("n")).collect()
    }
    assert got == cases


def test_signals_hand_case(spark):
    rows = [
        ("clean.ex", "http://clean.ex/p/1"),
        ("clean.ex", "http://clean.ex/p/2"),
        ("loop.ex", "http://loop.ex/a/1/a/2/a/x"),
        ("loop.ex", "http://loop.ex/a/3/a/4/a/x"),
        ("loop.ex", "http://loop.ex/p/ok"),
        ("sess.ex", "http://sess.ex/q?s=1&t=2&u=3"),
        ("sess.ex", "http://sess.ex/q?s=2"),
    ]
    df = spark.createDataFrame(rows, ["host", "url"])
    got = {r["host"]: r for r in trap_signals(df).collect()}
    c = got["clean.ex"]
    assert (c["max_depth"], c["n_repeat_urls"], c["params_x100"]) == (2, 0, 0)
    assert (c["deep"], c["repeaty"], c["paramy"], c["trap_score"]) == (0, 0, 0, 0)
    lo = got["loop.ex"]
    assert (lo["n_urls"], lo["max_depth"], lo["n_repeat_urls"]) == (3, 6, 2)
    assert (lo["deep"], lo["repeaty"], lo["trap_score"]) == (1, 1, 3)
    se = got["sess.ex"]
    assert se["params_x100"] == 200  # (3+1)*100 div 2
    assert (se["paramy"], se["trap_score"]) == (1, 2)


def test_plan_shapes(spark):
    from anycrawl_spark.queries import q_trap_signals

    p = q_trap_signals(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "Generate" not in p, "repeat detection must not explode"
    assert "partial_count" in p or "partial" in p.lower(), "agg must be two-phase"
    assert "Cartesian" not in p
