"""Recrawl scheduling (operators/freshness.py).

Layer 1: hand-computed change stats and priorities on a crafted history.
Layer 2: sequential-reference differential on a mixed fixture +
         partition invariance.
Layer 3: plan guards (lag window partitions per-url, rank cut map-side,
         pure JVM).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from anycrawl_spark.operators.freshness import (
    COLD_START_RATE,
    SCALE,
    recrawl_batch,
    recrawl_priorities,
    visit_change_stats,
)

# (url_id, seq, digest): url 1 changes twice in 3 intervals; url 2 never
# changes; url 3 is cold-start (one visit); url 4 changes every visit
HISTORY = [
    (1, 10, "a"), (1, 20, "b"), (1, 30, "b"), (1, 40, "c"),
    (2, 5, "x"), (2, 15, "x"), (2, 25, "x"),
    (3, 50, "q"),
    (4, 1, "m"), (4, 2, "n"), (4, 3, "o"),
]


def _stats_df(spark):
    return visit_change_stats(
        spark.createDataFrame(HISTORY, ["url_id", "seq", "digest"])
    )


def test_change_stats_hand_case(spark):
    got = {r["url_id"]: r for r in _stats_df(spark).collect()}
    assert (got[1]["n_visits"], got[1]["n_changes"], got[1]["last_seq"]) == (4, 2, 40)
    assert (got[2]["n_visits"], got[2]["n_changes"], got[2]["last_seq"]) == (3, 0, 25)
    assert (got[3]["n_visits"], got[3]["n_changes"], got[3]["last_seq"]) == (1, 0, 50)
    assert (got[4]["n_visits"], got[4]["n_changes"], got[4]["last_seq"]) == (3, 2, 3)


def test_priorities_hand_case(spark):
    got = {
        r["url_id"]: r
        for r in recrawl_priorities(_stats_df(spark), horizon_seq=100).collect()
    }
    # url1: rate = 2*1000 div 3 = 666, age = 60 -> 39960
    assert (got[1]["rate_scaled"], got[1]["age"], got[1]["priority"]) == (666, 60, 39960)
    # url2 never changed: rate 0, priority 0 even at age 75
    assert (got[2]["rate_scaled"], got[2]["priority"]) == (0, 0)
    # url3 cold start: half-scale prior
    assert got[3]["rate_scaled"] == COLD_START_RATE == SCALE // 2
    assert got[3]["priority"] == 500 * 50
    # url4: rate 1000, age 97
    assert (got[4]["rate_scaled"], got[4]["priority"]) == (1000, 97000)


def test_batch_tiebreak_and_budget(spark):
    pri = recrawl_priorities(_stats_df(spark), horizon_seq=100).withColumn(
        "host", F.lit("h0")
    )
    rows = recrawl_batch(pri, k=2).orderBy("rnk").collect()
    assert [r["url_id"] for r in rows] == [4, 1]
    assert [r["rnk"] for r in rows] == [1, 2]


def _sequential_reference(visits, horizon, k):
    hist = defaultdict(list)
    for url, seq, dig in visits:
        hist[url].append((seq, dig))
    out = {}
    for url, vs in hist.items():
        vs.sort()
        n = len(vs)
        c = sum(1 for (_, a), (_, b) in zip(vs, vs[1:]) if a != b)
        last = vs[-1][0]
        rate = (c * SCALE) // (n - 1) if n > 1 else SCALE // 2
        out[url] = (n, c, last, rate, horizon - last, rate * (horizon - last))
    ranked = defaultdict(list)
    for url, v in out.items():
        ranked[url % 3].append((-v[5], url))
    batch = {}
    for host, items in ranked.items():
        for i, (_, url) in enumerate(sorted(items)[:k], 1):
            batch[url] = (host, i)
    return out, batch


def test_sequential_differential_and_partition_invariance(spark):
    visits = [
        (u, s, str(((u * 7 + s * 13) % 29) % 4))
        for u in range(40)
        for s in range((u % 6) + 1)
    ]
    want, want_batch = _sequential_reference(visits, horizon=500, k=3)
    df = spark.createDataFrame(visits, ["url_id", "seq", "digest"])
    for parts in (1, 7):
        stats = visit_change_stats(df.repartition(parts))
        pri = recrawl_priorities(stats, horizon_seq=500).withColumn(
            "host", (F.col("url_id") % 3).cast("long")
        )
        got = {
            r["url_id"]: (
                r["n_visits"], r["n_changes"], r["last_seq"],
                r["rate_scaled"], r["age"], r["priority"],
            )
            for r in pri.collect()
        }
        assert got == want
        got_batch = {
            r["url_id"]: (r["host"], r["rnk"])
            for r in recrawl_batch(pri, k=3).collect()
        }
        assert got_batch == want_batch


def test_plan_shapes(spark):
    from anycrawl_spark.queries import q_recrawl_priority

    p = q_recrawl_priority(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "WindowGroupLimit" in p, "per-host budget cut must be map-side"
    assert "Cartesian" not in p
    # the lag window must partition by URL (bounded groups), never host
    assert "windowspecdefinition(url_id#" in p
