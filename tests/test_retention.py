"""Retention planning (operators/retention.py).

Layer 1: hand-built timelines (dense recent, tier boundaries, oldest-of-
         bucket convention, overlap of reasons).
Layer 2: sequential reference differential + policy invariants.
Layer 3: plan guard (metadata-scale global window acknowledged).
"""

from __future__ import annotations

from anycrawl_spark.operators.retention import DAY_S, WEEK_S, retention_plan

NOW = 10_000_000


def _plan(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["snapshot_id", "ts_s"])
    return {
        r["snapshot_id"]: r
        for r in retention_plan(df, now_s=NOW, **kw).collect()
    }


def test_keep_last_and_daily(spark):
    # 10 snapshots, one per hour (all inside day bucket 0)
    rows = [(i, NOW - i * 3600) for i in range(10)]
    got = _plan(spark, rows, keep_last=3, keep_days=7, keep_weeks=0)
    # most recent 3 kept by recency
    assert all(got[i]["keep_recent"] == 1 for i in (0, 1, 2))
    assert all(got[i]["keep_recent"] == 0 for i in range(3, 10))
    # daily keeps the OLDEST of day 0 = snapshot 9
    assert got[9]["keep_daily"] == 1 and got[9]["keep"] == 1
    # middle ones expire
    assert got[5]["keep"] == 0


def test_weekly_tier_and_expiry_horizon(spark):
    # one snapshot per week going back 8 weeks
    rows = [(i, NOW - i * WEEK_S - 100) for i in range(8)]
    got = _plan(spark, rows, keep_last=1, keep_days=0, keep_weeks=4)
    assert got[0]["keep_recent"] == 1
    for i in range(4):
        assert got[i]["keep_weekly"] == 1, i  # sole member = oldest of its week
    for i in range(4, 8):
        assert got[i]["keep"] == got[i]["keep_recent"], i  # beyond horizon


def test_oldest_of_bucket_convention(spark):
    # two snapshots in the same day: the OLDER one carries the daily flag
    rows = [(1, NOW - 1000), (2, NOW - 2000)]
    got = _plan(spark, rows, keep_last=0, keep_days=1, keep_weeks=0)
    assert got[2]["keep_daily"] == 1 and got[1]["keep_daily"] == 0


def _reference(rows, keep_last, keep_days, keep_weeks):
    by_id = dict(rows)
    order = sorted(rows, key=lambda x: (-x[1], -x[0]))
    recent = {sid for sid, _ in order[:keep_last]}
    daily, weekly = set(), set()
    buckets_d, buckets_w = {}, {}
    for sid, ts in rows:
        d, w = (NOW - ts) // DAY_S, (NOW - ts) // WEEK_S
        if 0 <= d < keep_days:
            cur = buckets_d.get(d)
            if cur is None or (ts, sid) < (by_id[cur], cur):
                buckets_d[d] = sid
        if 0 <= w < keep_weeks:
            cur = buckets_w.get(w)
            if cur is None or (ts, sid) < (by_id[cur], cur):
                buckets_w[w] = sid
    daily, weekly = set(buckets_d.values()), set(buckets_w.values())
    return {
        sid: 1 if (sid in recent or sid in daily or sid in weekly) else 0
        for sid, _ in rows
    }


def test_reference_differential(spark):
    rows = [
        (i, NOW - ((i * 13577 + (i * i) % 997) % (6 * WEEK_S)))
        for i in range(150)
    ]
    want = _reference(rows, keep_last=5, keep_days=7, keep_weeks=4)
    got = _plan(spark, rows, keep_last=5, keep_days=7, keep_weeks=4)
    assert {sid: r["keep"] for sid, r in got.items()} == want
    # invariant: at least one snapshot kept per populated retained bucket
    kept = [r for r in got.values() if r["keep"] == 1]
    assert kept and len(kept) < len(rows)


def test_plan_shape(spark):
    from anycrawl_spark.queries import q_retention_plan

    p = q_retention_plan(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "Cartesian" not in p
