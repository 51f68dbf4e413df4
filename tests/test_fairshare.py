"""Max-min fair allocation (operators/fairshare.py).

Layer 1: hand-computed textbook cases.
Layer 2: the max-min properties on generated instances + a sequential
         water-filling reference + partition invariance.
Layer 3: plan guard.
"""

from __future__ import annotations

from collections import defaultdict

from anycrawl_spark.operators.fairshare import fairshare_alloc


def _alloc(spark, rows):
    df = spark.createDataFrame(rows, ["host", "job_id", "demand", "capacity"])
    return {r["job_id"]: r for r in fairshare_alloc(df).collect()}


def test_under_subscribed(spark):
    got = _alloc(spark, [("h", 1, 10, 100), ("h", 2, 20, 100)])
    assert got[1]["alloc"] == 10 and got[2]["alloc"] == 20
    assert got[1]["fully_served"] == 1 and got[2]["fully_served"] == 1


def test_textbook_waterfill(spark):
    # C=10, demands 2,2,4,5 -> 2,2 full; remaining 6 split 3,3
    got = _alloc(
        spark,
        [("h", 1, 2, 10), ("h", 2, 2, 10), ("h", 3, 4, 10), ("h", 4, 5, 10)],
    )
    assert [got[j]["alloc"] for j in (1, 2, 3, 4)] == [2, 2, 3, 3]
    assert [got[j]["fully_served"] for j in (1, 2, 3, 4)] == [1, 1, 0, 0]


def test_remainder_split(spark):
    # C=10, demands 4,4,4 -> base 3, remainder 1 to the first by job id
    got = _alloc(spark, [("h", 1, 4, 10), ("h", 2, 4, 10), ("h", 3, 4, 10)])
    assert sorted(got[j]["alloc"] for j in (1, 2, 3)) == [3, 3, 4]
    assert got[1]["alloc"] == 4  # (demand,job) order gives job 1 the extra


def test_zero_capacity_and_zero_demand(spark):
    got = _alloc(spark, [("h", 1, 0, 0), ("h", 2, 5, 0)])
    assert got[1]["alloc"] == 0 and got[2]["alloc"] == 0
    assert got[1]["fully_served"] == 1  # zero demand is trivially served


def _reference(rows):
    # classic progressive filling per host
    by_host = defaultdict(list)
    cap = {}
    for h, j, d, c in rows:
        by_host[h].append((j, d))
        cap[h] = c
    alloc = {}
    for h, jobs in by_host.items():
        c = cap[h]
        remaining = {j: d for j, d in jobs}
        got = {j: 0 for j, _ in jobs}
        while c > 0 and remaining:
            share = c // len(remaining)
            if share == 0:
                # hand out 1s in (demand asc, job asc) order of the ORIGINAL
                # sort — matches the operator's remainder rule
                order = sorted(remaining, key=lambda j: (dict(jobs)[j], j))
                for j in order[:c]:
                    got[j] += 1
                    remaining[j] -= 1
                c = 0
                break
            done = []
            progressed = False
            for j in list(remaining):
                take = min(share, remaining[j])
                got[j] += take
                remaining[j] -= take
                c -= take
                if take:
                    progressed = True
                if remaining[j] == 0:
                    done.append(j)
            for j in done:
                del remaining[j]
            if not progressed:
                break
        alloc[h] = got
    return alloc


def test_properties_and_reference(spark):
    rows = [
        (f"h{i % 6}", i, (i * 37 + 5) % 23, 30 + (i % 6) * 11)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["host", "job_id", "demand", "capacity"])
    for parts in (1, 9):
        got = {
            r["job_id"]: r for r in fairshare_alloc(df.repartition(parts)).collect()
        }
        by_host = defaultdict(list)
        for h, j, d, c in rows:
            by_host[h].append((j, d, c))
        ref = _reference(rows)
        for h, jobs in by_host.items():
            total_alloc = sum(got[j]["alloc"] for j, _, _ in jobs)
            total_demand = sum(d for _, d, _ in jobs)
            c = jobs[0][2]
            # conservation
            assert total_alloc == min(c, total_demand), h
            for j, d, _ in jobs:
                # feasibility
                assert 0 <= got[j]["alloc"] <= d, (h, j)
                # reference equality
                assert got[j]["alloc"] == ref[h][j], (h, j)
            # max-min: a non-fully-served job's alloc is within 1 of the
            # maximum alloc among non-fully-served jobs
            unsat = [got[j]["alloc"] for j, d, _ in jobs if got[j]["alloc"] < d]
            if unsat:
                assert max(unsat) - min(unsat) <= 1, h


def test_plan_shape(spark):
    from anycrawl_spark.queries import q_fair_alloc

    p = q_fair_alloc(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "Cartesian" not in p
    assert "windowspecdefinition(host#" in p
