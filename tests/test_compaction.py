"""Compaction planning (operators/compaction.py).

Layer 1: hand-computed plan on a crafted manifest (thresholds, big-file
         passthrough, next-fit boundaries, overshoot bound).
Layer 2: sequential reference differential + partition invariance +
         plan invariants (every bin under target + one file).
Layer 3: plan guard (window per table-partition, pure JVM).
"""

from __future__ import annotations

from collections import defaultdict

from anycrawl_spark.operators.compaction import compaction_plan, compaction_rollup

TARGET, SMALL = 100, 60

# (partition, file_id, kb)
MANIFEST = [
    ("a", 1, 10), ("a", 2, 10), ("a", 3, 40), ("a", 4, 45),
    ("a", 5, 59), ("a", 6, 60),  # 60 is NOT small (>= threshold)
    ("a", 7, 500),
    ("b", 1, 59), ("b", 2, 59), ("b", 3, 59),
]


def _plan_rows(spark, manifest=MANIFEST):
    df = spark.createDataFrame(manifest, ["partition", "file_id", "kb"])
    return compaction_plan(df, target_kb=TARGET, small_kb=SMALL).collect()


def test_hand_case(spark):
    got = {(r["partition"], r["file_id"]): (r["cum_before"], r["bin"])
           for r in _plan_rows(spark)}
    # partition a, small files in (kb, id) order: 10,10,40,45,59
    # prefixes: 0,10,20,60,105 -> bins 0,0,0,0,1
    assert got[("a", 1)] == (0, 0)
    assert got[("a", 2)] == (10, 0)
    assert got[("a", 3)] == (20, 0)
    assert got[("a", 4)] == (60, 0)
    assert got[("a", 5)] == (105, 1)
    # at/above the small threshold: untouched, excluded from prefixes
    assert got[("a", 6)][1] == -1
    assert got[("a", 7)][1] == -1
    # partition b: 0,59,118 -> bins 0,0,1
    assert got[("b", 1)] == (0, 0)
    assert got[("b", 2)] == (59, 0)
    assert got[("b", 3)] == (118, 1)


def test_rollup(spark):
    df = spark.createDataFrame(MANIFEST, ["partition", "file_id", "kb"])
    plan = compaction_plan(df, target_kb=TARGET, small_kb=SMALL)
    roll = {(r["partition"], r["bin"]): (r["n_files"], r["total_kb"])
            for r in compaction_rollup(plan).collect()}
    assert roll[("a", 0)] == (4, 105)
    assert roll[("a", 1)] == (1, 59)
    assert roll[("a", -1)] == (2, 560)
    assert roll[("b", 0)] == (2, 118)


def _reference(manifest):
    by_part = defaultdict(list)
    for p, f, kb in manifest:
        by_part[p].append((f, kb))
    out = {}
    for p, files in by_part.items():
        cum = 0
        for f, kb in sorted(files, key=lambda x: (x[1], x[0])):
            if kb < SMALL:
                out[(p, f)] = (cum, cum // TARGET)
                cum += kb
            else:
                out[(p, f)] = (0, -1)
    return out


def test_reference_differential_and_partition_invariance(spark):
    manifest = [
        (f"p{i % 5}", i, ((i * 37 + 11) % 140) + 1) for i in range(300)
    ]
    want = {
        k: v[1] for k, v in _reference(manifest).items()
    }
    df = spark.createDataFrame(manifest, ["partition", "file_id", "kb"])
    for parts in (1, 13):
        got = {
            (r["partition"], r["file_id"]): r["bin"]
            for r in compaction_plan(
                df.repartition(parts), target_kb=TARGET, small_kb=SMALL
            ).collect()
        }
        assert got == want
    # next-fit bound: every bin holds < target + max small file
    totals = defaultdict(int)
    sizes = {(p, f): kb for p, f, kb in manifest}
    for (p, f), b in got.items():
        if b >= 0:
            totals[(p, b)] += sizes[(p, f)]
    assert all(t < TARGET + SMALL for t in totals.values())
    # bins are dense from 0 within each partition
    by_part = defaultdict(set)
    for (p, b) in totals:
        by_part[p].add(b)
    for p, bins in by_part.items():
        assert bins == set(range(len(bins)))


def test_plan_shape(spark):
    from anycrawl_spark.queries import q_compaction_plan

    p = q_compaction_plan(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "Cartesian" not in p
    # the cumsum window must partition by the table partition
    assert "windowspecdefinition(partition#" in p
