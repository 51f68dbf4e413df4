"""Exact percentiles (operators/quantiles.py).

Layer 1: hand-computed nearest-rank cases (including the definitional
         edges p=1, p=100, duplicates, single element).
Layer 2: numpy-free sequential reference over generated groups +
         partition invariance.
Layer 3: plan guards (no global sort of the data, two-phase histogram).
"""

from __future__ import annotations

import pytest

from anycrawl_spark.operators.quantiles import exact_percentiles


def _ref(values, p):
    s = sorted(values)
    rank = (p * len(s) + 99) // 100  # ceil(p*n/100)
    return s[rank - 1]


def _run(spark, rows, ps):
    df = spark.createDataFrame(rows, ["grp", "value"])
    return {
        (r["grp"], r["p"]): (r["q_value"], r["n"], r["rank_needed"])
        for r in exact_percentiles(df, ps).collect()
    }


def test_hand_case(spark):
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    got = _run(spark, [("g", v) for v in vals], [50, 90, 99, 100, 1])
    assert got[("g", 50)][0] == 5   # ceil(0.5*10)=5 -> 5th smallest
    assert got[("g", 90)][0] == 9
    assert got[("g", 99)][0] == 10  # ceil(9.9)=10
    assert got[("g", 100)][0] == 10
    assert got[("g", 1)][0] == 1


def test_duplicates_and_single(spark):
    got = _run(spark, [("g", 7)] * 5 + [("g", 9)], [50, 100])
    assert got[("g", 50)][0] == 7
    assert got[("g", 100)][0] == 9
    got = _run(spark, [("s", 42)], [1, 50, 100])
    assert all(got[("s", p)][0] == 42 for p in (1, 50, 100))


def test_validation():
    with pytest.raises(ValueError):
        exact_percentiles(None, [])
    with pytest.raises(ValueError):
        exact_percentiles(None, [0])
    with pytest.raises(ValueError):
        exact_percentiles(None, [101])


def test_reference_differential_and_partition_invariance(spark):
    rows = [
        (f"g{i % 4}", ((i * 193 + 7) % 50))
        for i in range(600)
    ]
    by_grp = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    df = spark.createDataFrame(rows, ["grp", "value"])
    ps = [10, 25, 50, 75, 90, 95, 99]
    for parts in (1, 11):
        got = {
            (r["grp"], r["p"]): r["q_value"]
            for r in exact_percentiles(df.repartition(parts), ps).collect()
        }
        for g, vals in by_grp.items():
            for p in ps:
                assert got[(g, p)] == _ref(vals, p), (g, p)


def test_plan_shape(spark):
    from anycrawl_spark.queries import q_latency_percentiles

    p = q_latency_percentiles(spark, "/root/testdata/sf0.001")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "partial_count" in p, "histogram must aggregate two-phase"
    assert "Cartesian" not in p
