"""AIMD rate controller (operators/aimd.py).

Layer 1: hand-traced evolutions (sawtooth, cap clamp, floor clamp).
Layer 2: Spark fold vs the sequential kernel on generated histories +
         shuffled input order (sort_array must make it order-proof).
Layer 3: plan guard (one two-phase groupBy, fold is JVM-side).
"""

from __future__ import annotations

from anycrawl_spark.operators.aimd import aimd_rates, aimd_rates_py


def test_kernel_hand_traces():
    # clean rounds climb additively to the cap
    assert aimd_rates_py([0] * 5, init=8, incr=2, cap=12) == (12, 0, 8, 12)
    # throttle halves: 8 -> 10 -> 5 -> 7 -> 3 (floor at 1 not reached)
    assert aimd_rates_py([0, 1, 0, 1], init=8, incr=2, cap=64) == (3, 2, 3, 10)
    # floor clamp
    assert aimd_rates_py([1] * 6, init=8, floor_min=1) == (1, 6, 1, 8)
    # empty history = initial state
    assert aimd_rates_py([]) == (8, 0, 8, 8)


def test_spark_matches_kernel_any_input_order(spark):
    hosts = {
        f"h{i}": [((i * 7 + r * 13) % 4 == 0) * 1 for r in range(i % 9)]
        for i in range(30)
    }
    rows = [
        (h, r, t) for h, flags in hosts.items() for r, t in enumerate(flags)
    ]
    # adversarial input order: reversed rounds
    rows = list(reversed(rows))
    df = spark.createDataFrame(rows, ["host", "round", "throttled"])
    for parts in (1, 7):
        got = {
            r["host"]: (
                r["final_rate"], r["n_halvings"], r["min_rate"], r["max_rate"],
            )
            for r in aimd_rates(df.repartition(parts)).collect()
        }
        for h, flags in hosts.items():
            if flags:
                assert got[h] == aimd_rates_py(flags), h
            else:
                assert h not in got  # no rounds -> no row


def test_plan_shape(spark):
    from anycrawl_spark.queries import q_aimd_rates

    p = q_aimd_rates(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "Cartesian" not in p
    assert "aggregate(" in p, "the evolution must be the higher-order fold"
