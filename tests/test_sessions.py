"""Sessionization (operators/sessions.py).

Layer 1: hand-computed boundaries (gap exactly at / over the timeout,
         single event, ties).
Layer 2: sequential reference differential + partition invariance.
Layer 3: plan guards (per-key windows, two-phase rollup).
"""

from __future__ import annotations

import datetime as dt

from anycrawl_spark.operators.sessions import session_stats, sessionize

EPOCH = dt.datetime(2026, 1, 1)


def _ts(s):
    return EPOCH + dt.timedelta(seconds=s)


def _stats(spark, rows, gap_s=100):
    df = spark.createDataFrame(
        [(u, _ts(s)) for u, s in rows], ["user_id", "ts"]
    )
    return {
        (r["key"], r["session_seq"]): (r["n_events"], r["duration_s"])
        for r in session_stats(df, gap_s=gap_s).collect()
    }


def test_boundaries(spark):
    rows = [
        (1, 0), (1, 100), (1, 200),      # gaps exactly 100 = timeout: ONE session
        (1, 301),                        # gap 101 > timeout: new session
        (2, 0), (2, 500),                # far apart: two sessions
        (3, 50),                         # singleton
    ]
    got = _stats(spark, rows)
    assert got[(1, 1)] == (3, 200)
    assert got[(1, 2)] == (1, 0)
    assert got[(2, 1)] == (1, 0) and got[(2, 2)] == (1, 0)
    assert got[(3, 1)] == (1, 0)


def test_tied_timestamps_one_session(spark):
    got = _stats(spark, [(1, 10), (1, 10), (1, 10)])
    assert got[(1, 1)] == (3, 0)


def _reference(rows, gap_s):
    from collections import defaultdict

    per_key = defaultdict(list)
    for u, s in rows:
        per_key[u].append(s)
    out = {}
    for u, ss in per_key.items():
        ss.sort()
        seq, start, prev, n = 1, ss[0], ss[0], 0
        for s in ss:
            if s - prev > gap_s:
                out[(u, seq)] = (n, prev - start)
                seq, start, n = seq + 1, s, 0
            n += 1
            prev = s
        out[(u, seq)] = (n, prev - start)
    return out


def test_reference_differential_and_partition_invariance(spark):
    rows = [
        (i % 7, ((i * 157 + 13) % 3000)) for i in range(400)
    ]
    # dedupe (user, ts) collisions: reference and engine must see the
    # same multiset; keep duplicates — both handle ties identically
    want = _reference(rows, gap_s=80)
    df = spark.createDataFrame([(u, _ts(s)) for u, s in rows], ["user_id", "ts"])
    for parts in (1, 9):
        got = {
            (r["key"], r["session_seq"]): (r["n_events"], r["duration_s"])
            for r in session_stats(df.repartition(parts), gap_s=80).collect()
        }
        assert got == want


def test_sessionize_rows_monotone(spark):
    rows = [(1, 0), (1, 50), (1, 500), (1, 550)]
    df = spark.createDataFrame([(u, _ts(s)) for u, s in rows], ["user_id", "ts"])
    out = sessionize(df, gap_s=100).orderBy("epoch_s").collect()
    assert [r["session_seq"] for r in out] == [1, 1, 2, 2]
    assert [r["new_session"] for r in out] == [1, 0, 1, 0]


def test_plan_shape(spark):
    from anycrawl_spark.queries import q_sessionize

    p = q_sessionize(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "windowspecdefinition(user_id#" in p
    assert "partial_count" in p
    assert "Cartesian" not in p


def test_streaming_batch_duality(spark):
    """The streaming session_window facet and the batch gaps-and-islands
    operator agree on (key, n_sessions, events-per-session multiset) for
    gap-distinct data. Boundary semantics differ BY DESIGN at gap ==
    timeout (batch: same session; session_window: [start, last+gap) is
    half-open -> new session), so the fixture keeps every gap != 100 s.
    Run in batch mode: session_window is a plain aggregation, identical
    plan modulo the watermark, which batch ignores."""
    from collections import Counter

    from anycrawl_spark.streaming.continuous import session_stats_stream

    rows = [
        (u, _ts(s))
        for u in range(5)
        for s in [0, 30, 60, 300, 320, 900, 901, 902, 1500][: (u % 4) + 5]
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    batch = session_stats(df, gap_s=100)
    stream_shape = session_stats_stream(df, gap="100 seconds")
    got_b = Counter(
        (r["key"], r["n_events"]) for r in batch.collect()
    )
    got_s = Counter(
        (r["user_id"], r["n_events"]) for r in stream_shape.collect()
    )
    assert got_b == got_s
