"""Gap-based sessionization of event streams.

Batch analytics over crawl/job event logs keeps needing "activity
episodes": a worker's fetch bursts, a user's dashboard visits, a host's
crawl waves. The standard definition (identical to Structured
Streaming's session windows, which the streaming layer
`streaming/continuous.py` models) is gap-based: a new session starts
when the time since the previous event of the same key exceeds the
timeout. The batch form is exact and window-expressible:

1. ``lag(ts)`` per key (event-time order) → gap;
2. ``new_session = gap IS NULL OR gap > timeout`` — a 0/1 column;
3. ``session_seq = running sum of new_session`` over the same window —
   the classic gaps-and-islands assignment (public SQL folklore, e.g.
   Itzik Ben-Gan's T-SQL writings);
4. one groupBy (key, session_seq) for per-session stats.

All integer epoch-seconds math (session timezone is pinned UTC in
`session.py`). Scale shape: both windows partition by the session KEY —
per-key event history, bounded by retention, never corpus-wide; the
stats groupBy is two-phase. Same per-key-window pattern as
`operators/freshness.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Adds ``epoch_s``, ``new_session`` and the per-key 1-based
    ``session_seq`` to each event row."""
    # TIMESTAMP_NTZ needs the hop through TIMESTAMP; session tz is pinned
    # UTC (session.py), so this equals DuckDB's epoch() on the naive value
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(key_col).orderBy(epoch)
    gap = epoch - F.lag(epoch).over(w)
    new = (gap.isNull() | (gap > gap_s)).cast("long")
    return (
        events.withColumn("epoch_s", epoch)
        .withColumn("new_session", new)
        .withColumn(
            "session_seq",
            F.sum("new_session")
            .over(
                Window.partitionBy(key_col)
                .orderBy("epoch_s")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .cast("long"),
        )
    )


def session_stats(
    events: DataFrame,
    gap_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup: event count, start/end epoch seconds,
    duration. Ties in ts within a key fall into one session (the gap of
    a tie is 0 <= timeout) — deterministic regardless of tie order."""
    s = sessionize(events, gap_s, key_col, ts_col)
    return s.groupBy(F.col(key_col).alias("key"), "session_seq").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("epoch_s").cast("long").alias("start_s"),
        F.max("epoch_s").cast("long").alias("end_s"),
        (F.max("epoch_s") - F.min("epoch_s")).cast("long").alias("duration_s"),
    )
