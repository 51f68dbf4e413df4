"""Snapshot retention planning: tiered expiry over the store's history.

The snapshot store (`storage.py`) accretes one snapshot per commit;
resumability wants recent history dense and old history sparse. The
standard tiered policy (Iceberg's ``expire_snapshots``, ZFS/restic
rotation schedules — all public) keeps:

- the ``keep_last`` most recent snapshots unconditionally;
- the OLDEST snapshot of each UTC day for ``keep_days`` days;
- the OLDEST snapshot of each ISO week for ``keep_weeks`` weeks;
- everything else expires.

"Oldest of the bucket" (not newest) is the archival convention: it is
the boundary snapshot a day/week rollback targets. All decisions are
integer window math over the snapshot MANIFEST — O(snapshots) metadata
rows, one recency rank window plus two min-per-bucket windows; the data
files referenced by expired snapshots are deleted by the store's
normal unreferenced-file sweep, never by this planner.

The recency rank is a GLOBAL (single-partition) window — deliberately:
the input is the snapshot manifest, whose cardinality is the commit
count (10^3-10^5 rows at any corpus size), the one place in this repo
where a global window is the right call rather than the skew trap it
would be on data-scale rows (contrast `operators/curriculum.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_S = 86400
WEEK_S = 7 * DAY_S


def retention_plan(
    snapshots: DataFrame,
    now_s: int,
    keep_last: int = 5,
    keep_days: int = 7,
    keep_weeks: int = 4,
    id_col: str = "snapshot_id",
    ts_col: str = "ts_s",
) -> DataFrame:
    """Adds recency rank, day/week buckets, the keep-reason flags and
    the final ``keep`` decision (1 = retain). Deterministic: ranks and
    bucket minima tie-break on snapshot id."""
    sid, ts = F.col(id_col), F.col(ts_col).cast("long")
    w_recent = Window.orderBy(F.desc(ts_col), F.desc(id_col))
    day = F.floor((F.lit(now_s) - ts) / DAY_S).cast("long")
    week = F.floor((F.lit(now_s) - ts) / WEEK_S).cast("long")
    base = snapshots.select(
        sid.alias("snapshot_id"),
        ts.alias("ts_s"),
        F.row_number().over(w_recent).cast("long").alias("recency_rank"),
        day.alias("day_bucket"),
        week.alias("week_bucket"),
    )
    w_day = Window.partitionBy("day_bucket").orderBy(F.asc("ts_s"), F.asc("snapshot_id"))
    w_week = Window.partitionBy("week_bucket").orderBy(
        F.asc("ts_s"), F.asc("snapshot_id")
    )
    flagged = base.select(
        "snapshot_id",
        "ts_s",
        "recency_rank",
        "day_bucket",
        "week_bucket",
        (F.col("recency_rank") <= keep_last).cast("long").alias("keep_recent"),
        (
            (F.row_number().over(w_day) == 1)
            & (F.col("day_bucket") >= 0)
            & (F.col("day_bucket") < keep_days)
        ).cast("long").alias("keep_daily"),
        (
            (F.row_number().over(w_week) == 1)
            & (F.col("week_bucket") >= 0)
            & (F.col("week_bucket") < keep_weeks)
        ).cast("long").alias("keep_weekly"),
    )
    return flagged.withColumn(
        "keep",
        F.greatest("keep_recent", "keep_daily", "keep_weekly").cast("long"),
    )
