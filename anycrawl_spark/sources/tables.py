"""Table sources/sinks (SURVEY §2.1 S4-S9): the engine's state tables.

The reference's sources are BullMQ queues + Crawlee RequestQueueV2 + Redis
hashes + Postgres tables (reference: packages/scrape/src/Worker.ts:181-207,
managers/EngineQueue.ts:49-55, managers/Progress.ts:40-42, packages/db/...).
The rebuild replaces all of them with columnar tables behind one API:

- ``frontier``       snapshot table, pending rows (S4/S5 queue analog)
- ``frontier_log``   append-only lineage of terminal schedule events
- ``seen``           append-only dedup keys (RequestQueueV2 uniqueKey store)
- ``documents``      append-only results (S7 job_results analog), spans payload
- ``progress``       append-only per-round counters (S6 Redis hash analog)
- ``metrics``        append-only fetch metrics (TrafficMetric analog)
- ``jobs``           snapshot dim (S8 jobs table analog)

All reads/writes go through ``SnapshotStore`` (Iceberg-style snapshots on
parquet; swap for an Iceberg catalog in production — same call sites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from anycrawl_spark.storage import SnapshotStore

APPEND_TABLES = (
    "frontier_log", "seen", "documents", "progress", "metrics", "webhook_events",
)
SNAPSHOT_TABLES = ("frontier", "jobs")


class CrawlTables:
    """Typed access to one crawl run's table set."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.store = SnapshotStore(workdir, spark)

    def frontier(self) -> DataFrame:
        return self.store.read("frontier")

    def jobs(self) -> DataFrame:
        return self.store.read("jobs")

    def seen(self) -> DataFrame | None:
        return self.store.read_appends("seen")

    def documents(self) -> DataFrame | None:
        return self.store.read_appends("documents")

    def progress(self) -> DataFrame | None:
        return self.store.read_appends("progress")

    def metrics(self) -> DataFrame | None:
        return self.store.read_appends("metrics")

    def frontier_log(self) -> DataFrame | None:
        return self.store.read_appends("frontier_log")

    def webhook_events(self) -> DataFrame | None:
        return self.store.read_appends("webhook_events")


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Driver-provided parquet tables (region..lineitem, events, documents,
    embeddings)."""
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
