"""Snapshot-table storage: Iceberg-style snapshots on parquet directories.

The target deployment is Iceberg (``writeTo(...).append()`` / MERGE INTO with
snapshot isolation); the sandbox has no Iceberg runtime jar, so this module
provides the same minimal API over parquet directories with an explicit
manifest — append-only snapshots, atomic pointer swap, time travel by round.
Swapping in Iceberg means replacing this class's read/write with catalog calls;
the superstep driver (``crawl/superstep.py``) only talks to this API.

Layout:
    {base}/{table}/snap-{snap_id:06d}/   parquet files (one Spark write each)
    {base}/MANIFEST.json                 {"tables": {name: snap_id}, "round": r}

Atomicity: data is written to ``_tmp-*`` and os.rename'd into place; the
manifest is rewritten last via write-to-temp + rename — a crashed round leaves
the previous manifest intact, which is exactly the resume point
(north_rule: "resumable from Iceberg-checkpointed frontier snapshots").
"""

from __future__ import annotations

import json
import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, base: str, spark: SparkSession):
        self.base = base
        self.spark = spark
        os.makedirs(base, exist_ok=True)
        # guards manifest mutation; Spark actions themselves are thread-safe,
        # so concurrent writes to DIFFERENT tables may run in parallel
        self._lock = threading.Lock()
        self.manifest_path = os.path.join(base, "MANIFEST.json")
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
        else:
            self.manifest = {"tables": {}, "appends": {}, "round": -1, "history": []}
        self.manifest.setdefault("appends", {})

    # -- manifest ----------------------------------------------------------

    def _flush_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)

    def commit_round(self, round_no: int) -> None:
        """Snapshot-commit: record that all tables are consistent as of round."""
        self.manifest["round"] = round_no
        self.manifest["history"].append(
            {
                "round": round_no,
                "tables": dict(self.manifest["tables"]),
                # drop reserved-but-failed append slots (see append())
                "appends": {
                    t: [d for d in ds if os.path.exists(d)]
                    for t, ds in self.manifest["appends"].items()
                },
            }
        )
        self._flush_manifest()

    @property
    def last_round(self) -> int:
        return self.manifest["round"]

    # -- table io ----------------------------------------------------------

    def _snap_dir(self, table: str, snap_id: int) -> str:
        return os.path.join(self.base, table, f"snap-{snap_id:06d}")

    def write(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Write a new immutable snapshot of `table` and advance its pointer."""
        snap_id = self.manifest["tables"].get(table, -1) + 1
        final = self._snap_dir(table, snap_id)
        tmp = os.path.join(self.base, table, f"_tmp-{snap_id:06d}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        self.manifest["tables"][table] = snap_id
        # stale snapshot GC: keep last 3 (Iceberg expire_snapshots analog)
        for old in range(max(0, snap_id - 3)):
            d = self._snap_dir(table, old)
            if os.path.exists(d):
                shutil.rmtree(d)

    def read(self, table: str, snap_id: int | None = None) -> DataFrame:
        if snap_id is None:
            snap_id = self.manifest["tables"][table]
        d = self._snap_dir(table, snap_id)
        if not os.path.exists(d):
            raise KeyError(
                f"snapshot expired: {table} snap-{snap_id:06d} was GC'd "
                f"(write() keeps the last 4 snapshots per table)"
            )
        return self.spark.read.parquet(d)

    def exists(self, table: str) -> bool:
        return table in self.manifest["tables"]

    # -- append-only tables (Iceberg fast-append analog) -------------------

    def append(self, table: str, df: DataFrame) -> None:
        """Append an immutable data file set to an append-only table.

        In Iceberg this is ``writeTo(t).append()`` — no rewrite of existing
        data. Uncommitted appends (crash before commit_round) are dropped on
        resume because the manifest still lists the old dir set.
        """
        with self._lock:
            # Reserve the slot atomically: two concurrent appends to the SAME
            # table must get distinct seq numbers, so the final path goes into
            # the dir list inside this lock, before the (slow) parquet write.
            # A failed write leaves a dangling entry; read_appends filters on
            # os.path.exists and commit_round only persists what exists.
            dirs = self.manifest["appends"].setdefault(table, [])
            seq = len(dirs)
            final = os.path.join(self.base, table, f"append-{seq:06d}")
            dirs.append(final)
        tmp = os.path.join(self.base, table, f"_tmp-append-{seq:06d}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    def read_appends(self, table: str) -> DataFrame | None:
        dirs = [d for d in self.manifest["appends"].get(table, []) if os.path.exists(d)]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def rollback_to_committed(self) -> None:
        """Drop uncommitted table pointers/appends (crash recovery): restore
        the manifest's last committed history entry."""
        if not self.manifest["history"]:
            self.manifest["tables"] = {}
            self.manifest["appends"] = {}
            return
        last = self.manifest["history"][-1]
        self.manifest["tables"] = dict(last["tables"])
        self.manifest["appends"] = {t: list(d) for t, d in last["appends"].items()}

    def read_at_round(self, table: str, round_no: int) -> DataFrame:
        """Time travel: table state as of a committed round."""
        for entry in reversed(self.manifest["history"]):
            if entry["round"] == round_no:
                return self.read(table, entry["tables"][table])
        raise KeyError(f"no committed snapshot for round {round_no}")
