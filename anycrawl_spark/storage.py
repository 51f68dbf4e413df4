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
        self.manifest.setdefault("lineage", {})

    # -- per-partition lineage ---------------------------------------------

    def _collect_lineage(self, data_dir: str, round_no: int | None) -> None:
        """Record per-data-file lineage for a just-written dir: one entry per
        parquet part file (= one writing partition) with row count and bytes,
        read from the parquet FOOTER — no Spark action, ~0.1 ms per file
        (the Iceberg manifest-file analog: DataFile{path, record_count,
        file_size_in_bytes})."""
        files = []
        try:
            import pyarrow.parquet as pq

            with os.scandir(data_dir) as it:
                for e in sorted(it, key=lambda e: e.name):
                    if not e.name.endswith(".parquet"):
                        continue
                    files.append(
                        {
                            "file": e.name,
                            "rows": pq.read_metadata(e.path).num_rows,
                            "bytes": e.stat().st_size,
                        }
                    )
        except Exception:
            files = []  # lineage is advisory; never fail a write over it
        self.manifest["lineage"][data_dir] = {
            "round": round_no,
            "files": files,
            "rows": sum(f["rows"] for f in files),
            "bytes": sum(f["bytes"] for f in files),
        }

    def lineage(self, table: str) -> list[dict]:
        """Per-append lineage entries for an append-only table, in commit
        order: [{dir, round, rows, bytes, files: [{file, rows, bytes}]}]."""
        out = []
        for d in self.manifest["appends"].get(table, []):
            ent = self.manifest["lineage"].get(d)
            if ent is not None and os.path.exists(d):
                out.append({"dir": d, **ent})
        return out

    def table_metrics(self) -> dict[str, dict]:
        """{table: {rows, bytes, appends}} across live append dirs — the
        driver-side metrics surface the north rule pairs with lineage."""
        out: dict[str, dict] = {}
        for t, dirs in self.manifest["appends"].items():
            ents = [
                self.manifest["lineage"].get(d)
                for d in dirs
                if os.path.exists(d) and self.manifest["lineage"].get(d)
            ]
            out[t] = {
                "rows": sum(e["rows"] for e in ents),
                "bytes": sum(e["bytes"] for e in ents),
                "appends": len(ents),
            }
        return out

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
        # prune lineage of GC'd / failed-append dirs (advisory metadata
        # never outlives its data files)
        self.manifest["lineage"] = {
            d: e for d, e in self.manifest["lineage"].items() if os.path.exists(d)
        }
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
        self._collect_lineage(final, None)
        # stale snapshot GC: keep last 3 (Iceberg expire_snapshots analog)
        for old in range(max(0, snap_id - 3)):
            d = self._snap_dir(table, old)
            if os.path.exists(d):
                shutil.rmtree(d)
                self.manifest["lineage"].pop(d, None)

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

    def append(self, table: str, df: DataFrame, round_no: int | None = None) -> None:
        """Append an immutable data file set to an append-only table.

        In Iceberg this is ``writeTo(t).append()`` — no rewrite of existing
        data. Uncommitted appends (crash before commit_round) are dropped on
        resume because the manifest still lists the old dir set. ``round_no``
        stamps the per-partition lineage entry with the producing round.
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
        self._collect_lineage(final, round_no)

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
