"""SparkSession factory with the AQE/shuffle settings the engine assumes.

Scale rationale (100 TB / 1000-executor target):
- AQE on: runtime coalescing + skew-join splitting cover the long tail of
  per-round shuffle imbalance that static planning can't see.
- shuffle.partitions defaults to the local core count here; on a real cluster
  this is set to ~2-3x total cores via spark-submit conf (documented in
  BENCH/BASELINE.md), and AQE coalesces down.
- Arrow enabled: every UDF in this engine is a pandas UDF / mapInPandas —
  Arrow batch transfer is the difference between viable and 100x-too-slow.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "anycrawl_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default 64m coalesces medium shuffles below the core count and
        # starves wide clusters; 8m keeps parallelism >= cores at bench scale
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # G1 (default) collapses under 32 allocation-heavy threads in one JVM
        # (measured: 2x slower at local[32] than local[8]); throughput GC
        # restores near-linear scaling for codegen'd string/row allocation
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        # shuffle files on tmpfs: local-mode shuffles are disk round-trips on
        # the driver host; with 126G of tmpfs there is no reason to thrash the
        # block device (32 concurrent shuffle writers anti-scale on one disk)
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # modest auto-broadcast cap: a multi-million-row dim broadcast is a
        # serial driver-side hash-table build (~15-20s) that AQE will happily
        # pick when compressed shuffle bytes look small; genuinely small dims
        # (jobs, robots, locales) are explicitly hinted with F.broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
