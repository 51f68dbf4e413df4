"""Structured-Streaming facet (SURVEY §2.9): continuous ingestion analog.

The reference is a continuously-running service (BullMQ workers + Crawlee
``keepAlive`` engines that never drain; reference: packages/scrape/src/
engines/EngineFactory.ts:15, core/EngineConfigurator.ts:29-31). The rebuild's
primary architecture is batch supersteps (deterministic, testable ordering);
this module provides the Structured-Streaming alternative for deployments
that want an always-on scrape endpoint:

- ``scrape_stream``: a streaming source of scrape requests (rate source
  standing in for the API queue) -> fused fetch+extract per micro-batch ->
  streaming sink. This is the §3.1 ``POST /v1/scrape`` pipeline as a stream.
- ``metrics_stream``: windowed per-host fetch-metric aggregation with a
  watermark (late fetch results beyond the watermark are dropped — the
  straggler analog of the reference's 600 s request-handler timeout).
- ``foreach_batch_crawl``: wiring for running crawl supersteps from
  ``foreachBatch`` — each micro-batch of seed requests starts/advances jobs
  via the same CrawlEngine (state stays in the snapshot tables, which is why
  no ``applyInPandasWithState`` is needed: the superstep design externalizes
  all state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anycrawl_spark import synth
from anycrawl_spark.operators.spans import fetch_extract


def scrape_requests_stream(
    spark: SparkSession, rows_per_second: int = 50, n_hosts: int = 50
) -> DataFrame:
    """Streaming DataFrame of synthetic scrape requests (rate source stands
    in for the API/BullMQ ingress; swap for kafka/readStream in production)."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return rate.select(
        F.col("timestamp").alias("request_ts"),
        F.concat(F.lit("stream-"), F.col("value").cast("string")).alias("job_id"),
        F.concat(
            F.lit("http://host"),
            F.lpad(F.pmod("value", n_hosts).cast("string"), 4, "0"),
            F.lit(".example.com/p/"),
            F.pmod(F.col("value") * 7, 1000).cast("string"),
        ).alias("url"),
    )


def scrape_stream(requests: DataFrame) -> DataFrame:
    """Per-micro-batch scrape: canonicalize -> fused fetch+extract.

    Returns a streaming DataFrame of extracted documents (spans payload).
    """
    from anycrawl_spark.functions.urls import with_url_key

    keyed = with_url_key(requests)
    sched = keyed.select(
        "job_id", "url", "url_hash", "host",
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("discovery_seq"),
        F.lit(0).cast("long").alias("parent_url_hash"),
        F.lit(0).alias("round_added"),
        F.lit(0).alias("attempt"),
        F.lit(0.0).alias("priority"),
        "request_ts",
    )
    # mapInPandas composes with streaming: it runs per micro-batch partition
    docs = fetch_extract(sched.drop("request_ts"))
    return docs


def metrics_stream(requests: DataFrame, window: str = "10 seconds") -> DataFrame:
    """Watermarked per-host windowed fetch metrics (A6/A7 streaming analog)."""
    from anycrawl_spark.functions.urls import host_udf

    enriched = requests.withColumn("host", host_udf(F.col("url")))
    return (
        enriched.withWatermark("request_ts", "30 seconds")
        .groupBy(F.window("request_ts", window), F.col("host"))
        .agg(F.count("*").alias("n_requests"))
    )


def foreach_batch_crawl(
    spark: SparkSession,
    workdir: str,
    robots: list[dict] | None = None,
    rows_per_second: int = 1,
    max_batches: int = 3,
):
    """Always-on crawl ingress: each micro-batch seeds any newly-arrived jobs
    into the CrawlEngine and advances ONE superstep round.

    This is the ``foreachBatch`` wiring of §3.2's async crawl start: state
    lives entirely in the snapshot tables (that's why no
    ``applyInPandasWithState`` is needed), so the streaming query is just a
    trigger clock + job ingress. Returns the engine after ``max_batches``
    micro-batches (bounded for tests; production runs unbounded).
    """
    from anycrawl_spark import synth
    from anycrawl_spark.crawl.params import CrawlParams
    from anycrawl_spark.crawl.superstep import CrawlEngine

    engine_state = {"engine": None, "round": 0, "batches": 0}

    def handle_batch(batch_df, batch_id: int):
        # job ingress: one new crawl job per arriving row (bounded demo)
        new_jobs = [
            {
                "job_id": f"sjob-{int(r.value)}",
                "seed_url": f"http://{synth.host_name(int(r.value) % 20)}/p/0",
                "engine": "cheerio",
                "strategy": "same-hostname",
                "max_depth": 4,
                "limit": 10,
                "include_paths": [],
                "exclude_paths": [],
                "scrape_paths": [],
                "status": "running",
            }
            for r in batch_df.select("value").distinct().collect()[:2]
        ]
        eng = engine_state["engine"]
        if eng is None and new_jobs:
            eng = CrawlEngine(
                spark, workdir, new_jobs, robots or [], CrawlParams(), num_buckets=8
            )
            eng.init_state()
            engine_state["engine"] = eng
        if eng is not None and len(eng.finalized) < len(eng.jobs):
            eng.run_round(engine_state["round"])
            engine_state["round"] += 1
        engine_state["batches"] += 1

    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    q = (
        rate.writeStream.foreachBatch(handle_batch)
        .trigger(processingTime="2 seconds")
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline and engine_state["batches"] < max_batches:
        time.sleep(1)
    q.stop()
    return engine_state["engine"]


def run_scrape_stream_once(spark: SparkSession, rows_per_second: int = 200) -> list:
    """Drive the scrape stream for a few micro-batches into a memory sink and
    return the collected document rows (used by tests)."""
    docs = scrape_stream(scrape_requests_stream(spark, rows_per_second))
    q = (
        docs.writeStream.format("memory")
        .queryName("scrape_stream_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM scrape_stream_out").collect()
            if len(rows) >= 20:
                break
            time.sleep(1)
        else:
            rows = spark.sql("SELECT * FROM scrape_stream_out").collect()
    finally:
        q.stop()
    return rows


# ---------------------------------------------------------------------------
# Custom stateful operator: streaming job progress (A1-A3 as a stream)
# ---------------------------------------------------------------------------

PROGRESS_UPDATE = T.StructType(
    [
        T.StructField("job_id", T.StringType()),
        T.StructField("done", T.LongType()),
        T.StructField("succeeded", T.LongType()),
        T.StructField("failed", T.LongType()),
        T.StructField("finalized", T.BooleanType()),
    ]
)

_PROGRESS_STATE = T.StructType(
    [
        T.StructField("done", T.LongType()),
        T.StructField("succeeded", T.LongType()),
        T.StructField("failed", T.LongType()),
        T.StructField("finalized", T.BooleanType()),
    ]
)


def job_progress_stream(events: DataFrame, limit: int = 50) -> DataFrame:
    """Per-job crawl progress as a CUSTOM STATEFUL streaming operator
    (``applyInPandasWithState``) — the streaming rendering of the reference's
    Redis progress counters + atomic finalize policy (Progress.ts:279-298:
    finalize once done >= limit).

    Unlike the batch superstep (which externalizes this state into the
    progress snapshot table), a long-lived scrape stream needs the counters
    INSIDE the stream: state per job_id survives across micro-batches, each
    batch emits the updated counters, and the finalize transition emits
    exactly once (state flips to finalized and stops counting).

    ``events``: streaming rows (job_id, status_code, ts).
    """
    import pandas as pd  # noqa: F811 — worker-side import

    def update(key, pdfs, state):
        (job_id,) = key
        if state.exists:
            done, succeeded, failed, finalized = state.get
        else:
            done, succeeded, failed, finalized = 0, 0, 0, False
        for pdf in pdfs:
            if finalized:
                break
            ok = int((pdf["status_code"] == 200).sum())
            bad = int((pdf["status_code"] != 200).sum())
            done += ok + bad
            succeeded += ok
            failed += bad
            if done >= limit:
                finalized = True
        state.update((done, succeeded, failed, finalized))
        yield pd.DataFrame(
            [{"job_id": job_id, "done": done, "succeeded": succeeded,
              "failed": failed, "finalized": finalized}]
        )

    return (
        events.groupBy("job_id")
        .applyInPandasWithState(
            update,
            outputStructType=PROGRESS_UPDATE,
            stateStructType=_PROGRESS_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def fetch_events_stream(spark: SparkSession, rows_per_second: int = 100, n_jobs: int = 4) -> DataFrame:
    """Synthetic fetch-result event stream (rate source -> job/status cols)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.concat(F.lit("job-"), F.pmod("value", n_jobs).cast("string")).alias("job_id"),
            F.when(F.pmod(F.xxhash64("value"), 10) < 8, 200).otherwise(500).alias("status_code"),
            F.col("timestamp").alias("ts"),
        )
    )


def session_stats_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming counterpart of `operators/sessions.session_stats`: the
    built-in ``session_window`` (dynamic-gap session windows, Spark 3.2+)
    with a watermark so state for closed sessions is evicted. Duality
    with the batch gaps-and-islands form is pinned by
    tests/test_sessions.py::test_streaming_batch_duality — including the
    ONE semantic boundary difference: the batch form keeps an event at
    gap EXACTLY equal to the timeout in the same session (``gap >
    timeout`` starts a new one), while session_window's window is
    ``[start, last + gap)`` half-open, so an exactly-gap event starts a
    NEW session. Equal-gap events are measure-zero in real event time;
    the duality test therefore compares on gap-distinct data and pins
    the boundary divergence in its docstring."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", gap)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("start"),
            F.col("session_window.end").alias("end"),
            "n_events",
        )
    )
