"""Structured-Streaming facet: scrape stream + watermarked metrics."""

import time

from pyspark.sql import functions as F


def test_scrape_stream_produces_documents(spark):
    from anycrawl_spark.streaming.continuous import run_scrape_stream_once

    rows = run_scrape_stream_once(spark, rows_per_second=200)
    assert len(rows) >= 20
    ok = [r for r in rows if r.status_code == 200]
    assert ok
    for r in ok[:10]:
        assert r.spans and [s.offset for s in r.spans] == list(range(len(r.spans)))
        assert r.url.startswith("http://host")


def test_foreach_batch_crawl(spark, tmp_path):
    from anycrawl_spark.streaming.continuous import foreach_batch_crawl

    eng = foreach_batch_crawl(spark, str(tmp_path / "fbc"), max_batches=4)
    assert eng is not None
    # at least one superstep ran and produced state
    assert eng.store.last_round >= 0
    assert sum(eng.done.values()) + sum(eng.pending.values()) > 0


def test_metrics_stream_watermark(spark):
    from anycrawl_spark.streaming.continuous import (
        metrics_stream, scrape_requests_stream,
    )

    m = metrics_stream(scrape_requests_stream(spark, rows_per_second=100))
    q = (
        m.writeStream.format("memory")
        .queryName("metrics_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # watermark = 30s: closed windows only; just assert the stream runs
        # and the plan carries the event-time watermark + window grouping
        deadline = time.time() + 15
        while time.time() < deadline and q.isActive:
            time.sleep(1)
        assert q.isActive
        progress = q.lastProgress
        assert progress is not None
        assert "watermark" in (progress.get("eventTime") or {})
    finally:
        q.stop()


def test_job_progress_stateful_stream(spark):
    """applyInPandasWithState: per-job counters persist across micro-batches,
    monotonically increase, and finalize exactly at the limit."""
    from anycrawl_spark.streaming.continuous import (
        fetch_events_stream, job_progress_stream,
    )

    prog = job_progress_stream(fetch_events_stream(spark, rows_per_second=200), limit=40)
    q = (
        prog.writeStream.format("memory")
        .queryName("progress_out")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 25
        while time.time() < deadline:
            time.sleep(1)
            rows = spark.sql("SELECT * FROM progress_out").collect()
            if rows and any(r.finalized for r in rows):
                break
        rows = spark.sql("SELECT * FROM progress_out").collect()
        assert rows, "no progress emitted"
        # counters are monotone per job across batch emissions
        seen = {}
        for r in rows:
            seen.setdefault(r.job_id, []).append(r.done)
        for jid, ds in seen.items():
            assert ds == sorted(ds), f"{jid} counters not monotone: {ds}"
        # at least one job crossed the limit and finalized; done >= limit there
        finals = [r for r in rows if r.finalized]
        assert finals and all(r.done >= 40 for r in finals)
        # sanity: succeeded + failed == done on every emission
        assert all(r.succeeded + r.failed == r.done for r in rows)
    finally:
        q.stop()
