"""Engine-level invariants asserted from the OUTPUT tables (not the parity
oracle): politeness budget respected per (host, round), webhook events
emitted, metrics complete."""

import shutil

import pytest
from pyspark.sql import functions as F

from anycrawl_spark import synth
from anycrawl_spark.crawl.params import CrawlParams
from anycrawl_spark.crawl.superstep import CrawlEngine
from anycrawl_spark.sources.tables import CrawlTables


@pytest.fixture(scope="module")
def inv_run(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("inv"))
    jobs = [dict(j, limit=35) for j in synth.seed_jobs(2)]
    robots = synth.robots_rules()
    params = CrawlParams(default_host_tokens=5)
    eng = CrawlEngine(spark, wd, jobs, robots, params)
    eng.init_state()
    eng.run()
    yield eng, CrawlTables(spark, wd), params
    shutil.rmtree(wd, ignore_errors=True)


def test_politeness_budget_per_round(inv_run):
    """No (job, host, round) ever exceeds its token budget in the metrics."""
    eng, tables, params = inv_run
    m = tables.metrics()
    counts = (
        m.groupBy("job_id", "host", "round").agg(F.count("*").alias("n")).collect()
    )
    assert counts
    for r in counts:
        cap = params.host_tokens(eng.host_delays.get(r.host))
        assert r.n <= cap, (r.host, r.round, r.n, cap)


def test_webhook_events(inv_run):
    eng, tables, _ = inv_run
    ev = {(r.job_id, r.event) for r in tables.webhook_events().collect()}
    for j in eng.jobs:
        assert (j["job_id"], "crawl.started") in ev
        assert any(e in ("crawl.completed", "crawl.failed")
                   for jid, e in ev if jid == j["job_id"])


def test_metrics_cover_all_fetches(inv_run):
    """Every terminal fetched/failed URL has at least one metrics row."""
    eng, tables, _ = inv_run
    log = tables.frontier_log().filter(F.col("status").isin("fetched", "failed"))
    missing = log.join(
        tables.metrics().select("job_id", "url_hash").distinct(),
        ["job_id", "url_hash"],
        "left_anti",
    ).count()
    assert missing == 0


def test_documents_only_for_success(inv_run):
    eng, tables, _ = inv_run
    docs = tables.documents()
    assert docs.filter(F.col("status_code") != 200).count() == 0
    # every fetched row has a document
    fetched = tables.frontier_log().filter(F.col("status") == "fetched")
    missing = fetched.join(
        docs.select("job_id", "url_hash"), ["job_id", "url_hash"], "left_anti"
    ).count()
    assert missing == 0
