"""Scheduling gates: politeness variants equivalence + budget window."""

import pandas as pd
from pyspark.sql import functions as F

from anycrawl_spark.crawl.params import CrawlParams


def _pending(spark, n=3000, hosts=5):
    rows = []
    for i in range(n):
        # host0 is the mega-host: 60% of rows
        h = "mega.com" if i % 10 < 6 else f"h{i % hosts}.com"
        rows.append((f"job-{i % 3}", f"http://{h}/p/{i}", i * 2654435761 % 2**31,
                     h, i % 7, i))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["job_id", "url", "url_hash", "host", "depth", "discovery_seq"])
    )


def test_two_phase_politeness_equivalent(spark):
    from anycrawl_spark.operators.gates import apply_politeness, apply_politeness_two_phase

    params = CrawlParams(default_host_tokens=7)
    delays = {"mega.com": 250}  # 4 tokens
    df = _pending(spark)
    a = {(r.job_id, r.url) for r in apply_politeness(df, delays, params).collect()}
    b = {(r.job_id, r.url) for r in
         apply_politeness_two_phase(df, delays, params, salt_buckets=8).collect()}
    assert a == b
    # cap respected: mega host limited to 4 per job
    out = apply_politeness(df, delays, params)
    counts = {(r.job_id, r.host): r.c for r in
              out.groupBy("job_id", "host").agg(F.count("*").alias("c")).collect()}
    for (j, h), c in counts.items():
        assert c <= (4 if h == "mega.com" else 7)


def test_detect_host_skew(spark):
    from anycrawl_spark.operators.gates import detect_host_skew

    df = _pending(spark)  # mega.com holds 60% of 3000 rows, 600/job
    # sample_mod=1 = exact counts: 600-row max partition
    assert detect_host_skew(df, threshold_rows=500, sample_mod=1)
    assert not detect_host_skew(df, threshold_rows=700, sample_mod=1)
    # hash-sampled estimate lands near the exact count (deterministic)
    assert detect_host_skew(df, threshold_rows=300, sample_mod=8)
    assert not detect_host_skew(df, threshold_rows=3000, sample_mod=8)
    # the driver-side upper bound short-circuits without a Spark action
    assert not detect_host_skew(df, threshold_rows=500, sample_mod=1,
                                upper_bound=499)
    assert detect_host_skew(df, threshold_rows=500, sample_mod=1,
                            upper_bound=3000)


def test_auto_politeness_matches_both_paths(spark):
    from anycrawl_spark.operators.gates import (
        apply_politeness, apply_politeness_auto,
    )

    params = CrawlParams(default_host_tokens=7)
    delays = {"mega.com": 250}
    df = _pending(spark)
    exact = {(r.job_id, r.url) for r in apply_politeness(df, delays, params).collect()}
    # low threshold -> detector engages two-phase; output must be identical
    two = {(r.job_id, r.url) for r in
           apply_politeness_auto(df, delays, params, threshold_rows=100,
                                 sample_mod=1).collect()}
    # high threshold -> detector stays exact
    one = {(r.job_id, r.url) for r in
           apply_politeness_auto(df, delays, params, threshold_rows=10**9,
                                 sample_mod=1).collect()}
    assert exact == two == one


def test_engine_auto_politeness_parity(spark, tmp_path):
    """Engine in auto mode with a forced-low threshold (two-phase engages
    whenever the sampled detector sees any row) stays byte-equal to the
    reference simulator — the strategy switch is physical-plan-only."""
    from anycrawl_spark import synth
    from anycrawl_spark.crawl.simulator import ReferenceSimulator
    from anycrawl_spark.crawl.superstep import CrawlEngine

    jobs = [dict(synth.seed_jobs(1)[0], limit=20)]
    eng = CrawlEngine(
        spark, str(tmp_path / "auto"), jobs, synth.robots_rules(),
        CrawlParams(), num_buckets=4,
        two_phase_politeness="auto", auto_skew_threshold=1,
    )
    eng.init_state(); eng.run()
    sim = ReferenceSimulator(jobs, synth.robots_rules(), CrawlParams())
    sim.run()
    assert eng.seen_sets() == sim.seen_sets()
    assert eng.terminal_status() == sim.terminal_status()
    assert all(s["politeness"] in ("exact", "two_phase") for s in eng.round_stats)


def test_budget_window(spark):
    from anycrawl_spark.operators.gates import apply_budget

    df = _pending(spark, n=300)
    out = apply_budget(df, {"job-0": 10, "job-1": 0, "job-2": 5})
    counts = {r.job_id: r.c for r in out.groupBy("job_id").agg(F.count("*").alias("c")).collect()}
    assert counts.get("job-0") == 10
    assert "job-1" not in counts
    assert counts.get("job-2") == 5
    # lowest (depth, seq) first: job-0 keeps its depth-0 rows
    kept = [r for r in out.collect() if r.job_id == "job-0"]
    assert all(r.depth == 0 for r in kept)


def test_robots_path_port_bearing():
    """urlsplit-based path extraction: a naive url.split(host) yields
    ':8080/p' for port-bearing URLs and mis-matches every robots prefix."""
    from anycrawl_spark.crawl.params import robots_decision, robots_path

    assert robots_path("http://example.com:8080/private/x") == "/private/x"
    assert robots_path("http://example.com/p/1") == "/p/1"
    assert robots_path("http://example.com") == "/"
    assert robots_path("http://example.com:8080") == "/"
    rules = [("disallow", "/private")]
    assert robots_decision(rules, robots_path("http://h.com:8080/private/x")) is False
    assert robots_decision(rules, robots_path("http://h.com:8080/public")) is True


def test_candidate_gate_robots_with_port(spark):
    """Gate kernel must apply robots to the path, not ':port/path'."""
    from anycrawl_spark.functions.urls import url_host
    from anycrawl_spark.operators.gates import make_candidate_gate

    jobs = [{
        "job_id": "j", "seed_url": "http://site-0.synth:8080/p/0",
        "strategy": "all", "max_depth": 5, "limit": 100,
    }]
    host = url_host("http://site-0.synth:8080/p/0")  # includes the port
    robots = {host: [("disallow", "/private")]}
    gate = make_candidate_gate(jobs, robots)
    df = spark.createDataFrame(
        [("j", "http://site-0.synth:8080/private/a"),
         ("j", "http://site-0.synth:8080/p/1")],
        "job_id string, url string",
    )
    out = df.select(
        gate(F.col("job_id"), F.col("url"), F.lit(None)).alias("g")
    ).select("g.*")
    keep = {r.url: r.keep for r in out.collect()}
    blocked = [u for u, k in keep.items() if not k]
    allowed = [u for u, k in keep.items() if k]
    assert any("/private/" in u for u in blocked)
    assert any("/p/1" in u for u in allowed)


def test_retryable_predicate_parity(spark):
    """Engine column predicate == simulator is_retryable for ALL statuses,
    including the >=500 band outside RETRYABLE_STATUSES (501, 599, ...)."""
    from anycrawl_spark.crawl.params import is_retryable, is_retryable_col

    statuses = list(range(100, 600))
    df = spark.createDataFrame([(s,) for s in statuses], "status_code int")
    got = {
        r.status_code: r.retry
        for r in df.select(
            "status_code", is_retryable_col(F.col("status_code")).alias("retry")
        ).collect()
    }
    for s in statuses:
        assert got[s] == is_retryable(s), f"status {s}"
