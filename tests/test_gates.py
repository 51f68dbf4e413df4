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
