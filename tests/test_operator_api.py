"""Standalone operator APIs not used by the fused engine path but exported
as building blocks (COVERAGE.md references): chained gates, robots filter,
with_url_key, standalone fetcher."""

import pandas as pd
from pyspark.sql import functions as F


def test_with_url_key(spark):
    from anycrawl_spark.functions.urls import with_url_key

    df = spark.createDataFrame(
        pd.DataFrame({"url": ["HTTP://A.com:80/x#f", "javascript:alert(1)", "http://b.com/y?utm_source=z&a=1"]})
    )
    rows = with_url_key(df).collect()
    assert {r.url for r in rows} == {"http://a.com/x", "http://b.com/y?a=1"}
    assert all(r.url_hash is not None and r.host for r in rows)


def test_robots_filter_udf(spark):
    from anycrawl_spark.operators.gates import make_robots_filter

    robots = {"h.com": [("disallow", "/private"), ("allow", "/")]}
    udf = make_robots_filter(robots)
    df = spark.createDataFrame(
        pd.DataFrame({"host": ["h.com", "h.com", "other.com"],
                      "url": ["http://h.com/private/x", "http://h.com/ok", "http://other.com/p"]})
    )
    out = [r.ok for r in df.select(udf(F.col("host"), F.col("url")).alias("ok")).collect()]
    assert out == [False, True, True]


def test_job_gate_udf(spark):
    from anycrawl_spark.operators.gates import make_job_gate, with_scope_keys

    jobs = [{"job_id": "j", "seed_url": "http://a.example.com/p/0",
             "strategy": "same-domain", "include_paths": [], "exclude_paths": ["**/skip"]}]
    gate = make_job_gate(jobs)
    df = spark.createDataFrame(
        pd.DataFrame({
            "job_id": ["j"] * 3,
            "url": ["http://b.example.com/p/1", "http://other.net/p/1", "http://a.example.com/skip"],
            "host": ["b.example.com", "other.net", "a.example.com"],
        })
    )
    df = with_scope_keys(df)
    out = [r.ok for r in df.select(
        gate(F.col("job_id"), F.col("url"), F.col("host"),
             F.col("_domain"), F.col("_origin")).alias("ok")
    ).collect()]
    assert out == [True, False, False]


def test_standalone_fetcher(spark):
    from anycrawl_spark import synth
    from anycrawl_spark.crawl.fetcher import fetch

    sched = spark.createDataFrame(
        [
            ("j", synth.page_url(synth.host_name(0), 1), 1, "h", 0, 0, 0, 0,
             "pending", 0, 0, 0.0)
        ],
        "job_id string, url string, url_hash long, host string, depth int, "
        "discovery_seq long, parent_url_hash long, round_added int, "
        "status string, attempt int, next_eligible_round int, priority double",
    )
    r = fetch(sched).collect()[0]
    assert r.status_code == synth.page_status(r.url)
    assert r.html == synth.page_html(r.url)
    assert r.size_bytes == len(r.html)
