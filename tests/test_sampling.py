"""Deterministic sampling + mixture weighting (operators/sampling.py).

Oracle equality (rates re-derived in SQL + identical hex-threshold
compare) runs in test_queries_oracle via q_mixture_sample. Here: the
threshold math, nesting/stability properties, the mixture solver, and
plan shape."""

import pyspark.sql.functions as F
import pytest

from anycrawl_spark.operators.sampling import (
    deterministic_sample,
    mixture_rates,
    mixture_sample,
    rate_threshold,
    sample_hash,
)


def test_rate_threshold_math():
    assert rate_threshold(0.0) == "00000000"
    assert rate_threshold(0.5) == "80000000"
    assert rate_threshold(0.25) == "40000000"
    assert rate_threshold(1.0) == "g"      # sorts after every hex digit
    assert rate_threshold(2.0) == "g"
    assert "f" < "g" and "9" < "g"


def test_mixture_rates_solver():
    counts = {"a": 100, "b": 100, "c": 50, "d": 77}
    shares = {"a": 0.5, "b": 0.25, "c": 0.25}
    rates = mixture_rates(counts, shares)
    # N* = min(100/.5, 100/.25, 50/.25) = 200
    assert rates == {"a": 1.0, "b": 0.5, "c": 1.0, "d": 0.0}


def test_mixture_rates_missing_source_forces_zero():
    rates = mixture_rates({"a": 10}, {"a": 0.5, "ghost": 0.5})
    assert rates == {"a": 0.0}


def test_sampling_nested_and_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    small = {r["doc_id"] for r in deterministic_sample(df, 0.1).collect()}
    big = {r["doc_id"] for r in deterministic_sample(df, 0.5).collect()}
    again = {r["doc_id"] for r in deterministic_sample(df, 0.5).collect()}
    assert small <= big              # thresholds nest
    assert big == again              # pure function of the key
    assert 0.35 < len(big) / 2000 < 0.65
    assert 0.05 < len(small) / 2000 < 0.16
    # a different salt draws an effectively independent sample
    other = {r["doc_id"] for r in deterministic_sample(df, 0.5, salt="v2").collect()}
    assert other != big


def test_mixture_sample_proportions(spark):
    rows = [(i, f"s{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    shares = {"s0": 0.5, "s1": 0.25, "s2": 0.25}
    kept = mixture_sample(df, shares).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in kept}
    assert "s3" not in got           # unlisted source drops entirely
    # N* = min(1000/.5, 1000/.25, 1000/.25) = 2000 -> expect 1000/500/500
    assert abs(got["s0"] - 1000) < 100
    assert abs(got["s1"] - 500) < 80
    assert abs(got["s2"] - 500) < 80


def test_plan_scan_stage_filter(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = deterministic_sample(df, 0.3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in p and "InPandas" not in p and "Python" not in p, (
        "sampling must be a pure scan-stage JVM filter"
    )
