"""Bloom-sharded seen filter (SURVEY §2.3 J1, §4.2.3): no false negatives,
exact equality with the naive anti-join."""

import pandas as pd
from pyspark.sql import functions as F

from anycrawl_spark.operators.seen import build_bloom_shards, filter_fresh, with_dedup_key


def _mk(spark, rows):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["job_id", "url"]))
    return df.withColumn("url_hash", F.xxhash64("url"))


def test_fresh_equals_naive_anti_join(spark):
    seen_rows = [("j1", f"http://h/{i}") for i in range(500)] + [
        ("j2", f"http://h/{i}") for i in range(0, 500, 2)
    ]
    cand_rows = [("j1", f"http://h/{i}") for i in range(300, 800)] + [
        ("j2", f"http://h/{i}") for i in range(100)
    ]
    seen = _mk(spark, seen_rows)
    cand = _mk(spark, cand_rows)

    bloom_fresh = filter_fresh(cand, seen, num_buckets=8, use_bloom=True)
    naive_fresh = filter_fresh(cand, seen, num_buckets=8, use_bloom=False)

    a = {(r.job_id, r.url) for r in bloom_fresh.collect()}
    b = {(r.job_id, r.url) for r in naive_fresh.collect()}
    assert a == b
    # sanity: j1 fresh = 500..799, j2 fresh = odd < 100
    assert ("j1", "http://h/799") in a and ("j1", "http://h/300") not in a
    assert ("j2", "http://h/1") in a and ("j2", "http://h/2") not in a


def test_bloom_no_false_negatives(spark):
    """Every seen key must probe positive in its shard."""
    seen = _mk(spark, [("j", f"http://h/{i}") for i in range(2000)])
    keyed = with_dedup_key(seen, num_buckets=4)
    shards = build_bloom_shards(keyed)
    # probing the seen set against itself must yield zero fresh rows
    fresh = filter_fresh(seen, seen, num_buckets=4, use_bloom=True)
    assert fresh.count() == 0
    # shard sizing: each bucket produced one row
    assert shards.count() == 4


def test_job_scoping(spark):
    """Same url in another job is NOT seen (per-job uniqueKey, Base.ts:420)."""
    seen = _mk(spark, [("j1", "http://h/x")])
    cand = _mk(spark, [("j2", "http://h/x"), ("j1", "http://h/x")])
    fresh = {(r.job_id, r.url) for r in filter_fresh(cand, seen, 4).collect()}
    assert fresh == {("j2", "http://h/x")}
