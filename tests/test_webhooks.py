"""Webhook delivery/retry state machine (Webhook.ts:136-409 batch analog)."""

from pyspark.sql import functions as F

from anycrawl_spark.operators.webhooks import (
    advance_deliveries, create_deliveries, release_due_retries,
)


def _subs(spark):
    return spark.createDataFrame(
        [("s0", "j0", "crawl.completed", "http://h/0", True, 2),
         ("s1", "j0", "crawl.completed", "http://h/1", False, 3),   # inactive
         ("s2", "j1", "crawl.completed", "http://h/2", True, None)],  # default 3
        "sub_id string, job_id string, event string, url string, "
        "active boolean, max_attempts int",
    )


def test_create_deliveries_matching(spark):
    events = spark.createDataFrame(
        [("j0", "crawl.completed", 0), ("j1", "crawl.completed", 0),
         ("j1", "crawl.failed", 0)],
        "job_id string, event string, round int",
    )
    rows = create_deliveries(events, _subs(spark)).collect()
    # inactive subscription skipped; unmatched event type skipped
    assert {r.sub_id for r in rows} == {"s0", "s2"}
    assert all(r.status == "pending" and r.attempt_number == 1 for r in rows)
    # maxRetries || 3 default (Webhook.ts:146)
    assert {r.sub_id: r.max_attempts for r in rows} == {"s0": 2, "s2": 3}


def test_full_lifecycle_transitions(spark):
    events = spark.createDataFrame(
        [("j0", "crawl.completed", 0), ("j1", "crawl.completed", 0)],
        "job_id string, event string, round int",
    )
    st = create_deliveries(events, _subs(spark))
    ids = {r.sub_id: r.delivery_id for r in st.collect()}

    def outcome(df, ok_ids):
        return df.filter(F.col("status") == "pending").select(
            "delivery_id",
            F.col("delivery_id").isin(list(ok_ids)).alias("ok"),
            F.lit(503).alias("response_status"),
        )

    # tick 1: s0 fails (-> retrying, next = 1 + 2^1 = 3), s2 succeeds
    st = advance_deliveries(st, outcome(st, {ids["s2"]}), now_round=1)
    r = {x.sub_id: x for x in st.collect()}
    assert r["s2"].status == "delivered"
    assert r["s0"].status == "retrying"
    assert r["s0"].attempt_number == 2 and r["s0"].next_retry_round == 3

    # tick 2: not due yet — release is a no-op, no pending rows to attempt
    st = release_due_retries(st, now_round=2)
    assert st.filter(F.col("status") == "pending").count() == 0

    # tick 3: due -> pending -> fails again at max_attempts=2 -> terminal
    st = release_due_retries(st, now_round=3)
    assert st.filter(F.col("status") == "pending").count() == 1
    st = advance_deliveries(st, outcome(st, set()), now_round=3)
    r = {x.sub_id: x for x in st.collect()}
    assert r["s0"].status == "failed"
    assert r["s0"].attempt_number == 2  # no increment on terminal failure
    assert r["s2"].status == "delivered"  # untouched
