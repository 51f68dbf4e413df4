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


def test_request_headers_body_and_digest(spark):
    """Webhook.ts:147-150: requestMethod POST, requestHeaders =
    customHeaders || {}, requestBody = payload; plus a sha256 body digest."""
    import hashlib

    events = spark.createDataFrame(
        [("j0", "crawl.completed", 2)], "job_id string, event string, round int"
    )
    subs = spark.createDataFrame(
        [("s0", "j0", "crawl.completed", "http://h/0", True, 2,
          '{"X-Team":"alpha"}'),
         ("s3", "j0", "crawl.completed", "http://h/3", True, 2, None)],
        "sub_id string, job_id string, event string, url string, "
        "active boolean, max_attempts int, custom_headers string",
    )
    rows = {r.sub_id: r for r in create_deliveries(events, subs).collect()}
    assert rows["s0"].request_method == "POST"
    assert rows["s0"].request_headers == '{"X-Team":"alpha"}'
    assert rows["s3"].request_headers == "{}"  # customHeaders || {}
    body = '{"job_id":"j0","event":"crawl.completed","round":2}'
    assert rows["s0"].request_body == body
    assert rows["s0"].request_body_sha256 == hashlib.sha256(body.encode()).hexdigest()


def test_payload_json_column_passthrough(spark):
    events = spark.createDataFrame(
        [("j0", "crawl.completed", 0, '{"pages":10}')],
        "job_id string, event string, round int, payload_json string",
    )
    subs = spark.createDataFrame(
        [("s0", "j0", "crawl.completed", "http://h/0", True, 2, None)],
        "sub_id string, job_id string, event string, url string, "
        "active boolean, max_attempts int, custom_headers string",
    )
    row = create_deliveries(events, subs).collect()[0]
    assert row.request_body == '{"pages":10}'


def test_delivery_headers_hmac_signature(spark):
    """Send-time headers (Webhook.ts:217-229): base headers + sha256= HMAC
    signature (Webhook.ts:370-374), custom headers spread LAST (they win)."""
    import hashlib
    import hmac as hmac_mod
    import json

    from anycrawl_spark.operators.webhooks import delivery_headers

    events = spark.createDataFrame(
        [("j0", "crawl.completed", 1)], "job_id string, event string, round int"
    )
    subs = spark.createDataFrame(
        [("s0", "j0", "crawl.completed", "http://h/0", True, 2,
          '{"X-Team":"alpha","Content-Type":"text/custom"}')],
        "sub_id string, job_id string, event string, url string, "
        "active boolean, max_attempts int, custom_headers string",
    )
    secrets = spark.createDataFrame([("s0", "topsecret")], "sub_id string, secret string")
    d = create_deliveries(events, subs)
    row = delivery_headers(d, secrets).collect()[0]
    headers = json.loads(row.send_headers)
    expected_sig = hmac_mod.new(
        b"topsecret", row.request_body.encode(), hashlib.sha256
    ).hexdigest()
    assert headers["X-AnyCrawl-Signature"] == f"sha256={expected_sig}"
    assert headers["X-Webhook-Event"] == "crawl.completed"
    assert headers["X-Webhook-Delivery-Id"] == row.delivery_id
    assert headers["X-Team"] == "alpha"
    assert headers["Content-Type"] == "text/custom"  # custom spread wins
