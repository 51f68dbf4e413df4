"""Webhook delivery bookkeeping: the batch analog of the reference's
delivery/retry state machine (packages/scrape/src/managers/Webhook.ts).

Reference semantics rebuilt as column math over a deliveries table:
- a delivery starts ``pending`` with attempt_number=1,
  max_attempts = subscription.maxRetries or 3, requestMethod POST,
  requestHeaders = subscription.customHeaders || {} and requestBody =
  the event payload (Webhook.ts:136-151);
- success => ``delivered`` (Webhook.ts:250);
- failure with attempts left => ``retrying``, attempt_number+1 and
  next_retry = now + backoff_multiplier^attempt_number * base
  (base 1 minute, multiplier default 2 — Webhook.ts:297-318; rounds stand in
  for minutes in the batch model);
- failure at max_attempts => terminal ``failed`` (Webhook.ts:321-333);
- the retry processor flips due ``retrying`` rows back to ``pending``
  (status='retrying' AND next_retry_at <= NOW — Webhook.ts:385-409);
- at send time the headers are Content-Type + X-AnyCrawl-Signature
  (HMAC-SHA256 of the body, `sha256=<hex>`, Webhook.ts:370-374) +
  X-Webhook-Event/Delivery-Id + the stored custom headers spread last
  (Webhook.ts:220-229) — ``delivery_headers`` below.

The state machine is JVM column math (no UDF, no shuffle beyond the event x
subscription join), so it is DuckDB-oracle checkable; only the send-time
HMAC runs in an Arrow-batched pandas UDF (delivery fan-out is tiny next to
the crawl stream, and the signature needs real crypto).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_ATTEMPTS = 3        # Webhook.ts:146 maxRetries || 3
DEFAULT_BACKOFF_MULTIPLIER = 2  # Webhook.ts:299 retryBackoffMultiplier || 2


def create_deliveries(events: DataFrame, subscriptions: DataFrame) -> DataFrame:
    """Event rows x matching ACTIVE subscriptions -> pending delivery rows.

    ``events``: (job_id, event, round[, payload_json]); ``subscriptions``:
    (sub_id, job_id, event, url, active, max_attempts[, custom_headers]).
    ``custom_headers`` is a JSON-object string (the reference stores JSONB);
    absent/null degrades to '{}' per `customHeaders || {}` (Webhook.ts:149).
    Without an explicit ``payload_json`` the body is the canonical event
    envelope. Subscriptions are a broadcast-sized dim (per-job config) —
    broadcast join, no shuffle of the event stream.
    """
    sub_cols = [
        "sub_id",
        F.col("job_id").alias("s_job_id"),
        F.col("event").alias("s_event"),
        F.col("url").alias("request_url"),
        F.coalesce(F.col("max_attempts"), F.lit(DEFAULT_MAX_ATTEMPTS)).alias(
            "max_attempts"
        ),
        (
            F.coalesce(F.col("custom_headers"), F.lit("{}"))
            if "custom_headers" in subscriptions.columns
            else F.lit("{}")
        ).alias("request_headers"),
    ]
    subs = F.broadcast(subscriptions.filter(F.col("active")).select(*sub_cols))
    body = (
        F.col("payload_json")
        if "payload_json" in events.columns
        else F.concat(
            F.lit('{"job_id":"'), "job_id", F.lit('","event":"'), "event",
            F.lit('","round":'), F.col("round").cast("string"), F.lit("}"),
        )
    )
    return (
        events.join(
            subs,
            (F.col("job_id") == F.col("s_job_id"))
            & (F.col("event") == F.col("s_event")),
        )
        .select(
            F.concat_ws("|", "job_id", "event", "round", "sub_id").alias("delivery_id"),
            "job_id", "event", "sub_id", "request_url",
            F.lit("POST").alias("request_method"),
            "request_headers",
            body.alias("request_body"),
            F.sha2(body, 256).alias("request_body_sha256"),
            F.col("round").alias("created_round"),
            F.lit("pending").alias("status"),
            F.lit(1).alias("attempt_number"),
            "max_attempts",
            F.lit(None).cast("int").alias("next_retry_round"),
            F.lit(None).cast("int").alias("response_status"),
        )
    )


def advance_deliveries(
    deliveries: DataFrame,
    outcomes: DataFrame,
    now_round: int,
    backoff_multiplier: int = DEFAULT_BACKOFF_MULTIPLIER,
) -> DataFrame:
    """Apply one delivery attempt's outcomes to pending rows.

    ``outcomes``: (delivery_id, ok boolean, response_status). Rows without an
    outcome (not attempted this tick) pass through unchanged, as do any
    carried columns (headers/body/...). Transition table mirrors
    Webhook.ts:240-333.
    """
    o = outcomes.select(
        F.col("delivery_id").alias("o_id"), "ok",
        F.col("response_status").alias("o_status"),
    )
    joined = deliveries.join(o, deliveries.delivery_id == o.o_id, "left")
    has_more = F.col("attempt_number") < F.col("max_attempts")
    backoff_rounds = F.pow(
        F.lit(backoff_multiplier), F.col("attempt_number")
    ).cast("int")  # base: 1 round (reference: 1 minute, Webhook.ts:300)
    return (
        joined
        .withColumn("_attempted", F.col("o_id").isNotNull() & (F.col("status") == "pending"))
        # ordering matters: status/next_retry read the PRE-update
        # attempt_number, so attempt_number is rewritten last
        .withColumn(
            "_new_status",
            F.when(~F.col("_attempted"), F.col("status"))
            .when(F.col("ok"), F.lit("delivered"))
            .when(has_more, F.lit("retrying"))
            .otherwise(F.lit("failed")),
        )
        .withColumn(
            "next_retry_round",
            F.when(
                F.col("_attempted") & ~F.col("ok") & has_more,
                F.lit(now_round) + backoff_rounds,
            ).otherwise(F.col("next_retry_round")),
        )
        .withColumn(
            "attempt_number",
            F.when(
                F.col("_attempted") & ~F.col("ok") & has_more,
                F.col("attempt_number") + 1,
            ).otherwise(F.col("attempt_number")),
        )
        .withColumn(
            "response_status",
            F.when(F.col("_attempted"), F.col("o_status")).otherwise(
                F.col("response_status")
            ),
        )
        .withColumn("status", F.col("_new_status"))
        .drop("o_id", "ok", "o_status", "_attempted", "_new_status")
    )


def release_due_retries(deliveries: DataFrame, now_round: int) -> DataFrame:
    """The retry processor: due ``retrying`` rows become ``pending`` again
    (Webhook.ts:385-409)."""
    due = (F.col("status") == "retrying") & (
        F.col("next_retry_round") <= F.lit(now_round)
    )
    return deliveries.withColumn(
        "status", F.when(due, F.lit("pending")).otherwise(F.col("status"))
    )


def delivery_headers(deliveries: DataFrame, secrets: DataFrame) -> DataFrame:
    """Send-time header assembly (Webhook.ts:217-229): Content-Type +
    X-AnyCrawl-Signature (`sha256=` + HMAC-SHA256(secret, body) hex,
    Webhook.ts:370-374) + X-Webhook-Event + X-Webhook-Delivery-Id, with the
    stored request headers spread LAST (custom headers win on key collision,
    matching the JS object-spread order). ``secrets``: (sub_id, secret) —
    broadcast dim. Adds a ``send_headers`` JSON-string column.

    The reference's X-Webhook-Timestamp (wall clock) is intentionally
    omitted — the batch model stamps deterministic round columns (X10).
    """
    import json

    s = F.broadcast(
        secrets.select(F.col("sub_id").alias("h_sub_id"), "secret")
    )

    @F.pandas_udf("string")
    def build(body: pd.Series, secret: pd.Series, event: pd.Series,
              delivery_id: pd.Series, custom: pd.Series) -> pd.Series:
        import hashlib
        import hmac as hmac_mod

        out = []
        for b, k, ev, did, cu in zip(body, secret, event, delivery_id, custom):
            sig = hmac_mod.new(
                (k or "").encode(), (b or "").encode(), hashlib.sha256
            ).hexdigest()
            headers = {
                "Content-Type": "application/json",
                "X-AnyCrawl-Signature": f"sha256={sig}",
                "X-Webhook-Event": ev,
                "X-Webhook-Delivery-Id": did,
            }
            try:
                headers.update(json.loads(cu) if cu else {})
            except ValueError:
                pass  # malformed stored headers: base headers still go out
            out.append(json.dumps(headers, separators=(",", ":")))
        return pd.Series(out)

    return (
        deliveries.join(s, deliveries.sub_id == s.h_sub_id, "left")
        .withColumn(
            "send_headers",
            build(
                F.col("request_body"), F.col("secret"), F.col("event"),
                F.col("delivery_id"), F.col("request_headers"),
            ),
        )
        .drop("h_sub_id", "secret")
    )
