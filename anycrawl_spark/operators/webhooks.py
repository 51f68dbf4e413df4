"""Webhook delivery bookkeeping: the batch analog of the reference's
delivery/retry state machine (packages/scrape/src/managers/Webhook.ts).

Reference semantics rebuilt as column math over a deliveries table:
- a delivery starts ``pending`` with attempt_number=1 and
  max_attempts = subscription.maxRetries or 3 (Webhook.ts:136-151);
- success => ``delivered`` (Webhook.ts:250);
- failure with attempts left => ``retrying``, attempt_number+1 and
  next_retry = now + backoff_multiplier^attempt_number * base
  (base 1 minute, multiplier default 2 — Webhook.ts:297-318; rounds stand in
  for minutes in the batch model);
- failure at max_attempts => terminal ``failed`` (Webhook.ts:321-333);
- the retry processor flips due ``retrying`` rows back to ``pending``
  (status='retrying' AND next_retry_at <= NOW — Webhook.ts:385-409).

Everything is JVM column math (no UDF, no shuffle beyond the event x
subscription join), so the whole state machine is DuckDB-oracle checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_ATTEMPTS = 3        # Webhook.ts:146 maxRetries || 3
DEFAULT_BACKOFF_MULTIPLIER = 2  # Webhook.ts:299 retryBackoffMultiplier || 2


def create_deliveries(events: DataFrame, subscriptions: DataFrame) -> DataFrame:
    """Event rows x matching ACTIVE subscriptions -> pending delivery rows.

    ``events``: (job_id, event, round); ``subscriptions``: (sub_id, job_id,
    event, url, active, max_attempts). Subscriptions are a broadcast-sized
    dim (per-job config) — broadcast join, no shuffle of the event stream.
    """
    subs = F.broadcast(
        subscriptions.filter(F.col("active"))
        .select(
            "sub_id",
            F.col("job_id").alias("s_job_id"),
            F.col("event").alias("s_event"),
            F.col("url").alias("request_url"),
            F.coalesce(F.col("max_attempts"), F.lit(DEFAULT_MAX_ATTEMPTS)).alias(
                "max_attempts"
            ),
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
    outcome (not attempted this tick) pass through unchanged. Transition table
    mirrors Webhook.ts:240-333.
    """
    o = outcomes.select(
        F.col("delivery_id").alias("o_id"), "ok",
        F.col("response_status").alias("o_status"),
    )
    joined = deliveries.join(o, deliveries.delivery_id == o.o_id, "left")
    attempted = F.col("o_id").isNotNull() & (F.col("status") == "pending")
    has_more = F.col("attempt_number") < F.col("max_attempts")
    backoff_rounds = F.pow(
        F.lit(backoff_multiplier), F.col("attempt_number")
    ).cast("int")  # base: 1 round (reference: 1 minute, Webhook.ts:300)
    return joined.select(
        "delivery_id", "job_id", "event", "sub_id", "request_url", "created_round",
        F.when(~attempted, F.col("status"))
        .when(F.col("ok"), F.lit("delivered"))
        .when(has_more, F.lit("retrying"))
        .otherwise(F.lit("failed"))
        .alias("status"),
        F.when(attempted & ~F.col("ok") & has_more, F.col("attempt_number") + 1)
        .otherwise(F.col("attempt_number"))
        .alias("attempt_number"),
        "max_attempts",
        F.when(attempted & ~F.col("ok") & has_more, F.lit(now_round) + backoff_rounds)
        .otherwise(F.col("next_retry_round"))
        .alias("next_retry_round"),
        F.when(attempted, F.col("o_status")).otherwise(F.col("response_status"))
        .alias("response_status"),
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
