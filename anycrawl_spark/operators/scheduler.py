"""Scheduled-task operators: template resolution (J4) + daily execution
gate (A4) — the batch analogs of the reference's Scheduler manager.

Reference semantics:
- template resolution (packages/scrape/src/managers/Scheduler.ts:346-409):
  a ``template``-typed task resolves its real type from the template dim
  (``template.templateType``); the engine falls back payload.engine ->
  template.reqOptions.engine -> 'cheerio'; the target queue is
  ``{actual_type}-{engine}``.
- daily execution limit (Scheduler.ts:241-262): a task with
  ``maxExecutionsPerDay`` set is skipped once today's execution count
  reaches the limit (midnight-anchored day window).

Both are pure column math / broadcast-dim joins — the cron firing itself is
BullMQ's job in the reference and the streaming trigger's here
(streaming/continuous.py); these operators are the decision logic that runs
per firing, expressed over task/execution tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ENGINE = "cheerio"  # Scheduler.ts:351


def resolve_task_templates(tasks: DataFrame, templates: DataFrame) -> DataFrame:
    """J4: template-typed tasks pull their actual type/engine from the
    template dim; others pass through.

    ``tasks``: (task_id, task_type, payload_engine, payload_template_id);
    ``templates``: (template_id, template_type, template_engine) —
    broadcast-sized dim. Adds actual_type / engine / queue_name.
    """
    tpl = F.broadcast(
        templates.select(
            F.col("template_id").alias("_tpl_id"),
            F.col("template_type").alias("_tpl_type"),
            F.col("template_engine").alias("_tpl_engine"),
        )
    )
    joined = tasks.join(
        tpl,
        (F.col("task_type") == "template")
        & (F.col("payload_template_id") == F.col("_tpl_id")),
        "left",
    )
    is_template = F.col("task_type") == "template"
    actual_type = F.when(is_template, F.col("_tpl_type")).otherwise(F.col("task_type"))
    engine = F.coalesce(
        F.col("payload_engine"),
        F.when(is_template, F.col("_tpl_engine")),
        F.lit(DEFAULT_ENGINE),
    )
    # A template task whose template_id matches no template row would get a
    # NULL actual_type, and concat_ws silently drops nulls — degrading the
    # queue_name to just the engine and routing to a bogus queue. Surface it
    # instead: unresolved=true, queue_name=NULL (downstream filters on it).
    unresolved = is_template & F.col("_tpl_id").isNull()
    return (
        joined.withColumn("actual_type", actual_type)
        .withColumn("engine", engine)
        .withColumn("unresolved", unresolved)
        .withColumn(
            "queue_name",
            F.when(~unresolved, F.concat_ws("-", "actual_type", "engine")),
        )
        .drop("_tpl_id", "_tpl_type", "_tpl_engine")
    )


def daily_execution_gate(
    tasks: DataFrame, executions: DataFrame, today: str
) -> DataFrame:
    """A4: per-task execution count for ``today`` + the skip decision.

    ``executions``: (task_id, exec_day, ...); ``today``: 'YYYY-MM-DD'.
    Adds executions_today and eligible (NULL/0 limit => always eligible,
    Scheduler.ts:242 ``maxExecutionsPerDay && > 0``).
    """
    counts = (
        executions.filter(F.col("exec_day") == today)
        .groupBy("task_id")
        .agg(F.count("*").alias("executions_today"))
    )
    out = tasks.join(counts, "task_id", "left").withColumn(
        "executions_today", F.coalesce(F.col("executions_today"), F.lit(0))
    )
    limited = F.col("max_executions_per_day").isNotNull() & (
        F.col("max_executions_per_day") > 0
    )
    return out.withColumn(
        "eligible",
        F.when(limited, F.col("executions_today") < F.col("max_executions_per_day"))
        .otherwise(F.lit(True)),
    )
