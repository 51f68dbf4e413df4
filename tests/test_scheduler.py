"""Scheduled-task operators: template resolution (Scheduler.ts:346-409) +
daily execution gate (Scheduler.ts:241-262)."""

from pyspark.sql import functions as F

from anycrawl_spark.operators.scheduler import (
    daily_execution_gate, resolve_task_templates,
)


def _templates(spark):
    return spark.createDataFrame(
        [("tpl-a", "scrape", "playwright"), ("tpl-b", "crawl", None)],
        "template_id string, template_type string, template_engine string",
    )


def test_template_resolution_chain(spark):
    tasks = spark.createDataFrame(
        [
            # non-template: type passes through; engine payload||cheerio
            ("t1", "crawl", None, None, None),
            ("t2", "scrape", "playwright", None, None),
            # template: type from dim; engine payload > template > default
            ("t3", "template", None, "tpl-a", None),       # -> scrape/playwright
            ("t4", "template", "cheerio", "tpl-a", None),  # payload wins
            ("t5", "template", None, "tpl-b", None),       # tpl engine NULL -> default
        ],
        "task_id string, task_type string, payload_engine string, "
        "payload_template_id string, max_executions_per_day int",
    )
    out = {r.task_id: r for r in resolve_task_templates(tasks, _templates(spark)).collect()}
    assert (out["t1"].actual_type, out["t1"].engine, out["t1"].queue_name) == ("crawl", "cheerio", "crawl-cheerio")
    assert out["t2"].queue_name == "scrape-playwright"
    assert (out["t3"].actual_type, out["t3"].engine) == ("scrape", "playwright")
    assert out["t4"].engine == "cheerio"             # payload.engine beats template
    assert (out["t5"].actual_type, out["t5"].engine) == ("crawl", "cheerio")
    assert all(r.unresolved is False and r.queue_name for r in out.values())


def test_resolve_unresolved_template_flagged(spark):
    """A template task pointing at a missing template must be surfaced
    (unresolved=true, queue_name NULL), not silently routed to a
    degenerate engine-only queue."""
    from anycrawl_spark.operators.scheduler import resolve_task_templates

    tasks = spark.createDataFrame(
        [("bad", "template", None, "tpl-missing", None),
         ("ok", "crawl", None, None, None)],
        "task_id string, task_type string, payload_engine string, "
        "payload_template_id string, max_executions_per_day int",
    )
    out = {r.task_id: r for r in resolve_task_templates(tasks, _templates(spark)).collect()}
    assert out["bad"].unresolved is True and out["bad"].queue_name is None
    assert out["bad"].actual_type is None
    assert out["ok"].unresolved is False and out["ok"].queue_name == "crawl-cheerio"


def test_daily_execution_gate(spark):
    tasks = spark.createDataFrame(
        [("a", 2), ("b", 2), ("c", None), ("d", 0)],
        "task_id string, max_executions_per_day int",
    )
    execs = spark.createDataFrame(
        [("a", "2026-08-17"), ("a", "2026-08-17"), ("a", "2026-08-16"),
         ("b", "2026-08-17"), ("c", "2026-08-17"), ("c", "2026-08-17"),
         ("d", "2026-08-17")],
        "task_id string, exec_day string",
    )
    out = {r.task_id: r for r in daily_execution_gate(tasks, execs, "2026-08-17").collect()}
    assert out["a"].executions_today == 2 and out["a"].eligible is False  # at limit
    assert out["b"].executions_today == 1 and out["b"].eligible is True
    assert out["c"].eligible is True   # NULL limit => unlimited
    assert out["d"].eligible is True   # 0 limit => treated as unset (Scheduler.ts:242)
