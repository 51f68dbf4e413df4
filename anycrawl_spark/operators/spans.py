"""Extraction stage: fetch results -> documents with interleaved spans + links.

The Spark face of the HTML kernel (``functions/htmlmd.py``): one
``mapInPandas`` pass computes title, metadata, markdown, the interleaved
``spans`` payload (input_hint shape) and the DOM-ordered out-link list —
mirroring the reference's single DataExtractor pass that fans out to all
formats concurrently (reference: packages/scrape/src/core/
DataExtractor.ts:230-341). Vectorized: one Python call per Arrow batch.

Output carries ``links: array<string>`` (absolute, raw order) so the link
expansion downstream is a built-in ``posexplode`` (the only table-generating
transform, matching SURVEY §2.10).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from anycrawl_spark.functions.htmlmd import extract_document
from anycrawl_spark.schemas import SPAN

EXTRACTED = T.StructType(
    [
        T.StructField("job_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_seq", T.LongType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if pdf.empty:
            continue
        rows = []
        for r in pdf.itertuples(index=False):
            doc = extract_document(r.html, r.url)
            rows.append(
                {
                    "job_id": r.job_id,
                    "url": r.url,
                    "url_hash": r.url_hash,
                    "host": r.host,
                    "depth": r.depth,
                    "discovery_seq": r.discovery_seq,
                    "status_code": r.status_code,
                    "title": doc["title"],
                    "markdown": doc["markdown"],
                    "spans": doc["spans"],
                    "links": doc["links"],
                }
            )
        yield pd.DataFrame(rows)


def extract(fetched_ok: DataFrame) -> DataFrame:
    """Successful fetch rows (status 200, html non-null) -> EXTRACTED rows."""
    cols = [
        "job_id", "url", "url_hash", "host", "depth", "discovery_seq",
        "status_code", "html",
    ]
    return fetched_ok.select(*cols).mapInPandas(_extract_batch, schema=EXTRACTED)


# --- fused fetch+extract (the hot path) ------------------------------------
# One python stage instead of fetch->Arrow->JVM->Arrow->extract: halves the
# python worker count per task chain (no JVM/py oversubscription at high
# core counts) and never ships raw HTML through Arrow at all.

FETCHED_DOC = T.StructType(
    [
        T.StructField("job_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_seq", T.LongType()),
        T.StructField("parent_url_hash", T.LongType()),
        T.StructField("round_added", T.IntegerType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("latency_ms", T.IntegerType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


def fetch_extract(sched: DataFrame, web=None) -> DataFrame:
    """Scheduled frontier rows -> fetch results + extracted docs in ONE
    python pass. Non-200 rows carry null title/markdown/spans/links."""
    from anycrawl_spark import synth

    cfg = web or synth.DEFAULT_WEB

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FETCHED_DOC.fields]
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                status = synth.page_status(r.url)
                html = synth.page_html(r.url, cfg)
                row = {
                    "job_id": r.job_id, "url": r.url, "url_hash": r.url_hash,
                    "host": r.host, "depth": r.depth,
                    "discovery_seq": r.discovery_seq,
                    "parent_url_hash": r.parent_url_hash,
                    "round_added": r.round_added, "attempt": r.attempt,
                    "priority": r.priority,
                    "status_code": status,
                    "latency_ms": synth.page_latency_ms(r.url),
                    "size_bytes": len(html),
                    "title": None, "markdown": None, "spans": None, "links": None,
                }
                if status == 200:
                    doc = extract_document(html, r.url)
                    row.update(
                        title=doc["title"], markdown=doc["markdown"],
                        spans=doc["spans"], links=doc["links"],
                    )
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    cols = [
        "job_id", "url", "url_hash", "host", "depth", "discovery_seq",
        "parent_url_hash", "round_added", "attempt", "priority",
    ]
    return sched.select(*cols).mapInPandas(batches, schema=FETCHED_DOC)
