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
