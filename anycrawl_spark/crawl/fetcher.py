"""Fetch stage: scheduled frontier partition -> fetch results (mapInPandas).

Replaces the reference's Crawlee engine fetch (reference: packages/scrape/src/
engines/Cheerio.ts:31-57 HTTP path, Playwright.ts/Puppeteer.ts browser path)
with a vectorized batch fetch over each scheduled partition. Per task rules no
external network is allowed, so the fetch body is the deterministic synthetic
web (``synth.py``) — the stage interface (input schema, output schema,
partitioning contract) is the production shape; a real deployment swaps
``_fetch_batch``'s body for an async HTTP pool per partition.

Scale contract: the input MUST already be repartitioned by host-hash (with
salting for hot hosts — see ``superstep.py``) so that one host's politeness
budget is honored within a single partition and no partition serializes a
mega-host. The fetch itself is embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from anycrawl_spark import synth
from anycrawl_spark.schemas import FETCH_RESULTS


def make_fetcher(web: synth.WebConfig = synth.DEFAULT_WEB, with_html: bool = True):
    def _fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            urls = pdf["url"]
            pdf = pdf.copy()
            pdf["status_code"] = urls.map(synth.page_status)
            pdf["html"] = (
                urls.map(lambda u: synth.page_html(u, web))
                if with_html
                else ""
            )
            pdf["latency_ms"] = urls.map(synth.page_latency_ms)
            pdf["size_bytes"] = pdf["html"].str.len().astype("int64")
            yield pdf

    return _fetch_batch


def fetch(scheduled: DataFrame, web: synth.WebConfig = synth.DEFAULT_WEB) -> DataFrame:
    """scheduled frontier rows -> FETCH_RESULTS rows."""
    return scheduled.mapInPandas(make_fetcher(web), schema=FETCH_RESULTS)
