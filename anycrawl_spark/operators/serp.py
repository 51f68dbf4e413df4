"""SERP pipeline: URL building (X15), parse (X16), enrichment join (J2).

Reference semantics:
- URL building per engine with locale params and page offsets
  (reference: packages/search/src/engines/Google.ts:72-169; effectivePages =
  ceil(limit/10) unless the engine supports a direct limit,
  SearchService.ts:210-219).
- Parse of Google result blocks ``div[jscontroller="SC7lYd"]`` with ``a h3``
  title and ``div[data-sncf="1"]`` description (Google.ts:201-257).
- Enrichment: scrape payloads merged back onto SERP rows by url
  (SearchController.ts:184-202) — a plain left join here.

The fetch is the same deterministic synthetic backend as the crawl (no
network): ``serp_html(query, page)`` emits the reference's DOM shapes so the
parser exercises the real selectors. Parsing is an Arrow-batched pandas UDF
returning ``array<struct<...>>`` + ``posexplode`` (SURVEY §2.8 X16).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anycrawl_spark.functions.htmlmd import Node, parse_html
from anycrawl_spark.synth import _digest, host_name

RESULTS_PER_PAGE = 10  # Google.ts:10

# F10: the 21 country codes the reference skips during locale resolution
# (Google.ts:35-57, kept verbatim)
SKIP_COUNTRIES = [
    "AL", "AZ", "BD", "BN", "BT", "ET", "GE", "GL", "KH", "LA", "LK",
    "ME", "MK", "MM", "MN", "MV", "MY", "NP", "TJ", "TM", "UZ",
]

# Compact locale dims (X15): lang -> lr restrict, lang -> default country,
# country -> google domain. The reference ships 590-line tables
# (packages/libs/src/data/Google.ts); these are representative broadcast dims
# with the same lookup semantics — swap in the full tables as data files.
LANG_RESTRICT = {
    "en": "lang_en", "de": "lang_de", "fr": "lang_fr", "es": "lang_es",
    "pt": "lang_pt", "ja": "lang_ja", "zh": "lang_zh-CN", "it": "lang_it",
}
LANG_DEFAULT_COUNTRY = {
    "en": "US", "de": "DE", "fr": "FR", "es": "ES",
    "pt": "BR", "ja": "JP", "zh": "CN", "it": "IT",
}
GOOGLE_DOMAINS = {
    "US": "www.google.com", "GB": "www.google.co.uk", "DE": "www.google.de",
    "FR": "www.google.fr", "ES": "www.google.es", "BR": "www.google.com.br",
    "JP": "www.google.co.jp", "CN": "www.google.com.hk", "IT": "www.google.it",
}
SAFE_SEARCH = {0: "off", 1: "medium", 2: "high"}


def _lit_map(d: dict) -> F.Column:
    return F.create_map(*[F.lit(x) for kv in d.items() for x in kv])


def build_locale_serp_url(
    query: F.Column,
    start: F.Column,
    lang: F.Column,
    country: F.Column,
    limit: F.Column,
    safe_search: F.Column,
) -> F.Column:
    """X15 locale-aware Google URL building as pure column math
    (Google.ts:72-169 semantics): country resolution (explicit country unless
    skip-listed, else the language's default, else US), per-country google
    domain, hl/lr/cr params, num capped at 100, safe mapping, and a seeded
    deterministic arc_id replacing the reference's random async param."""
    skip = F.array(*[F.lit(c) for c in SKIP_COUNTRIES])
    resolved_country = F.coalesce(
        F.when(~F.array_contains(skip, F.upper(country)), F.upper(country)),
        _lit_map(LANG_DEFAULT_COUNTRY)[lang],
        F.lit("US"),
    )
    domain = F.coalesce(_lit_map(GOOGLE_DOMAINS)[resolved_country], F.lit("www.google.com"))
    lr = F.coalesce(_lit_map(LANG_RESTRICT)[lang], F.lit("lang_en"))
    hl = F.concat(F.coalesce(lang, F.lit("en")), F.lit("-"), resolved_country)
    num = F.least(F.greatest(limit, F.lit(1)), F.lit(100))
    safe = F.coalesce(
        _lit_map(SAFE_SEARCH)[safe_search], F.lit("medium")
    )
    arc_id = F.concat(
        F.lit("arc_id:srp_"),
        F.substring(F.md5(F.concat(query, F.lit("|"), start.cast("string"))), 1, 10),
    )
    return F.concat(
        F.lit("https://"), domain, F.lit("/search?q="),
        F.regexp_replace(query, r"\s+", "+"),
        F.lit("&start="), start.cast("string"),
        F.lit("&hl="), hl,
        F.lit("&lr="), lr,
        F.lit("&cr=country"), resolved_country,
        F.lit("&ie=utf8&oe=utf8&filter=0&asearch=arc&async="), arc_id,
        F.lit("&num="), num.cast("string"),
        F.lit("&safe="), safe,
    )


def build_serp_requests(queries: DataFrame, limit_col: str = "limit") -> DataFrame:
    """(query_id, query, limit) -> one row per page with the fetch URL.

    Column math only: pages = ceil(limit/10); url = google-style params.
    """
    pages = F.ceil(F.col(limit_col) / F.lit(RESULTS_PER_PAGE)).cast("int")
    return (
        queries.withColumn("page", F.explode(F.sequence(F.lit(0), pages - 1)))
        .withColumn(
            "serp_url",
            F.concat(
                F.lit("http://serp.synth/search?q="),
                F.regexp_replace(F.col("query"), r"\s+", "+"),
                F.lit("&start="),
                (F.col("page") * RESULTS_PER_PAGE).cast("string"),
                F.lit("&num="),
                F.lit(str(RESULTS_PER_PAGE)),
            ),
        )
    )


def serp_html(query: str, page: int, n_hosts: int = 50) -> str:
    """Deterministic synthetic SERP page in the reference's Google DOM shape."""
    blocks = []
    for i in range(RESULTS_PER_PAGE):
        rank = page * RESULTS_PER_PAGE + i
        d = _digest("serp", query, rank)
        host = host_name(d % n_hosts)
        url = f"http://{host}/p/{d % 37}"
        blocks.append(
            f'<div jscontroller="SC7lYd">'
            f'<a href="{url}"><h3>Result {rank} for {query}</h3></a>'
            f'<div data-sncf="1">Description {rank} about {query} on {host}</div>'
            f"</div>"
        )
    return "<html><body>" + "".join(blocks) + "</body></html>"


def _find_all(root: Node, pred) -> list[Node]:
    return [n for n in root.iter() if not n.is_text and pred(n)]


def parse_serp_html(html: str) -> list[dict]:
    """Parse the Google block structure (selector parity with Google.ts:201-257)."""
    root = parse_html(html)
    out = []
    for pos, block in enumerate(
        _find_all(root, lambda n: n.tag == "div" and n.attrs.get("jscontroller") == "SC7lYd")
    ):
        anchors = _find_all(block, lambda n: n.tag == "a" and n.attrs.get("href"))
        h3s = _find_all(block, lambda n: n.tag == "h3")
        descs = _find_all(
            block, lambda n: n.tag == "div" and n.attrs.get("data-sncf") == "1"
        )
        if not anchors or not h3s:
            continue
        out.append(
            {
                "position": pos,
                "category": "web",
                "title": h3s[0].text_content().strip(),
                "url": anchors[0].attrs["href"],
                "description": descs[0].text_content().strip() if descs else None,
                "source": "google",
            }
        )
    return out


_PARSED = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("position", T.IntegerType()),
        T.StructField("category", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def fetch_and_parse(serp_requests: DataFrame) -> DataFrame:
    """(query_id, query, page, serp_url) -> SERP_RESULTS rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                html = serp_html(r.query, r.page)
                for res in parse_serp_html(html):
                    rows.append(
                        {
                            "query_id": r.query_id,
                            "page": r.page,
                            "position": r.page * RESULTS_PER_PAGE + res["position"],
                            **{k: res[k] for k in ("category", "title", "url", "description", "source")},
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _PARSED.fields])

    return serp_requests.select("query_id", "query", "page").mapInPandas(
        batches, schema=_PARSED
    )


def serp_search(queries: DataFrame) -> DataFrame:
    """Full SERP flow with the reference's final slice to ``limit`` (O4):
    orderBy(page, position) then per-query limit."""
    from pyspark.sql import Window

    reqs = build_serp_requests(queries)
    results = fetch_and_parse(reqs)
    w = Window.partitionBy("query_id").orderBy("page", "position")
    limits = F.broadcast(queries.select("query_id", F.col("limit").alias("_limit")))
    return (
        results.withColumn("rank", F.row_number().over(w))
        .join(limits, "query_id")
        .filter(F.col("rank") <= F.col("_limit"))
        .drop("_limit")
    )


def enrich_with_documents(serp: DataFrame, documents: DataFrame) -> DataFrame:
    """J2: merge scraped page payloads onto SERP rows by url (left join)."""
    docs = documents.select(
        F.col("url"), F.col("title").alias("doc_title"), F.col("markdown")
    )
    return serp.join(docs, "url", "left")
