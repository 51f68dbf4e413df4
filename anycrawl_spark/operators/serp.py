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
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anycrawl_spark.functions.htmlmd import Node, parse_html
from anycrawl_spark.functions.js import js_string as _js_string
from anycrawl_spark.synth import _digest, host_name

RESULTS_PER_PAGE = 10  # Google.ts:10

# F10: the 21 country codes the reference skips during locale resolution
# (Google.ts:35-57, kept verbatim)
SKIP_COUNTRIES = [
    "AL", "AZ", "BD", "BN", "BT", "ET", "GE", "GL", "KH", "LA", "LK",
    "ME", "MK", "MM", "MN", "MV", "MY", "NP", "TJ", "TM", "UZ",
]

# Full locale dims (X15): the reference's 590-line tables shipped as a data
# module (anycrawl_spark/data/google_locales.py, values verbatim from
# packages/libs/src/data/Google.ts) and exposed as broadcast literal maps.
from anycrawl_spark.data.google_locales import (
    LANGUAGES as LANG_RESTRICT_FULL,
    REGIONS,
    SUPPORTED_DOMAINS,
)

# language -> fallback country: the FIRST regions entry for the language whose
# country is not skip-listed (Google.ts engine :88-97 takes Object.entries
# order, which the data module preserves)
LANG_FALLBACK_COUNTRY: dict[str, str] = {}
for _k, _v in REGIONS.items():
    _lang = _k.split("-", 1)[0]
    if _lang not in LANG_FALLBACK_COUNTRY and _v.upper() not in SKIP_COUNTRIES:
        LANG_FALLBACK_COUNTRY[_lang] = _v

SAFE_SEARCH = {0: "off", 1: "medium", 2: "high"}
TIME_RANGE = {"day": "d", "week": "w", "month": "m", "year": "y"}  # Google.ts:20-25


def _lit_map(d: dict) -> F.Column:
    return F.create_map(*[F.lit(x) for kv in d.items() for x in kv])


def resolve_google_locale(lang: str | None, country: str | None) -> tuple[str, str, str, str]:
    """Pure-python locale resolution (Google.ts engine :81-112 semantics):
    returns (lang_code, eng_lang, country, domain).

    - eng_lang = languages[lang] or 'en'; lang_code = part after '_' (or the
      whole value when there is no underscore);
    - country: regions[f'{lang}-{country}'] when given and not skip-listed,
      else the first regions entry for the language with a non-skip country,
      else 'US';
    - domain = supported_domains[country] or www.google.com.
    """
    eng_lang = LANG_RESTRICT_FULL.get(lang or "", "en")
    parts = eng_lang.split("_")
    lang_code = parts[1] if len(parts) > 1 and parts[1] else eng_lang
    resolved = None
    if lang and country and country.upper() not in SKIP_COUNTRIES:
        resolved = REGIONS.get(f"{lang}-{country.upper()}")
    if not resolved and lang:
        resolved = LANG_FALLBACK_COUNTRY.get(lang)
    if not resolved:
        resolved = "US"
    domain = SUPPORTED_DOMAINS.get(resolved.upper(), "www.google.com")
    return lang_code, eng_lang, resolved, domain


def build_locale_serp_url(
    query: F.Column,
    start: F.Column,
    lang: F.Column,
    country: F.Column,
    limit: F.Column,
    safe_search: F.Column,
    time_range: F.Column | None = None,
) -> F.Column:
    """X15 locale-aware Google URL building as pure column math over the FULL
    locale tables (Google.ts:72-169 semantics): regions-keyed country
    resolution with skip-list + first-region fallback, per-country google
    domain, hl from the lr value's language code, num capped at 100 and
    omitted when limit<=0 (ts:130-133), tbs=qdr:X for valid time ranges,
    safe omitted when NULL (ts:141-143 undefined/null check), and a seeded
    deterministic arc id replacing the reference's random 23-char one
    (same ``arc_id:srp_..._1NN,use_ac:true,_fmt:prog`` shape, ts:153-157).

    Bug-exact details: the skip-list check and the regions lookup use the
    RAW country string (``skipCountries.includes(options.country)`` and
    ``regions[`${lang}-${country}`]`` — no case folding, so 'my' is not
    skipped and 'gb' resolves nothing), only the domain lookup uppercases;
    parameter values are form-urlencoded exactly as URLSearchParams does
    (java URLEncoder = the WHATWG application/x-www-form-urlencoded
    serializer: same safe set ``*-._`` + alnum, space->'+')."""
    skip = F.array(*[F.lit(c) for c in SKIP_COUNTRIES])
    eng_lang = F.coalesce(_lit_map(LANG_RESTRICT_FULL)[lang], F.lit("en"))
    lang_code = F.when(
        eng_lang.contains("_"), F.substring_index(eng_lang, "_", -1)
    ).otherwise(eng_lang)
    resolved_country = F.coalesce(
        F.when(
            lang.isNotNull() & country.isNotNull()
            & ~F.array_contains(skip, country),
            _lit_map(REGIONS)[F.concat(lang, F.lit("-"), country)],
        ),
        F.when(lang.isNotNull(), _lit_map(LANG_FALLBACK_COUNTRY)[lang]),
        F.lit("US"),
    )
    domain = F.coalesce(
        _lit_map(SUPPORTED_DOMAINS)[F.upper(resolved_country)], F.lit("www.google.com")
    )
    num = F.least(F.greatest(limit, F.lit(1)), F.lit(100))
    # deterministic stand-in for the 23-char random id + '_1' + 2-padded
    # start (ts:155); ':' and ',' form-encode to %3A / %2C in the value
    start_s = start.cast("string")
    arc = F.concat(
        F.lit("arc_id%3Asrp_"),
        F.substring(F.md5(F.concat(query, F.lit("|"), start_s)), 1, 23),
        F.lit("_1"),
        # JS padStart(2,'0') never truncates (start=100 -> '100'); lpad does
        F.when(F.length(start_s) < 2, F.lpad(start_s, 2, "0")).otherwise(start_s),
        F.lit("%2Cuse_ac%3Atrue%2C_fmt%3Aprog"),
    )
    tbs = (
        F.lit("")
        if time_range is None
        else F.coalesce(
            F.concat(F.lit("&tbs=qdr%3A"), _lit_map(TIME_RANGE)[time_range]),
            F.lit(""),
        )
    )
    safe = F.when(
        safe_search.isNotNull(),
        F.concat(
            F.lit("&safe="),
            F.coalesce(_lit_map(SAFE_SEARCH)[safe_search], F.lit("medium")),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("https://"), domain, F.lit("/search?q="),
        F.url_encode(query),
        F.lit("&start="), start.cast("string"),
        F.lit("&hl="), lang_code, F.lit("-"), resolved_country,
        F.lit("&lr="), eng_lang,
        F.lit("&cr=country"), resolved_country,
        F.lit("&ie=utf8&oe=utf8&filter=0&asearch=arc&async="), arc,
        F.when(
            limit.isNotNull() & (limit > 0),
            F.concat(F.lit("&num="), num.cast("string")),
        ).otherwise(F.lit("")),
        tbs,
        safe,
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


# One nullable-field union schema for web|images|news results — the Spark
# rendering of the reference's discriminated union (types.ts:6-57): web rows
# leave the image/news fields null, image rows fill imageUrl/width/height/
# thumbnail/format/filesize, news rows fill snippet/date/imageUrl.
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
        # images (ImageSearchResult, types.ts:25-33)
        T.StructField("image_url", T.StringType()),
        T.StructField("image_width", T.IntegerType()),
        T.StructField("image_height", T.IntegerType()),
        T.StructField("thumbnail_src", T.StringType()),
        T.StructField("img_format", T.StringType()),
        T.StructField("filesize", T.StringType()),
        # news (NewsSearchResult, types.ts:38-43)
        T.StructField("snippet", T.StringType()),
        T.StructField("date", T.StringType()),
    ]
)

_UNION_NULLS = {
    "image_url": None, "image_width": None, "image_height": None,
    "thumbnail_src": None, "img_format": None, "filesize": None,
    "snippet": None, "date": None,
}


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
                            **_UNION_NULLS,
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


# ---------------------------------------------------------------------------
# SearXNG engine (S12/X15/X16 parity with Searxng.ts)
# ---------------------------------------------------------------------------

import json
import re

# Searxng.ts:121 — [0-9] not \d: JS \d is ASCII-only, Python \d matches
# any Unicode digit (found by the parse differential fuzz)
_RESOLUTION_RE = re.compile(r"([0-9]+)\s*[×x]\s*([0-9]+)")


def _js_falsy(v) -> bool:
    """JS falsiness for JSON values: null/undefined, false, 0/-0/NaN, ''.
    Empty arrays and objects are TRUTHY in JS where Python's `or` treats
    them falsy — the parse kernels must use this to match `item.url ||`
    style coalescing on adversarial payloads (node fuzz)."""
    return (
        v is None
        or v is False
        or v == ""
        or (isinstance(v, (int, float)) and not isinstance(v, bool)
            and (v == 0 or v != v))
    )


def _js_or(v, default):
    """JS ``v || default``."""
    return default if _js_falsy(v) else v

# sources -> SearXNG category param (Searxng.ts:51-58)
SEARXNG_CATEGORY = {"web": "general", "images": "images", "news": "news"}


def _js_truthy_str(c: F.Column) -> F.Column:
    """JS string truthiness for optional params: non-null AND non-empty
    (`if (options.lang)` skips '' where an isNotNull check would not)."""
    return c.isNotNull() & (c != "")


def searxng_build_url(
    query: F.Column,
    page: F.Column,
    lang: F.Column | None = None,
    sources: F.Column | None = None,
    time_range: F.Column | None = None,
    safe_search: F.Column | None = None,
    categories: F.Column | None = None,
    base_url: str = "http://searxng.synth",
) -> F.Column:
    """SearXNG search-URL building as column math (Searxng.ts:38-71):
    q + format=json + 1-based pageno, optional language / categories /
    time_range / safesearch. Byte-exact details (node fuzz): values are
    form-urlencoded (URLSearchParams), optional string params use JS
    truthiness (empty string = absent), a TRUTHY-but-unmapped ``sources``
    appends nothing and does NOT fall through to the ``categories``
    backward-compat passthrough (ts:51-58 else-if)."""
    url = F.concat(
        F.lit(base_url.rstrip("/")), F.lit("/search?q="),
        F.url_encode(query),
        F.lit("&format=json&pageno="), page.cast("string"),
    )
    if lang is not None:
        url = F.concat(url, F.when(
            _js_truthy_str(lang), F.concat(F.lit("&language="), F.url_encode(lang))
        ).otherwise(F.lit("")))
    cat_passthrough = (
        F.when(
            _js_truthy_str(categories),
            F.concat(F.lit("&categories="), F.url_encode(categories)),
        ).otherwise(F.lit(""))
        if categories is not None
        else F.lit("")
    )
    if sources is not None:
        mapped = _lit_map(SEARXNG_CATEGORY)[sources]
        url = F.concat(url, F.when(
            _js_truthy_str(sources),
            F.coalesce(F.concat(F.lit("&categories="), mapped), F.lit("")),
        ).otherwise(cat_passthrough))
    else:
        url = F.concat(url, cat_passthrough)
    if time_range is not None:
        url = F.concat(url, F.when(
            _js_truthy_str(time_range),
            F.concat(F.lit("&time_range="), F.url_encode(time_range)),
        ).otherwise(F.lit("")))
    if safe_search is not None:
        url = F.concat(url, F.when(
            safe_search.isNotNull(),
            F.concat(F.lit("&safesearch="), safe_search.cast("string")),
        ).otherwise(F.lit("")))
    return url


def searxng_json(query: str, page: int, category: str = "web", n_hosts: int = 50) -> str:
    """Deterministic synthetic SearXNG JSON response (the fixture analog of
    ``serp_html``): emits the upstream field names (url/title/content/engine/
    category, plus resolution/img_src/thumbnail_src/img_format/filesize/
    positions for images and publishedDate/thumbnail for news) so the parser
    exercises the real mapping."""
    items = []
    for i in range(RESULTS_PER_PAGE):
        rank = (page - 1) * RESULTS_PER_PAGE + i
        d = _digest("searxng", query, category, rank)
        host = host_name(d % n_hosts)
        item = {
            "url": f"http://{host}/p/{d % 37}",
            "title": f"Result {rank} for {query}",
            "content": f"Content {rank} about {query} on {host}",
            "engine": ["duckduckgo", "brave", "qwant"][d % 3],
            "category": {"web": "general"}.get(category, category),
        }
        if category == "images":
            item["category"] = "images"
            item["resolution"] = f"{640 + d % 1280}×{480 + (d >> 8) % 720}"
            item["img_src"] = f"http://{host}/img/{d % 97}.jpg"
            item["thumbnail_src"] = f"http://{host}/thumb/{d % 97}.jpg"
            item["img_format"] = ["jpeg", "png", "webp"][d % 3]
            item["filesize"] = f"{(d % 900) + 100}.{d % 100:02d} KB"
            item["positions"] = [rank + 1]
        elif category == "news":
            item["category"] = "news"
            item["publishedDate"] = f"2026-{1 + d % 12:02d}-{1 + d % 28:02d}"
            item["thumbnail"] = f"http://{host}/news-thumb/{d % 97}.jpg"
        items.append(item)
    # one no-url suggestion item the parser must skip (Searxng.ts:113-115)
    items.append({"title": f"suggestion for {query}", "content": "no url here"})
    return json.dumps({"query": query, "results": items})


def parse_searxng_results(response: str | dict) -> list[dict]:
    """SearXNG JSON -> union rows (field mapping parity, Searxng.ts:103-181):
    content|snippet coalesce, 'SearXNG (<engine>)' source, resolution parsed
    to width/height, positions[0], publishedDate|pubdate, category fallback
    to web; items without url are skipped."""
    data = json.loads(response) if isinstance(response, str) else response
    results = []
    items = data.get("results") if isinstance(data, dict) else None
    if not isinstance(items, list):
        return results
    for item in items:
        if item is None:
            # `item.url` on null throws in JS; the outer catch discards
            # the WHOLE response (Searxng.ts:175-178 — code review)
            return []
        if not isinstance(item, dict) or _js_falsy(item.get("url")):
            continue  # non-null primitives read `.url` as undefined
        category = _js_or(item.get("category"), "web")
        base = {
            "title": _js_or(item.get("title"), ""),
            "url": _js_or(item.get("url"), ""),
            "description": _js_or(
                item.get("content"), _js_or(item.get("snippet"), "")
            ),
            "source": f"SearXNG ({_js_string(_js_or(item.get('engine'), 'unknown'))})",
            **_UNION_NULLS,
        }
        if category == "images":
            w = h = None
            if not _js_falsy(item.get("resolution")):
                if not isinstance(item["resolution"], str):
                    # `.match` on a non-string throws in JS; the reference's
                    # outer catch (ts:175-178) then discards the WHOLE
                    # response — one malformed item nukes every result
                    return []
                m = _RESOLUTION_RE.search(item["resolution"])
                if m:
                    w, h = int(m.group(1)), int(m.group(2))
            pos = item.get("positions")
            results.append({
                **base, "category": "images",
                "image_url": item.get("img_src"),
                "image_width": w, "image_height": h,
                "position": pos[0] if isinstance(pos, list) and pos else None,
                "thumbnail_src": item.get("thumbnail_src"),
                "img_format": item.get("img_format"),
                "filesize": item.get("filesize"),
            })
        elif category == "news":
            results.append({
                **base, "category": "news",
                "snippet": _js_or(
                    item.get("content"), _js_or(item.get("snippet"), "")
                ),
                "date": _js_or(item.get("publishedDate"), item.get("pubdate")),
                "image_url": _js_or(item.get("thumbnail"), None),
                "position": None,
            })
        else:
            results.append({**base, "category": "web", "position": None})
    return results


# ---------------------------------------------------------------------------
# AC-Engine (direct-limit JSON API, ACEngine.ts:23-118)
# ---------------------------------------------------------------------------

def ac_build_url(
    query: F.Column,
    limit: F.Column | None = None,
    page: F.Column | None = None,
    offset: F.Column | None = None,
    lang: F.Column | None = None,
    country: F.Column | None = None,
    time_range: F.Column | None = None,
    safe_search: F.Column | None = None,
    sources: F.Column | None = None,
    base_url: str = "http://ac-engine.synth",
) -> F.Column:
    """AC-Engine URL building (ACEngine.ts:23-44): q + start + limit (limit
    wins when finite and >0, else page*10 when page>0) + lang/country/
    timeRange/safe_search/sources passthrough. Byte-exact details (node
    fuzz): a falsy query omits the q param entirely; ``offset`` defaults
    to 0 only when ABSENT (an explicit null omits start — destructure
    defaults don't fire on null); params join in insertion order with
    URLSearchParams encoding; limit<=0 falls through to the page branch."""
    q_seg = F.when(_js_truthy_str(query), F.concat(F.lit("q="), F.url_encode(query)))
    if offset is None:
        offset = F.lit(0)  # ts:24 `offset = 0` destructure default
    start_seg = F.when(
        offset.isNotNull(), F.concat(F.lit("start="), offset.cast("string"))
    )
    eff = F.when(limit.isNotNull() & (limit > 0), limit) if limit is not None else F.lit(None)
    if page is not None:
        eff = F.coalesce(eff, F.when(page.isNotNull() & (page > 0), page * F.lit(RESULTS_PER_PAGE)))
    limit_seg = F.when(eff.isNotNull(), F.concat(F.lit("limit="), eff.cast("string")))

    def _opt(col, name, numeric=False):
        if col is None:
            return F.lit(None).cast("string")
        if numeric:  # safe_search: undefined/null check, not truthiness
            return F.when(col.isNotNull(), F.concat(F.lit(name + "="), col.cast("string")))
        return F.when(_js_truthy_str(col), F.concat(F.lit(name + "="), F.url_encode(col)))

    return F.concat(
        F.lit(base_url.rstrip("/")), F.lit("/search?"),
        F.concat_ws(
            "&", q_seg, start_seg, limit_seg,
            _opt(lang, "lang"), _opt(country, "country"),
            _opt(time_range, "timeRange"),
            _opt(safe_search, "safe_search", numeric=True),
            _opt(sources, "sources"),
        ),
    )


def ac_json(query: str, limit: int, category: str = "web", n_hosts: int = 50) -> str:
    """Deterministic synthetic AC-Engine JSON (direct-limit: all results in
    one response)."""
    items = []
    for rank in range(limit):
        d = _digest("ac", query, category, rank)
        host = host_name(d % n_hosts)
        item = {
            "url": f"http://{host}/p/{d % 37}",
            "title": f"Result {rank} for {query}",
            "description": f"Description {rank} about {query}",
            "source": "AC-Engine",
            "category": category,
        }
        if category == "images":
            item.update(imageUrl=f"http://{host}/img/{d % 97}.jpg",
                        imageWidth=640 + d % 1280, imageHeight=480 + (d >> 8) % 720,
                        position=rank + 1,
                        thumbnail_src=f"http://{host}/thumb/{d % 97}.jpg",
                        img_format=["jpeg", "png", "webp"][d % 3],
                        filesize=f"{(d % 900) + 100} KB")
        elif category == "news":
            item.update(snippet=f"Snippet {rank} about {query}",
                        date=f"2026-{1 + d % 12:02d}-{1 + d % 28:02d}",
                        imageUrl=f"http://{host}/news-thumb/{d % 97}.jpg")
        items.append(item)
    return json.dumps({"results": items})


def parse_ac_results(response: str | dict) -> list[dict]:
    """AC-Engine JSON -> union rows (ACEngine.ts:63-114): direct field names,
    description|snippet coalesce, source fallback 'AC-Engine', no-url skip,
    category fallback to web."""
    data = json.loads(response) if isinstance(response, str) else response
    raw = data.get("results") if isinstance(data, dict) else None
    items = raw if isinstance(raw, list) else []
    results = []
    for item in items:
        if item is None:
            return []  # `item.category` throws on null -> catch -> []
        if not isinstance(item, dict) or _js_falsy(item.get("url")):
            continue
        category = _js_or(item.get("category"), "web")
        base = {
            "title": _js_or(item.get("title"), ""),
            "url": _js_or(item.get("url"), ""),
            "description": _js_or(
                item.get("description"), _js_or(item.get("snippet"), "")
            ),
            "source": _js_or(item.get("source"), "AC-Engine"),
            **_UNION_NULLS,
        }
        if category == "images":
            results.append({
                **base, "category": "images",
                "image_url": item.get("imageUrl"),
                "image_width": item.get("imageWidth"),
                "image_height": item.get("imageHeight"),
                "position": item.get("position"),
                "thumbnail_src": item.get("thumbnail_src"),
                "img_format": item.get("img_format"),
                "filesize": item.get("filesize"),
            })
        elif category == "news":
            results.append({
                **base, "category": "news",
                "snippet": item.get("snippet"),
                "date": item.get("date"),
                "image_url": item.get("imageUrl"),
                "position": None,
            })
        else:
            results.append({**base, "category": "web", "position": None})
    return results


# engine registry: name -> (supports_direct_limit, fixture fn, parse fn)
# (SearchService.ts:210-219: direct-limit engines fetch ONE page; others
# fetch ceil(limit/10) pages)
ENGINES = {
    "google": {"supports_direct_limit": False},
    "searxng": {"supports_direct_limit": False},
    "ac": {"supports_direct_limit": True},
}


def fetch_and_parse_json(serp_requests: DataFrame, engine: str, sources: str = "web") -> DataFrame:
    """(query_id, query, page[, limit]) -> union SERP rows via the JSON-API
    engines (SearXNG page-wise; AC-Engine direct-limit)."""
    direct = ENGINES[engine]["supports_direct_limit"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if engine == "searxng":
                    # SearXNG pageno is 1-based (Searxng.ts:41)
                    payload = searxng_json(r.query, r.page + 1, sources)
                    parsed = parse_searxng_results(payload)
                else:
                    payload = ac_json(r.query, int(r.limit), sources)
                    parsed = parse_ac_results(payload)
                for i, res in enumerate(parsed):
                    # **res first: web/news rows carry position=None which must
                    # NOT clobber the computed page-offset position (images keep
                    # their fixture-reported 1-based position, like the Google
                    # path keeps DOM positions).
                    row = {**res, "query_id": r.query_id, "page": r.page}
                    if res.get("position") is None:
                        row["position"] = (0 if direct else r.page * RESULTS_PER_PAGE) + i
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in _PARSED.fields])

    cols = ["query_id", "query", "page"] + (["limit"] if direct else [])
    return serp_requests.select(*cols).mapInPandas(batches, schema=_PARSED)


def serp_search_engine(queries: DataFrame, engine: str = "google", sources: str = "web") -> DataFrame:
    """Engine-dispatching SERP flow (SearchService.ts:196-245): effectivePages
    = 1 for direct-limit engines else ceil(limit/10); union-schema output;
    final (page, position) slice to limit."""
    from pyspark.sql import Window

    if engine == "google":
        return serp_search(queries)
    if ENGINES[engine]["supports_direct_limit"]:
        reqs = queries.withColumn("page", F.lit(0))
        results = fetch_and_parse_json(reqs, engine, sources)
    else:
        pages = F.ceil(F.col("limit") / F.lit(RESULTS_PER_PAGE)).cast("int")
        reqs = queries.withColumn("page", F.explode(F.sequence(F.lit(0), pages - 1)))
        results = fetch_and_parse_json(reqs, engine, sources)
    w = Window.partitionBy("query_id").orderBy("page", "position")
    limits = F.broadcast(queries.select("query_id", F.col("limit").alias("_limit")))
    return (
        results.withColumn("rank", F.row_number().over(w))
        .join(limits, "query_id")
        .filter(F.col("rank") <= F.col("_limit"))
        .drop("_limit")
    )


# --- engine resolution / graceful fallback (SearchService.ts:44-178) --------
#
# The reference resolves the *requested* engine name against env-driven
# config before dispatch: unknown/unconfigured engines fall back to the
# default, 'default'/empty map to the default, and when exactly ONE engine
# is enabled it is forced regardless of the (valid) request. Two reference
# quirks are reproduced faithfully because callers can observe them:
# - the enabled-list membership test uses the RAW configured strings against
#   the normalized request (SearchService.ts:167 `includes(normalizedEngine)`),
#   so a capitalized entry like 'Google' never matches;
# - single-engine forcing returns the configured string VERBATIM
#   (SearchService.ts:161), and the valid configured default is returned raw
#   by getDefaultEngine (SearchService.ts:49-54) while the multi-engine
#   fallback lowercases it (SearchService.ts:171).

KNOWN_SEARCH_ENGINES = ("google", "searxng", "ac-engine")


@dataclass(frozen=True)
class SearchEngineConfig:
    """Env-driven engine config (ANYCRAWL_SEARCH_DEFAULT_ENGINE,
    ANYCRAWL_SEARCH_ENABLED_ENGINES, ANYCRAWL_SEARXNG_URL,
    ANYCRAWL_AC_ENGINE_URL — SearchService.ts:24-31)."""

    default_engine: str | None = None
    enabled_engines: tuple[str, ...] = ()
    searxng_url: str | None = None
    ac_engine_url: str | None = None


def _is_valid_engine(name: str, cfg: SearchEngineConfig) -> bool:
    """google always; searxng/ac-engine only with a URL (SearchService.ts:73-89)."""
    n = name.lower()
    if n == "google":
        return True
    if n == "searxng":
        return bool(cfg.searxng_url)
    if n == "ac-engine":
        return bool(cfg.ac_engine_url)
    return False


def available_engines(cfg: SearchEngineConfig) -> list[str]:
    """Enabled∩known (or all known), filtered by validity (SearchService.ts:95-101)."""
    known = list(KNOWN_SEARCH_ENGINES)
    cand = (
        [e.lower() for e in cfg.enabled_engines if e.lower() in known]
        if cfg.enabled_engines
        else known
    )
    return [e for e in cand if _is_valid_engine(e, cfg)]


def default_engine(cfg: SearchEngineConfig) -> str:
    """Configured default if valid (returned RAW), else first available,
    else 'google' (SearchService.ts:48-66)."""
    requested = cfg.default_engine or "google"
    if _is_valid_engine(requested, cfg):
        return requested
    avail = available_engines(cfg)
    return avail[0] if avail else "google"


def resolve_engine(requested: str | None, cfg: SearchEngineConfig) -> str:
    """Python mirror of SearchService.resolveEngine (ts:108-178)."""
    if not requested:
        return default_engine(cfg)
    norm = requested.lower().strip()
    if not norm or norm == "default" or not _is_valid_engine(norm, cfg):
        return default_engine(cfg)
    if cfg.default_engine and cfg.enabled_engines:
        if len(cfg.enabled_engines) == 1:
            return cfg.enabled_engines[0]  # forced verbatim (ts:161)
        if norm in cfg.enabled_engines:  # RAW-list membership (ts:167)
            return norm
        return cfg.default_engine.lower()  # lowercased here (ts:171)
    return norm


def resolve_engine_expr(col: F.Column, cfg: SearchEngineConfig) -> F.Column:
    """Column-level resolver: the config branches are plan-time constants,
    only normalization/validity/membership are per-row — pure JVM exprs."""
    valid = [e for e in KNOWN_SEARCH_ENGINES if _is_valid_engine(e, cfg)]
    dflt = default_engine(cfg)
    norm = F.lower(F.trim(col))
    to_default = (
        col.isNull() | (norm == "") | (norm == "default") | ~norm.isin(valid)
    )
    if cfg.default_engine and cfg.enabled_engines:
        if len(cfg.enabled_engines) == 1:
            use = F.lit(cfg.enabled_engines[0])
        else:
            use = F.when(norm.isin(list(cfg.enabled_engines)), norm).otherwise(
                F.lit(cfg.default_engine.lower())
            )
    else:
        use = norm
    return F.when(to_default, F.lit(dflt)).otherwise(use)
