"""Credit calculation (X17): the reference's CreditCalculator, exactly.

Mirrors packages/libs/src/credits.ts — proxy-mode resolution (:39-58),
stealth proxy credits (:66-72), JSON-extraction credits with the
extract_source='html' doubling (:78-90), the scrape/crawl/search totals
(:96-139), and the pre-execution task estimate with template perCall
pricing (apps/api side, credits.ts:160-205). The env knobs
(ANYCRAWL_PROXY_STEALTH_URL/_CREDITS, ANYCRAWL_EXTRACT_JSON_CREDITS) are
explicit ``CreditEnv`` fields so the kernels stay pure and testable.

Two forms, same semantics:
- python kernels (driver-side request accounting, one call per API request —
  the reference's DeductCreditsMiddleware shape);
- ``scrape_credits_expr`` — the same formula as a pure column expression for
  charging a TABLE of requests in one JVM pass (the 100 TB shape: per-page
  crawl credits are a column over the documents table, credits.ts:119-121).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from anycrawl_spark.functions.js import js_parse_int_number, js_trim


def _js_truthy(v: object) -> bool:
    """JS truthiness for payload fields: None/False/0/'' are falsy; empty
    containers ({} and []) are TRUTHY, unlike python."""
    return not (v is None or v is False or v == 0 or v == "")


def _js_get(obj: object, key: str) -> object:
    """JS property access ``obj.key`` for payload values: dicts read the key,
    null/undefined THROW (the reference relies on this — estimateTaskCredits
    catches it and bills 1), any other primitive yields undefined (None)."""
    if obj is None:
        raise TypeError(f"Cannot read properties of null (reading '{key}')")
    if isinstance(obj, dict):
        return obj.get(key)
    return None


def _js_opt_get(obj: object, key: str) -> object:
    """JS optional chaining ``obj?.key``: like _js_get but null-safe."""
    return None if obj is None else _js_get(obj, key)


def _js_spread(v: object) -> dict:
    """JS object spread ``{...v}``: dicts copy; strings/arrays contribute
    index keys ('0', '1', ...); null/undefined and other primitives spread
    to nothing — NEVER a throw (unlike python ``{**v}``)."""
    if isinstance(v, dict):
        return dict(v)
    if isinstance(v, (str, list)):
        return {str(i): x for i, x in enumerate(v)}
    return {}


@dataclass(frozen=True)
class CreditEnv:
    """ANYCRAWL_PROXY_STEALTH_URL (csv), _STEALTH_CREDITS, _EXTRACT_JSON_CREDITS.

    The credit knobs are ``int | float`` because the reference reads them with
    ``Number.parseInt`` (credits.ts:70,79): a non-numeric env value is NaN,
    which the JSON knob guards with Number.isFinite but the stealth surcharge
    does NOT — a misconfigured stealth knob makes every stealth charge NaN,
    and that propagation is part of the observable surface."""

    stealth_proxy_urls: tuple[str, ...] = ()
    stealth_credits: int | float = 2      # credits.ts:70 default '2'
    extract_json_credits: int | float = 0  # credits.ts:79 default '0'


def credit_env_from_env(env: dict[str, str | None]) -> CreditEnv:
    """Build a CreditEnv from raw env-var strings, mirroring credits.ts
    exactly: the URL list is split(','), JS-trimmed, filter(Boolean)
    (credits.ts:50); each credit knob is ``Number.parseInt(value || default,
    10)`` so empty/missing falls to the default and garbage parses to NaN."""
    urls = tuple(
        t
        for t in (
            js_trim(p)
            for p in (env.get("ANYCRAWL_PROXY_STEALTH_URL") or "").split(",")
        )
        if t
    )
    return CreditEnv(
        stealth_proxy_urls=urls,
        stealth_credits=js_parse_int_number(
            env.get("ANYCRAWL_PROXY_STEALTH_CREDITS") or "2"
        ),
        extract_json_credits=js_parse_int_number(
            env.get("ANYCRAWL_EXTRACT_JSON_CREDITS") or "0"
        ),
    )


def resolved_proxy_mode(proxy: str | None, env: CreditEnv = CreditEnv()) -> str:
    """'base' | 'stealth' | 'custom' (credits.ts:39-58); 'auto' resolves to
    stealth only when stealth proxy URLs are configured."""
    if not proxy or proxy == "base":
        return "base"
    if proxy == "stealth":
        return "stealth"
    if proxy == "auto":
        return "stealth" if env.stealth_proxy_urls else "base"
    return "custom"


def proxy_credits(proxy: str | None, env: CreditEnv = CreditEnv()) -> int:
    """Stealth surcharge; base/custom are free (credits.ts:66-72)."""
    return env.stealth_credits if resolved_proxy_mode(proxy, env) == "stealth" else 0


def json_extraction_credits(
    json_options: object | None,
    formats: list[str] | None,
    extract_source: str | None,
    env: CreditEnv = CreditEnv(),
) -> int:
    """Extra credits when JSON extraction runs; doubled for extract_source=
    'html' (credits.ts:78-90). Requires BOTH json_options and 'json' in
    formats, and a positive FINITE configured credit value — the reference
    guards this knob with Number.isFinite (credits.ts:83), so a NaN env
    value charges 0 here (unlike the unguarded stealth knob). json_options
    goes through JS Boolean() semantics (credits.ts:82): an empty object {}
    is truthy there, so it must charge here too (python bool({}) would not)."""
    has = _js_truthy(json_options) and bool(formats) and "json" in formats
    if not has or not math.isfinite(env.extract_json_credits) or env.extract_json_credits <= 0:
        return 0
    source = extract_source or "markdown"
    return env.extract_json_credits * 2 if source == "html" else env.extract_json_credits


def scrape_credits(
    proxy: str | None = None,
    json_options: object | None = None,
    formats: list[str] | None = None,
    extract_source: str | None = None,
    env: CreditEnv = CreditEnv(),
) -> int:
    """1 (base) + proxy + JSON extraction (credits.ts:96-103)."""
    return 1 + proxy_credits(proxy, env) + json_extraction_credits(
        json_options, formats, extract_source, env
    )


def crawl_initial_credits(proxy: str | None = None, env: CreditEnv = CreditEnv()) -> int:
    """First-page charge: 1 + proxy; per-page JSON credits are charged as
    pages complete (credits.ts:109-115 — "calculated per-page in Progress")."""
    return 1 + proxy_credits(proxy, env)


# per crawl page the formula IS the scrape formula (credits.ts:119-121)
crawl_page_credits = scrape_credits


def search_credits(
    pages: int | None = None,
    scrape_options: dict | None = None,
    completed_scrape_count: int | None = None,
    env: CreditEnv = CreditEnv(),
) -> int:
    """pages + completed-scrapes x per-scrape credits (credits.ts:127-139)."""
    page_credits = pages if pages is not None else 1
    # JS truthiness: an EMPTY scrape_options object still counts as present,
    # while false/0/'' do not (credits.ts:131)
    if (
        not _js_truthy(scrape_options)
        or not completed_scrape_count
        or completed_scrape_count <= 0
    ):
        return page_credits
    so = scrape_options if isinstance(scrape_options, dict) else {}
    per = scrape_credits(
        so.get("proxy"),
        so.get("json_options"),
        so.get("formats"),
        so.get("extract_source"),
        env,
    )
    return page_credits + completed_scrape_count * per


def estimate_task_credits(
    task_type: str,
    payload: dict | None,
    template: dict | None = None,
) -> int:
    """Pre-execution minimum-credit estimate (credits.ts:160-205): template
    resolution overrides the task type, merges reqOptions UNDER the payload,
    and adds pricing.perCall; scrape=1, search=pages(+limit if scraping),
    crawl=limit (payload.limit, else payload.options.limit, else 10).

    Payload access uses JS property semantics (_js_get): with no template, a
    null payload on the search/crawl branches THROWS in the reference
    (``actualPayload.pages`` on null) and the catch bills 1 — while the
    scrape branch never touches the payload and bills normally.  A template
    is detected by JS truthiness ({} counts, credits.ts:177) and its merge
    ``{...reqOptions, ...payload}`` spreads a null/primitive payload to
    nothing.  Found by differential fuzz vs credits.ts under node."""
    try:
        template_credits = 0
        actual_type, actual = task_type, payload
        if _js_truthy(template):
            actual_type = _js_get(template, "templateType") or task_type
            actual = {
                **_js_spread(_js_get(template, "reqOptions") or {}),
                **_js_spread(payload),
            }
            template_credits = _js_opt_get(_js_get(template, "pricing"), "perCall") or 0
        if actual_type == "scrape":
            base = 1
        elif actual_type == "search":
            base = _js_get(actual, "pages") or 1
            # JS truthiness: {} counts as present, false/0/'' do not (ts:186)
            if _js_truthy(_js_get(actual, "scrape_options")):
                base += _js_get(actual, "limit") or 10
        elif actual_type == "crawl":
            base = (
                _js_get(actual, "limit")
                or _js_opt_get(_js_get(actual, "options"), "limit")
                or 10
            )
        else:
            base = 1
        return base + template_credits
    except Exception:
        return 1  # credits.ts:202-204: estimation must never fail the request


def scrape_credits_expr(
    proxy: Column,
    has_json_options: Column,
    formats: Column,
    extract_source: Column,
    env: CreditEnv = CreditEnv(),
) -> Column:
    """The scrape-credit formula over a table of requests — pure JVM column
    math (no UDF), for charging crawl pages / batch scrapes at scale.
    ``formats`` is an array<string> column; NULL extract_source = 'markdown'."""
    stealth = F.lit(env.stealth_credits)
    mode_stealth = (proxy == "stealth") | (
        (proxy == "auto") & F.lit(bool(env.stealth_proxy_urls))
    )
    p = F.when(mode_stealth, stealth).otherwise(F.lit(0))
    has_json = (
        has_json_options
        & formats.isNotNull()
        & F.array_contains(formats, "json")
        & F.lit(env.extract_json_credits > 0)
    )
    base_json = F.lit(env.extract_json_credits)
    j = F.when(
        has_json,
        F.when(F.coalesce(extract_source, F.lit("markdown")) == "html", base_json * 2)
        .otherwise(base_json),
    ).otherwise(F.lit(0))
    return (F.lit(1) + p + j).alias("credits")
