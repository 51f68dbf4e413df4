"""CreditCalculator parity (X17, packages/libs/src/credits.ts): proxy-mode
resolution, stealth surcharge, JSON-extraction credits with the html
doubling, scrape/crawl/search totals, task estimation with template perCall —
plus the column-expression form agreeing with the python mirror."""

import pandas as pd
from pyspark.sql import functions as F

from anycrawl_spark.functions.credits import (
    CreditEnv,
    crawl_initial_credits,
    crawl_page_credits,
    estimate_task_credits,
    json_extraction_credits,
    proxy_credits,
    resolved_proxy_mode,
    scrape_credits,
    scrape_credits_expr,
    search_credits,
)

STEALTH = CreditEnv(stealth_proxy_urls=("http://p1", "http://p2"))
JSON3 = CreditEnv(extract_json_credits=3)
BOTH = CreditEnv(stealth_proxy_urls=("http://p1",), extract_json_credits=3)


def test_proxy_mode_resolution():
    # credits.ts:39-58 — 'auto' is stealth ONLY when stealth URLs configured
    for proxy, env, want in [
        (None, CreditEnv(), "base"),
        ("", CreditEnv(), "base"),
        ("base", STEALTH, "base"),
        ("stealth", CreditEnv(), "stealth"),
        ("auto", STEALTH, "stealth"),
        ("auto", CreditEnv(), "base"),
        ("http://my.proxy:8080", STEALTH, "custom"),
    ]:
        assert resolved_proxy_mode(proxy, env) == want, (proxy, env)
    assert proxy_credits("stealth") == 2  # default surcharge (ts:70)
    assert proxy_credits("stealth", CreditEnv(stealth_credits=5)) == 5
    assert proxy_credits("http://custom", STEALTH) == 0  # custom is free


def test_json_extraction_credits():
    # credits.ts:78-90 — needs json_options AND 'json' format AND credits>0
    schema = {"type": "object"}
    assert json_extraction_credits(schema, ["json"], None, JSON3) == 3
    assert json_extraction_credits(schema, ["json"], "html", JSON3) == 6  # doubled
    assert json_extraction_credits(schema, ["json"], "markdown", JSON3) == 3
    assert json_extraction_credits(schema, ["markdown"], None, JSON3) == 0
    assert json_extraction_credits(None, ["json"], None, JSON3) == 0
    assert json_extraction_credits(schema, ["json"], "html", CreditEnv()) == 0
    # JS Boolean({}) is true (credits.ts:82): an EMPTY json_options object
    # still charges — python bool({}) would skip it (ADVICE r3)
    assert json_extraction_credits({}, ["json"], None, JSON3) == 3


def test_scrape_crawl_totals():
    # scrape = 1 + proxy + json (ts:96-103); crawl initial = 1 + proxy (ts:109)
    assert scrape_credits() == 1
    assert scrape_credits("stealth", env=STEALTH) == 3
    assert scrape_credits("auto", {"s": 1}, ["json"], "html", BOTH) == 1 + 2 + 6
    assert crawl_initial_credits("stealth", STEALTH) == 3
    assert crawl_initial_credits("auto", CreditEnv()) == 1  # auto->base, no urls
    assert crawl_page_credits("base", {"s": 1}, ["json"], None, JSON3) == 4


def test_search_credits():
    # pages + completed x per-scrape (ts:127-139); ?? semantics: pages=0 stays 0
    assert search_credits() == 1
    assert search_credits(pages=3) == 3
    assert search_credits(pages=0) == 0
    # {} is truthy in JS: an empty scrape_options still charges per scrape
    assert search_credits(pages=2, scrape_options={}, completed_scrape_count=5) == 7
    so = {"proxy": "stealth", "json_options": {"x": 1}, "formats": ["json"]}
    assert search_credits(2, so, 5, BOTH) == 2 + 5 * (1 + 2 + 3)
    assert search_credits(2, so, 0, BOTH) == 2


def test_estimate_task_credits():
    # credits.ts:160-205 — template overrides type, reqOptions merge UNDER
    # payload, perCall added; crawl limit fallback chain; JS || semantics
    assert estimate_task_credits("scrape", {}) == 1
    assert estimate_task_credits("search", {"pages": 3}) == 3
    assert estimate_task_credits("search", {"pages": 0}) == 1  # || 1
    assert estimate_task_credits("search", {"pages": 2, "scrape_options": {}, "limit": 7}) == 9
    assert estimate_task_credits("search", {"pages": 2, "scrape_options": {}}) == 12  # limit||10
    assert estimate_task_credits("crawl", {"limit": 25}) == 25
    assert estimate_task_credits("crawl", {"options": {"limit": 4}}) == 4
    assert estimate_task_credits("crawl", {}) == 10
    assert estimate_task_credits("other", {}) == 1
    tpl = {"templateType": "crawl", "reqOptions": {"limit": 50},
           "pricing": {"perCall": 2}}
    # template type wins, payload overrides reqOptions, perCall added
    assert estimate_task_credits("scrape", {}, tpl) == 52
    assert estimate_task_credits("scrape", {"limit": 5}, tpl) == 7
    assert estimate_task_credits("scrape", {}, {"pricing": {}}) == 1


def test_expr_matches_mirror(spark):
    proxies = [None, "base", "stealth", "auto", "http://custom"]
    rows = []
    for p in proxies:
        for has_json in (True, False):
            for fmts in (["json"], ["markdown"], ["markdown", "json"], None):
                for src in (None, "html", "markdown"):
                    rows.append((p, has_json, fmts, src))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["proxy", "has_json", "formats", "src"])
    )
    for env in (CreditEnv(), STEALTH, JSON3, BOTH):
        got = df.select(
            "proxy", "has_json", "formats", "src",
            scrape_credits_expr(
                F.col("proxy"), F.col("has_json"), F.col("formats"), F.col("src"), env
            ),
        ).collect()
        for r in got:
            want = scrape_credits(
                r.proxy, {"x": 1} if r.has_json else None, r.formats, r.src, env
            )
            assert r.credits == want, (r, env)


def test_js_falsy_scrape_options():
    """false/0/'' scrape_options are ABSENT (JS truthiness), never a crash."""
    for falsy in (False, 0, ""):
        assert search_credits(2, falsy, 5) == 2
        assert estimate_task_credits("search", {"pages": 2, "scrape_options": falsy}) == 2
    # non-dict truthy value: per-scrape fields all read as undefined -> base 1
    assert search_credits(2, "yes", 5) == 2 + 5 * 1
