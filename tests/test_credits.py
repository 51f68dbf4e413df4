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


def test_env_parsing_and_nan_propagation():
    """credit_env_from_env mirrors credits.ts env handling; each case below
    was a class of divergence the node fuzz exposed (pinned node-free)."""
    # parseInt('abc') -> NaN: the stealth surcharge is UNGUARDED, so a
    # stealth scrape bills NaN total; the JSON knob is isFinite-guarded -> 0
    env = credit_env_from_env({"ANYCRAWL_PROXY_STEALTH_CREDITS": "abc",
                               "ANYCRAWL_EXTRACT_JSON_CREDITS": "abc"})
    got = scrape_credits("stealth", {"x": 1}, ["json"], None, env)
    assert got != got  # NaN
    assert json_extraction_credits({"x": 1}, ["json"], None, env) == 0
    # '' falls to the default BEFORE parseInt ('' || '2'), NBSP is JS ws
    env = credit_env_from_env({"ANYCRAWL_PROXY_STEALTH_CREDITS": "",
                               "ANYCRAWL_EXTRACT_JSON_CREDITS": "\xa04"})
    assert scrape_credits("stealth", {}, ["json"], "html", env) == 1 + 2 + 8
    # URL list: split(',') + JS trim + filter(Boolean); ' , ' yields none
    assert credit_env_from_env(
        {"ANYCRAWL_PROXY_STEALTH_URL": " , "}).stealth_proxy_urls == ()
    assert credit_env_from_env(
        {"ANYCRAWL_PROXY_STEALTH_URL": "http://a, http://b"}
    ).stealth_proxy_urls == ("http://a", "http://b")
    # huge digit strings round like JS doubles (parseInt returns a Number)
    assert credit_env_from_env(
        {"ANYCRAWL_PROXY_STEALTH_CREDITS": "9" * 400}
    ).stealth_credits == float("inf")


def test_estimate_js_access_semantics():
    """Null-payload property access THROWS in the reference (caught -> 1);
    primitive payloads read as undefined; primitive reqOptions spread like
    JS objects. All found by the node differential fuzz."""
    assert estimate_task_credits("crawl", None) == 1     # null.limit throws
    assert estimate_task_credits("search", None) == 1    # null.pages throws
    assert estimate_task_credits("scrape", None) == 1    # payload untouched
    assert estimate_task_credits("crawl", 5) == 10       # (5).limit undefined
    # template={} is JS-TRUTHY: merge runs, so a null payload spreads to {}
    # and crawl falls through to the default limit instead of throwing
    assert estimate_task_credits("crawl", None, {}) == 10
    # primitive reqOptions: {...5} = {}, {...'x'} = index keys -> no throw
    assert estimate_task_credits(
        "crawl", {"pages": 2}, {"templateType": "crawl", "reqOptions": 5}) == 10
    assert estimate_task_credits(
        "search", {"pages": 100}, {"templateType": 0, "reqOptions": "x",
                                   "pricing": {"perCall": 1}}) == 101


def test_js_falsy_scrape_options():
    """false/0/'' scrape_options are ABSENT (JS truthiness), never a crash."""
    for falsy in (False, 0, ""):
        assert search_credits(2, falsy, 5) == 2
        assert estimate_task_credits("search", {"pages": 2, "scrape_options": falsy}) == 2
    # non-dict truthy value: per-scrape fields all read as undefined -> base 1
    assert search_credits(2, "yes", 5) == 2 + 5 * 1


# --- differential fuzz vs credits.ts under node ---
#
# The oracle is packages/libs/src/credits.ts itself (read from the reference
# checkout, type-stripped by tests/node_oracle), so JS semantics run
# verbatim: `??` vs `||` defaulting, Number.parseInt of env strings (NaN on
# garbage, double rounding on huge values), the Number.isFinite guard that
# protects the JSON knob but NOT the stealth surcharge, JS-truthy templates,
# and the null-payload property-access throw inside estimateTaskCredits.

import random  # noqa: E402

import pytest  # noqa: E402

from anycrawl_spark.functions.credits import credit_env_from_env  # noqa: E402
from node_oracle import have_node_oracle, run_reference_js  # noqa: E402

_CREDITS_TS = "packages/libs/src/credits.ts"

_CREDITS_DRIVER_JS = """
const enc = x => (typeof x === 'number' && !Number.isFinite(x))
    ? (Number.isNaN(x) ? 'NaN' : (x > 0 ? 'Infinity' : '-Infinity')) : x;
const data = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(data.map(c => {
    for (const k of ['ANYCRAWL_PROXY_STEALTH_URL',
                     'ANYCRAWL_PROXY_STEALTH_CREDITS',
                     'ANYCRAWL_EXTRACT_JSON_CREDITS']) delete process.env[k];
    for (const [k, v] of Object.entries(c.env || {})) process.env[k] = v;
    switch (c.kind) {
        case 'mode': return CreditCalculator.getResolvedProxyMode(c.proxy);
        case 'scrape': return enc(CreditCalculator.calculateScrapeCredits(c.options));
        case 'crawl_init': return enc(CreditCalculator.calculateCrawlInitialCredits(c.options));
        case 'search': return enc(CreditCalculator.calculateSearchCredits(c.options));
        case 'estimate': return enc(estimateTaskCredits(c.task_type, c.payload, c.opts));
    }
})));
"""

_ENV_VALS = [None, "", "2", "0", "5", "-3", " 7 ", "abc", "3.9", "0x10",
             "1e3", "9" * 400, "9" * 20, "\xa04", "\x1c4", "+6", "-0",
             "Infinity"]
_URL_VALS = [None, "", ",", " , ", "http://a, http://b", "\xa0x\xa0",
             ", ,", "\x1cx", "a,,b"]
_PROXY_VALS = [None, "", "base", "stealth", "auto", "http://custom:1", 0, 5,
               False, "BASE"]
_JSON_OPT_VALS = [None, {}, {"type": "object"}, [], 0, "", "x", False, True]
_FORMATS_VALS = [None, [], ["json"], ["markdown"], ["markdown", "json"],
                 "json", "", ["jso"], ["json", "json"]]
_SRC_VALS = [None, "", "html", "markdown", "HTML", 0]
_NUM_VALS = [None, 0, 1, 2, 3, -1, 2.5, 10, 0.0, -0.5, 100]


def _enc_py(x):
    if isinstance(x, float):
        if x != x:
            return "NaN"
        if x == float("inf"):
            return "Infinity"
        if x == float("-inf"):
            return "-Infinity"
        if x.is_integer():
            return int(x)  # JSON round-trip: 3.0 prints as 3
    return x


def _rand_env(rnd):
    env = {}
    for k, vals in (("ANYCRAWL_PROXY_STEALTH_URL", _URL_VALS),
                    ("ANYCRAWL_PROXY_STEALTH_CREDITS", _ENV_VALS),
                    ("ANYCRAWL_EXTRACT_JSON_CREDITS", _ENV_VALS)):
        v = rnd.choice(vals)
        if v is not None:
            env[k] = v
    return env


def _rand_scrape_options(rnd):
    opts = {}
    for k, vals in (("proxy", _PROXY_VALS), ("json_options", _JSON_OPT_VALS),
                    ("formats", _FORMATS_VALS), ("extract_source", _SRC_VALS)):
        if rnd.random() < 0.75:
            v = rnd.choice(vals)
            if v is not None or rnd.random() < 0.3:
                opts[k] = v
    return opts


def _rand_payload(rnd):
    if rnd.random() < 0.08:
        return rnd.choice([None, 5, "x", True])
    p = {}
    if rnd.random() < 0.7:
        p["pages"] = rnd.choice(_NUM_VALS)
    if rnd.random() < 0.7:
        p["limit"] = rnd.choice(_NUM_VALS)
    if rnd.random() < 0.6:
        p["scrape_options"] = rnd.choice(
            [_rand_scrape_options(rnd), {}, 0, "", False, "yes", 5, None])
    if rnd.random() < 0.4:
        p["options"] = rnd.choice([{"limit": rnd.choice(_NUM_VALS)}, {}, None, 3])
    return {k: v for k, v in p.items() if v is not None or rnd.random() < 0.4}


def _rand_template(rnd):
    if rnd.random() < 0.3:
        return rnd.choice([None, {}, 0, "", False, 5])
    t = {}
    if rnd.random() < 0.7:
        t["templateType"] = rnd.choice(
            ["scrape", "crawl", "search", "other", "", None, 0])
    if rnd.random() < 0.7:
        t["reqOptions"] = rnd.choice([_rand_payload(rnd), {}, None])
    if rnd.random() < 0.7:
        t["pricing"] = rnd.choice(
            [{"perCall": rnd.choice(_NUM_VALS)}, {}, None, 7])
    return {k: v for k, v in t.items() if v is not None or rnd.random() < 0.4}


@pytest.mark.skipif(
    not have_node_oracle(_CREDITS_TS),
    reason="node or the reference checkout not available",
)
def test_credits_differential_fuzz_vs_reference_logic():
    rnd = random.Random(20260819)
    cases = []
    for _ in range(6000):
        kind = rnd.choice(["mode", "scrape", "crawl_init", "search", "estimate"])
        c = {"kind": kind, "env": _rand_env(rnd)}
        if kind == "mode":
            c["proxy"] = rnd.choice(_PROXY_VALS)
        elif kind in ("scrape", "crawl_init"):
            c["options"] = rnd.choice(
                [_rand_scrape_options(rnd), {}]
                if kind == "scrape"
                else [{"scrape_options": rnd.choice(
                    [_rand_scrape_options(rnd), {}, None, 0, "x", 5])}, {}])
        elif kind == "search":
            c["options"] = {
                k: v for k, v in {
                    "pages": rnd.choice(_NUM_VALS),
                    "scrape_options": rnd.choice(
                        [_rand_scrape_options(rnd), {}, None, 0, "", "yes", 5]),
                    "completedScrapeCount": rnd.choice(_NUM_VALS),
                }.items() if v is not None or rnd.random() < 0.4
            }
        else:
            c["task_type"] = rnd.choice(
                ["scrape", "crawl", "search", "other", ""])
            c["payload"] = _rand_payload(rnd)
            c["opts"] = rnd.choice(
                [None, {}, {"template": _rand_template(rnd)}])
        cases.append(c)

    ref = run_reference_js(_CREDITS_TS, _CREDITS_DRIVER_JS, cases)

    diverging = []
    for c, exp in zip(cases, ref):
        env = credit_env_from_env(c["env"])
        kind = c["kind"]
        if kind == "mode":
            got = resolved_proxy_mode(c["proxy"], env)
        elif kind == "scrape":
            o = c["options"]
            got = scrape_credits(o.get("proxy"), o.get("json_options"),
                                 o.get("formats"), o.get("extract_source"), env)
        elif kind == "crawl_init":
            so = c["options"].get("scrape_options")
            proxy = so.get("proxy") if isinstance(so, dict) else None
            got = crawl_initial_credits(proxy, env)
        elif kind == "search":
            o = c["options"]
            got = search_credits(o.get("pages"), o.get("scrape_options"),
                                 o.get("completedScrapeCount"), env)
        else:
            opts = c.get("opts") or {}
            got = estimate_task_credits(
                c["task_type"], c["payload"], opts.get("template"))
        if _enc_py(got) != exp:
            diverging.append((c, exp, got))
    assert diverging == [], diverging[:10]
