"""Differential fuzz of the Google SERP URL builder (X15) against the
reference's own buildSearchUrl under node.

The oracle evaluates the REAL locale tables (packages/libs/src/data/
Google.ts — the file our CSV dims were extracted from) plus the engine's
buildSearchUrl/generateAsyncParam methods (packages/search/src/engines/
Google.ts, type-stripped at test time), with the class's small literal maps
(timeRangeMap, safe_searchMap, skipCountries) injected from OUR constants —
so a drift in either the assembly logic, the URLSearchParams encoding
(java URLEncoder on the Spark side), the raw-case skip/regions lookups, or
the table copies themselves surfaces as a URL diff. The only normalized
byte range is the random 23-char arc id (seeded md5 here, Math.random
there)."""

import json
import re
import shutil

import pytest

from node_oracle import (
    fuzz_seed,
    REFERENCE_ROOT,
    extract_ts_blocks,
    have_node_oracle,
    run_ts_oracle,
    strip_ts,
)

_DATA_TS = "packages/libs/src/data/Google.ts"
_ENGINE_TS = "packages/search/src/engines/Google.ts"

_ARC_RE = re.compile(r"(async=arc_id%3Asrp_)[0-9a-fx]{23}")


def _oracle_source() -> str:
    from anycrawl_spark.operators.serp import SAFE_SEARCH, SKIP_COUNTRIES, TIME_RANGE

    data = strip_ts((REFERENCE_ROOT / _DATA_TS).read_text())
    engine = (REFERENCE_ROOT / _ENGINE_TS).read_text()
    methods = extract_ts_blocks(
        engine,
        [r"^\s*private buildSearchUrl\(", r"^\s*private generateAsyncParam\("],
    )
    # instance -> static so strip_ts's signature stripper sees the methods
    # and `this.` resolves to the class in the shell below
    methods = methods.replace(
        "private buildSearchUrl(", "private static buildSearchUrl("
    ).replace("private generateAsyncParam(", "private static generateAsyncParam(")
    return (
        "const log = {info(){},warn(){},error(){},debug(){}};\n"
        + data
        + "\nconst google = GoogleParameters;\n"
        + "class GoogleEngine {\n"
        + f"  static timeRangeMap = {json.dumps(TIME_RANGE)};\n"
        + "  static safe_searchMap = "
        + json.dumps({str(k): v for k, v in SAFE_SEARCH.items()})
        + ";\n"
        + f"  static skipCountries = {json.dumps(list(SKIP_COUNTRIES))};\n"
        + "  static generateRandomString(length) { return 'x'.repeat(length); }\n"
        + strip_ts(methods)
        + "\n}\n"
    )


_DRIVER_JS = """
const cases = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(cases.map(c => {
    try {
        return GoogleEngine.buildSearchUrl(c.query, c.start, c.options);
    } catch (e) { return "ERR:" + e.message; }
})));
"""

_SEARXNG_TS = "packages/search/src/engines/Searxng.ts"
_AC_TS = "packages/search/src/engines/ACEngine.ts"


def _engine_oracle_source(ts_rel: str, class_name: str, base_url: str) -> str:
    engine = (REFERENCE_ROOT / ts_rel).read_text()
    methods = extract_ts_blocks(engine, [r"^\s*private buildSearchUrl\("])
    methods = methods.replace(
        "private buildSearchUrl(", "private static buildSearchUrl("
    )
    return (
        "const log = {info(){},warn(){},error(){},debug(){}};\n"
        + f"class {class_name} {{\n"
        + f"  static baseUrl = {json.dumps(base_url)};\n"
        + strip_ts(methods)
        + "\n}\n"
    )


_QUERIES = [
    "plain", "two words", "a  double  space", "a&b=c", "100%+sure",
    "q?*~'()!", "comma,colon:slash/", "ünïcödé", "日本語クエリ", "emoji 🙂",
    "", "trailing space ", "newline\nin query", "a.b-c_d*e",
]
_LANGS = ["en", "fr", "de", "zh-CN", "pt", "hi", "xx", None]
_COUNTRIES = ["US", "GB", "my", "de", "MY", "UZ", "BR", "XX", "us", None]
_LIMITS = [None, 0, 1, 10, 55, 100, 200]
_SAFES = [None, 0, 1, 2, 5]
_RANGES = [None, "day", "week", "month", "year", "decade"]


@pytest.mark.skipif(
    not (shutil.which("node") and have_node_oracle(_ENGINE_TS)),
    reason="node + reference checkout not available",
)
def test_google_url_differential_fuzz_vs_reference(spark):
    import random

    from pyspark.sql import functions as F

    from anycrawl_spark.operators.serp import build_locale_serp_url

    rnd = random.Random(fuzz_seed(20260819))
    cases = []
    for _ in range(800):
        cases.append(
            {
                "query": rnd.choice(_QUERIES),
                "start": rnd.choice([0, 10, 20, 90, 100]),
                "options": {
                    "lang": rnd.choice(_LANGS),
                    "country": rnd.choice(_COUNTRIES),
                    "limit": rnd.choice(_LIMITS),
                    "safe_search": rnd.choice(_SAFES),
                    "timeRange": rnd.choice(_RANGES),
                },
            }
        )

    ref = run_ts_oracle(_oracle_source(), _DRIVER_JS, cases)

    rows = [
        (
            i, c["query"], c["start"], c["options"]["lang"],
            c["options"]["country"], c["options"]["limit"],
            c["options"]["safe_search"], c["options"]["timeRange"],
        )
        for i, c in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows,
        "i int, query string, start int, lang string, country string, "
        "lim int, safe int, tr string",
    ).select(
        "i",
        build_locale_serp_url(
            F.col("query"), F.col("start"), F.col("lang"), F.col("country"),
            F.col("lim"), F.col("safe"), F.col("tr"),
        ).alias("url"),
    )
    got = {r.i: r.url for r in df.collect()}

    diverging = []
    for i, exp in enumerate(ref):
        g = _ARC_RE.sub(r"\1ID", got[i])
        e = _ARC_RE.sub(r"\1ID", exp)
        if g != e:
            diverging.append((cases[i], e, g))
    assert diverging == [], (len(diverging), diverging[:6])


_SX_SOURCES = [None, "", "web", "images", "news", "videos"]
_SX_CATEGORIES = [None, "", "science", "it files", "ma&ps"]


@pytest.mark.skipif(
    not (shutil.which("node") and have_node_oracle(_SEARXNG_TS)),
    reason="node + reference checkout not available",
)
def test_searxng_url_differential_fuzz_vs_reference(spark):
    import random

    from pyspark.sql import functions as F

    from anycrawl_spark.operators.serp import searxng_build_url

    rnd = random.Random(fuzz_seed(20260820))
    cases = [
        {
            "query": rnd.choice(_QUERIES),
            "page": rnd.choice([1, 2, 7]),
            "options": {
                "lang": rnd.choice(_LANGS + [""]),
                "sources": rnd.choice(_SX_SOURCES),
                "categories": rnd.choice(_SX_CATEGORIES),
                "timeRange": rnd.choice(_RANGES + [""]),
                "safe_search": rnd.choice(_SAFES),
            },
        }
        for _ in range(600)
    ]
    src = _engine_oracle_source(_SEARXNG_TS, "SearxngEngine", "http://searxng.synth")
    driver = """
const cases = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(cases.map(c => {
    try { return SearxngEngine.buildSearchUrl(c.query, c.page, c.options); }
    catch (e) { return "ERR:" + e.message; }
})));
"""
    ref = run_ts_oracle(src, driver, cases)

    rows = [
        (
            i, c["query"], c["page"], c["options"]["lang"],
            c["options"]["sources"], c["options"]["categories"],
            c["options"]["timeRange"], c["options"]["safe_search"],
        )
        for i, c in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows,
        "i int, query string, page int, lang string, sources string, "
        "cats string, tr string, safe int",
    ).select(
        "i",
        searxng_build_url(
            F.col("query"), F.col("page"), F.col("lang"), F.col("sources"),
            F.col("tr"), F.col("safe"), categories=F.col("cats"),
        ).alias("url"),
    )
    got = {r.i: r.url for r in df.collect()}
    diverging = [
        (cases[i], exp, got[i]) for i, exp in enumerate(ref) if got[i] != exp
    ]
    assert diverging == [], (len(diverging), diverging[:6])


@pytest.mark.skipif(
    not (shutil.which("node") and have_node_oracle(_AC_TS)),
    reason="node + reference checkout not available",
)
def test_ac_engine_url_differential_fuzz_vs_reference(spark):
    import random

    from pyspark.sql import functions as F

    from anycrawl_spark.operators.serp import ac_build_url

    rnd = random.Random(fuzz_seed(20260821))
    cases = []
    for _ in range(600):
        opts = {
            "query": rnd.choice(_QUERIES),
            "offset": rnd.choice([None, 0, 10, 90, "absent"]),
            "page": rnd.choice([None, 0, 1, 3]),
            "limit": rnd.choice([None, 0, 1, 25, 200]),
            "lang": rnd.choice(_LANGS + [""]),
            "country": rnd.choice(_COUNTRIES + [""]),
            "timeRange": rnd.choice(_RANGES + [""]),
            "safe_search": rnd.choice(_SAFES),
            "sources": rnd.choice([None, "", "web", "news"]),
        }
        if opts["offset"] == "absent":
            del opts["offset"]  # destructure default 0 fires only here
        cases.append(opts)
    src = _engine_oracle_source(_AC_TS, "ACEngine", "http://ac-engine.synth")
    driver = """
const cases = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(cases.map(c => {
    try { return ACEngine.buildSearchUrl(c); }
    catch (e) { return "ERR:" + e.message; }
})));
"""
    ref = run_ts_oracle(src, driver, cases)

    rows = [
        (
            i, c["query"],
            "absent" if "offset" not in c else c["offset"],
            c["page"], c["limit"], c["lang"], c["country"],
            c["timeRange"], c["safe_search"], c["sources"],
        )
        for i, c in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows,
        "i int, query string, off string, page int, lim int, lang string, "
        "country string, tr string, safe int, sources string",
    ).select(
        "i",
        ac_build_url(
            F.col("query"), limit=F.col("lim"), page=F.col("page"),
            # 'absent' -> python-side default (0); NULL stays NULL
            offset=F.when(F.col("off") == "absent", F.lit(0)).otherwise(
                F.col("off").cast("int")
            ),
            lang=F.col("lang"), country=F.col("country"),
            time_range=F.col("tr"), safe_search=F.col("safe"),
            sources=F.col("sources"),
        ).alias("url"),
    )
    got = {r.i: r.url for r in df.collect()}
    diverging = [
        (cases[i], exp, got[i]) for i, exp in enumerate(ref) if got[i] != exp
    ]
    assert diverging == [], (len(diverging), diverging[:6])


# --------------------------- parse (X16) fuzz: JSON -> result objects ------

_PARSE_FIELD_MAP = {
    "image_url": "imageUrl", "image_width": "imageWidth",
    "image_height": "imageHeight",
}


def _norm_py(rows):
    out = []
    for r in rows:
        out.append({
            _PARSE_FIELD_MAP.get(k, k): v for k, v in r.items() if v is not None
        })
    return out


_PARSE_DRIVER_TAIL = """
const strip = (r) => Object.fromEntries(
    Object.entries(r).filter(([k, v]) => v !== null && v !== undefined));
"""


def _adversarial_items(rnd):
    urls = [None, "", 0, "http://x/p", "u", True, 5]
    cats = [None, "", "images", "news", "web", "videos", 0, "Images"]
    texts = [None, "", "txt", 0, 1, True, False]
    n = rnd.randint(0, 5)
    items = []
    for _ in range(n):
        if rnd.random() < 0.08:
            # a null item throws in the reference loop -> whole response []
            items.append(rnd.choice([None, 0, "s", [1]]))
            continue
        items.append({
            "url": rnd.choice(urls),
            "category": rnd.choice(cats),
            "title": rnd.choice(texts),
            "content": rnd.choice(texts),
            "snippet": rnd.choice(texts),
            "description": rnd.choice(texts),
            "source": rnd.choice(texts),
            "engine": rnd.choice([None, "brave", "", 0, 7, True]),
            "resolution": rnd.choice(
                [None, "", "1000×1500", "10x20", " 7  × 8 ", "axb",
                 "12×", "0x0", "999x1", 5]
            ),
            "positions": rnd.choice([None, [], [3], [1, 2], "x", 0]),
            "img_src": rnd.choice([None, "", "http://i"]),
            "thumbnail_src": rnd.choice([None, "t"]),
            "img_format": rnd.choice([None, "jpeg", ""]),
            "filesize": rnd.choice([None, "12 KB", 0]),
            "publishedDate": rnd.choice([None, "", "2026-01-01", 0]),
            "pubdate": rnd.choice([None, "", "yesterday", 0]),
            "thumbnail": rnd.choice([None, "", "http://t", 0]),
            "imageUrl": rnd.choice([None, "", "http://i2"]),
            "imageWidth": rnd.choice([None, 0, 640, "640"]),
            "imageHeight": rnd.choice([None, 480, -1]),
            "position": rnd.choice([None, 0, 3]),
            "date": rnd.choice([None, "", "2026-02-02"]),
        })
    return items


@pytest.mark.skipif(
    not (shutil.which("node") and have_node_oracle(_SEARXNG_TS)),
    reason="node + reference checkout not available",
)
def test_searxng_parse_differential_fuzz_vs_reference():
    import random

    from anycrawl_spark.operators.serp import parse_searxng_results

    rnd = random.Random(fuzz_seed(20260822))
    payloads = []
    for _ in range(400):
        shape = rnd.random()
        if shape < 0.1:
            payloads.append(rnd.choice([{}, {"results": None},
                                        {"results": "nope"}, {"results": 7}]))
        else:
            payloads.append({"results": _adversarial_items(rnd)})

    engine = (REFERENCE_ROOT / _SEARXNG_TS).read_text()
    method = extract_ts_blocks(engine, [r"^\s*async parse\("])
    src = (
        "const log = {info(){},warn(){},error(){},debug(){}};\n"
        "class SearxngEngine {\n  static "
        + strip_ts(method)
        + "\n}\n"
    )
    driver = _PARSE_DRIVER_TAIL + """
const cases = JSON.parse(require('fs').readFileSync(0, 'utf8'));
(async () => {
  const out = [];
  for (const c of cases) out.push((await SearxngEngine.parse(c)).map(strip));
  console.log(JSON.stringify(out));
})();
"""
    ref = run_ts_oracle(src, driver, payloads)
    diverging = []
    for payload, exp in zip(payloads, ref):
        got = _norm_py(parse_searxng_results(payload))
        if got != exp:
            diverging.append((payload, exp, got))
    assert diverging == [], (len(diverging), diverging[:4])


@pytest.mark.skipif(
    not (shutil.which("node") and have_node_oracle(_AC_TS)),
    reason="node + reference checkout not available",
)
def test_ac_parse_differential_fuzz_vs_reference():
    import random

    from anycrawl_spark.operators.serp import parse_ac_results

    rnd = random.Random(fuzz_seed(20260823))
    payloads = []
    for _ in range(400):
        shape = rnd.random()
        if shape < 0.1:
            payloads.append(rnd.choice([{}, {"results": None},
                                        {"results": "nope"}, {"results": 0}]))
        else:
            payloads.append({"results": _adversarial_items(rnd)})

    engine = (REFERENCE_ROOT / _AC_TS).read_text()
    method = extract_ts_blocks(engine, [r"^\s*async parse\("])
    src = (
        "const log = {info(){},warn(){},error(){},debug(){}};\n"
        "class ACEngine {\n  static "
        + strip_ts(method)
        + "\n}\n"
    )
    driver = _PARSE_DRIVER_TAIL + """
const cases = JSON.parse(require('fs').readFileSync(0, 'utf8'));
(async () => {
  const out = [];
  for (const c of cases) out.push((await ACEngine.parse(c)).map(strip));
  console.log(JSON.stringify(out));
})();
"""
    ref = run_ts_oracle(src, driver, payloads)
    diverging = []
    for payload, exp in zip(payloads, ref):
        got = _norm_py(parse_ac_results(payload))
        if got != exp:
            diverging.append((payload, exp, got))
    assert diverging == [], (len(diverging), diverging[:4])


# ------------------- engine resolution (S12b) fuzz vs SearchService.ts -----

_SERVICE_TS = "packages/search/src/SearchService.ts"


@pytest.mark.skipif(
    not (shutil.which("node") and have_node_oracle(_SERVICE_TS)),
    reason="node + reference checkout not available",
)
def test_resolve_engine_differential_fuzz_vs_reference():
    import random

    from anycrawl_spark.operators.serp import SearchEngineConfig, resolve_engine

    service = (REFERENCE_ROOT / _SERVICE_TS).read_text()
    methods = extract_ts_blocks(service, [
        r"^\s*getDefaultEngine\(",
        r"^\s*private isValidEngine\(",
        r"^\s*public getAvailableEngines\(",
        r"^\s*public resolveEngine\(",
        r"^\s*private resolveEngineName\(",
    ])
    for a, b in [
        ("getDefaultEngine(", "static getDefaultEngine("),
        ("private isValidEngine(", "private static isValidEngine("),
        ("public getAvailableEngines(", "public static getAvailableEngines("),
        ("public resolveEngine(", "public static resolveEngine("),
        ("private resolveEngineName(", "private static resolveEngineName("),
    ]:
        methods = methods.replace(a, b, 1)
    src = (
        "const log = {info(){},warn(){},error(){},debug(){}};\n"
        "const AVAILABLE_SEARCH_ENGINES = ['google', 'searxng', 'ac-engine'];\n"
        "class SearchService {\n  static config = {};\n"
        + strip_ts(methods)
        + "\n}\n"
    )
    driver = """
const cases = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(cases.map(c => {
    SearchService.config = c.config;
    try { return SearchService.resolveEngine(c.requested === null ? undefined : c.requested); }
    catch (e) { return "ERR:" + e.message; }
})));
"""
    rnd = random.Random(fuzz_seed(20260824))
    reqs = [None, "", "default", " Default ", "google", "GOOGLE ", "searxng",
            "ac-engine", "AC-Engine", "bogus", " searxng\t", " google",
            "Ac-ENGINE", "default "]
    defaults = [None, "", "google", "searxng", "ac-engine", "SearXNG", "bogus"]
    enabled = [None, [], ["google"], ["searxng"], ["google", "searxng"],
               ["AC-ENGINE"], ["bogus"], ["searxng", "ac-engine"],
               ["google", "searxng", "ac-engine"]]
    cases = [
        {
            "requested": rnd.choice(reqs),
            "config": {
                "defaultEngine": rnd.choice(defaults),
                "enabledEngines": rnd.choice(enabled),
                "searxngUrl": rnd.choice([None, "", "http://sx"]),
                "acEngineUrl": rnd.choice([None, "", "http://ac"]),
            },
        }
        for _ in range(1500)
    ]
    ref = run_ts_oracle(src, driver, cases)
    diverging = []
    for c, exp in zip(cases, ref):
        cfgd = c["config"]
        cfg = SearchEngineConfig(
            default_engine=cfgd["defaultEngine"],
            enabled_engines=tuple(cfgd["enabledEngines"] or ()),
            searxng_url=cfgd["searxngUrl"],
            ac_engine_url=cfgd["acEngineUrl"],
        )
        got = resolve_engine(c["requested"], cfg)
        if got != exp:
            diverging.append((c, exp, got))
    assert diverging == [], (len(diverging), diverging[:8])


# ------------------ proxy wildcard matchers (F12/X9) fuzz vs Proxy.ts ------

_PROXY_TS = "packages/scrape/src/managers/Proxy.ts"


@pytest.mark.skipif(
    not (shutil.which("node") and have_node_oracle(_PROXY_TS)),
    reason="node + reference checkout not available",
)
def test_proxy_wildcard_matchers_differential_fuzz_vs_reference():
    import random
    import re as _re

    from anycrawl_spark.operators.rules import _wildcard_to_regex

    src = extract_ts_blocks((REFERENCE_ROOT / _PROXY_TS).read_text(), [
        r"^function matchesDomainPattern\(",
        r"^function matchesUrlPattern\(",
    ])
    js = (
        "const log = {info(){},warn(){},error(){},debug(){}};\n"
        + strip_ts(src)
        + """
const cases = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(cases.map(([pat, s, kind]) =>
    kind === 'domain' ? matchesDomainPattern(pat, s) : matchesUrlPattern(pat, s))));
"""
    )
    rnd = random.Random(fuzz_seed(20260829))
    pat_atoms = ["*", "?", ".", "example", "EXAMPLE", "com", "https://",
                 "/p/", "a", "1", "-", "+", "(x)", "[y]", "$", "^", "{2}",
                 "|", "\\"]
    sub_atoms = ["example", "EXAMPLE", "com", "https://", "/p/", "a", "ab",
                 "1", "12", ".", "-", "+", "(x)", "[y]", "$", "x|y", "\\"]
    cases = []
    for _ in range(4000):
        pat = "".join(rnd.choice(pat_atoms) for _ in range(rnd.randint(0, 6)))
        s = "".join(rnd.choice(sub_atoms) for _ in range(rnd.randint(0, 6)))
        cases.append([pat, s, rnd.choice(["domain", "url"])])
    import json as _json
    import subprocess
    out = subprocess.run(["node", "-e", js], input=_json.dumps(cases),
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[:500]
    ref = _json.loads(out.stdout)
    diverging = []
    for (pat, s, kind), exp in zip(cases, ref):
        # ONE kernel serves both matchers (the reference bodies are
        # identical); anchoring and the 'i' flag live inside the source
        got = _re.match(_wildcard_to_regex(pat), s) is not None
        if got != exp:
            diverging.append((pat, s, kind, exp, got))
    assert diverging == [], (len(diverging), diverging[:10])
