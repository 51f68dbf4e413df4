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

    rnd = random.Random(20260819)
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
