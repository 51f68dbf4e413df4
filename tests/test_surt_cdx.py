"""SURT canonicalization + CDX index (functions/surt.py, sources/warc.py).

Layer 1: hand-derived SURT cases against the sequential kernel.
Layer 2: Spark column transform vs the kernel over a structured fuzz
         grid (every rule exercised combinatorially).
Layer 3: the CDX absolute offsets land on real record boundaries in the
         actually-serialized segments; warcinfo constant pinned.
"""

from __future__ import annotations

import itertools

from anycrawl_spark.functions.surt import surt
from anycrawl_spark.functions.warc import build_warcinfo_record, parse_warc

# ---------------------------------------------------------------- layer 1

CASES = {
    # host reversal + scheme drop
    "http://example.com/path": "com,example)/path",
    "https://example.com/path": "com,example)/path",
    # lowercase everything
    "HTTP://EXAMPLE.COM/PATH?Q=V": "com,example)/path?q=v",
    # www strip (one label only)
    "http://www.example.com/": "com,example)/",
    "http://www.www.example.com/": "com,example,www)/",
    # wwwx is NOT www.
    "http://wwwx.example.com/": "com,example,wwwx)/",
    # default ports drop, explicit ports keep
    "http://example.com:80/a": "com,example)/a",
    "http://example.com:443/a": "com,example)/a",
    "http://example.com:8080/a": "com,example:8080)/a",
    # empty path -> /
    "http://example.com": "com,example)/",
    "http://example.com:8080": "com,example:8080)/",
    # query sorting, bytewise
    "http://a.b/p?b=2&a=1": "b,a)/p?a=1&b=2",
    "http://a.b/p?a=1&b=2": "b,a)/p?a=1&b=2",
    # trailing '?' survives as an empty query
    "http://a.b/p?": "b,a)/p?",
    # fragment dropped
    "http://a.b/p#frag": "b,a)/p",
    "http://a.b/p?x=1#frag": "b,a)/p?x=1",
    # query with no path
    "http://a.b?x=1": "b,a)/?x=1",
    # no scheme at all: first segment is the host
    "example.com/path": "com,example)/path",
    # deep subdomains cluster under the registrable domain
    "http://x.y.example.com/": "com,example,y,x)/",
}


def test_hand_cases():
    for url, want in CASES.items():
        assert surt(url) == want, url


def test_sort_friendliness():
    # the property SURT exists for: captures of a site and its
    # subdomains are lexicographically contiguous
    keys = sorted(
        surt(u)
        for u in [
            "http://example.com/a",
            "http://sub.example.com/b",
            "http://example.com/z",
            "http://examplf.com/a",
            "http://exampld.com/a",
        ]
    )
    site = [k for k in keys if k.startswith("com,example")]
    lo, hi = keys.index(site[0]), keys.index(site[-1])
    assert site == keys[lo : hi + 1]


# ---------------------------------------------------------------- layer 2


def _fuzz_urls():
    schemes = ["http://", "https://", "HTTP://"]
    hosts = ["Example.COM", "www.Example.com", "a.B.c.Example.org", "wwww.e.net"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/P/1", "/a%20b"]
    queries = ["", "?", "?b=2&a=1&A=3", "?z"]
    frags = ["", "#F-1"]
    return [
        s + h + po + pa + q + f
        for s, h, po, pa, q, f in itertools.product(
            schemes, hosts, ports, paths, queries, frags
        )
    ]


def test_spark_column_matches_kernel(spark):
    from pyspark.sql import functions as F

    from anycrawl_spark.functions.surt import surt_key_col

    urls = _fuzz_urls()
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {
        r["url"]: r["k"]
        for r in df.select("url", surt_key_col(F.col("url")).alias("k")).collect()
    }
    for u in urls:
        assert got[u] == surt(u), u


# ---------------------------------------------------------------- layer 3


def test_warcinfo_base_constant_pinned():
    from anycrawl_spark.sources.warc import WARCINFO_BASE

    for name in ("", "x.warc", "h12.example.warc"):
        blob = build_warcinfo_record(name, "2026-08-20T12:34:56Z")
        assert len(blob) == WARCINFO_BASE + len(name.encode())


def test_cdx_offsets_hit_record_boundaries(spark):
    from anycrawl_spark.queries import q_cdx_index, q_warc_manifest  # noqa: F401
    from anycrawl_spark.sources.warc import write_warc_segments

    cdx = q_cdx_index(spark, "/root/testdata/sf0.001")
    rows = cdx.collect()
    # rebuild the docs exactly as the query synthesized them, write real
    # segments, and check every (filename, abs_offset, record_len)
    # triple names a real response record for the right URL
    from pyspark.sql import functions as F

    did = F.col("doc_id")
    sec = (did * 977) % 86400
    two = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    url = F.concat(
        F.when(did % 3 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(did % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("H"), (did % 40).cast("string"), F.lit(".Example.ORG"),
        F.when(did % 5 == 0, F.lit(":8080"))
        .when(did % 5 == 1, F.lit(":80"))
        .when(did % 5 == 2, F.lit(":443"))
        .otherwise(F.lit("")),
        F.lit("/Page/"), did.cast("string"),
        F.when(did % 4 == 0, F.concat(F.lit("?b="), did.cast("string"), F.lit("&a=1&A=2")))
        .when(did % 4 == 1, F.lit("?z=9"))
        .when(did % 4 == 2, F.lit("?"))
        .otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit("#Sec-2")).otherwise(F.lit("")),
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "text",
        url.alias("url"),
        F.concat(F.lit("h"), (did % 40).cast("string"), F.lit(".example")).alias("segment"),
        F.concat(
            F.lit("2026-08-20T"), two(F.floor(sec / 3600)), F.lit(":"),
            two(F.floor(sec / 60) % 60), F.lit(":"), two(sec % 60), F.lit("Z"),
        ).alias("warc_date"),
    )
    segs = {
        r["filename"]: bytes(r["blob"])
        for r in write_warc_segments(docs).collect()
    }
    by_file_offset = {}
    for fname, blob in segs.items():
        for rec in parse_warc(blob):
            by_file_offset[(fname, rec["offset"])] = rec
    assert rows, "cdx produced no rows"
    for r in rows:
        rec = by_file_offset[(r["filename"], r["abs_offset"])]
        assert rec["warc_type"] == "response"
        assert rec["headers"]["WARC-Target-URI"] == r["url"]
        assert rec["length"] == r["record_len"]
        assert r["surt_key"] == surt(r["url"])
        assert r["cdx_ts"] == r["cdx_ts"].strip() and len(r["cdx_ts"]) == 14
