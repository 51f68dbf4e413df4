"""URL kernel unit tests (SURVEY §2.4 C1-C3 semantics)."""

import pandas as pd
import pytest

from anycrawl_spark.functions.urls import (
    canonicalize_url,
    fix_malformed,
    registrable_domain,
    resolve_url,
    url_host,
    url_origin,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        # scheme/host lowercasing, default port stripping
        ("HTTP://Example.COM:80/a", "http://example.com/a"),
        ("https://Example.com:443/a", "https://example.com/a"),
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        # fragment stripped (Crawlee computeUniqueKey default)
        ("http://example.com/a#frag", "http://example.com/a"),
        # empty path -> /
        ("http://example.com", "http://example.com/"),
        # utm_* params dropped, others sorted
        ("http://e.com/p?utm_source=x&b=2&a=1", "http://e.com/p?a=1&b=2"),
        ("http://e.com/p?UTM_CAMPAIGN=y&z=1", "http://e.com/p?z=1"),
        # malformed repair (HTMLTransformer.ts:366-384)
        ("http:/example.com/a", "http://example.com/a"),
        ("https:/example.com/a", "https://example.com/a"),
        # trailing dot host
        ("http://example.com./a", "http://example.com/a"),
    ],
)
def test_canonicalize(raw, expected):
    assert canonicalize_url(raw) == expected


@pytest.mark.parametrize(
    "raw", ["", "javascript:void(0)", "mailto:x@y.z", "#", "ftp://x/y", "not a url"]
)
def test_canonicalize_rejects(raw):
    assert canonicalize_url(raw) is None


def test_resolve():
    assert resolve_url("http://a.com/x/y", "/p/1") == "http://a.com/p/1"
    assert resolve_url("http://a.com/x/", "p/1") == "http://a.com/x/p/1"
    assert resolve_url("http://a.com/x", "http:/b.com/q") == "http://b.com/q"
    assert fix_malformed("http://ok.com/") == "http://ok.com/"


def test_scope_keys():
    assert url_host("http://Sub.Example.com/a") == "sub.example.com"
    assert url_origin("https://e.com/a") == "https://e.com:443"
    assert url_origin("http://e.com:8080/a") == "http://e.com:8080"
    assert registrable_domain("a.b.example.com") == "example.com"
    assert registrable_domain("www.example.co.uk") == "example.co.uk"
    assert registrable_domain("example.com") == "example.com"


def test_spark_udf_parity(spark):
    """Pandas-UDF output must equal the pure function on the same inputs."""
    from pyspark.sql import functions as F

    urls = [
        "HTTP://Example.COM:80/a#f",
        "http://e.com/p?utm_source=x&b=2&a=1",
        "http:/fixme.com/x",
        "javascript:void(0)",
        "http://host0001.example.org/p/3",
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    from anycrawl_spark.functions.urls import canonicalize_url_udf, host_udf

    got = [r.c for r in df.select(canonicalize_url_udf("url").alias("c")).collect()]
    assert got == [canonicalize_url(u) for u in urls]
    goth = [r.h for r in df.select(host_udf("url").alias("h")).collect()]
    assert goth == [url_host(u) for u in urls]


def test_with_url_key_uses_jvm_hash(spark):
    from pyspark.sql import functions as F

    from anycrawl_spark.functions.urls import with_url_key

    df = spark.createDataFrame([("http://E.com/a#x",)], "url string")
    out = with_url_key(df).collect()[0]
    expect = spark.createDataFrame([("http://e.com/a",)], "url string").select(
        F.xxhash64("url").alias("h")
    ).collect()[0].h
    assert out.url == "http://e.com/a"
    assert out.url_hash == expect
    assert out.host == "e.com"
