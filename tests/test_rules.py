"""F6 ad-domain filter + F12/J5 proxy-rule matcher."""

import pandas as pd
from pyspark.sql import functions as F


def test_ad_filter(spark):
    from anycrawl_spark.operators.rules import filter_ad_requests

    urls = [
        "http://doubleclick.net/ad",
        "http://sub.googletagmanager.com/x",
        "http://ok.example.com/p/1",
        "http://site.com/track?u=google-analytics.com",  # substring containment
        "http://facebook.net.evil.com/x",                # still contains 'facebook.net'
        "http://clean.org/page",
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    kept = {r.url for r in filter_ad_requests(df).collect()}
    assert kept == {"http://ok.example.com/p/1", "http://clean.org/page"}


def test_proxy_match_priority(spark):
    from anycrawl_spark.operators.rules import ProxyRule, match_proxy

    rules = [
        ProxyRule(proxy="p-exact", url="http://a.com/x"),
        ProxyRule(proxy="p-pattern", pattern="http://a.com/*"),
        ProxyRule(proxy="p-domain", domain="a.com"),
        ProxyRule(proxy="p-sub", domain=".b.com"),
    ]
    rows = [
        ("http://a.com/x", "a.com"),       # exact wins over pattern+domain
        ("http://a.com/y", "a.com"),       # pattern wins over domain
        ("https://a.com/z", "a.com"),      # only domain matches (pattern is http://)
        ("http://www.b.com/q", "www.b.com"),  # subdomain suffix match
        ("http://b.com/q", "b.com"),       # '.b.com' rule also matches bare domain
        ("http://c.com/q", "c.com"),       # no rule -> NULL
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "host"]))
    out = {r.url: r.proxy for r in df.select(
        "url", match_proxy(rules, F.col("url"), F.col("host")).alias("proxy")
    ).collect()}
    assert out["http://a.com/x"] == "p-exact"
    assert out["http://a.com/y"] == "p-pattern"
    assert out["https://a.com/z"] == "p-domain"
    assert out["http://www.b.com/q"] == "p-sub"
    assert out["http://b.com/q"] == "p-sub"
    assert out["http://c.com/q"] is None
