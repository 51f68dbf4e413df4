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
    """First-match in CONFIG ORDER (Proxy.ts:729-745), with the reference's
    wildcard kernel: '?' single char, case-insensitive, domain = FULL
    hostname wildcard match (no implicit suffix semantics)."""
    from anycrawl_spark.operators.rules import ProxyRule, match_proxy

    rules = [
        ProxyRule(proxy="p-exact", url="http://a.com/x"),
        ProxyRule(proxy="p-pattern", pattern="http://a.com/*"),
        ProxyRule(proxy="p-domain", domain="a.com"),
        ProxyRule(proxy="p-sub", domain="*.b.com"),
        ProxyRule(proxy="p-q", pattern="HTTP://q.com/?"),
    ]
    rows = [
        ("http://a.com/x", "a.com"),       # exact rule listed first wins
        ("http://a.com/y", "a.com"),       # pattern rule beats later domain
        ("https://a.com/z", "a.com"),      # only the domain rule matches
        ("http://www.b.com/q", "www.b.com"),  # '*.b.com' matches subdomain
        ("http://b.com/q", "b.com"),       # ...but NOT the bare domain
        ("http://q.com/1", "q.com"),       # '?' = one char, case-insensitive
        ("http://q.com/12", "q.com"),      # two chars -> no '?' match
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
    assert out["http://b.com/q"] is None
    assert out["http://q.com/1"] == "p-q"
    assert out["http://q.com/12"] is None
    assert out["http://c.com/q"] is None


def test_proxy_match_config_order_beats_kind(spark):
    """A pattern rule listed BEFORE an exact-url rule wins when both match
    — the reference loop is per-rule, not per-kind (Proxy.ts:729-745)."""
    from anycrawl_spark.operators.rules import ProxyRule, match_proxy

    rules = [
        ProxyRule(proxy="p-first", pattern="http://a.com/*"),
        ProxyRule(proxy="p-exact", url="http://a.com/x"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame([("http://a.com/x", "a.com")], columns=["url", "host"]))
    out = df.select(
        match_proxy(rules, F.col("url"), F.col("host")).alias("proxy")
    ).first().proxy
    assert out == "p-first"


def test_proxy_tier_ladder(spark):
    """Retry ladder (HttpClient.ts:62-78): attempt i uses proxy tier i,
    clamped to the last tier; rule-matched URLs short-circuit tier stepping
    into the merged [rule_proxy, ...tiers] pool (Proxy.ts:280-292)."""
    from pyspark.sql import functions as F

    from anycrawl_spark.operators.rules import ProxyRule, with_proxy_tier

    tiers = [
        ["http://t0a:8080", "http://t0b:8080"],   # tier 0: datacenter
        ["http://t1a:8080"],                      # tier 1: residential
        ["http://t2a:8080", "http://t2b:8080"],   # tier 2: premium
    ]
    rules = [ProxyRule(proxy="http://rule:9999", domain="special.com")]

    rows = [("u%d" % a, "http://site.com/p/1", "site.com", a) for a in range(6)]
    rows += [("r0", "http://special.com/x", "special.com", 0)]
    df = spark.createDataFrame(rows, "rid string, url string, host string, attempt int")
    out = {r.rid: r for r in with_proxy_tier(df, tiers, rules).collect()}

    # reference trace: attempt->tier is 0,1,2 then clamped at the last tier
    expected_tiers = [0, 1, 2, 2, 2, 2]
    for a in range(6):
        r = out["u%d" % a]
        assert r.proxy_tier == expected_tiers[a], (a, r.proxy_tier)
        assert r.proxy_url in tiers[expected_tiers[a]]
    # same attempt+url -> deterministic choice; successive attempts rotate
    again = {r.rid: r for r in with_proxy_tier(df, tiers, rules).collect()}
    for k in out:
        assert out[k].proxy_url == again[k].proxy_url
    # rule match: tier is NULL, proxy drawn from merged rule+fallback pool
    r = out["r0"]
    assert r.proxy_tier is None
    assert r.proxy_url in (["http://rule:9999"] + [u for pool in tiers for u in pool])


def test_proxy_ladder_in_crawl_engine(spark, tmp_path):
    """The engine logs (attempt, proxy_tier) per scheduled fetch; a URL that
    retries must step 0 -> 1 -> 2 across rounds."""
    import shutil

    from anycrawl_spark import synth
    from anycrawl_spark.crawl.params import CrawlParams
    from anycrawl_spark.crawl.superstep import CrawlEngine

    # host0033 has 5 retryable (>=500/403) pages in its first 40 — guarantees
    # the ladder is exercised; no robots (=> no crawl-delay token caps), wide
    # host tokens, enough rounds for the 2^attempt backoff to elapse
    jobs = [dict(synth.seed_jobs(1)[0],
                 seed_url="http://host0033.example.org/p/0",
                 strategy="same-hostname", limit=60)]
    tiers = [["http://t0:1"], ["http://t1:1"], ["http://t2:1"]]
    wd = str(tmp_path / "px")
    eng = CrawlEngine(spark, wd, jobs, [],
                      CrawlParams(max_rounds=16, default_host_tokens=50),
                      num_buckets=4, tiered_proxies=tiers)
    eng.init_state()
    eng.run()
    log = eng.store.read_appends("proxy_log")
    assert log is not None
    rows = log.collect()
    assert rows
    for r in rows:
        assert r.proxy_tier == min(r.attempt, 2)
        assert r.proxy_url == tiers[r.proxy_tier][0]
    # at least one retried URL stepped the ladder
    stepped = (
        log.groupBy("url_hash").agg(F.collect_set("proxy_tier").alias("ts")).collect()
    )
    assert any(len(r.ts) > 1 for r in stepped), "no URL exercised tier stepping"
