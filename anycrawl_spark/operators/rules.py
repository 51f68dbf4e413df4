"""Rule-table operators: ad-domain blocking (F6) + proxy-rule matching (F12/J5).

Reference behavior:
- F6: sub-requests whose URL contains any of 13 ad domains are aborted
  (reference: packages/scrape/src/core/EngineConfigurator.ts:178-202; list at
  packages/libs/src/constants.ts:4-18). Rebuilt as one vectorized
  ``~rlike(alternation)`` predicate — a broadcast literal, JVM-side.
- F12/J5: proxy selection matches a priority-ordered rule list per request
  URL — exact url match beats url-prefix pattern beats domain wildcard
  (reference: packages/scrape/src/managers/Proxy.ts:716-750; wildcard->regex
  at :500-524). Rebuilt as an ordered ``coalesce(when...)`` chain over a
  broadcast-sized rule list — first match wins, all codegen, no join.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# kept verbatim from the reference list (constants.ts:4-18)
AD_DOMAINS = [
    "doubleclick.net",
    "adservice.google.com",
    "googlesyndication.com",
    "googletagservices.com",
    "googletagmanager.com",
    "google-analytics.com",
    "adsystem.com",
    "adservice.com",
    "adnxs.com",
    "ads-twitter.com",
    "facebook.net",
    "fbcdn.net",
    "amazon-adsystem.com",
]

_AD_RE = "|".join(re.escape(d) for d in AD_DOMAINS)


def is_ad_url(url: Column) -> Column:
    """True when the URL contains any blocked ad domain (F6 semantics:
    substring containment, matching the reference's ``url.includes(domain)``)."""
    return url.rlike(_AD_RE)


def filter_ad_requests(df, url_col: str = "url"):
    """Drop ad-domain requests before the fetch stage."""
    return df.filter(~is_ad_url(F.col(url_col)))


@dataclass(frozen=True)
class ProxyRule:
    """One proxy rule; exactly one of url/pattern/domain set (Proxy.ts:368-377)."""

    proxy: str
    url: str | None = None        # exact canonical URL match
    pattern: str | None = None    # wildcard URL pattern ('*' any chars)
    domain: str | None = None     # host suffix match ('.x.com' or 'x.com')


def _wildcard_to_regex(pattern: str) -> str:
    """Proxy.ts:500-524 matchesUrlPattern/matchesDomainPattern body:
    regex specials escaped, '*' -> '.*', '?' -> '.' (single char), anchored,
    CASE-INSENSITIVE ('i' flag — carried as an inline (?i) so the same
    source runs under Java rlike and RE2). Node-fuzzed byte-exact."""
    parts = [
        ".".join(re.escape(q) for q in p.split("?"))
        for p in pattern.split("*")
    ]
    return "(?i)^" + ".*".join(parts) + "$"


def match_proxy(rules: list[ProxyRule], url: Column, host: Column) -> Column:
    """First-match proxy selection as an ordered coalesce(when...) chain.

    The reference walks the rules IN CONFIG ORDER and each rule fires on
    its own criterion (Proxy.ts:729-745 — the url/pattern/domain priority
    is WITHIN one rule, not a global tiering; a pattern rule listed first
    beats a later exact-url rule). Domain rules are full-hostname wildcard
    matches, not suffix matches ('example.com' does NOT match
    'www.example.com'; write '*.example.com' for subdomains). Returns the
    proxy string or NULL (no proxy). Rules are broadcast-sized literals —
    whole-stage codegen, zero shuffle; a rules table large enough to matter
    would become a broadcast join instead.
    """
    tiers: list[Column] = []
    for r in rules:
        if r.url is not None:
            tiers.append(F.when(url == F.lit(r.url), F.lit(r.proxy)))
        if r.pattern is not None:
            tiers.append(
                F.when(url.rlike(_wildcard_to_regex(r.pattern)), F.lit(r.proxy))
            )
        if r.domain is not None:
            tiers.append(
                F.when(host.rlike(_wildcard_to_regex(r.domain)), F.lit(r.proxy))
            )
    if not tiers:
        return F.lit(None).cast("string")
    out = tiers[0]
    for t in tiers[1:]:
        out = F.coalesce(out, t)
    return out


# ---------------------------------------------------------------------------
# Attempt-indexed proxy tier stepping (HttpClient.ts:59-123, Proxy.ts:274-328)
# ---------------------------------------------------------------------------

def with_proxy_tier(
    df,
    tiered_proxy_urls: list[list[str]],
    rules: list[ProxyRule] | None = None,
    attempt_col: str = "attempt",
    url_col: str = "url",
    host_col: str = "host",
):
    """Attach ``proxy_tier`` + ``proxy_url`` columns: the retry ladder.

    Semantics (HttpClient.ts:62-78 + Proxy.ts:274-328):
    - tier = attempt index (0-based), clamped to the last configured tier —
      the batch analog of the reference's "fallback to auto selection" when
      the explicit tier is invalid;
    - a URL matching a proxy RULE short-circuits tier stepping: the proxy
      pool becomes [matched_rule_proxy, ...all tier urls] (Proxy.ts:280-292)
      and proxy_tier is NULL;
    - rotation inside a pool: the reference advances a mutable counter per
      request (nextCustomUrlIndex++); the deterministic batch analog indexes
      the pool with pmod(xxhash64(url) + attempt, len(pool)) — same
      round-robin coverage, reproducible under retry/resume.

    Everything is literal-map column math: no shuffle, no UDF.
    """
    n_tiers = len(tiered_proxy_urls)
    if n_tiers == 0:
        return df.withColumn("proxy_tier", F.lit(None).cast("int")).withColumn(
            "proxy_url", F.lit(None).cast("string")
        )
    attempt = F.col(attempt_col)
    tier = F.least(attempt, F.lit(n_tiers - 1)).cast("int")
    rotor = F.xxhash64(F.col(url_col)) + attempt

    def pick(pool: list[str]) -> Column:
        idx = F.pmod(rotor, F.lit(len(pool))).cast("int")
        return F.element_at(F.array(*[F.lit(p) for p in pool]), idx + 1)

    tier_choice = None
    for t in range(n_tiers - 1, -1, -1):
        sel = pick(tiered_proxy_urls[t]) if tiered_proxy_urls[t] else F.lit(None).cast("string")
        tier_choice = sel if tier_choice is None else F.when(tier == t, sel).otherwise(tier_choice)

    matched = match_proxy(rules or [], F.col(url_col), F.col(host_col))
    all_urls = [u for pool in tiered_proxy_urls for u in pool if u]
    merged_pool_idx = F.pmod(rotor, F.lit(1 + len(all_urls))).cast("int")
    merged_choice = F.when(merged_pool_idx == 0, matched).otherwise(
        F.element_at(F.array(*[F.lit(u) for u in all_urls]), merged_pool_idx)
        if all_urls
        else matched
    )
    return (
        df.withColumn(
            "proxy_tier", F.when(matched.isNull(), tier).cast("int")
        ).withColumn(
            "proxy_url", F.when(matched.isNotNull(), merged_choice).otherwise(tier_choice)
        )
    )
