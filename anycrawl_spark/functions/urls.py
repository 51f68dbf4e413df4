"""URL kernel: canonicalization, resolution, host extraction.

Replicates the dedup-key semantics of the reference (SURVEY §2.4):
- C1 canonicalization — the reference delegates to Crawlee 3.13
  ``Request.computeUniqueKey`` (reference: packages/scrape/src/engines/
  Base.ts:413-419). The rebuild defines the normalization explicitly:
  lowercase scheme+host, strip default port, strip fragment, drop
  ``utm_*`` tracking params, sort remaining query params, '' path -> '/'.
- C2 malformed-URL repair — ``http:/x`` -> ``http://x`` (reference:
  packages/scrape/src/core/transformers/HTMLTransformer.ts:366-384).
- C3 uniqueKey composition — dedup key is ``(job_id, xxhash64(canonical))``
  (reference: Base.ts:420 ``${jobId}-${baseUnique}``).

The pure-Python functions here are shared verbatim by the pandas UDFs (Spark
side) and by the reference simulator (``crawl/simulator.py``) — parity between
the two is therefore structural, not coincidental.

Scale: all Spark-side use is via pandas UDFs (Arrow-vectorized). The hash used
for partitioning/join keys is Spark's JVM-side ``F.xxhash64`` — never Python.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def fix_malformed(url: str) -> str:
    """Repair ``http:/host`` -> ``http://host`` like the reference does."""
    if url.startswith("http:/") and not url.startswith("http://"):
        return "http://" + url[6:]
    if url.startswith("https:/") and not url.startswith("https://"):
        return "https://" + url[7:]
    return url


def resolve_url(base: str, rel: str) -> str:
    """Relative -> absolute resolution with malformed-URL repair (C2)."""
    try:
        return urljoin(base, fix_malformed(rel.strip()))
    except ValueError:
        return rel


def canonicalize_url_host(url: str) -> tuple[str | None, str | None]:
    """C1 canonical form + the canonical HOST from a single urlsplit.

    The candidate gate needs both for every link; sharing the split saves a
    second full URL parse per candidate (urlsplit is the gate kernel's
    hottest call). Returns (None, None) for unusable URLs.
    """
    if not url:
        return None, None
    # drop the fragment BEFORE trimming: a whitespace run just before '#'
    # must not survive into the canonical path (idempotency — the second
    # canonicalization would strip it as trailing whitespace)
    url = fix_malformed(url.split("#", 1)[0].strip())
    try:
        parts = urlsplit(url)
    except ValueError:
        return None, None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None, None
    host = parts.hostname
    if not host:
        return None, None
    host = host.lower().rstrip(".")
    if not host:  # e.g. 'http://.' — dot-only hostname strips to empty
        return None, None
    port = None
    try:
        port = parts.port
    except ValueError:
        pass
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    qs = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not k.lower().startswith("utm_")
    ]
    qs.sort()
    query = urlencode(qs)
    return urlunsplit((scheme, netloc, path, query, "")), host


def canonicalize_url(url: str) -> str | None:
    """C1: deterministic canonical form used as the dedup key basis.

    Returns None for unsupported/unusable URLs (non-http(s), empty,
    javascript:, mailto:, fragment-only).
    """
    return canonicalize_url_host(url)[0]


def url_host(url: str) -> str | None:
    try:
        h = urlsplit(url).hostname
        return h.lower().rstrip(".") if h else None
    except ValueError:
        return None


def url_origin(url: str) -> str | None:
    """scheme://host:port — the F3 ``same-origin`` scope key."""
    try:
        p = urlsplit(url)
    except ValueError:
        return None
    if not p.hostname:
        return None
    scheme = p.scheme.lower()
    host = p.hostname.lower().rstrip(".")
    try:
        port = p.port
    except ValueError:
        port = None
    eff = str(port) if port is not None else _DEFAULT_PORTS.get(scheme, "")
    return f"{scheme}://{host}:{eff}"


def registrable_domain(host: str | None) -> str | None:
    """eTLD+1 via the real public-suffix list (data/public_suffixes.py,
    publicsuffix.org semantics: longest match, wildcards, exceptions) — the
    ``same-domain`` scope key. The reference gets this from Crawlee/tldts,
    which embeds the same list."""
    from anycrawl_spark.data.public_suffixes import registrable_domain_psl

    return registrable_domain_psl(host)


# --- pandas UDFs (Arrow-vectorized Spark surface) --------------------------

@F.pandas_udf(T.StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize_url(u) if u is not None else None)


@F.pandas_udf(T.StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: url_host(u) if u is not None else None)


@F.pandas_udf(T.StringType())
def registrable_domain_udf(hosts: pd.Series) -> pd.Series:
    return hosts.map(registrable_domain)


@F.pandas_udf(T.StringType())
def origin_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: url_origin(u) if u is not None else None)


@F.pandas_udf(T.StringType())
def resolve_url_udf(bases: pd.Series, rels: pd.Series) -> pd.Series:
    return pd.Series(
        [resolve_url(b, r) if (b is not None and r is not None) else None
         for b, r in zip(bases, rels)]
    )


def with_url_key(df, url_col: str = "url"):
    """Attach (canonical url, url_hash, host) — the standard key triple.

    url_hash is JVM-side xxhash64 so join/partition keys never round-trip
    through Python.
    """
    return (
        df.withColumn(url_col, canonicalize_url_udf(F.col(url_col)))
        .filter(F.col(url_col).isNotNull())
        .withColumn("url_hash", F.xxhash64(F.col(url_col)))
        .withColumn("host", host_udf(F.col(url_col)))
    )
