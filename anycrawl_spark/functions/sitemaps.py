"""Sitemap parsing (sitemaps.org protocol): urlset, sitemapindex, txt, gzip.

Completes the robots.txt loop: ``functions/robots.py`` already collects
``Sitemap:`` directives per host (RFC 9309 non-group lines); this module
parses the sitemap DOCUMENTS those directives point at into frontier seed
candidates. The reference (xienanzheng/AnyCrawl) has no sitemap ingestion —
like the robots layer (SURVEY §2.3 J6) this is rebuild-added crawl-tier
functionality, specced from the public sitemaps.org protocol
(https://www.sitemaps.org/protocol.html):

- XML ``<urlset>`` with per-``<url>`` ``loc`` (required), ``lastmod``
  (W3C datetime, kept verbatim), ``changefreq`` (closed vocabulary, else
  dropped), ``priority`` (default 0.5, valid 0.0..1.0, invalid -> default).
- XML ``<sitemapindex>`` whose ``<sitemap><loc>`` entries reference OTHER
  sitemap documents. Per the protocol an index must not list other index
  files, so resolution is one level deep — the operator layer joins child
  refs back to the corpus of fetched bodies instead of recursing.
- Plain-text format: one absolute URL per line.
- gzip transport (``sitemap.xml.gz``): sniffed by magic bytes.
- Limits: 50,000 URLs / 50 MB uncompressed per document; oversized inputs
  keep a deterministic prefix and carry an error marker.
- Location scope ("Sitemap file location"): a sitemap at
  ``http://example.com/catalog/sitemap.xml`` may only contain URLs under
  ``http://example.com/catalog/`` — same scheme, same host, same port,
  path under the sitemap's directory. Robots-submitted sitemaps
  (cross-submission) relax the path rule to whole-host scope. Out-of-scope
  entries are flagged, not silently dropped, so callers can count them.

Namespace handling matches lenient real-world parsers: tags are matched by
LOCAL name (the 0.9 namespace is customary but feeds vary), and entity/DTD
tricks are inert — ``xml.etree`` resolves no external entities and raises
on undefined ones, which this module converts into a per-document error
row (one hostile document must never fail a whole partition).

Scale shape: sitemap documents are O(hosts), not O(urls) — each body is
one input row (<=50 MB), parsed exactly once inside an Arrow stage
(``sources/sitemaps.py``), exploding to <=50k entry rows. Bodies never
shuffle; only (url, small metadata) rows leave the parse stage.
"""

from __future__ import annotations

import gzip
import math
import zlib
import xml.etree.ElementTree as ET
from urllib.parse import urlsplit

MAX_URLS = 50_000
MAX_BYTES = 50 * 1024 * 1024
MAX_URL_LEN = 2048
_CHANGEFREQS = {"always", "hourly", "daily", "weekly", "monthly", "yearly", "never"}
DEFAULT_PRIORITY = 0.5


def _localname(tag: str) -> str:
    """``{http://www.sitemaps.org/...}loc`` -> ``loc`` (match by local name)."""
    return tag.rpartition("}")[2].lower()


def scope_prefix(sitemap_url: str, robots_submitted: bool = False) -> str | None:
    """The URL prefix a sitemap at ``sitemap_url`` is allowed to cover.

    Protocol rule: scheme + host + port must match and the path must start
    with the sitemap's directory. Cross-submission via robots.txt widens
    the path scope to the whole host (the robots.txt at the host root
    vouches for it). Returns None when the location itself is unusable.
    """
    try:
        p = urlsplit(sitemap_url)
    except ValueError:
        return None
    if p.scheme.lower() not in ("http", "https") or not p.hostname:
        return None
    host = p.hostname.lower()
    try:
        port = p.port
    except ValueError:
        return None
    netloc = host if port is None else f"{host}:{port}"
    directory = "/" if robots_submitted else p.path.rpartition("/")[0] + "/"
    return f"{p.scheme.lower()}://{netloc}{directory}"


def in_scope(url: str, prefix: str | None) -> bool:
    """Case-normalized scope check: scheme+authority fold, path is exact."""
    if prefix is None:
        return False
    try:
        p = urlsplit(url)
    except ValueError:
        return False
    if not p.hostname:
        return False
    try:
        port = p.port
    except ValueError:
        return False
    netloc = p.hostname.lower() if port is None else f"{p.hostname.lower()}:{port}"
    folded = f"{p.scheme.lower()}://{netloc}{p.path}"
    return folded.startswith(prefix)


def _parse_priority(text: str | None) -> float:
    if text is None:
        return DEFAULT_PRIORITY
    try:
        v = float(text.strip())
    except ValueError:
        return DEFAULT_PRIORITY
    if not math.isfinite(v) or not (0.0 <= v <= 1.0):
        return DEFAULT_PRIORITY
    return v


def _decode_body(body: bytes | str) -> tuple[str | None, str | None]:
    """bytes/str -> (text, error). Sniffs gzip, enforces the 50 MB cap."""
    if isinstance(body, str):
        data = body.encode("utf-8", errors="replace")
    else:
        data = bytes(body or b"")
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error):
            # BadGzipFile is an OSError; a TRUNCATED stream raises EOFError
            # and corrupt deflate data raises zlib.error — all are data
            # faults that must become an error row, not a stage failure
            return None, "gzip_error"
    if len(data) > MAX_BYTES:
        return None, "too_large"
    return data.decode("utf-8", errors="replace"), None


def parse_sitemap(
    body: bytes | str,
    sitemap_url: str,
    robots_submitted: bool = False,
) -> dict:
    """Parse one sitemap document into entries / child refs.

    Returns ``{"kind": 'urlset'|'sitemapindex'|'txt'|None,
    "entries": [{"loc", "lastmod", "changefreq", "priority", "in_scope"}],
    "children": [{"loc", "in_scope"}], "error": str|None}``. ``entries``
    come from urlset/txt documents, ``children`` from an index. A document
    that cannot be decoded or parsed yields kind None + an error string —
    never an exception (row-wise failure isolation, same contract as the
    PNG codec's ``PngFormatError`` handling).
    """
    out = {"kind": None, "entries": [], "children": [], "error": None}
    text, err = _decode_body(body)
    if err:
        out["error"] = err
        return out
    prefix = scope_prefix(sitemap_url, robots_submitted=robots_submitted)
    stripped = text.lstrip("﻿ \t\r\n")
    if stripped.startswith("<"):
        return _parse_xml(stripped, prefix, out)
    return _parse_txt(stripped, prefix, out)


def _parse_xml(text: str, prefix: str | None, out: dict) -> dict:
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        out["error"] = "xml_error"
        return out
    kind = _localname(root.tag)
    if kind == "urlset":
        out["kind"] = "urlset"
        for el in root:
            if _localname(el.tag) != "url":
                continue
            fields: dict[str, str] = {}
            for child in el:
                name = _localname(child.tag)
                if name in ("loc", "lastmod", "changefreq", "priority"):
                    fields[name] = (child.text or "").strip()
            loc = fields.get("loc", "")
            if not loc or len(loc) > MAX_URL_LEN:
                continue
            freq = fields.get("changefreq", "").lower()
            out["entries"].append(
                {
                    "loc": loc,
                    "lastmod": fields.get("lastmod") or None,
                    "changefreq": freq if freq in _CHANGEFREQS else None,
                    "priority": _parse_priority(fields.get("priority")),
                    "in_scope": in_scope(loc, prefix),
                }
            )
            if len(out["entries"]) >= MAX_URLS:
                out["error"] = "too_many_urls"
                break
        return out
    if kind == "sitemapindex":
        out["kind"] = "sitemapindex"
        for el in root:
            if _localname(el.tag) != "sitemap":
                continue
            loc = ""
            for child in el:
                if _localname(child.tag) == "loc":
                    loc = (child.text or "").strip()
            if not loc or len(loc) > MAX_URL_LEN:
                continue
            # index scope follows the same location rule: a child sitemap
            # must live under the index's own directory (or host, when
            # robots-submitted) for its entries to be trusted
            out["children"].append({"loc": loc, "in_scope": in_scope(loc, prefix)})
            if len(out["children"]) >= MAX_URLS:
                out["error"] = "too_many_urls"
                break
        return out
    out["error"] = f"unknown_root:{kind}"
    return out


def _parse_txt(text: str, prefix: str | None, out: dict) -> dict:
    out["kind"] = "txt"
    for line in text.splitlines():
        loc = line.strip()
        if not loc:
            continue
        if len(loc) > MAX_URL_LEN or not (
            loc.startswith("http://") or loc.startswith("https://")
        ):
            continue  # txt format: nothing but absolute URLs is valid
        out["entries"].append(
            {
                "loc": loc,
                "lastmod": None,
                "changefreq": None,
                "priority": DEFAULT_PRIORITY,
                "in_scope": in_scope(loc, prefix),
            }
        )
        if len(out["entries"]) >= MAX_URLS:
            out["error"] = "too_many_urls"
            break
    return out
