"""SURT keys + CDX capture-index rows (public wayback/pywb conventions).

SURT (Sort-friendly URI Reordering Transform) is the canonical key a
web archive indexes captures under: reversing the host labels makes a
plain lexicographic sort cluster every capture of a site (and its
subdomains) contiguously — which is exactly what a range-partitioned
100 TB index wants. CDX is the line-oriented capture index pywb /
OpenWayback read: one row per archived record, keyed (surt, timestamp),
pointing at (filename, offset, length) inside a WARC segment.

The reference (xienanzheng/AnyCrawl) has neither — like the WARC layer
this is rebuild-added crawl-tier functionality, specced from the public
format descriptions only. The transform here is the standard
canonicalization subset that both the Spark column path
(`sources/warc.py:surt_key_col`) and the SQL oracle can restate
byte-for-byte:

- lowercase the entire URL (default surt-library behavior);
- drop the scheme (http/https treated alike);
- strip one leading ``www.`` label (wayback massaging rule);
- drop default ports (:80, :443), keep explicit non-default ports;
- reverse the remaining host labels, join with commas;
- append ``)`` + path;
- sort query parameters bytewise and re-join with ``&`` (so
  ``?b=2&a=1`` and ``?a=1&b=2`` collide, per canonicalization);
- drop fragments.

Kept deliberately OUT (documented, not forgotten): IDN/punycode and
%-escape normalization (the WHATWG layer in ``functions/urls.py``
already canonicalizes those upstream), session-id param stripping
(policy, not transform).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surt_key_col(url: Column) -> Column:
    """The SURT transform as pure JVM column math — byte-equal to the
    sequential kernel below (differential-tested). Every step is a
    built-in string/array expression, so SURT keys for 10^10 captures
    stay inside whole-stage codegen; the subexpression duplication
    (hostport/rest referenced repeatedly) collapses in Catalyst's CSE."""
    u0 = F.regexp_replace(F.lower(url), "^https?://", "")
    u = F.split(u0, "#").getItem(0)
    hostport = F.regexp_extract(u, "^([^/?]*)", 1)
    rest = F.substr(u, F.length(hostport) + F.lit(1))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    host = F.regexp_replace(
        F.regexp_replace(hostport, ":[0-9]+$", ""), r"^www\.", ""
    )
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    revp = F.when(
        (port != "") & ~port.isin("80", "443"),
        F.concat(rev, F.lit(":"), port),
    ).otherwise(rev)
    path0 = F.regexp_extract(rest, "^([^?]*)", 1)
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    query = F.substr(rest, F.instr(rest, "?") + F.lit(1))
    sortedq = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.when(
        F.instr(rest, "?") > 0,
        F.concat(revp, F.lit(")"), path, F.lit("?"), sortedq),
    ).otherwise(F.concat(revp, F.lit(")"), path))


def surt(url: str) -> str:
    """Sequential reference kernel (tests + oracle derivation)."""
    u = url.lower()
    for scheme in ("https://", "http://"):
        if u.startswith(scheme):
            u = u[len(scheme) :]
            break
    u = u.split("#", 1)[0]
    # split host[:port] from path?query at the first / or ?
    cut = len(u)
    for ch in "/?":
        i = u.find(ch)
        if i >= 0:
            cut = min(cut, i)
    hostport, rest = u[:cut], u[cut:]
    host, _, port = hostport.partition(":")
    if host.startswith("www."):
        host = host[4:]
    rev = ",".join(reversed(host.split(".")))
    if port and port not in ("80", "443"):
        rev += ":" + port
    path, q, query = rest.partition("?")
    if not path:
        path = "/"
    if q:
        query = "&".join(sorted(query.split("&")))
        return f"{rev}){path}?{query}"
    return f"{rev}){path}"
