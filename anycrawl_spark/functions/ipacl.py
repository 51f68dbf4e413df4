"""API-key IP allowlist (apps/api/src/utils/ipUtils.ts): client-IP
extraction from proxy headers and exact/CIDR whitelist matching.

The reference gates every authenticated request on ``key.allowedIps``
(AuthMiddleware.ts:57). Mirrored here as pure kernels plus a column form
for filtering request TABLES (the batch-accounting shape: which logged
requests would the ACL have admitted).

Reference quirks reproduced (each observable):
- header priority CF-Connecting-IP > X-Forwarded-For (first hop of the
  comma chain) > X-Real-IP > req.ip (ipUtils.ts:13-48);
- empty/missing whitelist admits everything; unknown client IP is denied
  only when a whitelist exists (ipUtils.ts:60-70);
- octets and prefix lengths are parsed with JS ``parseInt`` leniency —
  ``"24abc"`` -> 24, ``"1e2"`` -> 1 (ipUtils.ts:115,157);
- the prefix-length guard allows 0..128 (an IPv6 bound) but the address
  math is IPv4-only, so prefixes 33..128 make the host-mask computation
  throw and the pattern silently never matches (ipUtils.ts:118-134);
  ``/0`` matches every valid IPv4 address.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# JS parseInt/trim exactness (whitespace + ASCII-digit sets) lives in the
# shared js module — every octet and prefix length below goes through it,
# and header values are trimmed with the JS set, not Python's wider one
# (.strip() would eat \x1c-\x1f which String.prototype.trim keeps).
from anycrawl_spark.functions.js import JS_WS_CLASS
from anycrawl_spark.functions.js import js_parse_int as _parse_int
from anycrawl_spark.functions.js import js_trim


def client_ip(headers: dict[str, str | list[str] | None], req_ip: str | None = None) -> str | None:
    """Resolve the client IP from proxy headers (ipUtils.ts:13-48).
    ``headers`` keys are lower-case header names; list values model Express's
    repeated-header arrays (first element wins, like the reference)."""
    def first(v):
        if isinstance(v, list):
            v = v[0] if v else None
        return v
    cf = first(headers.get("cf-connecting-ip"))
    if cf:
        return js_trim(cf)
    fwd = first(headers.get("x-forwarded-for"))
    if fwd:
        hop = js_trim(fwd.split(",")[0])
        if hop:
            return hop
    real = first(headers.get("x-real-ip"))
    if real:
        return js_trim(real)
    return req_ip or None


def _ip_to_number(ip: str) -> int | None:
    parts = ip.split(".")
    if len(parts) != 4:
        return None
    num = 0
    for p in parts:
        if not p:
            return None
        v = _parse_int(p)  # parseInt leniency: '01' -> 1, '1e2' -> 1
        if v is None or v < 0 or v > 255:
            return None
        num = (num << 8) | v
    return num


def _matches_cidr(ip: str, cidr: str) -> bool:
    network, _, prefix_str = cidr.partition("/")
    if not network or not prefix_str:
        return False
    prefix = _parse_int(prefix_str)
    if prefix is None or prefix < 0 or prefix > 128:
        return False
    ip_num, net_num = _ip_to_number(ip), _ip_to_number(network)
    if ip_num is None or net_num is None:
        return False
    if prefix > 32:
        return False  # 2n**negative throws in the reference -> caught -> false
    host_mask = (1 << (32 - prefix)) - 1
    subnet = ((1 << 32) - 1) ^ host_mask
    return (ip_num & subnet) == (net_num & subnet)


def is_ip_allowed(ip: str | None, whitelist: list[str] | None) -> bool:
    """Exact or CIDR whitelist check (ipUtils.ts:60-97)."""
    if not whitelist:
        return True
    if not ip:
        return False
    for pattern in whitelist:
        if ip == pattern:
            return True
        if "/" in pattern and _matches_cidr(ip, pattern):
            return True
    return False


def _octet(col: Column, i: int) -> Column:
    """Lenient octet: leading integer prefix of the i-th dot part (mirrors
    parseInt for the digit-prefixed cases), NULL when absent/out of range."""
    part = F.get(F.split(col, r"\."), i)
    # the whitespace class and sign handling must mirror JS parseInt exactly
    # (see _INT_PREFIX): Java's \s misses NBSP/Zs which JS trims, and a
    # leading '-' must parse so that '-0' is a VALID octet (-0 passes the
    # reference's 0..255 guard) while '-5' fails the range check.  Both were
    # live divergences found by differential fuzz vs the node oracle.
    digits = F.regexp_extract(part, f"^[{JS_WS_CLASS}]*([+-]?[0-9]+)", 1)
    # try_cast, not cast: under ANSI mode a plain cast THROWS on overflow-long
    # digit runs (e.g. a 25-digit octet) instead of yielding invalid
    v = F.when(digits != "", digits.try_cast("long"))
    return F.when((v >= 0) & (v <= 255), v)


def ip_number_expr(col: Column) -> Column:
    """IPv4 string column -> 32-bit number, NULL when invalid (4 dot parts,
    every octet 0..255 after lenient parse)."""
    ok4 = F.size(F.split(col, r"\.")) == 4
    num = F.lit(0).cast("long")
    for i in range(4):
        num = F.shiftleft(num, 8) + _octet(col, i)
    return F.when(col.isNotNull() & ok4, num)  # any NULL octet nulls the sum


def is_ip_allowed_expr(col: Column, whitelist: list[str] | None) -> Column:
    """Column form of ``is_ip_allowed``: the whitelist is a plan-time
    constant, so each pattern folds to an exact equality or one masked
    range compare — pure JVM math, no UDF."""
    if not whitelist:
        return F.lit(True)
    num = ip_number_expr(col)
    cond = F.lit(False)
    for pattern in whitelist:
        cond = cond | (col == pattern)
        network, _, prefix_str = pattern.partition("/")
        if "/" not in pattern or not network or not prefix_str:
            continue
        prefix = _parse_int(prefix_str)
        if prefix is None or prefix < 0 or prefix > 32:
            continue  # 33..128 never matches (reference quirk); invalid skipped
        net_num = _ip_to_number(network)
        if net_num is None:
            continue
        subnet = ((1 << 32) - 1) ^ ((1 << (32 - prefix)) - 1)
        cond = cond | (num.bitwiseAND(F.lit(subnet)) == F.lit(net_num & subnet))
    # empty-string clients are denied BEFORE matching (ipUtils.ts:67 '!ip'),
    # even when the whitelist literally contains '' — mirror that here
    return col.isNotNull() & (col != "") & F.coalesce(cond, F.lit(False))
