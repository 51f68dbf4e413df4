"""IP allowlist parity (apps/api/src/utils/ipUtils.ts): header priority
chain, exact/CIDR matching, parseInt leniency, the 33..128-prefix quirk,
expr↔mirror agreement on a grid, and a seeded differential fuzz that
executes the reference's own source under node (loaded from the reference
checkout at test time and mechanically type-stripped — no reference code
lives in this repo; the fuzz skips when the checkout or node is absent)."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from node_oracle import have_node_oracle, run_reference_js

from anycrawl_spark.functions.ipacl import (
    client_ip,
    is_ip_allowed,
    is_ip_allowed_expr,
)


def test_client_ip_priority_chain():
    # CF > X-Forwarded-For(first hop) > X-Real-IP > req.ip (ipUtils.ts:13-48)
    h = {
        "cf-connecting-ip": " 1.1.1.1 ",
        "x-forwarded-for": "2.2.2.2, 3.3.3.3",
        "x-real-ip": "4.4.4.4",
    }
    assert client_ip(h, "5.5.5.5") == "1.1.1.1"
    del h["cf-connecting-ip"]
    assert client_ip(h, "5.5.5.5") == "2.2.2.2"
    h["x-forwarded-for"] = ["9.9.9.9, 8.8.8.8", "7.7.7.7"]  # repeated header
    assert client_ip(h, None) == "9.9.9.9"
    assert client_ip({"x-real-ip": "4.4.4.4"}, None) == "4.4.4.4"
    assert client_ip({}, "5.5.5.5") == "5.5.5.5"
    assert client_ip({}, None) is None


def test_allowlist_semantics():
    # empty/missing whitelist admits all; no IP denied only under a whitelist
    assert is_ip_allowed(None, None)
    assert is_ip_allowed(None, [])
    assert not is_ip_allowed(None, ["1.2.3.4"])
    # exact + CIDR
    wl = ["10.1.2.3", "192.168.1.0/24"]
    assert is_ip_allowed("10.1.2.3", wl)
    assert not is_ip_allowed("10.1.2.4", wl)
    assert is_ip_allowed("192.168.1.77", wl)
    assert not is_ip_allowed("192.168.2.77", wl)
    # /0 matches any valid IPv4; /32 is exact
    assert is_ip_allowed("8.8.8.8", ["0.0.0.0/0"])
    assert is_ip_allowed("1.2.3.4", ["1.2.3.4/32"])
    assert not is_ip_allowed("1.2.3.5", ["1.2.3.4/32"])
    # reference quirk: prefix 33..128 passes validation but can never match
    assert not is_ip_allowed("1.2.3.4", ["1.2.3.4/64"])
    # parseInt leniency: '24abc' -> 24 (ipUtils.ts:115)
    assert is_ip_allowed("192.168.1.9", ["192.168.1.0/24abc"])
    # exact string match runs BEFORE numeric parsing: non-IP strings can match
    assert is_ip_allowed("not-an-ip", ["not-an-ip"])
    # invalid network / malformed CIDR never match
    assert not is_ip_allowed("1.2.3.4", ["1.2.3/8", "/8", "1.2.3.4/"])
    assert not is_ip_allowed("1.2.3.400", ["0.0.0.0/0"])  # octet > 255


def test_expr_matches_mirror(spark):
    ips = [
        "10.1.2.3", "10.1.2.4", "192.168.1.77", "192.168.2.77", "8.8.8.8",
        "1.2.3.4", "1.2.3.5", "1.2.3.400", "not-an-ip", "", None,
        "255.255.255.255", "0.0.0.0", "01.2.3.4",
    ]
    wls = [
        None,
        [],
        ["10.1.2.3", "192.168.1.0/24"],
        ["0.0.0.0/0"],
        ["1.2.3.4/32", "not-an-ip"],
        ["1.2.3.4/64", "1.2.3/8"],
    ]
    df = spark.createDataFrame(pd.DataFrame({"ip": ips}))
    for wl in wls:
        got = {
            r.ip: r.ok
            for r in df.withColumn("ok", is_ip_allowed_expr(F.col("ip"), wl)).collect()
        }
        for ip in ips:
            assert got[ip] == is_ip_allowed(ip, wl), (ip, wl)


def test_empty_ip_denied_even_with_empty_whitelist_entry(spark):
    # reference denies '' BEFORE matching (ipUtils.ts:67), even if '' is
    # whitelisted — both forms must agree
    assert not is_ip_allowed("", [""])
    df = spark.createDataFrame(pd.DataFrame({"ip": ["", "x"]}))
    got = {r.ip: r.ok for r in df.withColumn("ok", is_ip_allowed_expr(F.col("ip"), ["", "x"])).collect()}
    assert got == {"": False, "x": True}


def test_expr_survives_ansi_overflow_octet(spark):
    # 25-digit octet: plain cast throws under ANSI mode; must yield denied
    ip = "1.2.3.9999999999999999999999999"
    df = spark.createDataFrame(pd.DataFrame({"ip": [ip]}))
    r = df.withColumn("ok", is_ip_allowed_expr(F.col("ip"), ["0.0.0.0/0"])).collect()[0]
    assert r.ok is False and not is_ip_allowed(ip, ["0.0.0.0/0"])


# --- parseInt-exactness goldens (each was a live divergence found by the
# node differential fuzz below; values confirmed against the reference
# logic under node 20) ---

PARSEINT_GOLDENS = [
    # '-0' octet: parseInt('-0') = -0, which passes the 0..255 guard
    # (ipUtils.ts:163) — so '-0.2.3.4' is a VALID address equal to 0.2.3.4
    ("-0.2.3.4", ["0.2.3.0/24"], True),
    # NBSP is JS parseInt whitespace (Zs): '\xa05' parses to 5
    ("\xa05.2.3.4", ["5.2.3.0/24"], True),
    # \x1c is Python-\s whitespace but NOT JS whitespace: parseInt -> NaN.
    # Before the fix this CRASHED the Python kernel (int('\x1c5')).
    ("\x1c5.2.3.4", ["5.2.3.0/24"], False),
    # Unicode digits (U+0665) match Python \d but not JS parseInt
    ("٥.2.3.4", ["5.2.3.0/24"], False),
    ("+5.2.3.4", ["5.2.3.0/24"], True),   # explicit plus sign
    ("-5.2.3.4", ["0.0.0.0/0"], False),   # negative fails 0..255
    # '-0' prefix length: parseInt('-0') = -0 passes the 0..128 guard -> /0
    ("9.9.9.9", ["1.2.3.4/-0"], True),
]


@pytest.mark.parametrize("ip,wl,want", PARSEINT_GOLDENS)
def test_parseint_exactness_goldens(ip, wl, want):
    assert is_ip_allowed(ip, wl) is want


def test_parseint_goldens_expr_agrees(spark):
    df = spark.createDataFrame(pd.DataFrame({"ip": [c[0] for c in PARSEINT_GOLDENS]}))
    for ip, wl, want in PARSEINT_GOLDENS:
        got = {r.ip: bool(r.ok) for r in df.withColumn(
            "ok", is_ip_allowed_expr(F.col("ip"), wl)).collect()}
        assert got[ip] is want, (ip, wl)


# --- differential fuzz vs the reference's actual source under node ---
#
# The oracle is apps/api/src/utils/ipUtils.ts itself, read from the
# reference checkout at test time and type-stripped by tests/node_oracle —
# parseInt leniency, BigInt mask arithmetic, and the 33..128
# throw-to-false path all run verbatim under node.

_IPUTILS = "apps/api/src/utils/ipUtils.ts"

_DRIVER_JS = """
const data = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(data.map(c =>
    c.kind === "allowed" ? isIpAllowed(c.ip, c.whitelist)
                         : getClientIp({ headers: c.headers, ip: c.req_ip }))));
"""

_OCTETS = [
    "0", "1", "5", "9", "10", "00", "007", "255", "256", "-0", "-1", "+5",
    "+0", " 5", "5 ", "5x", "1e2", "0x10", "", ".", "24abc", "2.5",
    "\x1c5", "\xa05", "﻿5", " 5", " 5", "　5", "\t5",
    "\v5", "٥", "1٥", "9" * 20, "9" * 40, "Infinity", "NaN",
    "--5", "+-5", " +5", "+ 5", "0.0", "128", "254",
]
_PREFIXES = [
    "0", "1", "8", "16", "24", "31", "32", "33", "64", "128", "129", "-0",
    "-1", "+24", " 24", "24 ", "24abc", "1e2", "0x18", "", "abc",
    "9" * 20, "\xa024", "\x1c24", "032", "2.9",
]
_HDR_VALS = [None, "", " ", "1.2.3.4", " 1.2.3.4 ", "a, b", ", 9.9.9.9",
             " , 8.8.8.8", "1.2.3.4,5.6.7.8", ",", [], [""], ["5.6.7.8"],
             ["", "7.7.7.7"], [" 9.8.7.6 , 1.1.1.1"], "\xa01.2.3.4\xa0",
             # \x1c: Python-strip whitespace that JS trim PRESERVES
             "\x1c1.2.3.4\x1c", ["\x1c2.2.2.2"]]


def _rand_ip(rnd):
    if rnd.random() < 0.05:
        return rnd.choice(["", " ", "1.2.3.4.5", "1.2.3", "...", "1..3.4",
                           ".1.2.3", "1.2.3.", "localhost", "::1",
                           "0.0.0.0", "255.255.255.255"])
    n = 4 if rnd.random() < 0.85 else rnd.choice([1, 2, 3, 5])
    return ".".join(rnd.choice(_OCTETS) for _ in range(n))


def _rand_pattern(rnd):
    r = rnd.random()
    if r < 0.35:
        return _rand_ip(rnd)
    net, pfx = _rand_ip(rnd), rnd.choice(_PREFIXES)
    if r < 0.40:
        return f"{net}/{pfx}/{rnd.choice(_PREFIXES)}"
    if r < 0.45:
        return f"/{pfx}"
    if r < 0.50:
        return f"{net}/"
    return f"{net}/{pfx}"


@pytest.mark.skipif(
    not have_node_oracle(_IPUTILS),
    reason="node or the reference checkout not available",
)
def test_ipacl_differential_fuzz_vs_reference_logic():
    """Seeded fuzz of is_ip_allowed/client_ip vs the reference's own
    source (type-stripped at load time) executed by node: adversarial
    octets covering the parseInt whitespace set, signed zero, Unicode
    digits, overflow digit runs, malformed CIDRs, and proxy-header
    chains."""
    rnd = random.Random(20260818)
    cases = []
    for _ in range(8000):
        if rnd.random() < 0.8:
            wl = (None if rnd.random() < 0.05 else [] if rnd.random() < 0.05
                  else [_rand_pattern(rnd) for _ in range(rnd.randint(1, 4))])
            cases.append({"kind": "allowed", "ip": _rand_ip(rnd),
                          "whitelist": wl})
        else:
            headers = {h: rnd.choice(_HDR_VALS)
                       for h in ("cf-connecting-ip", "x-forwarded-for",
                                 "x-real-ip") if rnd.random() < 0.6}
            headers = {k: v for k, v in headers.items() if v is not None}
            cases.append({"kind": "client", "headers": headers,
                          "req_ip": rnd.choice([None, "", "6.6.6.6"])})
    ref = run_reference_js(_IPUTILS, _DRIVER_JS, cases)
    diverging = []
    for c, exp in zip(cases, ref):
        got = (is_ip_allowed(c["ip"], c["whitelist"])
               if c["kind"] == "allowed"
               else client_ip(c["headers"], c["req_ip"]))
        if got != exp:
            diverging.append((c, exp, got))
    assert diverging == [], diverging[:20]
