"""IP allowlist parity (apps/api/src/utils/ipUtils.ts): header priority
chain, exact/CIDR matching, parseInt leniency, the 33..128-prefix quirk,
and expr↔mirror agreement on a grid."""

import pandas as pd
from pyspark.sql import functions as F

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
