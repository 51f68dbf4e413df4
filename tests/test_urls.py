"""URL kernel unit tests (SURVEY §2.4 C1-C3 semantics)."""

import pandas as pd
import pytest

from node_oracle import fuzz_seed

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
        # --- WHATWG-aligned behaviors (differential-fuzzed vs Node) ---
        # special-authority-ignore-slashes: 0/1/3 slashes and backslashes
        ("http:example.com/a", "http://example.com/a"),
        ("http:///example.com/a", "http://example.com/a"),
        ("http:\\\\example.com\\a\\b", "http://example.com/a/b"),
        # dot segments resolve, including percent-encoded spellings
        ("http://e.com/a/../b/./c", "http://e.com/b/c"),
        ("http://e.com/a/%2e%2e/b/%2E/c", "http://e.com/b/c"),
        ("http://e.com/a/..", "http://e.com/"),
        ("http://e.com/a/.", "http://e.com/a/"),
        ("http://e.com/..", "http://e.com/"),
        # WHATWG path percent-encode set (space " < > ` { } + non-ASCII);
        # ' | ^ stay verbatim; existing % bytes are never touched
        ('http://e.com/a b/"x"/<y>/`/{z}', "http://e.com/a%20b/%22x%22/%3Cy%3E/%60/%7Bz%7D"),
        ("http://e.com/café", "http://e.com/caf%C3%A9"),
        ("http://e.com/'/|/^/%41/%zz/%", "http://e.com/'/|/^/%41/%zz/%"),
        # spaces before a fragment are PATH content (WHATWG trims only the
        # whole-input ends), and tab/CR/LF vanish anywhere
        ("http://e.com/a  #f", "http://e.com/a%20%20"),
        ("ht\ttp://e\n.com/a\r", "http://e.com/a"),
        # IPv6 hosts keep brackets; address canonicalizes to shortest form
        ("http://[::1]:8080/a", "http://[::1]:8080/a"),
        ("HTTP://[2001:DB8:0:0:0:0:0:1]/a", "http://[2001:db8::1]/a"),
        ("https://[::1]:443/a", "https://[::1]/a"),
        # ends-in-number hosts parse as IPv4 (hex/octal/short forms)
        ("http://0x7f.1/a", "http://127.0.0.1/a"),
        ("http://0177.0.0.1/a", "http://127.0.0.1/a"),
        ("http://2130706433/a", "http://127.0.0.1/a"),
        # percent-encoded hosts decode; IDN hosts punycode
        ("http://host%41.com/a", "http://hosta.com/a"),
        ("http://münchen.de/a", "http://xn--mnchen-3ya.de/a"),
    ],
)
def test_canonicalize(raw, expected):
    assert canonicalize_url(raw) == expected


@pytest.mark.parametrize(
    "raw",
    [
        # WHATWG-fatal ports: out of range, non-digit, interior whitespace
        "http://e.com:65536/a",
        "http://e.com:bogus/a",
        "http://e.com:80 /a",
        "http://e.com:+80/a",
        # ends-in-number hosts that fail the IPv4 parser are fatal
        "http://192.168.1.256/a",
        "http://1.2.3.4.5/a",
        # forbidden host code points
        "http://ex ample.com/a",
        "http://ex|ample.com/a",
        # invalid IPv6
        "http://[::zz]/a",
    ],
)
def test_canonicalize_rejects_whatwg(raw):
    assert canonicalize_url(raw) is None


def test_canonicalize_idempotent_on_fuzz_corpus():
    """canon(canon(u)) == canon(u) over the same structured generator the
    node differential fuzz uses — canonical forms must be fixed points."""
    import random

    random.seed(fuzz_seed(20260818))
    for _ in range(4000):
        u = _gen_fuzz_url(random)
        c = canonicalize_url(u)
        if c is not None:
            assert canonicalize_url(c) == c, (u, c, canonicalize_url(c))


@pytest.mark.parametrize(
    "raw", ["", "javascript:void(0)", "mailto:x@y.z", "#", "ftp://x/y", "not a url"]
)
def test_canonicalize_rejects(raw):
    assert canonicalize_url(raw) is None


# Structured URL generator shared by the idempotency property and the node
# differential fuzz: scheme soup, userinfo, hostile hosts (IDN, percent,
# dotted numbers, IPv6, forbidden chars), ports, path atoms exercising dot
# segments / backslashes / the percent-encode set, query/fragment noise.
_FUZZ_SCHEMES = ["http://", "https://", "HTTP://", "Http://", "http:/",
                 "https:/", "http:", "ftp://", "javascript:", "", "//",
                 "http:\\\\", "http:///"]
_FUZZ_USERINFO = ["", "", "", "", "user@", "user:pass@", "@", "a:b:c@"]
_FUZZ_HOSTS = ["example.com", "Example.COM", "EXAMPLE.com", "sub.ex.co.uk",
               "example.com.", "example..com", "127.0.0.1", "0x7f.1", "[::1]",
               "[2001:db8::1]", "a_b.com", "xn--nxasmq6b.com", "ex ample.com",
               "münchen.de", "e", ".", "..", "com.", "1.2.3.4.5",
               "192.168.1.256", "host%41.com", "ex\tam\nple.com",
               "ex\\ample.com", "example.com\\x",
               # non-IPv6 bracket hosts and invalid ACE labels throw in node
               "[v1.x]", "[1.2.3.4]", "[::zz]", "xn--", "xn--a.com",
               "xn--zzzzzz.com", "xn--9ca.fr", "a.xn--0.b"]
_FUZZ_PORTS = ["", "", "", "", ":80", ":443", ":8080", ":0", ":65535",
               ":65536", ":bogus", ":", ":008080", ":80 "]
_FUZZ_PATHSEGS = ["a", "b", "A B", "..", ".", "...", "a.html", "%2e%2e",
                  "%2E", "%41", "%zz", "%", "é", "a\\b", "\\", "a b", "~u",
                  "a:b", "@x", "'", '"', "<x>", "|", "^", "`", "{}", "a?b",
                  "  ", "a#b", "%20"]
_FUZZ_QUERIES = ["", "", "", "?a=1&b=2", "?b=2&a=1", "?utm_source=x&a=1",
                 "?UTM_X=1&z=2", "?a=%20&b=+", "?a=1&a=2", "?=x", "?a", "??",
                 "?a=1;b=2", "?a=é", "?a=%zz", "?utm_", "?a==b", "?a&b&c"]
_FUZZ_FRAGS = ["", "", "", "#f", "#", "#a#b", "#é"]
_FUZZ_WS = ["", "", "", " ", "\t", "\n", "  \t"]


def _gen_fuzz_url(rng) -> str:
    s = (rng.choice(_FUZZ_WS) + rng.choice(_FUZZ_SCHEMES)
         + rng.choice(_FUZZ_USERINFO) + rng.choice(_FUZZ_HOSTS)
         + rng.choice(_FUZZ_PORTS))
    n = rng.randint(0, 4)
    if n or rng.random() < 0.8:
        s += "/" + "/".join(rng.choice(_FUZZ_PATHSEGS) for _ in range(n))
    if rng.random() < 0.1:
        s += "/"
    return s + rng.choice(_FUZZ_QUERIES) + rng.choice(_FUZZ_FRAGS) + rng.choice(_FUZZ_WS)


@pytest.mark.skipif(not __import__("shutil").which("node"),
                    reason="node not available")
def test_canonicalize_differential_fuzz_vs_whatwg():
    """Seeded differential check of the parsing projection against Node's
    real WHATWG URL parser — the semantics the reference inherits through
    Crawlee's computeUniqueKey (Base.ts:413-419 -> new URL). Documented
    deviations are normalized before diffing: trailing host dots and IPv6
    brackets fold on the node side; hosts that are ONLY dots are ours to
    reject; the query projection is excluded (decode-sort-reencode + utm_*
    strip is a documented rebuild decision)."""
    import json
    import random
    import subprocess
    from urllib.parse import urlsplit as _split

    from anycrawl_spark.functions.urls import canonicalize_url_host

    random.seed(fuzz_seed(20260818))
    cases = [_gen_fuzz_url(random) for _ in range(4000)]
    script = (
        "const cases = JSON.parse(require('fs').readFileSync(0, 'utf8'));"
        "console.log(JSON.stringify(cases.map(s => {"
        "  try { const u = new URL(s.trim());"
        "    return [u.protocol, u.hostname, u.port, u.pathname]; }"
        "  catch (e) { return null; }})));"
    )
    out = subprocess.run(["node", "-e", script], input=json.dumps(cases),
                         capture_output=True, text=True, timeout=120)
    node = json.loads(out.stdout)
    diverging = []
    for s, nd in zip(cases, node):
        canon, _h = canonicalize_url_host(s)
        if nd is None or nd[0] not in ("http:", "https:"):
            if canon is not None and nd is None:
                diverging.append((s, canon, None))
            continue
        if canon is None:
            if nd[1].strip(".") != "":  # dot-only hosts: documented fold
                diverging.append((s, None, nd))
            continue
        p = _split(canon)
        nhost = nd[1].strip("[]").rstrip(".").lower()
        nport = None if nd[2] == "" else int(nd[2])
        if p.hostname != nhost or p.port != nport or p.path != nd[3]:
            diverging.append((s, (p.hostname, p.port, p.path), nd))
    assert diverging == [], diverging[:15]


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


def test_public_suffix_list_semantics():
    """PSL algorithm (publicsuffix.org): longest match, wildcards,
    exceptions, implicit default rule, private platform suffixes."""
    from anycrawl_spark.data.public_suffixes import public_suffix, registrable_domain_psl

    assert public_suffix("www.bbc.co.uk") == "co.uk"
    assert registrable_domain_psl("www.bbc.co.uk") == "bbc.co.uk"
    # private suffix: every *.github.io site is its own registrable domain
    assert public_suffix("foo.github.io") == "github.io"
    assert registrable_domain_psl("foo.github.io") == "foo.github.io"
    assert registrable_domain_psl("deep.sub.foo.github.io") == "foo.github.io"
    assert registrable_domain_psl("a.github.io") != registrable_domain_psl("b.github.io")
    # multi-label ccTLD families the round-1 sample missed
    assert registrable_domain_psl("shop.example.co.nz") == "example.co.nz"
    assert registrable_domain_psl("x.example.com.tr") == "example.com.tr"
    # wildcard rule *.ck with exception !www.ck
    assert public_suffix("a.something.ck") == "something.ck"
    assert registrable_domain_psl("b.a.something.ck") == "a.something.ck"
    assert registrable_domain_psl("sub.www.ck") == "www.ck"
    # Japanese city wildcards + exceptions
    assert registrable_domain_psl("x.y.kawasaki.jp") == "x.y.kawasaki.jp"
    assert registrable_domain_psl("x.city.kawasaki.jp") == "city.kawasaki.jp"
    # unknown TLD: implicit '*' default
    assert registrable_domain_psl("a.b.veryunknown") == "b.veryunknown"
    # degenerate inputs
    assert registrable_domain_psl(None) is None
    assert registrable_domain_psl("localhost") == "localhost"


# checkPublicSuffix(input, expected_eTLD+1) vectors ported from the PSL's own
# test suite (publicsuffix.org test_psl.txt), restricted to families present
# in the vendored snapshot. None = no registrable domain.
PSL_TEST_VECTORS = [
    # null / degenerate input
    (None, None),
    ("", None),
    (".com", None),
    ("com", None),
    ("example", None),
    # mixed case
    ("COM", None),
    ("example.COM", "example.com"),
    ("WwW.example.COM", "example.com"),
    # unlisted TLD (implicit '*' default rule)
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("a.b.example.example", "example.example"),
    # TLD with only one (implicit) rule
    ("biz", None),
    ("domain.biz", "domain.biz"),
    ("b.domain.biz", "domain.biz"),
    ("a.b.domain.biz", "domain.biz"),
    # TLD with some two-level rules
    ("uk.com", "uk.com"),  # not a listed suffix here -> com's +1
    ("example.uk.com", "uk.com"),
    # uk family
    ("co.uk", None),
    ("example.co.uk", "example.co.uk"),
    ("b.example.co.uk", "example.co.uk"),
    ("a.b.example.co.uk", "example.co.uk"),
    # jp: flat, prefecture, city wildcard + exception
    ("jp", None),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kyoto.jp", None),
    ("test.kyoto.jp", "test.kyoto.jp"),
    ("kobe.jp", "kobe.jp"),  # *.kobe.jp needs 3 labels; implicit '*' wins
    ("test.kobe.jp", None),  # *.kobe.jp: test.kobe.jp IS a suffix
    ("www.test.kobe.jp", "www.test.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),  # exception !city.kobe.jp
    ("www.city.kobe.jp", "city.kobe.jp"),
    # ck: wildcard with exception
    ("ck", None),
    ("test.ck", None),  # *.ck: test.ck IS a suffix
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),  # exception !www.ck
    ("www.www.ck", "www.ck"),
    # us: state locality scheme
    ("us", None),
    ("test.us", "test.us"),
    ("www.test.us", "test.us"),
    ("ak.us", None),
    ("test.ak.us", "test.ak.us"),
    ("www.test.ak.us", "test.ak.us"),
    ("k12.ak.us", None),
    ("test.k12.ak.us", "test.k12.ak.us"),
    ("www.test.k12.ak.us", "test.k12.ak.us"),
    # private-section domains
    ("blogspot.com", None),
    ("foo.blogspot.com", "foo.blogspot.com"),
    ("www.foo.blogspot.com", "foo.blogspot.com"),
    # trailing dot normalized
    ("example.com.", "example.com"),
]


def test_psl_official_vectors():
    from anycrawl_spark.data.public_suffixes import etld_plus_one

    for host, expected in PSL_TEST_VECTORS:
        assert etld_plus_one(host) == expected, (host, expected, etld_plus_one(host))


def test_psl_dat_parser_and_sections():
    """The snapshot ships in the real .dat format; the parser honors comments,
    blank lines, whitespace truncation, and the ICANN/PRIVATE split."""
    from anycrawl_spark.data.public_suffixes import (
        ICANN_RULES, PRIVATE_RULES, RULES, parse_psl,
    )

    icann, private = parse_psl(
        "// comment\n\ncom\n*.ck  trailing junk\n!www.ck\n"
        "// ===BEGIN PRIVATE DOMAINS===\nGithub.IO\n// ===END PRIVATE DOMAINS===\n"
    )
    assert icann == ["com", "*.ck", "!www.ck"]
    assert private == ["github.io"]  # lowercased, whitespace-truncated

    # snapshot invariants the matcher relies on
    assert "co.uk" in ICANN_RULES and "*.ck" in ICANN_RULES and "!www.ck" in ICANN_RULES
    assert "github.io" in PRIVATE_RULES and "github.io" not in ICANN_RULES
    assert len(RULES) == len(ICANN_RULES) + len(PRIVATE_RULES)
    assert len(ICANN_RULES) > 500  # us-state + jp-prefecture blocks present
    assert len(set(RULES)) == len(RULES)  # no duplicate rules


def test_same_domain_scope_github_io(spark):
    """F3 same-domain on a private-suffix seed: sibling *.github.io sites are
    OUT of scope (the round-1 suffix sample admitted them), subdomains of the
    seed site stay IN scope."""
    from pyspark.sql import functions as F

    from anycrawl_spark.operators.gates import make_candidate_gate

    jobs = [{
        "job_id": "j", "seed_url": "http://host0001.github.io/p/0",
        "strategy": "same-domain", "max_depth": 5, "limit": 100,
    }]
    gate = make_candidate_gate(jobs, {})
    df = spark.createDataFrame(
        [("j", "http://host0001.github.io/p/1"),
         ("j", "http://sub.host0001.github.io/p/2"),
         ("j", "http://host0002.github.io/p/3"),
         ("j", "http://github.io/p/4")],
        "job_id string, url string",
    )
    out = df.select(
        gate(F.col("job_id"), F.col("url"), F.lit(None)).alias("g")
    ).select("g.*")
    keep = {r.url: r.keep for r in out.collect()}
    assert keep["http://host0001.github.io/p/1"] is True
    assert keep["http://sub.host0001.github.io/p/2"] is True
    assert keep["http://host0002.github.io/p/3"] is False
    assert keep["http://github.io/p/4"] is False


def test_registrable_domain_fixpoint_property():
    """registrable_domain is a fixpoint: applying it twice equals once (the
    eTLD+1 of an eTLD+1 is itself) — over a varied host corpus."""
    from anycrawl_spark.data.public_suffixes import registrable_domain_psl

    hosts = [
        "a.b.c.example.com", "x.github.io", "a.x.github.io", "www.bbc.co.uk",
        "deep.www.bbc.co.uk", "e.co.nz", "f.e.co.nz", "g.com.tr",
        "a.something.ck", "b.a.something.ck", "sub.www.ck",
        "x.city.kawasaki.jp", "a.b.kawasaki.jp", "localhost",
        "a.veryunknown", "b.a.veryunknown", "s3.amazonaws.com",
        "bucket.s3.amazonaws.com", "x.blogspot.com", "www.x.blogspot.com",
    ]
    for h in hosts:
        once = registrable_domain_psl(h)
        assert registrable_domain_psl(once) == once, h
