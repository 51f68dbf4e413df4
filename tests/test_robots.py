"""RFC 9309 robots.txt parser + matcher tests.

The precedence/anchor cases are hand-written from the published RFC 9309
examples (§2.2.2 / §5) and the documented behavior of Google's public
robotstxt matcher — no reference-repo counterpart exists (robots gating is
rebuild-added functionality, SURVEY §2.3 J6).
"""

from node_oracle import fuzz_seed

from anycrawl_spark.crawl.params import robots_decision
from anycrawl_spark.functions.robots import (
    as_prefix_rules,
    compile_robots,
    match_pattern,
    parse_robots_txt,
    product_token,
    robots_allowed_rfc,
    select_group,
)

SAMPLE = """
# global comment
Sitemap: https://example.com/sitemap.xml

User-agent: FooBot
Disallow: /private/        # trailing comment
Allow: /private/ok
Crawl-delay: 2.5

User-agent: BarBot
User-agent: BazBot
Disallow: /bar
Unknown-directive: whatever

Disallow: /ignored-no-group-restart
User-agent: *
Disallow: /all
Sitemap: https://example.com/extra.xml
"""


def test_parse_groups_and_globals():
    p = parse_robots_txt(SAMPLE)
    assert [g["agents"] for g in p["groups"]][:3] == [["foobot"], ["barbot", "bazbot"], ["*"]]
    foo = p["groups"][0]
    assert foo["rules"] == [("disallow", "/private/"), ("allow", "/private/ok")]
    assert foo["crawl_delay"] == 2.5
    # the dangling Disallow after a rules block starts NO new group — but it
    # also does not belong to BarBot's group (a rules line after rules with
    # no new user-agent line stays in the current group per the RFC grammar)
    assert ("disallow", "/ignored-no-group-restart") in p["groups"][1]["rules"]
    assert p["sitemaps"] == [
        "https://example.com/sitemap.xml",
        "https://example.com/extra.xml",
    ]


def test_parse_edge_cases():
    # rules before any user-agent line are ignored; empty patterns dropped
    p = parse_robots_txt("Disallow: /early\nUser-agent: a\nDisallow:\nAllow: /x")
    assert p["groups"] == [{"agents": ["a"], "rules": [("allow", "/x")], "crawl_delay": None}]
    # keys are case-insensitive, values keep case
    p = parse_robots_txt("USER-AGENT: FooBot\nDISALLOW: /CaseSensitivePath")
    assert p["groups"][0] == {
        "agents": ["foobot"],
        "rules": [("disallow", "/CaseSensitivePath")],
        "crawl_delay": None,
    }
    assert parse_robots_txt("")["groups"] == []
    assert parse_robots_txt(None)["groups"] == []


def test_product_token():
    assert product_token("FooBot/2.1 (+http://foo.example)") == "foobot"
    assert product_token("  Mozilla/5.0") == "mozilla"
    assert product_token("***") == ""


def test_group_selection_longest_prefix_token():
    txt = (
        "User-agent: *\nDisallow: /star\n"
        "User-agent: foo\nDisallow: /foo\n"
        "User-agent: foobot\nDisallow: /foobot\n"
    )
    p = parse_robots_txt(txt)
    # longest matching token wins: foobot > foo > *
    assert select_group(p, "FooBot/1.0")["rules"] == [("disallow", "/foobot")]
    # 'foo' itself matches only the 'foo' group (foobot is not a prefix of foo)
    assert select_group(p, "foo")["rules"] == [("disallow", "/foo")]
    # unknown crawler falls back to *
    assert select_group(p, "OtherBot")["rules"] == [("disallow", "/star")]
    # equally-specific groups merge their rules (RFC "combine")
    p2 = parse_robots_txt(
        "User-agent: a\nDisallow: /one\nUser-agent: a\nAllow: /two\nCrawl-delay: 7\n"
    )
    merged = select_group(p2, "a")
    assert merged["rules"] == [("disallow", "/one"), ("allow", "/two")]
    assert merged["crawl_delay"] == 7.0
    assert select_group(parse_robots_txt("User-agent: x\nDisallow: /"), "y") is None


def test_pattern_matching():
    assert match_pattern("/fish", "/fish.html")          # implicit prefix
    assert match_pattern("/fish", "/fishheads/yes.html")
    assert not match_pattern("/fish", "/Fish.asp")       # paths are case-sensitive
    assert match_pattern("/fish*.php", "/fishheads/catfish.php?x=1")
    assert match_pattern("/*.php", "/folder/any.php")
    assert not match_pattern("/*.php$", "/file.php5")    # $ anchors the end
    assert match_pattern("/*.php$", "/file.php")
    assert match_pattern("/fish*", "/fish")
    # '$' not at the end is a literal octet
    assert match_pattern("/a$b", "/a$b/c")
    assert not match_pattern("/a$b", "/ab")


def test_precedence_rfc_examples():
    # RFC 9309 §5.2-style cases: most specific (longest) match wins
    rules = [("allow", "/example/page/"), ("disallow", "/example/page/index.html")]
    assert not robots_allowed_rfc(rules, "/example/page/index.html")
    assert robots_allowed_rfc(rules, "/example/page/other.html")
    # equal length => allow wins
    assert robots_allowed_rfc([("allow", "/folder"), ("disallow", "/folder")], "/folder/page")
    # /page (len 5) vs /*.ph (len 5): tie => allow
    assert robots_allowed_rfc([("allow", "/page"), ("disallow", "/*.ph")], "/page.php5")
    # /page (5) vs /*.html (7): longer disallow wins
    assert not robots_allowed_rfc([("allow", "/page"), ("disallow", "/*.html")], "/page.html")
    # allow /$ + disallow /: only the exact root is allowed
    rules = [("allow", "/$"), ("disallow", "/")]
    assert robots_allowed_rfc(rules, "/")
    assert not robots_allowed_rfc(rules, "/page")
    # no matching rule => allowed
    assert robots_allowed_rfc([("disallow", "/x")], "/y")
    assert robots_allowed_rfc([], "/anything")


def test_prefix_compile_down_matches_engine_kernel():
    """Wildcard-free rulesets must decide identically under the RFC matcher
    and the engine's longest-prefix kernel (crawl/params.robots_decision) —
    the compile-down path swaps kernels without changing decisions."""
    rules = [
        ("disallow", "/private/"),
        ("allow", "/private/ok"),
        ("disallow", "/tmp"),
        ("allow", "/tmp/keep/deeper"),
    ]
    assert as_prefix_rules(rules) == rules
    paths = [
        "/", "/private/", "/private/x", "/private/ok", "/private/okay/2",
        "/tmp", "/tmp/keep", "/tmp/keep/deeper/file", "/other",
    ]
    for path in paths:
        assert robots_allowed_rfc(rules, path) == robots_decision(rules, path), path
    assert as_prefix_rules([("disallow", "/a*b")]) is None
    assert as_prefix_rules([("disallow", "/a$")]) is None


def test_compile_robots_splits_kernels():
    texts = {
        "plain.example": "User-agent: *\nDisallow: /private\nAllow: /private/ok\n",
        "wild.example": "User-agent: *\nDisallow: /*.php$\nCrawl-delay: 3\n",
        "empty.example": "User-agent: otherbot\nDisallow: /\n",
        "sitemapped.example": "Sitemap: https://s.example/s.xml\nUser-agent: *\nDisallow:\n",
    }
    c = compile_robots(texts, "FooBot/1.0")
    assert c["prefix"] == {"plain.example": [("disallow", "/private"), ("allow", "/private/ok")]}
    assert c["rfc"] == {"wild.example": [("disallow", "/*.php$")]}
    assert c["delays"] == {"wild.example": 3.0}
    assert c["sitemaps"] == {"sitemapped.example": ["https://s.example/s.xml"]}
    # 'empty.example' has no applicable group for FooBot => absent everywhere
    assert "empty.example" not in c["prefix"] and "empty.example" not in c["rfc"]


def test_crawl_from_robots_texts_parity(spark, tmp_path):
    """E2E: a crawl gated by RAW robots.txt TEXT (wildcard + literal rules on
    the seed host, so the whole ruleset folds into the RFC kernel) must stay
    engine==simulator, every fetched URL must satisfy the RFC decision, the
    wildcard rule must actually bite, and the text's crawl-delay must land in
    the politeness token table."""
    from anycrawl_spark import synth
    from anycrawl_spark.crawl.params import CrawlParams, robots_target
    from anycrawl_spark.crawl.simulator import ReferenceSimulator
    from anycrawl_spark.crawl.superstep import CrawlEngine
    from anycrawl_spark.functions.robots import robots_rows_from_texts
    from anycrawl_spark.functions.urls import url_host

    job = dict(synth.seed_jobs(1)[0], limit=40, max_depth=6)
    seed_host = url_host(job["seed_url"])
    texts = {
        seed_host: (
            "User-agent: anycrawl\n"
            "Disallow: /p/*7$\n"     # wildcard: any page path ending in 7
            "Disallow: /p/1\n"       # literal prefix: /p/1, /p/1x, /p/1xx
            "Allow: /p/15\n"         # re-allows /p/15*
            "Crawl-delay: 0.2\n"
        ),
        "unrelated.example": "User-agent: *\nDisallow: /\n",
    }
    rows = robots_rows_from_texts(texts, "AnyCrawl/1.0 (+https://example)")
    # the compiled rows are wildcard-marked as a whole-host property
    seed_rows = [r for r in rows if r["host"] == seed_host]
    assert len(seed_rows) == 3 and all(r.get("wildcard") for r in seed_rows)
    assert all(r["crawl_delay_ms"] == 200 for r in seed_rows)
    params = CrawlParams(max_rounds=20)
    sim = ReferenceSimulator([job], rows, params)
    sim.run()
    eng = CrawlEngine(spark, str(tmp_path / "rb"), [job], rows, params, num_buckets=4)
    eng.init_state()
    eng.run()
    jid = job["job_id"]
    assert eng.seen_sets()[jid] == sim.seen_sets()[jid]
    assert eng.terminal_status()[jid] == sim.terminal_status()[jid]

    # mixed literal+wildcard host folded entirely into the RFC kernel
    assert seed_host in eng.robots_rfc_by_host and seed_host not in eng.robots_by_host
    rules = eng.robots_rfc_by_host[seed_host]
    fetched = sorted(eng.terminal_status()[jid])
    assert len(fetched) > 10
    for url in fetched:
        path = robots_target(url)
        assert robots_allowed_rfc(rules, path), f"robots violation: {url}"
        assert not path.endswith("7"), url
        assert not (path.startswith("/p/1") and not path.startswith("/p/15")), url
    # the allow-override is reachable in this web: some /p/15* page was seen
    assert any(robots_target(u).startswith("/p/15") for u in eng.seen_sets()[jid])
    # crawl-delay seconds -> politeness ms
    assert eng.host_delays[seed_host] == 200


# ---------------------------------------------------------------- fuzz layer

def _brute_match(pattern: str, path: str) -> bool:
    """Independent oracle for RFC pattern matching: recursive descent, no
    regex. '*' matches any run (including empty); trailing '$' anchors;
    everything else is a literal octet; match starts at path[0]."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern

    def rec(i: int, j: int) -> bool:
        if i == len(body):
            return j == len(path) if anchored else True
        if body[i] == "*":
            return any(rec(i + 1, k) for k in range(j, len(path) + 1))
        return j < len(path) and path[j] == body[i] and rec(i + 1, j + 1)

    return rec(0, 0)


def test_match_pattern_fuzz_vs_brute():
    import random

    from anycrawl_spark.functions.robots import match_pattern

    rng = random.Random(fuzz_seed(20260818))
    alphabet = "/ab1.*$?**"  # star-weighted: multi-wildcard shapes matter most
    for _ in range(6000):
        pattern = "/" + "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
        path = "/" + "".join(rng.choice("/ab1.$?") for _ in range(rng.randint(0, 10)))
        assert match_pattern(pattern, path) == _brute_match(pattern, path), (
            pattern, path,
        )


def test_wildcard_free_rfc_equals_prefix_kernel_fuzz():
    """For any wildcard-free ruleset the RFC longest-match decision must equal
    the engine's longest-prefix kernel on every path (this equivalence is what
    licenses the compile-down in compile_robots)."""
    import random

    rng = random.Random(fuzz_seed(99))
    for _ in range(1500):
        rules = [
            (
                rng.choice(["allow", "disallow"]),
                "/" + "".join(rng.choice("ab1/.") for _ in range(rng.randint(0, 5))),
            )
            for _ in range(rng.randint(1, 6))
        ]
        path = "/" + "".join(rng.choice("ab1/.") for _ in range(rng.randint(0, 8)))
        assert robots_allowed_rfc(rules, path) == robots_decision(rules, path), (
            rules, path,
        )


def test_match_target_includes_query():
    """RFC 9309 matches path + optional query: $-anchored patterns must not
    block query-bearing URLs, and query-targeting patterns can only match
    with the query attached (found by review; previously the query was
    stripped before matching)."""
    from anycrawl_spark.crawl.params import robots_target

    assert robots_target("https://h/x.php?id=1") == "/x.php?id=1"
    assert robots_target("https://h/x.php") == "/x.php"
    assert robots_target("https://h:8443/") == "/"
    assert robots_target("https://h") == "/"
    assert not robots_allowed_rfc([("disallow", "/*.php$")], robots_target("https://h/x.php"))
    assert robots_allowed_rfc([("disallow", "/*.php$")], robots_target("https://h/x.php?id=1"))
    rules = [("disallow", "/*?sessionid=")]
    assert not robots_allowed_rfc(rules, robots_target("https://h/p?sessionid=a"))
    assert robots_allowed_rfc(rules, robots_target("https://h/p?other=1"))
    assert robots_allowed_rfc(rules, robots_target("https://h/sessionid="))


def test_multi_star_pattern_is_linear_time():
    """The matcher must stay linear on hostile multi-wildcard patterns — the
    '*'->'.*' regex translation backtracks exponentially here (>10 s before
    the rewrite; found by review)."""
    import time

    from anycrawl_spark.functions.robots import match_pattern

    pattern = "/" + "*a" * 14 + "$"
    path = "/" + "a" * 2000 + "b"
    t0 = time.time()
    assert not match_pattern(pattern, path)
    assert match_pattern("/" + "*a" * 14, "/" + "a" * 2000)
    assert time.time() - t0 < 0.1
    # brute-force agreement on dense-star shapes the random fuzz rarely hits
    for pat, tgt in [
        ("/*a*a*a$", "/xaxaxa"), ("/*a*a*a$", "/xaxax"), ("/a**b", "/ab"),
        ("/**", "/"), ("/*$", "/anything"), ("/a*", "/a"), ("/a*b*", "/aXbY"),
    ]:
        assert match_pattern(pat, tgt) == _brute_match(pat, tgt), (pat, tgt)


def test_parse_hostile_inputs():
    """Non-finite crawl-delays are rejected at parse time (int(inf*1000)
    blew up the row bridge; found by review), and unknown directives must
    not split a stacked user-agent run (RFC 9309 §2.2.4; found by review)."""
    from anycrawl_spark.functions.robots import robots_rows_from_texts

    p = parse_robots_txt("User-agent: a\nCrawl-delay: inf\nDisallow: /x")
    assert p["groups"][0]["crawl_delay"] is None
    p = parse_robots_txt("User-agent: a\nCrawl-delay: nan\n")
    assert p["groups"][0]["crawl_delay"] is None
    rows = robots_rows_from_texts(
        {"h": "User-agent: *\nCrawl-delay: inf\nDisallow: /x\n"}, "bot"
    )
    assert rows == [{"host": "h", "rule": "disallow", "path_prefix": "/x", "crawl_delay_ms": 0}]
    # Host:/Clean-param:-style unknown records between user-agent lines keep
    # the stack intact: one group, both agents, the rule applies to both
    p = parse_robots_txt("User-agent: a\nHost: example.com\nUser-agent: b\nDisallow: /x")
    assert p["groups"] == [
        {"agents": ["a", "b"], "rules": [("disallow", "/x")], "crawl_delay": None}
    ]
    assert select_group(p, "a")["rules"] == [("disallow", "/x")]
