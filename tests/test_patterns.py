"""F1/F2 path-pattern kernels (functions/patterns.py) vs the reference's
observable semantics: Base.ts:339-379 include split + crawlee glob matching
(nocase), Base.ts:361-365 exclude-as-globs + current-URL append, and
Base.ts:465-495 shouldScrapeUrl's ordered regex/glob loop."""

import pytest

from anycrawl_spark.functions.patterns import (
    compile_exclude_patterns,
    compile_include_patterns,
    should_scrape_url,
    split_regex_literal,
    url_passes,
)


# ---------------------------------------------------------- regex literal
def test_regex_literal_detection():
    assert split_regex_literal("/abc/") is not None
    assert split_regex_literal("/abc/i") is not None
    assert split_regex_literal("/abc/gimsuy") is not None
    # flags outside [gimsuy] keep the string a glob (Base.ts:345)
    assert split_regex_literal("/abc/x") is None
    assert split_regex_literal("/abc/I") is None
    # not literal-shaped at all
    assert split_regex_literal("abc") is None
    assert split_regex_literal("/abc") is None
    # JS '.' never crosses a newline, so a body containing one is a glob
    assert split_regex_literal("/a\nb/") is None
    # trailing newline after the flags fails the JS '$' (no multiline)
    assert split_regex_literal("/abc/i\n") is None
    # an INVALID body falls through to the glob branch (Base.ts:350-353)
    assert split_regex_literal("/a(/") is None
    assert split_regex_literal("/a{2,1}/") is None


def test_regex_literal_flags_behave():
    rx = split_regex_literal("/^HTTP/i")
    assert rx.search("http://x") and not split_regex_literal("/^HTTP/").search(
        "http://x"
    )
    # '.test' is substring search, not fullmatch
    assert split_regex_literal("/p\\/\\d+/").search("http://h/p/12?x")


# ------------------------------------------------------------- include split
def test_include_split_and_match():
    inc = compile_include_patterns(["**/p/**", "/\\/q\\/\\d+$/"])
    globs, regexps = inc
    assert globs == ("**/p/**",) and len(regexps) == 1
    assert url_passes("http://h/p/1", inc, ())
    assert url_passes("http://h/q/22", inc, ())
    assert not url_passes("http://h/r/1", inc, ())
    # crawlee trims globs and drops empty/whitespace entries
    assert compile_include_patterns(["  ", ""]) is None
    assert compile_include_patterns([" a/* "])[0] == ("a/*",)
    # non-strings are skipped (Base.ts:343)
    assert compile_include_patterns([None, 7, "x"])[0] == ("x",)
    # no patterns at all -> every link passes
    assert url_passes("anything", None, ())


def test_include_glob_is_nocase():
    # crawlee: minimatch(url, glob, { nocase: true })
    inc = compile_include_patterns(["http://H/P/*"])
    assert url_passes("http://h/p/x", inc, ())
    inc2 = compile_include_patterns(["*.JSON"])
    assert url_passes("data.json", inc2, ())


def test_include_glob_dot_default_false():
    # plain-minimatch default dot:false — '*' skips dot-leading segments
    inc = compile_include_patterns(["http://h/*"])
    assert url_passes("http://h/x", inc, ())
    assert not url_passes("http://h/.hidden", inc, ())


# ------------------------------------------------------------------ excludes
def test_exclude_semantics():
    exc = compile_exclude_patterns(["**/p/7", " **/q/** "])
    assert exc == ("**/p/7", "**/q/**")
    assert not url_passes("http://h/p/7", None, exc)
    assert not url_passes("http://h/q/1", None, exc)
    assert url_passes("http://h/p/8", None, exc)
    # excludes are GLOBS, never regex literals (crawlee string excludes):
    # '/x/' is an absolute-path glob, so it matches only the literal '/x/'
    # — as a regex literal it would hit every URL containing an 'x'
    exc2 = compile_exclude_patterns(["/x/"])
    assert not url_passes("/x/", None, exc2)
    assert url_passes("zzxzz", None, exc2)
    assert url_passes("http://h/x/", None, exc2)


def test_exclude_appends_current_url():
    # Base.ts:362-364: with ANY exclude configured, the current page URL
    # joins the exclude set; with none, it does not
    exc = compile_exclude_patterns(["**/p/7"])
    assert not url_passes(
        "http://h/p/1", None, exc, current_url="http://h/p/1"
    )
    assert url_passes("http://h/p/1", None, (), current_url="http://h/p/1")
    # the current URL is matched AS A GLOB: '?' in a query string is magic
    assert not url_passes(
        "http://h/pxq=1", None, exc, current_url="http://h/p?q=1"
    )


# ------------------------------------------------------------- shouldScrape
def test_should_scrape_empty_is_true():
    assert should_scrape_url("http://h/x", None)
    assert should_scrape_url("http://h/x", [])


def test_should_scrape_ordered_loop():
    # glob branch: minimatch dot:true
    assert should_scrape_url("http://h/p/1", ["**/p/**"])
    assert not should_scrape_url("http://h/q/1", ["**/p/**"])
    # a VALID regex literal is consumed as regex — non-match continues to
    # the NEXT pattern, it does not retry the same string as a glob
    assert should_scrape_url("http://h/p/12", ["/\\/p\\/\\d+$/", "**/q/**"])
    assert should_scrape_url("http://h/q/x", ["/\\/p\\/\\d+$/", "**/q/**"])
    assert not should_scrape_url("http://h/r/x", ["/\\/p\\/\\d+$/", "**/q/**"])
    # an INVALID regex literal falls through to the glob branch
    assert not should_scrape_url("http://h/x", ["/a(/"])
    assert should_scrape_url("/a(/", ["/a(/"])  # matched literally as glob
    # dot:true here (unlike the crawlee side)
    assert should_scrape_url("http://h/.hidden", ["http://h/*"])
    # non-strings are skipped
    assert should_scrape_url("http://h/p/1", [None, "**/p/**"])


# ------------------------------------------------- engine/simulator parity
@pytest.mark.slow
def test_scrape_paths_and_exclude_parity(spark, tmp_path):
    """Engine documents vs simulator scraped_urls under scrape_paths +
    exclude_paths; crawl reach (seen) is unaffected by scrape_paths."""
    from anycrawl_spark import synth
    from anycrawl_spark.crawl.params import CrawlParams
    from anycrawl_spark.crawl.simulator import ReferenceSimulator
    from anycrawl_spark.crawl.superstep import CrawlEngine

    jobs = synth.seed_jobs(2)
    jobs[0] = dict(
        jobs[0], limit=30, scrape_paths=["/\\/p\\/1\\d+$/", "**/p/2*"]
    )
    jobs[1] = dict(jobs[1], limit=20, exclude_paths=["**/p/1?"])
    robots = synth.robots_rules()
    params = CrawlParams()

    eng = CrawlEngine(spark, str(tmp_path / "wd"), jobs, robots, params)
    eng.init_state()
    eng.run()
    sim = ReferenceSimulator(jobs, robots, params)
    sim.run()

    assert eng.seen_sets() == sim.seen_sets()
    docs = eng.store.read_appends("documents").select("job_id", "url").collect()
    got: dict[str, set] = {}
    for r in docs:
        got.setdefault(r.job_id, set()).add(r.url)
    want = sim.scraped_urls()
    for jid in want:
        assert got.get(jid, set()) == want[jid], jid
    # the scrape filter really dropped something for job 0
    fetched0 = {
        u for u, s in sim.terminal_status()[jobs[0]["job_id"]].items()
        if s == "fetched"
    }
    assert want[jobs[0]["job_id"]] < fetched0


# ------------------------------------------------------ crash-freedom props
def test_kernels_never_raise_on_hostile_input():
    """The gate kernels run inside mapInPandas over attacker-controlled
    URLs and operator-supplied patterns — any exception is a stage kill.
    Sweep hostile inputs through every entry point."""
    from anycrawl_spark.functions.capture import glob_match
    from anycrawl_spark.operators.rules import _wildcard_to_regex
    import re

    hostiles = ["", "*", "**", "?", "[", "[]", "[!", "{", "{a,", "\\",
                "!(", "@(", "+(", ")(", "a{1..}", "{9..1..0}", "!"*5,
                "\x00", "\ud800" if False else "￿", "(" * 30,
                "a" * 500, "/" * 50, "{" * 20, "*" * 40, "?" * 40,
                "[z-a]", "[[:alpha:]]", "a\\", "{,}", "!(!(!(x"]
    subjects = ["", "/", "a", ".", "..", "http://h/p", "\x00", "a" * 300]
    for pat in hostiles:
        compiled = _wildcard_to_regex(pat)
        for s in subjects:
            re.match(compiled, s)  # must compile + run
            for dot in (True, False):
                for nocase in (True, False):
                    glob_match(s, pat, dot=dot, nocase=nocase)
        for s in subjects:
            should_scrape_url(s, [pat, "/" + pat + "/"])
            url_passes(
                s,
                compile_include_patterns([pat]),
                compile_exclude_patterns([pat]),
                current_url=subjects[-1],
            )
