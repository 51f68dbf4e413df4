"""Sitemap parsing kernel + ingestion operator tests (sitemaps.org protocol).

No reference-repo counterpart exists (sitemap ingestion is rebuild-added
crawl-tier functionality, same status as the robots layer) — cases are
hand-written from https://www.sitemaps.org/protocol.html: formats (urlset /
sitemapindex / txt / gzip), field validation, the location-scope rule with
robots.txt cross-submission, size caps, and row-wise failure isolation.
"""

import gzip

import pytest

from anycrawl_spark.functions import sitemaps as sm
from anycrawl_spark.functions.sitemaps import (
    in_scope,
    parse_sitemap,
    scope_prefix,
)

NS = ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(*urls: str) -> str:
    return f"<urlset{NS}>" + "".join(urls) + "</urlset>"


# --- scope rule -------------------------------------------------------------

def test_scope_prefix_directory_rule():
    assert scope_prefix("http://example.com/catalog/sitemap.xml") == (
        "http://example.com/catalog/"
    )
    assert scope_prefix("http://example.com/sitemap.xml") == "http://example.com/"


def test_scope_prefix_robots_submission_widens_to_host():
    p = scope_prefix("http://example.com/catalog/sitemap.xml", robots_submitted=True)
    assert p == "http://example.com/"


def test_scope_prefix_unusable_locations():
    assert scope_prefix("ftp://example.com/sitemap.xml") is None
    assert scope_prefix("not a url") is None
    assert scope_prefix("https://example.com:bogus/s.xml") is None


def test_in_scope_case_folds_authority_not_path():
    p = scope_prefix("http://Example.COM/Cat/sitemap.xml")
    assert p == "http://example.com/Cat/"
    assert in_scope("HTTP://EXAMPLE.com/Cat/page", p)
    assert not in_scope("http://example.com/cat/page", p)  # path is exact
    assert not in_scope("http://example.com/CatX", p)


def test_in_scope_port_and_host_must_match():
    p = scope_prefix("https://example.com:8443/s.xml")
    assert in_scope("https://example.com:8443/x", p)
    assert not in_scope("https://example.com/x", p)
    assert not in_scope("https://sub.example.com:8443/x", p)
    assert not in_scope("https://example.com:8443/x", None)


def test_in_scope_ignores_query():
    p = scope_prefix("https://example.com/dir/s.xml")
    assert in_scope("https://example.com/dir/page?x=1&y=2", p)


# --- urlset -----------------------------------------------------------------

def test_urlset_fields_defaults_and_validation():
    body = _urlset(
        "<url><loc>https://e.com/a</loc><lastmod>2026-01-02</lastmod>"
        "<changefreq>Daily</changefreq><priority>0.8</priority></url>",
        "<url><loc>https://e.com/b</loc><changefreq>sometimes</changefreq>"
        "<priority>2.0</priority></url>",
        "<url><loc>https://e.com/c</loc><priority>nan</priority></url>",
        "<url><lastmod>2026-01-01</lastmod></url>",  # no loc: dropped
    )
    res = parse_sitemap(body, "https://e.com/sitemap.xml")
    assert res["kind"] == "urlset" and res["error"] is None
    assert [e["loc"] for e in res["entries"]] == [
        "https://e.com/a", "https://e.com/b", "https://e.com/c",
    ]
    a, b, c = res["entries"]
    assert a["lastmod"] == "2026-01-02"
    assert a["changefreq"] == "daily"  # vocabulary is case-folded
    assert a["priority"] == 0.8
    assert b["changefreq"] is None  # not in the closed vocabulary
    assert b["priority"] == 0.5  # out of [0,1] -> default
    assert c["priority"] == 0.5  # nan is not a valid priority
    assert all(e["in_scope"] for e in res["entries"])


def test_urlset_scope_flags():
    body = _urlset(
        "<url><loc>https://e.com/dir/in</loc></url>",
        "<url><loc>https://e.com/out</loc></url>",
        "<url><loc>https://other.com/x</loc></url>",
    )
    res = parse_sitemap(body, "https://e.com/dir/s.xml")
    assert [e["in_scope"] for e in res["entries"]] == [True, False, False]
    res = parse_sitemap(body, "https://e.com/dir/s.xml", robots_submitted=True)
    assert [e["in_scope"] for e in res["entries"]] == [True, True, False]


def test_urlset_without_namespace_is_accepted():
    res = parse_sitemap(
        "<urlset><url><loc>https://e.com/a</loc></url></urlset>",
        "https://e.com/s.xml",
    )
    assert res["kind"] == "urlset" and len(res["entries"]) == 1


# --- sitemapindex -----------------------------------------------------------

def test_sitemapindex_children_and_scope():
    body = (
        f"<sitemapindex{NS}>"
        "<sitemap><loc>https://e.com/maps/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://cdn.com/s2.xml</loc></sitemap>"
        "<sitemap><lastmod>2026-01-01</lastmod></sitemap>"  # no loc: dropped
        "</sitemapindex>"
    )
    res = parse_sitemap(body, "https://e.com/index.xml", robots_submitted=True)
    assert res["kind"] == "sitemapindex" and res["entries"] == []
    assert [(c["loc"], c["in_scope"]) for c in res["children"]] == [
        ("https://e.com/maps/s1.xml", True),
        ("https://cdn.com/s2.xml", False),
    ]


# --- txt + gzip -------------------------------------------------------------

def test_txt_format_absolute_urls_only():
    res = parse_sitemap(
        "https://e.com/x\nnot-a-url\n\n  https://e.com/y  \nftp://e.com/z\n",
        "https://e.com/sitemap.txt",
    )
    assert res["kind"] == "txt"
    assert [e["loc"] for e in res["entries"]] == ["https://e.com/x", "https://e.com/y"]
    assert all(e["priority"] == 0.5 and e["lastmod"] is None for e in res["entries"])


def test_gzip_sniffed_by_magic_bytes():
    xml = _urlset("<url><loc>https://e.com/a</loc></url>")
    res = parse_sitemap(gzip.compress(xml.encode(), mtime=0), "https://e.com/s.xml.gz")
    assert res["kind"] == "urlset" and len(res["entries"]) == 1


def test_gzip_corrupt_is_an_error_row():
    res = parse_sitemap(b"\x1f\x8b" + b"junk", "https://e.com/s.xml.gz")
    assert res["kind"] is None and res["error"] == "gzip_error"


def test_bom_is_tolerated():
    xml = "﻿" + _urlset("<url><loc>https://e.com/a</loc></url>")
    res = parse_sitemap(xml.encode("utf-8"), "https://e.com/s.xml")
    assert res["kind"] == "urlset" and len(res["entries"]) == 1


# --- failure isolation + caps ----------------------------------------------

def test_malformed_xml_and_unknown_root():
    res = parse_sitemap(b"<urlset><url><loc>https://e", "https://e.com/s.xml")
    assert res["error"] == "xml_error" and res["entries"] == []
    res = parse_sitemap(b"<rss></rss>", "https://e.com/s.xml")
    assert res["error"] == "unknown_root:rss"


def test_entity_tricks_are_inert():
    # xml.etree resolves no external entities; an undefined entity is a
    # parse error -> one error row, never code execution or a crash
    body = (
        '<?xml version="1.0"?><!DOCTYPE urlset [<!ENTITY x SYSTEM "file:///etc/passwd">]>'
        "<urlset><url><loc>&x;</loc></url></urlset>"
    )
    res = parse_sitemap(body.encode(), "https://e.com/s.xml")
    assert res["kind"] is None and res["error"] == "xml_error"


def test_url_count_cap(monkeypatch):
    monkeypatch.setattr(sm, "MAX_URLS", 2)
    body = _urlset(*[f"<url><loc>https://e.com/{i}</loc></url>" for i in range(5)])
    res = parse_sitemap(body, "https://e.com/s.xml")
    assert len(res["entries"]) == 2 and res["error"] == "too_many_urls"
    txt = "\n".join(f"https://e.com/{i}" for i in range(5))
    res = parse_sitemap(txt, "https://e.com/s.txt")
    assert len(res["entries"]) == 2 and res["error"] == "too_many_urls"


def test_byte_size_cap(monkeypatch):
    monkeypatch.setattr(sm, "MAX_BYTES", 10)
    res = parse_sitemap(b"x" * 11, "https://e.com/s.xml")
    assert res["kind"] is None and res["error"] == "too_large"
    # the cap applies to the UNCOMPRESSED size
    res = parse_sitemap(gzip.compress(b"y" * 100, mtime=0), "https://e.com/s.xml.gz")
    assert res["error"] == "too_large"


def test_overlong_urls_dropped():
    long_url = "https://e.com/" + "a" * sm.MAX_URL_LEN
    body = _urlset(
        f"<url><loc>{long_url}</loc></url>",
        "<url><loc>https://e.com/ok</loc></url>",
    )
    res = parse_sitemap(body, "https://e.com/s.xml")
    assert [e["loc"] for e in res["entries"]] == ["https://e.com/ok"]


# --- Spark operator ----------------------------------------------------------

@pytest.fixture(scope="module")
def seed_fixture(spark):
    from anycrawl_spark.queries import q_sitemap_seeds

    return q_sitemap_seeds(spark, sf_dir="")  # fixture corpus; sf_dir unused


def test_sitemap_seeds_end_to_end(seed_fixture):
    rows = {r.url: r for r in seed_fixture.collect()}
    assert set(rows) == {
        "https://s.example/a", "https://s.example/dir/b",
        "https://t.example/maps/p1", "https://u.example/x",
        "https://u.example/y", "https://v.example/gz1",
    }
    # cross-sitemap dedup: highest priority wins, with its own metadata
    a = rows["https://s.example/a"]
    assert (a.priority, a.lastmod, a.source_sitemap) == (
        0.8, "2026-01-02", "https://s.example/sitemap.xml",
    )
    # index child trusted, but checked against its OWN strict scope
    assert rows["https://t.example/maps/p1"].priority == 0.9
    assert "https://t.example/p2" not in rows
    # cross-host index child distrusted entirely
    assert "https://cdn.example/evil" not in rows
    assert rows["https://v.example/gz1"].changefreq == "weekly"


def test_parse_corpus_error_rows_isolated(spark):
    from anycrawl_spark.sources.sitemaps import parse_sitemap_corpus

    corpus = spark.createDataFrame(
        [
            ("https://ok.example/s.xml",
             b'<urlset><url><loc>https://ok.example/a</loc></url></urlset>'),
            ("https://bad.example/s.xml", b"<urlset><broken"),
            ("https://gz.example/s.xml.gz", b"\x1f\x8bjunk"),
        ],
        "sitemap_url string, body binary",
    )
    rows = parse_sitemap_corpus(corpus, {"https://ok.example/s.xml"}).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.row_kind, []).append(r)
    assert len(by_kind["entry"]) == 1 and by_kind["entry"][0].robots_submitted
    errs = {r.sitemap_url: r.error for r in by_kind["error"]}
    assert errs == {
        "https://bad.example/s.xml": "xml_error",
        "https://gz.example/s.xml.gz": "gzip_error",
    }


def test_robots_submitted_sitemaps_bridge():
    from anycrawl_spark.sources.sitemaps import robots_submitted_sitemaps

    texts = {
        "a.example": "User-agent: *\nDisallow: /x\nSitemap: https://a.example/s.xml\n",
        "b.example": "Sitemap: https://b.example/1.xml\nSitemap: https://b.example/2.xml\n",
        "c.example": "User-agent: *\nDisallow:\n",
    }
    assert robots_submitted_sitemaps(texts) == {
        "https://a.example/s.xml",
        "https://b.example/1.xml",
        "https://b.example/2.xml",
    }
