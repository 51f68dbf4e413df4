"""Span-rule golden tests: one fixture per markdown rule (FIXTURES.md §8).

Each case pins the behavior of a specific reference rule
(reference: packages/libs/src/html-to-markdown.ts:24-213,
packages/scrape/src/core/transformers/HTMLTransformer.ts:21-384).
"""

from anycrawl_spark.functions.htmlmd import extract_document, markdown_to_spans

BASE = "http://site.test/dir/page"


def md(html, **kw):
    return extract_document(html, BASE, **kw)["markdown"]


def spans(html, **kw):
    return [
        (s["kind"], s["text"], s["media_ref"])
        for s in extract_document(html, BASE, **kw)["spans"]
    ]


def test_para_basic():
    assert md("<p>one</p><p>two</p>") == "one\n\ntwo"
    assert md("<p>  </p><p>x</p>") == "x"


def test_div_inline_vs_block():
    # div without block children: inline + trailing space
    assert md("<div>a</div><div>b</div>") == "a b"
    # div with a block child: paragraph spacing
    assert md("<div><p>a</p></div><div>b</div>") == "a\n\nb"


def test_span_spacing():
    # span rule adds prefix/suffix spaces when content-bearing siblings exist
    # (html-to-markdown.ts:82-98); doubled spaces next to literal whitespace
    # are reference behavior (no collapse inside lines post-conversion).
    assert md("<div><span>a</span><span>b</span></div>") == "a  b"
    assert md("<p>x<span>mid</span>y</p>") == "x mid y"


def test_emphasis():
    # NB: whitespace between tags is removed by the reference's own
    # pre-normalization (html-to-markdown.ts:4-8), so `</em> <i>` fuses.
    assert md("<p><em>a</em> <i>b</i></p>") == "*a**b*"
    assert md("<p>x <em>a</em>, <strong>c</strong>!</p>") == "x *a*, **c**!"
    assert md("<p><i>b</i>-<b>d</b></p>") == "*b*-**d**"


def test_br():
    assert md("<p>a<br>b</p>") == "a\nb"


def test_image_and_relative_src():
    assert md('<img src="/i.png" alt="A">') == "![A](http://site.test/i.png)"


def test_linked_image_valid_href():
    out = md('<a href="/target"><img src="/i.png" alt="A"></a>')
    assert out == "[![A](http://site.test/i.png)](http://site.test/target)"


def test_linked_image_invalid_href_unwraps():
    # href '#' / javascript: / empty -> bare image (html-to-markdown.ts:115-123)
    assert md('<a href="#"><img src="/i.png" alt="A"></a>') == "![A](http://site.test/i.png)"
    assert (
        md('<a href="javascript:void(0)"><img src="/i.png" alt="A"></a>')
        == "![A](http://site.test/i.png)"
    )


def test_figure_caption():
    out = md('<figure><img src="/f.png" alt="F"><figcaption>cap text</figcaption></figure>')
    assert out == "![F](http://site.test/f.png)\n\ncap text"


def test_bracket_image_normalization():
    from anycrawl_spark.functions.htmlmd import _normalize_bracket_images

    # [ ![..](..) ] with whitespace, not followed by link -> stripped bare
    # (iterate-to-stable, html-to-markdown.ts:171-189)
    assert _normalize_bracket_images("[ ![A](x.png) ]") == "![A](x.png)"
    assert markdown_to_spans(_normalize_bracket_images("[ ![A](x.png) ]"))[0] == {
        "kind": "media", "text": None, "media_ref": "x.png", "offset": 0,
    }
    # nested brackets iterate to stable
    assert _normalize_bracket_images("[[![A](x.png)]]") == "![A](x.png)"
    # followed by a link target -> kept as linked image
    assert _normalize_bracket_images("[ ![A](x.png) ](http://t)") == "[![A](x.png)](http://t)"


def test_link_text_whitespace_collapse():
    from anycrawl_spark.functions.htmlmd import _normalize_link_text_ws

    assert _normalize_link_text_ws("[a\n  b](http://t)") == "[a b](http://t)"


def test_srcset_best_candidate():
    # 2x beats 1x; src rewritten to largest (HTMLTransformer.ts:244-296)
    out = md('<img src="/s.png" alt="R" srcset="/s.png 1x, /b.png 2x">')
    assert out == "![R](http://site.test/b.png)"
    # width descriptors
    out = md('<img src="/s.png" alt="R" srcset="/a.png 400w, /b.png 800w">')
    assert out == "![R](http://site.test/b.png)"


def test_srcset_rebuilt_absolute():
    """srcset itself is rewritten with absolute URLs (HTMLTransformer.ts:298-316),
    including the http:/ repair inside srcset entries."""
    from anycrawl_spark.functions.htmlmd import parse_html, transform_urls

    root = parse_html(
        '<img src="/s.png" srcset="/a.png 1x, http:/cdn.test/b.png 2x" alt="x">'
    )
    transform_urls(root, "http://site.test/dir/page")
    img = next(n for n in root.iter() if not n.is_text and n.tag == "img")
    # original descriptor text preserved (not re-formatted)
    assert img.attrs["srcset"] == (
        "http://site.test/a.png 1x, http://cdn.test/b.png 2x"
    )
    assert img.attrs["src"] == "http://cdn.test/b.png"  # 2x wins


def test_non_main_strip():
    html = (
        "<header><p>skip</p></header><nav><p>skip</p></nav>"
        '<div class="footer"><p>skip</p></div><aside>skip</aside>'
        '<div id="sidebar">skip</div><p>keep</p><script>var x;</script>'
    )
    assert md(html) == "keep"


def test_exclude_include_tags():
    html = '<p class="a">one</p><p class="b">two</p>'
    assert md(html, exclude_tags=[".b"]) == "one"
    assert md(html, include_tags=[".b"]) == "two"


def test_malformed_url_repair_in_links():
    doc = extract_document('<a href="http:/other.test/x">t</a>', BASE)
    assert doc["links"] == ["http://other.test/x"]


def test_metadata_and_title():
    doc = extract_document(
        "<html><head><title>T</title>"
        '<meta name="description" content="d">'
        '<meta property="og:x" content="y">'
        '<meta name="nocontent">'
        "</head><body><p>b</p></body></html>",
        BASE,
    )
    assert doc["title"] == "T"
    assert {m["content"] for m in doc["metadata"]} == {"d", "y"}


def test_span_sequence_interleaving():
    html = '<p>t1</p><img src="/a.png" alt=""><p>t2</p><img src="/b.png" alt=""><p>t3</p>'
    got = spans(html)
    assert got == [
        ("text", "t1", None),
        ("media", None, "http://site.test/a.png"),
        ("text", "t2", None),
        ("media", None, "http://site.test/b.png"),
        ("text", "t3", None),
    ]
    # offsets dense increasing
    doc = extract_document(html, BASE)
    assert [s["offset"] for s in doc["spans"]] == list(range(5))


def test_comments_removed():
    assert md("<p>a</p><!-- hidden --><p>b</p>") == "a\n\nb"


def test_synth_link_order_parity():
    """Extractor recovers synth.page_hrefs exactly (set AND order)."""
    from anycrawl_spark import synth
    from anycrawl_spark.functions.urls import resolve_url

    for hi in range(8):
        host = synth.host_name(hi)
        for k in range(4):
            url = synth.page_url(host, k)
            doc = extract_document(synth.page_html(url), url)
            expected = [resolve_url(url, h) for h in synth.page_hrefs(url)]
            assert doc["links"] == expected, url


def test_lxml_backend_parity_when_available():
    """When lxml is installed, the fast kernel must produce byte-identical
    markdown on the golden set; sandbox without lxml exercises the forced-
    backend error path instead."""
    import pytest

    from anycrawl_spark.functions import htmlmd
    from anycrawl_spark.functions.htmlmd import parse_html, to_markdown

    html = ('<html><body><h1>Title</h1><p>Some <strong>bold</strong> and '
            '<em>em</em> text.</p><ul><li>a</li><li>b</li></ul>'
            '<a href="http://x/y">link</a><img src="http://i/z.png" alt="z">'
            '</body></html>')
    if htmlmd._lxml_etree is None:
        with pytest.raises(RuntimeError, match="lxml backend requested"):
            parse_html(html, backend="lxml")
        return
    md_std = to_markdown(parse_html(html, backend="stdlib"))
    md_lx = to_markdown(parse_html(html, backend="lxml"))
    assert md_std == md_lx


# --- transformed-HTML output format (HTMLTransformer.ts transformHtml) -----

def thtml(html, **kw):
    return extract_document(html, BASE, with_html=True, **kw)["html"]


def test_html_format_absolutizes_href_and_src_in_dom_order():
    out = thtml(
        '<div><a href="/x">one</a><img src="img/pic.png" alt="p">'
        '<a href="../up">two</a></div>'
    )
    assert out == (
        '<div><a href="http://site.test/x">one</a>'
        '<img src="http://site.test/dir/img/pic.png" alt="p">'
        '<a href="http://site.test/up">two</a></div>'
    )
    # DOM order: href rewrites appear in source order
    assert out.index("http://site.test/x") < out.index("http://site.test/up")


def test_html_format_srcset_rewritten_and_best_src():
    out = thtml('<img src="/s.png" alt="R" srcset="/s.png 1x, /b.png 2x">')
    # src replaced by the largest candidate; srcset absolutized with
    # original descriptors preserved (HTMLTransformer.ts:298-316)
    assert out == (
        '<img src="http://site.test/b.png" alt="R" '
        'srcset="http://site.test/s.png 1x, http://site.test/b.png 2x">'
    )


def test_html_format_strips_non_main_and_comments():
    out = thtml(
        "<header><p>skip</p></header><!-- gone --><p>keep</p>"
        "<script>var x;</script><div class=\"ad\">skip</div>"
    )
    assert out == "<p>keep</p>"


def test_html_format_exclude_and_include_tags():
    src = '<div id="a"><p>A</p></div><div class="b"><p>B</p></div><p>C</p>'
    assert thtml(src, exclude_tags=[".b"]) == '<div id="a"><p>A</p></div><p>C</p>'
    # include_tags: matched elements collected like cheerio $root.html()
    assert thtml(src, include_tags=["#a"]) == '<div id="a"><p>A</p></div>'


def test_html_format_entity_escaping_roundtrip():
    # parse decodes entities; serialization re-escapes the minimal set
    out = thtml('<p title="a &amp; &quot;b&quot;">x &amp; y &lt;z&gt;</p>')
    assert out == '<p title="a &amp; &quot;b&quot;">x &amp; y &lt;z&gt;</p>'


def test_html_format_void_and_valueless():
    out = thtml('<p>a<br>b<input type="text" disabled></p>')
    assert out == '<p>a<br>b<input type="text" disabled></p>'


def test_html_format_all_rule_fixtures_roundtrip():
    """Every markdown-rule fixture also serializes: no crashes, stripped
    selectors absent, and every emitted URL attribute absolute."""
    import re

    fixtures = [
        "<p>text</p>",
        "<div>a<p>b</p>c</div>",
        "<em>i</em><strong>b</strong>",
        "<ul><li>1<li>2</ul>",
        '<a href="/r">l</a>',
        '<img src="i.png" alt="a">',
        '<figure><img src="/f.png"><figcaption>cap</figcaption></figure>',
        '<table><tr><td><a href="u">t</a></td></tr></table>',
        "<header>h</header><p>k</p>",
        "<h1>t</h1><blockquote>q</blockquote>",
        "<pre><code>x = 1 &lt; 2</code></pre>",
        '<span class="social">s</span><p>main</p>',
        '<a href="http:/broken.test/p">m</a>',
    ]
    for fx in fixtures:
        out = thtml(fx)
        for attr, val in re.findall(r'(href|src)="([^"]+)"', out):
            assert val.startswith("http://"), (fx, attr, val)
        assert "<header" not in out and "social" not in out
