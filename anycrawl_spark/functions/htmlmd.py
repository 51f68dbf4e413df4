"""HTML -> (links, title, metadata, markdown, spans) extraction kernel.

Pure-Python (stdlib ``html.parser`` — no lxml in the sandbox), called only from
Arrow-batched pandas UDFs (``operators/spans.py``). Re-implements the
reference's extraction semantics:

- whitespace pre-normalization          (reference: packages/libs/src/html-to-markdown.ts:4-8)
- remove script/style/noscript/meta/link (html-to-markdown.ts:15-21)
- custom turndown rules: paragraphs(:24-41), divs(:44-69), spans(:72-100),
  linked images(:103-124), figure/picture(:127-133), figcaption(:136-142),
  emphasis(:145-160), br(:163-168)
- post-processing: bracket-image normalization(:171-189), link-text whitespace
  collapse(:192-201), collapse 3+ newlines + trim(:210)
- non-main-content stripping, 42-selector list   (reference: packages/scrape/
  src/core/transformers/HTMLTransformer.ts:21-66)
- relative->absolute URL rewrite for img src/srcset + a href, srcset
  best-candidate selection (largest descriptor wins)  (HTMLTransformer.ts:215-360)
- malformed-URL repair ``http:/x`` -> ``http://x``    (HTMLTransformer.ts:366-384)
- title + meta extraction  (reference: packages/scrape/src/core/DataExtractor.ts:156-198)

Span derivation (the BASELINE.json input_hint payload): the markdown stream is
segmented at image tokens — each ``![alt](src)`` (or ``[![alt](src)](href)``
linked image) becomes a ``media`` span with ``media_ref=src``; the text between
consecutive image tokens becomes ``text`` spans. ``offset`` is the dense
in-document ordinal. The per-row invariant vs the reference is span-sequence
equality on (kind, text, media_ref, order).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from anycrawl_spark.functions.urls import fix_malformed, resolve_url

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

REMOVE_TAGS = {"script", "style", "noscript", "meta", "link"}

# 42-selector non-main-content list, kept verbatim from the reference
# (HTMLTransformer.ts:21-66).
EXCLUDE_NON_MAIN_TAGS = [
    "header", "footer", "nav", "aside",
    ".header", ".top", ".navbar", "#header",
    ".footer", ".bottom", "#footer",
    ".sidebar", ".side", ".aside", "#sidebar",
    ".modal", ".popup", "#modal", ".overlay",
    ".ad", ".ads", ".advert", "#ad",
    ".lang-selector", ".language", "#language-selector",
    ".social", ".social-media", ".social-links", "#social",
    ".menu", ".navigation", "#nav",
    ".breadcrumbs", "#breadcrumbs",
    ".share", "#share",
    ".widget", "#widget",
    ".cookie", "#cookie",
    "script", "style", "noscript",
]

BLOCK_QUERY_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "blockquote", "pre"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "text")

    def __init__(self, tag: str | None, attrs: dict | None = None, text: str | None = None):
        self.tag = tag            # None => text node
        self.attrs = attrs or {}
        self.children: list[Node] = []
        self.parent: Node | None = None
        self.text = text

    @property
    def is_text(self) -> bool:
        return self.tag is None

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def text_content(self) -> str:
        if self.is_text:
            return self.text or ""
        return "".join(c.text_content() for c in self.children)

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()


class _TreeBuilder(HTMLParser):
    """Forgiving HTML -> Node tree; comments dropped at parse time
    (the reference removes comments, HTMLTransformer.ts:137-139)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        self.stack[-1].append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].append(Node(None, text=data))


# Guarded fast-parser import: lxml's C parser is ~5-10x the stdlib
# html.parser on real pages — at 100 TB the extract stage is the cost
# center, so production environments with lxml installed get the fast
# kernel automatically; this sandbox has no lxml, so the stdlib path is
# the tested default. Both paths build the same Node tree and must pass
# the same golden-rule fixtures (tests/test_htmlmd.py runs whichever
# backends are importable).
try:  # pragma: no cover - exercised only where lxml is installed
    from lxml import etree as _lxml_etree
except ImportError:
    _lxml_etree = None


def _lxml_to_node(el, parent: Node) -> None:
    node = Node(str(el.tag).lower(), {k: v for k, v in el.attrib.items()})
    parent.append(node)
    if el.text:
        node.append(Node(None, text=el.text))
    for child in el:
        if isinstance(child.tag, str):  # skips comments/PIs
            _lxml_to_node(child, node)
        if child.tail:
            node.append(Node(None, text=child.tail))


# 'auto' only switches to lxml after a golden-parity self-check: lxml wraps
# fragments in implied <html>/<body> and diverges from the stdlib builder on
# malformed markup/entities, and extraction output feeds dedup keys and crawl
# scope — silent divergence between environments is worse than losing the
# fast path. The check parses adversarial fragments with both backends and
# compares the serialized trees; any mismatch pins 'auto' to stdlib.
_PARITY_FRAGMENTS = (
    "<p>a<b>b</p>c",                       # unclosed inline at block close
    "<div>x &amp; y &lt;z&gt; &#169;</div>",  # entities
    "<ul><li>1<li>2</ul>",                 # implied </li>
    "<table><tr><td>t</table>",            # implied tbody handling
    "plain text, no tags",
    "<a href='u'>l</a> tail <br> more",
)
_auto_lxml_ok: "bool | None" = None


def _serialize(node: Node) -> str:
    if node.is_text:
        return "T(%s)" % node.text
    kids = ",".join(_serialize(c) for c in node.children)
    return "%s%s[%s]" % (node.tag, sorted((node.attrs or {}).items()), kids)


def _lxml_parity_check() -> bool:
    global _auto_lxml_ok
    if _auto_lxml_ok is None:
        try:
            _auto_lxml_ok = all(
                _serialize(parse_html(f, backend="lxml"))
                == _serialize(parse_html(f, backend="stdlib"))
                for f in _PARITY_FRAGMENTS
            )
        except Exception:
            _auto_lxml_ok = False
    return _auto_lxml_ok


def parse_html(html: str, backend: str = "auto") -> Node:
    """Forgiving HTML -> Node tree.

    ``backend``: 'auto' uses lxml only when importable AND it passes the
    embedded golden-parity self-check against the stdlib builder (otherwise
    stdlib); 'stdlib' / 'lxml' force a specific kernel (tests exercise both).
    """
    # Whitespace pre-normalization (html-to-markdown.ts:4-8).
    html = re.sub(r">\s+<", "><", html)
    html = re.sub(r"\s+", " ", html).strip()
    if backend == "auto":
        use_lxml = _lxml_etree is not None and _lxml_parity_check()
    else:
        use_lxml = backend == "lxml"
    if use_lxml:
        if _lxml_etree is None:
            raise RuntimeError("lxml backend requested but lxml is not installed")
        root = Node("#root")
        parsed = _lxml_etree.HTML(html) if html else None
        if parsed is not None:
            _lxml_to_node(parsed, root)
        return root
    b = _TreeBuilder()
    b.feed(html)
    return b.root


# --- selector matching (tag | .class | #id — all the reference list needs) --

def _matches(node: Node, selector: str) -> bool:
    if node.is_text:
        return False
    if selector.startswith("."):
        return selector[1:] in (node.attrs.get("class") or "").split()
    if selector.startswith("#"):
        return node.attrs.get("id") == selector[1:]
    return node.tag == selector


def remove_matching(root: Node, selectors: list[str]) -> None:
    # Pre-bucket the selector list into tag/class/id sets so each node is an
    # O(1) membership test instead of a 42-selector scan — this loop runs
    # per NODE per document and was 53% of the extract kernel's CPU.
    tags: set[str] = set()
    classes: set[str] = set()
    ids: set[str] = set()
    for sel in selectors:
        if sel.startswith("."):
            classes.add(sel[1:])
        elif sel.startswith("#"):
            ids.add(sel[1:])
        else:
            tags.add(sel)

    def hit(c: Node) -> bool:
        if c.tag in tags:
            return True
        a = c.attrs
        if ids and a.get("id") in ids:
            return True
        if classes:
            cls = a.get("class")
            if cls and not classes.isdisjoint(cls.split()):
                return True
        return False

    def prune(node: Node) -> None:
        node.children = [c for c in node.children if c.is_text or not hit(c)]
        for c in node.children:
            if not c.is_text:
                prune(c)

    prune(root)


# --- URL rewriting (HTMLTransformer.ts:215-384) ----------------------------

_SRCSET_SPLIT = re.compile(r"\s+")


def _parse_srcset(srcset: str) -> list[tuple[str, float, bool]]:
    out = []
    for entry in (e.strip() for e in srcset.split(",")):
        if not entry:
            continue
        parts = _SRCSET_SPLIT.split(entry)
        url = parts[0]
        desc = parts[1] if len(parts) > 1 else "1x"
        size, is_density = 1.0, True
        if desc.endswith("x"):
            try:
                size = float(desc[:-1])
            except ValueError:
                pass
        elif desc.endswith("w"):
            try:
                size, is_density = float(int(desc[:-1])), False
            except ValueError:
                pass
        out.append((url, size, is_density))
    return out


def transform_urls(root: Node, base_url: str) -> None:
    """Absolutize img src/srcset + a href; pick the largest srcset candidate
    as src (HTMLTransformer.ts:236-316). Mutates the tree in place."""
    for node in root.iter():
        if node.is_text:
            continue
        if node.tag == "img":
            srcset = node.attrs.get("srcset")
            if srcset:
                sources = [
                    (resolve_url(base_url, u), s, d) for u, s, d in _parse_srcset(srcset)
                ]
                if sources and all(d for _, _, d in sources):
                    src = node.attrs.get("src")
                    if src:
                        sources.append((resolve_url(base_url, src), 1.0, True))
                if sources:
                    best = max(sources, key=lambda t: t[1])
                    node.attrs["src"] = best[0]
                # rebuild keeps the ORIGINAL descriptor text (reference:
                # `${absoluteUrl} ${parts[1]}`, HTMLTransformer.ts:298-310)
                rebuilt = []
                for entry in (e.strip() for e in srcset.split(",")):
                    if not entry:
                        continue
                    parts = _SRCSET_SPLIT.split(entry)
                    absu = resolve_url(base_url, parts[0])
                    rebuilt.append(f"{absu} {parts[1]}" if len(parts) > 1 else absu)
                node.attrs["srcset"] = ", ".join(rebuilt)
            elif node.attrs.get("src"):
                node.attrs["src"] = resolve_url(base_url, node.attrs["src"])
        elif node.tag == "a" and node.attrs.get("href"):
            href = node.attrs["href"]
            low = href.strip().lower()
            if not (low.startswith("javascript:") or low.startswith("mailto:") or low == "#"):
                node.attrs["href"] = resolve_url(base_url, href)


# --- DOM queries -----------------------------------------------------------

def extract_links(root: Node) -> list[str]:
    """All <a href> in DOM order (pre-stripping — matches Crawlee
    enqueueLinks operating on the full page, Base.ts:376-423)."""
    return [
        n.attrs["href"]
        for n in root.iter()
        if not n.is_text and n.tag == "a" and n.attrs.get("href")
    ]


def extract_title(root: Node) -> str:
    for n in root.iter():
        if not n.is_text and n.tag == "title":
            return n.text_content().strip()
    return ""


def extract_metadata(root: Node) -> list[dict]:
    """<meta name/property/content> rows (DataExtractor.ts:175-198)."""
    out = []
    for n in root.iter():
        if not n.is_text and n.tag == "meta":
            name, prop, content = (
                n.attrs.get("name"), n.attrs.get("property"), n.attrs.get("content"),
            )
            if content and (name or prop):
                out.append({"name": name, "property": prop, "content": content})
    return out


# --- markdown conversion (turndown-rule parity) ----------------------------

def _has_ancestor(node: Node, tag: str) -> bool:
    cur = node.parent
    while cur is not None:
        if cur.tag == tag:
            return True
        cur = cur.parent
    return False


def _has_block_descendant(node: Node) -> bool:
    return any(
        (not c.is_text) and c.tag in BLOCK_QUERY_TAGS for c in node.iter() if c is not node
    )


def _sibling_has_content(sib: Node | None) -> bool:
    if sib is None:
        return False
    if sib.is_text:
        return bool((sib.text or "").strip())
    if sib.tag == "span":
        return bool(sib.text_content().strip())
    return False


def _node_to_md(node: Node) -> str:
    if node.is_text:
        return node.text or ""
    tag = node.tag
    if tag in REMOVE_TAGS:
        return ""
    content = "".join(_node_to_md(c) for c in node.children)

    if tag == "p":  # html-to-markdown.ts:24-41
        t = content.strip()
        if not t:
            return ""
        if _has_ancestor(node, "a"):
            return t
        return "\n\n" + t + "\n\n"

    if tag == "div":  # :44-69
        t = content.strip()
        if not t:
            return ""
        if _has_ancestor(node, "a"):
            return t
        if _has_block_descendant(node):
            return "\n\n" + t + "\n\n"
        return t + " "

    if tag == "span":  # :72-100
        t = content.strip()
        if not t:
            return ""
        sibs = node.parent.children if node.parent else []
        idx = sibs.index(node)
        prev_s = sibs[idx - 1] if idx > 0 else None
        next_s = sibs[idx + 1] if idx + 1 < len(sibs) else None
        prefix = " " if _sibling_has_content(prev_s) else ""
        suffix = " " if _sibling_has_content(next_s) else ""
        return prefix + t + suffix

    if tag == "a":
        href = (node.attrs.get("href") or "").strip()
        non_ws_children = [
            c for c in node.children if not (c.is_text and not (c.text or "").strip())
        ]
        # linked-image rule (:103-124)
        if len(non_ws_children) == 1 and non_ws_children[0].tag == "img":
            image_md = content.strip()
            invalid = not href or href == "#" or href.lower().startswith("javascript:")
            return image_md if invalid else f"[{image_md}]({href})"
        t = content.strip()
        if not t:
            return ""
        if not href:
            return t
        return f"[{t}]({href})"

    if tag in ("figure", "picture"):  # :127-133
        t = content.strip()
        return f"\n\n{t}\n\n" if t else ""

    if tag == "figcaption":  # :136-142
        t = content.strip()
        return f"\n\n{t}\n\n" if t else ""

    if tag in ("em", "i"):  # :145-160
        t = content.strip()
        return f"*{t}*" if t else ""

    if tag in ("strong", "b"):
        t = content.strip()
        return f"**{t}**" if t else ""

    if tag == "br":  # :163-168
        return "\n"

    if tag == "img":
        src = node.attrs.get("src") or ""
        alt = node.attrs.get("alt") or ""
        return f"![{alt}]({src})" if src else ""

    if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        t = content.strip()
        return f"\n\n{'#' * int(tag[1])} {t}\n\n" if t else ""

    if tag in ("ul", "ol"):
        items = [c for c in node.children if not c.is_text and c.tag == "li"]
        lines = []
        for i, li in enumerate(items):
            txt = "".join(_node_to_md(c) for c in li.children).strip()
            marker = f"{i + 1}." if tag == "ol" else "-"
            lines.append(f"{marker}  {txt}" if tag == "ol" else f"{marker}   {txt}")
        return "\n\n" + "\n".join(lines) + "\n\n" if lines else ""

    if tag == "blockquote":
        t = content.strip()
        return "\n\n" + "\n".join("> " + l for l in t.split("\n")) + "\n\n" if t else ""

    if tag == "pre":
        t = node.text_content()
        return f"\n\n```\n{t}\n```\n\n" if t.strip() else ""

    if tag == "hr":
        return "\n\n* * *\n\n"

    if tag == "li":
        return content

    # default: transparent container (html, body, head handled by removals)
    return content


_IMG_IN_BRACKETS = re.compile(r"\[\s*(!\[[^\]]*\]\([^\)]+\))\s*\]")
_BARE_BRACKET_IMG = re.compile(r"\[\s*(!\[[^\]]*\]\([^\)]+\))\s*\](?!\s*[\(\[])")
_LINK_TEXT = re.compile(r"\[\s*([\s\S]*?)\s*\]\(([^\)]+)\)")


def _normalize_bracket_images(md: str) -> str:
    # iterate-to-stable (html-to-markdown.ts:171-189)
    prev = None
    while md != prev:
        prev = md
        md = _IMG_IN_BRACKETS.sub(r"[\1]", md)
        md = _BARE_BRACKET_IMG.sub(r"\1", md)
    return md


def _normalize_link_text_ws(md: str) -> str:
    def repl(m: re.Match) -> str:
        cleaned = re.sub(r"\s{2,}", " ", re.sub(r"[\t\r\n]+", " ", m.group(1))).strip()
        return f"[{cleaned}]({m.group(2)})"

    return _LINK_TEXT.sub(repl, md)


def to_markdown(root: Node) -> str:
    md = "".join(_node_to_md(c) for c in root.children)
    md = _normalize_bracket_images(md)
    md = _normalize_link_text_ws(md)
    md = re.sub(r"\n{3,}", "\n\n", md).strip()
    return md


# --- transformed-HTML serialization (the reference's `html` format) --------

_RAW_TEXT_TAGS = {"script", "style"}


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


def _node_to_html(node: Node, raw: bool = False) -> str:
    if node.is_text:
        # raw-text elements (script/style) serialize verbatim, like parse5
        return (node.text or "") if raw else _escape_text(node.text or "")
    parts = [f"<{node.tag}"]
    for k, v in node.attrs.items():
        # valueless attributes (e.g. `disabled`) round-trip as bare names
        parts.append(f' {k}="{_escape_attr(v)}"' if v is not None else f" {k}")
    parts.append(">")
    if node.tag in VOID_TAGS:
        return "".join(parts)
    inner_raw = node.tag in _RAW_TEXT_TAGS
    parts.extend(_node_to_html(c, inner_raw) for c in node.children)
    parts.append(f"</{node.tag}>")
    return "".join(parts)


def to_html(root: Node) -> str:
    """Serialize a (stripped, URL-rewritten) tree back to an HTML string —
    the reference's transformed `html` output format (HTMLTransformer.ts
    transformHtml -> doExtractCleanHtml -> `$.html()`). Comments are already
    gone (dropped at parse time); the include_tags path serializes the
    collected elements concatenated, matching cheerio's `$root.html()` on
    the wrapper div. Minimal entity escaping (parse5 style): `& < >` in
    text, `& \"` in attribute values; script/style text kept verbatim."""
    return "".join(_node_to_html(c) for c in root.children)


# --- span segmentation (input_hint payload) --------------------------------

_SPAN_TOKEN = re.compile(
    r"\[!\[[^\]]*\]\(([^\)]+)\)\]\([^\)]+\)"  # linked image -> group 1 = src
    r"|!\[[^\]]*\]\(([^\)]+)\)"               # plain image  -> group 2 = src
)


def markdown_to_spans(md: str) -> list[dict]:
    """Segment markdown into the interleaved (text|media) span sequence."""
    spans: list[dict] = []
    pos = 0
    for m in _SPAN_TOKEN.finditer(md):
        pre = md[pos:m.start()].strip()
        if pre:
            spans.append({"kind": "text", "text": pre, "media_ref": None})
        spans.append(
            {"kind": "media", "text": None, "media_ref": m.group(1) or m.group(2)}
        )
        pos = m.end()
    tail = md[pos:].strip()
    if tail:
        spans.append({"kind": "text", "text": tail, "media_ref": None})
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


# --- one-pass document extraction ------------------------------------------

def extract_document(
    html: str,
    base_url: str,
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
    with_html: bool = False,
) -> dict:
    """Full extraction: links (raw DOM order), title, metadata, markdown, spans,
    and (on request) the transformed-HTML format.

    Mirrors DataExtractor.extractData's format fan-out (DataExtractor.ts:230-341)
    as a single pass: links are taken BEFORE stripping (Crawlee semantics);
    markdown/spans AFTER non-main stripping + URL rewrite. ``with_html=True``
    additionally serializes the post-strip, URL-rewritten tree as the
    reference's `html` output format (HTMLTransformer.ts transformHtml) — off
    by default, matching the reference's formats option (html is produced only
    when requested) and keeping the hot extract kernel serialization-free.
    """
    root = parse_html(html)
    title = extract_title(root)
    metadata = extract_metadata(root)
    transform_urls(root, base_url)
    links = extract_links(root)
    if include_tags:
        keep = [n for s in include_tags for n in root.iter() if _matches(n, s)]
        pruned = Node("#root")
        for n in keep:
            pruned.append(n)
        root = pruned
    else:
        remove_matching(root, EXCLUDE_NON_MAIN_TAGS)
        if exclude_tags:
            remove_matching(root, list(exclude_tags))
    md = to_markdown(root)
    spans = markdown_to_spans(md)
    out = {
        "title": title,
        "metadata": metadata,
        "links": links,
        "markdown": md,
        "spans": spans,
    }
    if with_html:
        out["html"] = to_html(root)
    return out
