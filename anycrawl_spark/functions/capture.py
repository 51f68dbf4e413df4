"""preNav capture rules — the template surface's response-capture matcher.

Reference: `packages/scrape/src/core/EngineConfigurator.ts:277-473` (the
preNavHook): a template's ``customHandlers.preNav`` declares keyed rule
lists; every network response a page produces is matched against the
pending keys' rules (``exact`` string equality, ``glob`` via
``minimatch(url, pattern, { dot: true })``, ``regex`` via
``new RegExp("^(?:" + pattern + ")$")``), and the FIRST matching non-empty
response per key is captured (status, lowercased headers, body, raw
set-cookie values). One response may satisfy several keys; an EMPTY body
skips the capture and leaves the key pending (ts:388-394 ``continue``
without ``cfg.done = true``).

The glob matcher reimplements minimatch semantics from the public library
behavior (isaacs/minimatch; the reference pins ^10.0.3, whose glob
semantics match v9): leading ``#`` comments, leading ``!`` negation, brace
expansion (alternates + ranges, escaped commas), both-side multi-slash
coalescing (``slashSplit = /\\/+/``), pattern-level ``<p>/..`` resolution
(levelOneOptimize), ``/``-segment matching with ``*`` / ``?`` / character
classes (single-char classes are literal) / extglobs (incl. nesting and
the negation tail-folding of ``#fillNegs`` + ``#emptyExt``), the fast-path
segment shapes (``*``, ``*.ext``, ``?``-runs, ``*.*``, ``.*`` — which
carry their own, subtly different, dot/empty rules), ``**`` globstar (zero
or more whole segments, never ``.``/``..``; ``**`` inside a segment
degrades to ``*``), and the no-traversal guard on magic segments. ``dot``
is a parameter: capture rules use ``{dot: true}`` (the reference's option
here), while the template domain validator calls plain ``minimatch(...)``
whose default is ``dot: false`` (star/qmark/globstar skip dot-leading
segments, mirrored per ast.js/index.js v9). The unit goldens in
tests/test_capture.py were generated
against the real minimatch 9.0.5 (node); a 38,000-case random differential
fuzz against the same library passed with zero divergences at generation
time.

Determinism note: the reference stamps payloads with ``Date.now()``
(``matchedAt``) and ships them through Redis; here ``matched_seq`` is the
response's position in the request's ordered response log — the sandbox's
deterministic stand-in, same information content for ordering.
"""

from __future__ import annotations

import json
import re
from functools import lru_cache

# --------------------------------------------------------------- brace expand

_RANGE_RE = re.compile(r"^(-?\d+)\.\.(-?\d+)(?:\.\.(-?\d+))?$|^([a-zA-Z])\.\.([a-zA-Z])$")


def _split_alternates(body: str) -> list[str] | None:
    """Split a brace body on top-level UNESCAPED commas; None when there is
    no comma (minimatch: `{a}` is literal, only `{a,b}` or ranges expand;
    `{a\\,b,c}` keeps the escaped comma inside the first alternate)."""
    parts, depth, cur, i = [], 0, [], 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            cur.append(ch)
            cur.append(body[i + 1])
            i += 2
            continue
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts if len(parts) > 1 else None


def brace_expand(pattern: str) -> list[str]:
    """minimatch's pre-pass (brace-expansion pkg): `{a,b}` alternates,
    `{1..3}` / `{a..c}` ranges, nested; unmatched braces stay literal."""
    i = pattern.find("{")
    while i != -1 and i > 0 and pattern[i - 1] == "\\":
        i = pattern.find("{", i + 1)
    if i == -1:
        return [pattern]
    depth, j = 0, i
    while j < len(pattern):
        if pattern[j] == "{" and (j == 0 or pattern[j - 1] != "\\"):
            depth += 1
        elif pattern[j] == "}" and pattern[j - 1] != "\\":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if depth != 0:
        return [pattern]  # unbalanced: literal
    prefix, body, suffix = pattern[:i], pattern[i + 1 : j], pattern[j + 1 :]
    m = _RANGE_RE.match(body)
    if m:
        if m.group(4):  # alpha range
            a, b = ord(m.group(4)), ord(m.group(5))
            step = 1 if b >= a else -1
            mids = [chr(c) for c in range(a, b + step, step)]
        else:
            a, b = int(m.group(1)), int(m.group(2))
            step = abs(int(m.group(3) or 1)) or 1
            if b < a:
                step = -step
            mids = [str(n) for n in range(a, b + (1 if step > 0 else -1), step)]
        return [o for mid in mids for o in brace_expand(prefix + mid + suffix)]
    alts = _split_alternates(body)
    if alts is None:
        # `{x}` does not expand; recurse past it for later braces
        return [prefix + "{" + h + "}" + t
                for h in brace_expand_inner(body)
                for t in brace_expand(suffix)]
    return [o for alt in alts for o in brace_expand(prefix + alt + suffix)]


def brace_expand_inner(body: str) -> list[str]:
    return brace_expand(body)


# ------------------------------------------------------- segment -> regex

_EXTGLOB_HEADS = "@!+*?"


def _class_to_regex(seg: str, i: int) -> tuple[str, int, str | None] | None:
    """Parse `[...]` starting at seg[i]; returns (regex, next_i, literal) or
    None when there is no closing `]` (minimatch then treats `[` literally).
    ``literal`` is the single character when the class reduces to one plain
    char (v9 parseClass marks `[a]` / `[.]` NON-magic and compares them as
    literals), else None."""
    j = i + 1
    neg = ""
    if j < len(seg) and seg[j] in "!^":
        neg = "^"
        j += 1
    body = []
    raw_entities = []  # plain chars consumed (None marker for ranges)
    while j < len(seg):
        c = seg[j]
        if c == "\\" and j + 1 < len(seg):
            body.append(re.escape(seg[j + 1]))
            raw_entities.append(seg[j + 1])
            j += 2
            continue
        if c == "]" and body:
            lit = None
            if not neg and len(raw_entities) == 1 and raw_entities[0] is not None:
                lit = raw_entities[0]
            return f"[{neg}{''.join(body)}]", j + 1, lit
        if c == "]" and not body and neg:
            # `[!]` / `[^]` with immediate ]: ] joins the class body
            body.append(re.escape(c))
            raw_entities.append(c)
            j += 1
            continue
        body.append(c if (c.isalnum() or c == "-") else re.escape(c))
        raw_entities.append(None if c == "-" else c)
        j += 1
    return None


def _split_top_pipe(s: str) -> list[str]:
    """Split an extglob body on top-level '|' only (nesting- and
    escape-aware) — ``@(a@(b|c))`` keeps its inner alternation intact."""
    parts, depth, cur, i = [], 0, [], 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            cur.append(ch)
            cur.append(s[i + 1])
            i += 2
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "|" and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


_START_NO_TRAVERSAL = r"(?!(?:^|\/)\.\.?(?:$|\/))"


def _empty_ext(inner: str) -> bool:
    """ast.js:291-293 #emptyExt: at the extglob's closing ')' the
    accumulated literal tail is empty — the body is '', ends with '|', or
    ends with a nested extglob. A '!' extglob in that state compiles to
    plain starNoEmpty ([^/]+?)."""
    acc_empty = True
    i = 0
    while i < len(inner):
        c = inner[i]
        if c == "\\" and i + 1 < len(inner):
            acc_empty = False
            i += 2
            continue
        if c == "|":
            acc_empty = True
            i += 1
            continue
        if c in _EXTGLOB_HEADS and i + 1 < len(inner) and inner[i + 1] == "(":
            depth, j = 0, i + 1
            while j < len(inner):
                if inner[j] == "(":
                    depth += 1
                elif inner[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if j < len(inner):
                acc_empty = True  # nested extglob resets the accumulator
                i = j + 1
                continue
        acc_empty = False
        i += 1
    return acc_empty


def _alt_to_regex(alt: str, at_start: bool, at_end: bool, dot: bool) -> str:
    """One extglob alternative, with v9's portion-start semantics when the
    extglob spans the segment edge: a lone '*' needs one char and magic
    dot-capable starts get the no-traversal (dot:true) or no-dot
    (dot:false) guard (ast.js:436-452)."""
    if at_start and at_end and alt == "*":
        return (_START_NO_TRAVERSAL if dot else _START_NO_DOT) + "[^/]+?"
    src, _, alt_ext = _segment_to_regex(alt, dot)
    if at_start and not alt_ext:
        src = _start_guard(src, dot) + src
    return src


def _segment_to_regex(seg: str, dot: bool) -> tuple[str, str | None, bool]:
    """One path segment (no '/') -> (regex fragment, literal text,
    starts-with-extglob flag).

    The literal text is the unescaped segment when NO glob magic was seen
    (minimatch keeps such parts as plain strings and compares with ===),
    else None. The flag mirrors v9's `typeof parts[0] === 'string'` check:
    segments that OPEN with an extglob never receive the outer
    no-traversal guard (the extglob handles its own dot semantics).
    `**` inside a segment is NOT a globstar (only a whole-`**` segment
    is)."""
    out: list[str] = []
    lit: list[str] = []
    magic = False
    starts_with_ext = False
    i = 0
    while i < len(seg):
        c = seg[i]
        nxt = seg[i + 1] if i + 1 < len(seg) else ""
        if c == "\\" and nxt:
            out.append(re.escape(nxt))
            lit.append(nxt)
            i += 2
        elif c in _EXTGLOB_HEADS and nxt == "(":
            # extglob X(a|b): scan to the balanced ')'
            depth, j = 0, i + 1
            while j < len(seg):
                if seg[j] == "(":
                    depth += 1
                elif seg[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if j >= len(seg):  # unbalanced: literal
                out.append(re.escape(c))
                lit.append(c)
                i += 1
                continue
            magic = True
            if i == 0:
                starts_with_ext = True
            inner = seg[i + 2 : j]
            at_start = i == 0
            at_end = j == len(seg) - 1
            alts = [
                _alt_to_regex(a, at_start, at_end, dot)
                for a in _split_top_pipe(inner)
            ]
            if c == "!":
                # v9 #fillNegs: the REST of the segment moves into each
                # alternative's lookahead, bound by (?:$|/) — so !(a)
                # matches 'a.b' (the binding fails) but not 'a'. A body
                # whose tail is empty (#emptyExt) is exactly [^/]+?.
                rest_src = (
                    _segment_to_regex(seg[j + 1 :], dot)[0] if j + 1 < len(seg) else ""
                )  # recursive: nested negations fold their own tails
                # dot:false + negation at segment start: the matcher star
                # gets startNoDot (ast.js:500,505 — both the emptyExt and
                # the '))'+star close insert it when isStart && !dot)
                nodot = _START_NO_DOT if at_start and not dot else ""
                if _empty_ext(inner):
                    out.append(nodot + "[^/]+?" + rest_src)
                else:
                    looka = "|".join(f"{a}{rest_src}(?:$|\\/)" for a in alts)
                    out.append(f"(?:(?!(?:{looka})){nodot}[^/]*?){rest_src}")
                # rest consumed into the negation
                return "".join(out), None, starts_with_ext
            body = "|".join(alts)
            if c == "@":
                out.append(f"(?:{body})")
            elif c in "*+" and not dot:
                # ast.js:473-495 bodyDotAllowed: a repeated extglob with
                # dot:false computes its body twice — first iteration in
                # no-dot mode, further iterations dot-allowed — so *(?)
                # matches 'a.b' but not '.ab'. Close: '+' drops its
                # quantifier, '*' becomes '?' (found by the dot:false
                # minimatch differential fuzz).
                body_dot = "|".join(
                    _alt_to_regex(a, at_start, at_end, True)
                    for a in _split_top_pipe(inner)
                )
                if body_dot == body:
                    out.append(f"(?:{body}){c}")
                else:
                    opt = "?" if c == "*" else ""
                    out.append(f"(?:(?:{body})(?:{body_dot})*?){opt}")
            else:  # + * ?
                out.append(f"(?:{body}){c}")
            i = j + 1
        elif c == "*":
            magic = True
            out.append("[^/]*")
            i += 1
        elif c == "?":
            magic = True
            out.append("[^/]")
            i += 1
        elif c == "[":
            parsed = _class_to_regex(seg, i)
            if parsed is None:
                out.append(re.escape(c))
                lit.append(c)
                i += 1
            else:
                frag, i, class_lit = parsed
                if class_lit is not None:
                    # single-char class is NON-magic in v9 ([.] == literal .)
                    out.append(re.escape(class_lit))
                    lit.append(class_lit)
                else:
                    magic = True
                    out.append(frag)
        else:
            out.append(re.escape(c))
            lit.append(c)
            i += 1
    return "".join(out), (None if magic else "".join(lit)), starts_with_ext


# v9's fast-path segment shapes (index.js:22-41): these REPLACE the regex
# test for the most common patterns, with subtly different semantics (e.g.
# '*.json' is a plain endsWith with NO dot exclusion, while '*' excludes
# '', '.' and '..'). Mirrored verbatim, dot:true variants.
_STAR_RE = re.compile(r"^\*+$")
_STAR_EXT_RE = re.compile(r"^\*+([^+@!?\*\[\(]*)$")
_QMARKS_RE = re.compile(r"^(\?+)([^+@!?\*\[\(]*)?$")
_STAR_DOT_STAR_RE = re.compile(r"^\*+\.\*+$")
_DOT_STAR_RE = re.compile(r"^\.\*+$")

_APS = ("[", ".")
_START_NO_DOT = r"(?!\.)"


def _start_guard(src: str, dot: bool) -> str:
    """ast.js:438-451: with dot:true, guard '.'/'..' (needNoTrav) when the
    compiled source could match a leading dot — starts with '[' or '.', or
    with escaped dots followed by one; the escaped-dot clauses apply in
    BOTH modes. With dot:false, a dot-capable magic start instead gets the
    no-DOT guard (needNoDot), so '*'/'[a]' never match dotfiles."""
    trav = (
        (dot and src[:1] in _APS)
        or (src.startswith("\\.") and src[2:3] in _APS)
        or (src.startswith("\\.\\.") and src[4:5] in _APS)
    )
    if trav:
        return r"(?!\.\.?$)"
    if not dot and src[:1] in _APS:
        return _START_NO_DOT
    return ""


def _compile_segment(seg: str, dot: bool, nocase: bool):
    """"**" sentinel for a whole-`**` segment; a fast-path tuple for v9's
    shortcut shapes (each exists in dot and nocase variants,
    index.js:22-68 — the nocase variants lowercase the extension at compile
    and the candidate at test); ("lit", text, nocase) for magic-free
    segments (string equality; with nocase a letter-bearing literal becomes
    "magic" in v9 — toMMPattern's `body.toUpperCase() !== body.toLowerCase()`
    — and compiles to an 'i' regex, which lowercased comparison mirrors);
    else a compiled regex with the start guard ('.'/'..' are never matched
    by magic even with dot:true — ast.js:435 'for explosively exponential
    reasons'; dotfiles are excluded entirely with dot:false) and the 'i'
    flag when nocase. A fragment that fails to compile matches literally."""
    if seg == "**":
        return "**"
    if _STAR_RE.match(seg):
        return ("star", dot)
    m = _STAR_EXT_RE.match(seg)
    if m:
        ext = m.group(1)
        return ("ends", ext.lower() if nocase else ext, dot, nocase)
    m = _QMARKS_RE.match(seg)
    if m:
        ext = m.group(2) or ""
        return ("qmarks", len(seg), ext.lower() if nocase else ext, dot, nocase)
    if _STAR_DOT_STAR_RE.match(seg):
        return ("stardotstar", dot)
    if _DOT_STAR_RE.match(seg):
        return ("dotstar",)
    src, lit, starts_with_ext = _segment_to_regex(seg, dot)
    if lit is not None:
        return ("lit", lit, nocase)
    guard = "" if starts_with_ext else _start_guard(src, dot)
    try:
        return re.compile("^" + guard + src + "$", re.IGNORECASE if nocase else 0)
    except re.error:
        return ("lit", seg, nocase)


def _seg_hit(p, f: str) -> bool:
    if not isinstance(p, tuple):
        return p.match(f) is not None
    kind = p[0]
    if kind == "lit":  # string equality ('i'-regex semantics under nocase)
        return f.lower() == p[1].lower() if p[2] else f == p[1]
    if kind == "star":  # starTestDot / starTest
        if p[1]:
            return f != "" and f != "." and f != ".."
        return f != "" and not f.startswith(".")
    if kind == "ends":  # starDotExtTest{,Dot,Nocase,NocaseDot}
        tail = f.lower() if p[3] else f
        if p[2]:
            return tail.endswith(p[1])
        return not f.startswith(".") and tail.endswith(p[1])
    if kind == "qmarks":  # qmarksTest{,Dot,Nocase,NocaseDot}
        tail = f.lower() if p[4] else f
        if p[3]:
            return len(f) == p[1] and f not in (".", "..") and tail.endswith(p[2])
        return len(f) == p[1] and not f.startswith(".") and tail.endswith(p[2])
    if kind == "stardotstar":  # starDotStarTestDot / starDotStarTest
        if p[1]:
            return f not in (".", "..") and "." in f
        return not f.startswith(".") and "." in f
    # "dotstar": dotStarTest (same in both modes — the dot is explicit)
    return f not in (".", "..") and f.startswith(".")


def _match_one(file_segs: list[str], pat_segs: list, fi: int = 0, pi: int = 0,
               dot: bool = True) -> bool:
    """minimatch matchOne over pre-compiled pattern segments
    (partial:false) — a semantic mirror of the public source's end
    conditions: a trailing ``**`` needs at least the '/' before it in the
    file (``a/**`` matches ``a/`` but NOT ``a``) and never swallows '.' or
    '..' segments (nor ANY dot-leading segment with dot:false);
    pattern-exhausted with file left matches only a single trailing empty
    segment (``a/*`` matches ``a/b/``)."""
    def blocked(f: str) -> bool:
        return f in (".", "..") or (not dot and f.startswith("."))

    fl, pl = len(file_segs), len(pat_segs)
    while fi < fl and pi < pl:
        p = pat_segs[pi]
        if p == "**":
            pr = pi + 1
            if pr == pl:
                # trailing globstar swallows the rest — except dot segments
                return all(not blocked(f) for f in file_segs[fi:])
            for swallow in range(fi, fl):  # fr < fl, as in the source
                if _match_one(file_segs, pat_segs, swallow, pr, dot):
                    return True
                if blocked(file_segs[swallow]):
                    break  # ** can stop BEFORE a dot segment, never cross it
            return False
        if not _seg_hit(p, file_segs[fi]):
            return False
        fi += 1
        pi += 1
    if fi == fl and pi == pl:
        return True
    if fi == fl:
        return False  # file ran out, pattern left (partial=false)
    # pattern ran out: ok only for the trailing '' of a file ending in '/'
    return fi == fl - 1 and file_segs[fi] == ""


_SLASHES = re.compile(r"/+")


def _level_one(parts: list[str]) -> list[str]:
    """v9 levelOneOptimize (default optimizationLevel=1, index.js:369):
    collapse adjacent '**' runs and resolve '<p>/..' pairs in the PATTERN
    (so 'a/../b' matches 'b', and 'x/..' reduces to the lone '' segment)."""
    out: list[str] = []
    for part in parts:
        prev = out[-1] if out else None
        if part == "**" and prev == "**":
            continue
        if part == ".." and prev and prev not in ("..", ".", "**"):
            out.pop()
            continue
        out.append(part)
    return out or [""]


@lru_cache(maxsize=4096)
def _compile_glob(pattern: str, dot: bool = True, nocase: bool = False):
    """pattern -> None (comment: never matches) | (negate, "") for the
    whole-empty pattern (matches only "") | (negate, expansions) where each
    expansion is a tuple of compiled segments. Cached so the per-response
    capture loop compiles each rule once per worker, like the regex rules."""
    if pattern.startswith("#"):
        return None  # comment (nocomment is NOT set in the reference)
    if pattern == "":
        # this.empty: ONLY the un-negated whole-'' pattern short-circuits
        return (False, "")
    negate = False
    while pattern.startswith("!"):
        negate = not negate
        pattern = pattern[1:]
    if pattern == "":
        # '!' strips to '': matched via a single literal-'' segment (so
        # '/' vs '!' is false: ['', ''] vs [''] fails the end conditions)
        return (negate, ((("lit", "", False),),))
    expansions = []
    for exp in brace_expand(pattern):
        if exp == "":
            # a brace-expanded EMPTY alternative is dropped from the glob
            # set in v9 ('{a,}' never matches ''), unlike the '!' case above
            continue
        segs = _level_one(_SLASHES.split(exp))
        expansions.append(tuple(_compile_segment(seg, dot, nocase) for seg in segs))
    return (negate, tuple(expansions))


def glob_match(s: str, pattern: str, dot: bool = True, nocase: bool = False) -> bool:
    """``minimatch(s, pattern, { dot, nocase })`` — dot:true is the
    capture-rule option (EngineConfigurator.ts); dot:false is the library
    default used by the template domain validator (domainValidator.ts
    calls plain ``minimatch(value, pattern)``); nocase:true is what
    crawlee's enqueueLinks applies to include/exclude globs
    (crawlee 3.13, packages/core/src/enqueue_links/shared.ts).

    Both the pattern AND the subject split on runs of slashes
    (`slashSplit = /\\/+/` applies to both sides in the library, so
    ``https://a.com/x`` has three segments on each side and consecutive
    slashes coalesce)."""
    compiled = _compile_glob(pattern, dot, nocase)
    if compiled is None:
        return False
    negate, expansions = compiled
    if expansions == "":
        result = s == ""
    else:
        file_segs = _SLASHES.split(s)
        result = any(_match_one(file_segs, list(exp), dot=dot) for exp in expansions)
    return result != negate


# ------------------------------------------------ preNav rule parsing + match

def parse_prenav_configs(prenav) -> list[dict]:
    """EngineConfigurator.ts:311-327: coerce each entry to {key, rules};
    regex rules compile ``^(?:pattern)$`` (invalid regex -> never matches,
    mirroring the swallowed-exception ``re = undefined``); unknown rule
    types fall back to exact; entries with empty key or no rules drop."""
    cfgs = []
    for cfg in prenav or []:
        if not isinstance(cfg, dict):
            cfg = {}
        key = str(cfg.get("key") if cfg.get("key") is not None else "")
        rules = []
        for r in cfg.get("rules") or [] if isinstance(cfg.get("rules"), list) else []:
            if not isinstance(r, dict):
                r = {}
            rtype = r.get("type")
            pattern = str(r.get("pattern") if r.get("pattern") is not None else "")
            if rtype == "regex":
                try:
                    compiled = re.compile(f"^(?:{pattern})$")
                except re.error:
                    compiled = None
                rules.append({"type": "regex", "pattern": pattern, "re": compiled})
            elif rtype == "glob":
                rules.append({"type": "glob", "pattern": pattern})
            else:
                rules.append({"type": "exact", "pattern": pattern})
        if key and rules:
            cfgs.append({"key": key, "rules": rules})
    return cfgs


def match_capture_url(url: str, rules: list[dict]) -> bool:
    """ts:340-352: first rule wins; glob errors are swallowed (never match)."""
    for r in rules:
        if r["type"] == "exact":
            if url == r["pattern"]:
                return True
        elif r["type"] == "glob":
            try:
                if glob_match(url, r["pattern"]):
                    return True
            except Exception:  # minimatch throw -> ignored (ts:346)
                pass
        else:
            if r["re"] is not None and r["re"].match(url):
                return True
    return False


def _lower_headers(headers: dict | None) -> dict:
    """ts:381-383: lowercase keys; list values keep their FIRST element,
    everything stringified."""
    out = {}
    for k, v in (headers or {}).items():
        out[str(k).lower()] = str(v[0]) if isinstance(v, list) else str(v)
    return out


def _parse_int_leniently(s) -> int:
    """JS parseInt(String(x)): leading int prefix, else 0 (ts:389-391 wraps
    it in try/catch and NaN -> falsy -> reportedLength stays 0)."""
    m = re.match(r"\s*([+-]?\d+)", str(s))
    return int(m.group(1)) if m else 0


def capture_responses(prenav, responses: list[dict]) -> list[dict]:
    """The preNavHook response loop (ts:355-466), deterministic core: walk
    ``responses`` in order; for each pending key whose rules match the
    response URL, capture the payload and mark the key done — unless the
    body is empty (no text AND content-length <= 0), which skips the
    response but leaves the key pending. One response may satisfy several
    keys. Returns payload dicts in capture order.

    A response dict: {url, status?, method?, headers?, body?, cookies?,
    } — cookies models the engine's context.cookies() snapshot
    (``cookiesRaw``); raw set-cookie values come from the headers.
    """
    cfgs = parse_prenav_configs(prenav)
    if not cfgs:
        return []
    captured: list[dict] = []
    for seq, resp in enumerate(responses or []):
        url = str(resp.get("url") or "")
        if not url:
            continue
        if all(c.get("done") for c in cfgs):
            break  # ts:452-456: listener detaches once every key is satisfied
        for cfg in cfgs:
            if cfg.get("done") or not match_capture_url(url, cfg["rules"]):
                continue
            headers = resp.get("headers") or {}
            lower = _lower_headers(headers)
            body = resp.get("body")
            reported = _parse_int_leniently(lower.get("content-length", "")) if lower.get("content-length") else 0
            has_body = (isinstance(body, str) and len(body) > 0) or reported > 0
            if not has_body:
                continue  # key stays pending (ts:392-394)
            set_cookie = headers.get("set-cookie", lower.get("set-cookie"))
            if isinstance(set_cookie, list):
                set_cookie_raw = [str(x) for x in set_cookie]
            elif isinstance(set_cookie, str):
                set_cookie_raw = [set_cookie]
            else:
                set_cookie_raw = []
            captured.append(
                {
                    "key": cfg["key"],
                    "url": url,
                    "method": resp.get("method"),
                    "status": int(resp.get("status") or 0),
                    "headers": lower,
                    "body": body,
                    "matched_seq": seq,
                    "cookiesRaw": resp.get("cookies") or [],
                    "setCookieRaw": set_cookie_raw,
                }
            )
            cfg["done"] = True
    return captured


def captures_to_json(captures: list[dict]) -> str:
    """Canonical JSON for the Spark column: stable key order, no whitespace."""
    return json.dumps(captures, sort_keys=True, separators=(",", ":"))
