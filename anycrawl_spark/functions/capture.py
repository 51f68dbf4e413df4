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
expansion (alternates + ranges), ``/``-segment matching with ``*`` / ``?``
/ character classes / extglobs, and ``**`` globstar (zero or more whole
segments; ``**`` inside a segment degrades to ``*``). ``dot`` restrictions
are omitted because the reference always passes ``{dot: true}``. The unit
goldens in tests/test_capture.py were generated against the real minimatch
9.0.5 (node) to pin these semantics.

Determinism note: the reference stamps payloads with ``Date.now()``
(``matchedAt``) and ships them through Redis; here ``matched_seq`` is the
response's position in the request's ordered response log — the sandbox's
deterministic stand-in, same information content for ordering.
"""

from __future__ import annotations

import json
import re

# --------------------------------------------------------------- brace expand

_RANGE_RE = re.compile(r"^(-?\d+)\.\.(-?\d+)(?:\.\.(-?\d+))?$|^([a-zA-Z])\.\.([a-zA-Z])$")


def _split_alternates(body: str) -> list[str] | None:
    """Split a brace body on top-level commas; None when there is no comma
    (minimatch: `{a}` is literal, only `{a,b}` or ranges expand)."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
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


def _class_to_regex(seg: str, i: int) -> tuple[str, int] | None:
    """Parse `[...]` starting at seg[i]; returns (regex, next_i) or None when
    there is no closing `]` (minimatch then treats `[` literally)."""
    j = i + 1
    neg = ""
    if j < len(seg) and seg[j] in "!^":
        neg = "^"
        j += 1
    body = []
    while j < len(seg):
        c = seg[j]
        if c == "\\" and j + 1 < len(seg):
            body.append(re.escape(seg[j + 1]))
            j += 2
            continue
        if c == "]" and body:
            return f"[{neg}{''.join(body)}]", j + 1
        if c == "]" and not body and neg:
            # `[!]` / `[^]` with immediate ]: ] joins the class body
            body.append(re.escape(c))
            j += 1
            continue
        body.append(c if (c.isalnum() or c == "-") else re.escape(c))
        j += 1
    return None


def _segment_to_regex(seg: str) -> str:
    """One path segment (no '/') to an anchored-regex fragment. `**` inside a
    segment is NOT a globstar (minimatch: only a whole-`**` segment is)."""
    out: list[str] = []
    i = 0
    while i < len(seg):
        c = seg[i]
        nxt = seg[i + 1] if i + 1 < len(seg) else ""
        if c == "\\" and nxt:
            out.append(re.escape(nxt))
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
                i += 1
                continue
            inner = seg[i + 2 : j]
            alts = "|".join(_segment_to_regex(a) for a in inner.split("|"))
            if c == "@":
                out.append(f"(?:{alts})")
            elif c == "!":
                # minimatch's own translation: unanchored lookahead, so
                # !(x) also rejects x-prefixed segments — library quirk
                out.append(f"(?:(?!(?:{alts}))[^/]*?)")
            else:  # + * ?
                out.append(f"(?:{alts}){c}")
            i = j + 1
        elif c == "*":
            out.append("[^/]*")
            i += 1
        elif c == "?":
            out.append("[^/]")
            i += 1
        elif c == "[":
            parsed = _class_to_regex(seg, i)
            if parsed is None:
                out.append(re.escape(c))
                i += 1
            else:
                frag, i = parsed
                out.append(frag)
        else:
            out.append(re.escape(c))
            i += 1
    return "".join(out)


def _compile_segment(seg: str) -> re.Pattern | str:
    """GLOBSTAR sentinel for a whole-`**` segment, else a compiled regex;
    a regex that fails to compile (broken class) matches literally."""
    if seg == "**":
        return "**"
    try:
        return re.compile("^" + _segment_to_regex(seg) + "$")
    except re.error:
        return re.compile("^" + re.escape(seg) + "$")


def _match_one(file_segs: list[str], pat_segs: list, fi: int = 0, pi: int = 0) -> bool:
    """minimatch matchOne over pre-compiled pattern segments (dot:true,
    partial:false) — a line-for-line semantic mirror of the public source's
    end conditions: a trailing ``**`` needs at least the '/' before it in
    the file (``a/**`` matches ``a/`` but NOT ``a``); pattern-exhausted with
    file left matches only a single trailing empty segment (``a/*`` matches
    ``a/b/``)."""
    fl, pl = len(file_segs), len(pat_segs)
    while fi < fl and pi < pl:
        p = pat_segs[pi]
        if p == "**":
            pr = pi + 1
            if pr == pl:
                return True  # trailing globstar swallows all remaining segs
            for swallow in range(fi, fl):  # fr < fl, as in the source
                if _match_one(file_segs, pat_segs, swallow, pr):
                    return True
            return False
        if not p.match(file_segs[fi]):
            return False
        fi += 1
        pi += 1
    if fi == fl and pi == pl:
        return True
    if fi == fl:
        return False  # file ran out, pattern left (partial=false)
    # pattern ran out: ok only for the trailing '' of a file ending in '/'
    return fi == fl - 1 and file_segs[fi] == ""


def glob_match(s: str, pattern: str) -> bool:
    """``minimatch(s, pattern, { dot: true })``."""
    if pattern.startswith("#"):
        return False  # comment (nocomment is NOT set in the reference)
    negate = False
    while pattern.startswith("!"):
        negate = not negate
        pattern = pattern[1:]
    if pattern == "":
        result = s == ""
    else:
        file_segs = s.split("/")
        result = any(
            _match_one(file_segs, [_compile_segment(seg) for seg in exp.split("/")])
            for exp in brace_expand(pattern)
        )
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
