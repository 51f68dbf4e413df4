"""Run reference TypeScript sources under node as differential-fuzz oracles.

Several reference utility modules (ipUtils.ts, credits.ts, optionMerger.ts,
the pure kernels of templateHandler.ts) are plain JS plus an erasable
TypeScript surface: imports, ``type``/``interface`` declarations, visibility
modifiers, generics, ``as`` casts, non-null ``!`` assertions, and
parameter/return/local annotations.  ``strip_ts`` removes exactly that
surface with a nesting-aware scanner over a code/noncode mask (strings and
comments are noncode; template-literal ``${...}`` interpolations are code) —
every runtime statement survives verbatim — so node 20 executes the
reference's own semantics (parseInt leniency, ``??`` vs ``||`` defaulting,
NaN propagation, RegExp dialect behavior, JS truthiness) as the oracle for
seeded differential fuzzing.  No reference code is copied into this repo:
sources are read from the read-only checkout at test time and the fuzz
skips when the checkout or node is absent.

Limitations (fine for the files we target): no object-literal *return*
types, no decorators, no TS enums, no regex literals (the targets use
``new RegExp``), single-line imports only.
"""

from __future__ import annotations

import json
import pathlib
import re
import shutil
import subprocess

REFERENCE_ROOT = pathlib.Path("/root/reference")

_DECL_RE = re.compile(
    r"""(?mx)
    (?:^|(?<=\s)) (?:
        function \s+ [\w$]+ |              # function declarations
        static \s+ (?:async\s+)? [\w$]+    # static class methods
    ) \s* (?=[<(])"""
)
_LOCAL_ANN_RE = re.compile(r"(?m)^\s*(?:const|let|var)\s+[\w$]+\s*(:)")
_AS_CAST_RE = re.compile(r"\s+as\s+(?=[\w$({\[])")
_ARROW_ANY_RE = re.compile(r"\(\s*([\w$]+)\s*(:\s*any\s*)\)(\s*=>)")
_NON_NULL_RE = re.compile(r"([)\]\w$])!(?![=!])")
_VISIBILITY_RE = re.compile(r"(?m)^(\s*)(?:public|private|protected|readonly)\s+")


def have_node_oracle(ts_rel_path: str) -> bool:
    return bool(shutil.which("node")) and (REFERENCE_ROOT / ts_rel_path).exists()


def _code_mask(src: str) -> bytearray:
    """1 where ``src[i]`` is code; 0 inside strings and comments.  Template
    literals are noncode EXCEPT their ``${...}`` interpolations, whose
    contents are code (recursively)."""
    n = len(src)
    mask = bytearray([1]) * n

    def scan_code(i: int, stop_at_brace: bool) -> int:
        depth = 0
        while i < n:
            c = src[i]
            if c in "'\"":
                j = i + 1
                while j < n:
                    if src[j] == "\\":
                        j += 2
                        continue
                    if src[j] == c:
                        j += 1
                        break
                    j += 1
                mask[i:min(j, n)] = bytes(min(j, n) - i)
                i = j
                continue
            if c == "`":
                i = scan_template(i)
                continue
            if c == "/" and i + 1 < n and src[i + 1] == "/":
                j = src.find("\n", i)
                j = n if j < 0 else j
                mask[i:j] = bytes(j - i)
                i = j
                continue
            if c == "/" and i + 1 < n and src[i + 1] == "*":
                j = src.find("*/", i + 2)
                j = n if j < 0 else j + 2
                mask[i:j] = bytes(j - i)
                i = j
                continue
            if stop_at_brace:
                if c == "{":
                    depth += 1
                elif c == "}":
                    if depth == 0:
                        return i
                    depth -= 1
            i += 1
        return i

    def scan_template(i: int) -> int:
        mask[i] = 0
        i += 1
        while i < n:
            if src[i] == "\\":
                mask[i:min(i + 2, n)] = bytes(min(i + 2, n) - i)
                i += 2
                continue
            if src[i] == "`":
                mask[i] = 0
                return i + 1
            if src.startswith("${", i):
                mask[i] = mask[i + 1] = 0
                j = scan_code(i + 2, stop_at_brace=True)
                if j < n:
                    mask[j] = 0
                i = j + 1
                continue
            mask[i] = 0
            i += 1
        return i

    scan_code(0, stop_at_brace=False)
    return mask


def _skip_type_expr(src: str, mask: bytearray, i: int, *, stop_on_eq: bool) -> int:
    """Scan past a type expression starting just after ``:`` (or ``as``).

    Terminates at a top-level ``,`` / ``)`` / ``;`` or at a top-level ``=``
    (a parameter default) when ``stop_on_eq``.  ``=>`` pairs (function
    types) are consumed.  A top-level ``{`` is part of the type (an
    object-literal type) when it opens the expression or follows a type
    combinator (``| & < ( ,``); after an identifier/closer it is the
    function BODY opener and terminates the scan — this disambiguates
    ``): { a?: T } | undefined {`` correctly.
    """
    depth = 0
    prev = ""  # last significant code char consumed ("" = expression start)
    while i < len(src):
        if not mask[i]:
            i += 1
            continue
        c = src[i]
        if src.startswith("=>", i):
            prev = ">"
            i += 2
            continue
        if c in " \t\r\n":
            i += 1
            continue
        if c in "([<":
            depth += 1
        elif c == "{":
            if depth == 0 and not stop_on_eq and prev not in ("", "|", "&", "<", "(", ","):
                return i
            depth += 1
        elif c in ")]>}":
            if depth == 0:
                return i
            depth -= 1
        elif depth == 0 and (c in ",;" or (stop_on_eq and c == "=")):
            return i
        prev = c
        i += 1
    return i


def _strip_param_annotations(
    src: str, mask: bytearray, lparen: int, edits: list[tuple[int, int]]
) -> int:
    """Record deletions for ``?: Type`` annotations inside one balanced
    ``( ... )`` starting at ``lparen``; returns the index of the closing
    paren."""
    depth = 0
    i = lparen
    while i < len(src):
        if not mask[i]:
            i += 1
            continue
        c = src[i]
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
            if depth == 0 and c == ")":
                return i
        elif c == ":" and depth == 1:
            a0 = i - 1 if i > 0 and src[i - 1] == "?" else i
            end = _skip_type_expr(src, mask, i + 1, stop_on_eq=True)
            edits.append((a0, end))
            i = end
            continue
        i += 1
    return i


def _arrow_param_edits(
    src: str, mask: bytearray, edits: list[tuple[int, int]]
) -> None:
    """Strip annotations from ``( params ) =>`` arrow functions: find each
    ``=>`` in code, reverse-match its closing paren to the opening one, and
    scan the span like a declaration parameter list."""
    for m in re.finditer(r"=>", src):
        if not mask[m.start()]:
            continue
        j = m.start() - 1
        while j >= 0 and src[j] in " \t\r\n":
            j -= 1
        if j >= 0 and src[j] != ")":
            # `(params): RetType =>` — walk back over a return-type
            # annotation to the `):` that opens it, and record its deletion.
            # The span must LOOK like a type (identifiers/generics/arrays/
            # unions only) so a ternary's `) ? x : y` or ordinary code
            # between some ')' and a later arrow never matches.
            r = src.rfind(")", 0, j + 1)
            while r >= 0 and not mask[r]:
                r = src.rfind(")", 0, r)
            if r < 0:
                continue
            span = src[r + 1 : m.start()]
            if not re.match(r"^\s*:\s*[\w$<>\[\],.\s|&]+\s*$", span):
                continue
            edits.append((r + 1, m.start()))
            j = r
        if j < 0 or src[j] != ")":
            continue  # single-identifier arrow: no annotations possible
        depth, k = 0, j
        while k >= 0:
            if mask[k]:
                c = src[k]
                if c in ")]}":
                    depth += 1
                elif c in "([{":
                    depth -= 1
                    if depth == 0:
                        break
            k -= 1
        if k >= 0 and src[k] == "(":
            _strip_param_annotations(src, mask, k, edits)


def _strip_signature(
    src: str, mask: bytearray, start: int, edits: list[tuple[int, int]]
) -> None:
    """Record deletions for one declaration: optional generic params, then
    annotations inside ``( params )`` and the return-type position."""
    i = start
    while src[i] in " \t\r\n":
        i += 1
    if src[i] == "<":  # generic parameter list on the declaration
        depth = 0
        g0 = i
        while i < len(src):
            if not mask[i]:
                i += 1
                continue
            depth += src[i] == "<"
            depth -= src[i] == ">"
            i += 1
            if depth == 0:
                break
        edits.append((g0, i))
        while src[i] in " \t\r\n":
            i += 1
    if src[i] != "(":
        raise ValueError(f"expected '(' at {i}: {src[i:i+40]!r}")
    i = _strip_param_annotations(src, mask, i, edits)
    j = i + 1
    while j < len(src) and src[j] in " \t\r\n":
        j += 1
    if j < len(src) and src[j] == ":":
        end = _skip_type_expr(src, mask, j + 1, stop_on_eq=False)
        edits.append((i + 1, end))


def strip_ts(source: str) -> str:
    """Strip the erasable TS surface described in the module docstring."""
    lines = source.splitlines()
    kept: list[str] = []
    depth_to_close = 0  # inside an interface block being dropped
    for line in lines:
        s = line.strip()
        if depth_to_close:
            depth_to_close += line.count("{") - line.count("}")
            continue
        if s.startswith("import "):
            if not s.endswith(";"):
                raise ValueError(f"multi-line import unsupported: {s!r}")
            continue
        if re.match(r"(export\s+)?(declare\s+)?interface\b", s):
            depth_to_close = line.count("{") - line.count("}")
            if depth_to_close <= 0 and not s.endswith("}"):
                raise ValueError(f"unsupported interface shape: {s!r}")
            continue
        # a type ALIAS is `type Name = ...` / `type Name<...>` — `type` as an
        # object shorthand or destructuring key must not match
        if re.match(r"(export\s+)?type\s+[A-Za-z_$][\w$]*\s*[=<].*;\s*$", s):
            continue
        if re.match(r"(export\s+)?type\s+[A-Za-z_$][\w$]*\s*[=<]", s):
            raise ValueError(f"multi-line type alias unsupported: {s!r}")
        line = re.sub(r"\bexport\s+(default\s+)?", r"\1", line)
        line = _VISIBILITY_RE.sub(r"\1", line)
        kept.append(line)
    src = "\n".join(kept)
    mask = _code_mask(src)

    edits: list[tuple[int, int]] = []
    for m in _DECL_RE.finditer(src):
        if mask[m.start()]:
            _strip_signature(src, mask, m.end(), edits)
    for m in _LOCAL_ANN_RE.finditer(src):
        if mask[m.start(1)]:
            edits.append(
                (m.start(1), _skip_type_expr(src, mask, m.end(1), stop_on_eq=True))
            )
    for m in _AS_CAST_RE.finditer(src):
        if mask[m.start()]:
            edits.append(
                (m.start(), _skip_type_expr(src, mask, m.end(), stop_on_eq=False))
            )
    _arrow_param_edits(src, mask, edits)
    # call-site generics: `new Set<string>([...])` / `f<T>(...)` — the
    # <...> span between an identifier and an immediate `(` is type-only
    for m in re.finditer(r"[\w$]\s*(<)", src):
        i = m.start(1)
        if not mask[i]:
            continue
        depth, j = 0, i
        while j < len(src):
            if mask[j]:
                depth += src[j] == "<"
                depth -= src[j] == ">"
                if depth == 0:
                    break
            j += 1
        k = j + 1
        while k < len(src) and src[k] in " \t\r\n":
            k += 1
        if k < len(src) and src[k] == "(" and "\n" not in src[i:j]:
            edits.append((i, j + 1))

    edits = sorted(set(edits))
    for (a, b), (c, _) in zip(edits, edits[1:]):
        if c < b:
            raise ValueError(f"overlapping strip edits at {a}:{b} vs {c}")
    for a, b in reversed(edits):
        src = src[:a] + src[b:]

    # token-level erasures, guarded to code positions
    src = _sub_code(src, _ARROW_ANY_RE, r"(\1)\3")
    src = _sub_code(src, _NON_NULL_RE, r"\1")
    return src


def _sub_code(src: str, pattern: re.Pattern, repl: str) -> str:
    mask = _code_mask(src)
    out = src
    for m in reversed(list(pattern.finditer(src))):
        if mask[m.start()]:
            out = out[: m.start()] + m.expand(repl) + out[m.end():]
    return out


def extract_ts_blocks(source: str, headers: list[str]) -> str:
    """Pull whole ``function``/``class``/method blocks out of a module by
    header regex: from the match start through the brace-matched body end.
    The body ``{`` is the first one at paren-depth 0 — a ``{`` inside the
    parameter list is an object TYPE annotation, not the body.  Raises when
    a header does not match exactly once."""
    mask = _code_mask(source)
    blocks = []
    for header in headers:
        ms = [m for m in re.finditer(header, source, re.M) if mask[m.start()]]
        if len(ms) != 1:
            raise ValueError(f"header {header!r} matched {len(ms)} times")
        i = ms[0].start()
        paren = depth = 0
        in_body = False
        while i < len(source):
            if not mask[i]:
                i += 1
                continue
            c = source[i]
            if not in_body:
                if c == "(":
                    paren += 1
                elif c == ")":
                    paren -= 1
                elif c == "{" and paren == 0:
                    in_body, depth = True, 1
            else:
                depth += c == "{"
                depth -= c == "}"
                if depth == 0:
                    i += 1
                    break
            i += 1
        blocks.append(source[ms[0].start():i])
    return "\n\n".join(blocks)


# npm's vendored modules (minimatch et al.) — the same public packages the
# reference depends on, resolvable via NODE_PATH without any install
NPM_VENDORED_MODULES = "/usr/lib/node_modules/npm/node_modules"


def run_ts_oracle(ts_source: str, driver_js: str, payload: object,
                  timeout: float = 120.0, node_path: str | None = None) -> object:
    """Execute stripped reference TS + ``driver_js`` under node.

    The driver reads ``payload`` as JSON on stdin and must print one JSON
    document on stdout; non-finite numbers should be encoded by the driver
    (JSON.stringify would null them silently).  ``node_path`` extends module
    resolution (e.g. NPM_VENDORED_MODULES for minimatch).
    """
    import os

    env = None
    if node_path:
        env = dict(os.environ, NODE_PATH=node_path)
    js = strip_ts(ts_source) + "\n" + driver_js
    out = subprocess.run(
        ["node", "-e", js],
        input=json.dumps(payload),
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    if out.returncode != 0:
        raise RuntimeError(f"node oracle failed: {out.stderr[:800]}")
    return json.loads(out.stdout)


def run_reference_js(
    ts_rel_path: str, driver_js: str, payload: object, timeout: float = 120.0
) -> object:
    """:func:`run_ts_oracle` over a whole reference module read by path."""
    return run_ts_oracle(
        (REFERENCE_ROOT / ts_rel_path).read_text(), driver_js, payload, timeout
    )


def fuzz_seed(default: int) -> int:
    """Seed for a differential-fuzz campaign. The defaults pin the
    committed corpora (deterministic CI); set ANYCRAWL_FUZZ_SEED_OFFSET to
    shift every campaign onto a fresh corpus — scripts/fuzz_soak.sh loops
    offsets to soak the parity kernels beyond the committed case counts."""
    import os

    return default + int(os.environ.get("ANYCRAWL_FUZZ_SEED_OFFSET", "0"))
