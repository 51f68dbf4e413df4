"""Run reference TypeScript sources under node as differential-fuzz oracles.

Several reference utility modules (ipUtils.ts, credits.ts) are plain JS plus
a *signature-only* TypeScript surface: imports, `type`/`interface`
declarations, and parameter/return annotations.  ``strip_ts`` removes exactly
that surface with a nesting-aware scanner — every runtime statement survives
verbatim — so node 20 executes the reference's own semantics (parseInt
leniency, ``??`` vs ``||`` defaulting, NaN propagation, JS truthiness) as the
oracle for seeded differential fuzzing.  No reference code is copied into
this repo: sources are read from the read-only checkout at test time and the
fuzz skips when the checkout or node is absent.

Limitations (fine for the files we target, asserted where cheap): no
object-literal *return* types, no decorators, no enums, no generics on
declarations themselves (`function f<T>`), single-line imports only.
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
    (?:^|\s) (?:
        function \s+ [\w$]+ \s* \( |               # function declarations
        (?:static\s+)(?:async\s+)? [\w$]+ \s* \(   # static class methods
    )"""
)


def have_node_oracle(ts_rel_path: str) -> bool:
    return bool(shutil.which("node")) and (REFERENCE_ROOT / ts_rel_path).exists()


def _skip_string(src: str, i: int) -> int:
    """Return the index just past the string literal opening at ``i``."""
    quote = src[i]
    i += 1
    while i < len(src):
        c = src[i]
        if c == "\\":
            i += 2
            continue
        if c == quote:
            return i + 1
        i += 1
    return i


def _skip_type_expr(src: str, i: int, *, stop_on_eq: bool) -> int:
    """Scan past a type expression starting just after a ``:``.

    Terminates at a top-level ``,`` / ``)`` (parameter position) or at a
    top-level ``{`` (return position — the function body opener), or at a
    top-level ``=`` (a parameter default value) when ``stop_on_eq``.
    ``=>`` pairs (function types) are consumed as a unit.
    """
    depth = 0
    while i < len(src):
        c = src[i]
        if c in "'\"`":
            i = _skip_string(src, i)
            continue
        if src.startswith("=>", i):
            i += 2
            continue
        if c in "([<":
            depth += 1
        elif c == "{":
            # an object type at top level in RETURN position would be
            # ambiguous with the body opener; we forbid it (see module doc)
            if depth == 0 and not stop_on_eq:
                return i
            depth += 1
        elif c in ")]>}":
            if depth == 0:
                return i
            depth -= 1
        elif depth == 0 and (c == "," or (stop_on_eq and c == "=")):
            return i
        i += 1
    return i


def _strip_signature(src: str, lparen: int, edits: list[tuple[int, int]]) -> None:
    """Record deletions for annotations inside one ``( params ) : ret`` span."""
    depth = 0
    i = lparen
    while i < len(src):
        c = src[i]
        if c in "'\"`":
            i = _skip_string(src, i)
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
            if depth == 0 and c == ")":
                break
        elif c == ":" and depth == 1:
            start = i - 1 if i > 0 and src[i - 1] == "?" else i
            end = _skip_type_expr(src, i + 1, stop_on_eq=True)
            edits.append((start, end))
            i = end
            continue
        i += 1
    # return-type annotation after the closing paren
    j = i + 1
    while j < len(src) and src[j] in " \t\r\n":
        j += 1
    if j < len(src) and src[j] == ":":
        end = _skip_type_expr(src, j + 1, stop_on_eq=False)
        edits.append((i + 1, end))


def strip_ts(source: str) -> str:
    """Strip the signature-only TS surface described in the module docstring."""
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
        if re.match(r"(export\s+)?type\b.*=.*;\s*$", s):
            continue
        if re.match(r"(export\s+)?type\b", s):
            raise ValueError(f"multi-line type alias unsupported: {s!r}")
        kept.append(re.sub(r"\bexport\s+(default\s+)?", r"\1", line))
    src = "\n".join(kept)

    edits: list[tuple[int, int]] = []
    for m in _DECL_RE.finditer(src):
        _strip_signature(src, m.end() - 1, edits)
    for start, end in sorted(edits, reverse=True):
        src = src[:start] + src[end:]
    return src


def run_reference_js(
    ts_rel_path: str, driver_js: str, payload: object, timeout: float = 120.0
) -> object:
    """Execute a stripped reference module + ``driver_js`` under node.

    The driver reads ``payload`` as JSON on stdin and must print one JSON
    document on stdout; non-finite numbers should be encoded by the driver
    (JSON.stringify would null them silently).
    """
    js = strip_ts((REFERENCE_ROOT / ts_rel_path).read_text()) + "\n" + driver_js
    out = subprocess.run(
        ["node", "-e", js],
        input=json.dumps(payload),
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    if out.returncode != 0:
        raise RuntimeError(f"node oracle failed: {out.stderr[:800]}")
    return json.loads(out.stdout)
