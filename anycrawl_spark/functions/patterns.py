"""Glob / regex path-pattern compilation (SURVEY §2.2 F1-F2, §2.8 X8-X9).

The reference splits ``include_paths`` into minimatch globs and
``/body/flags`` regex literals and hands them to Crawlee's enqueueLinks
(reference: packages/scrape/src/engines/Base.ts:339-379). Exclude paths are
passed through RAW — Base.ts:361-365 pushes the strings plus the CURRENT
page URL into ``exclude``, and crawlee treats string excludes as globs, not
regexes (crawlee 3.13, packages/core/src/enqueue_links/shared.ts). Crawlee
matches both include and exclude globs with ``minimatch(url, glob,
{ nocase: true })`` after trimming them and dropping empty strings
(``validateGlobPattern`` / the ``constructGlobObjectsFromGlobs`` filter).
``scrape_paths`` (Base.ts:465-495 ``shouldScrapeUrl``) runs its own ordered
loop: a valid ``/body/flags`` literal is tested as a regex (no fall-through
to glob on non-match), anything else is ``minimatch(url, pattern,
{ dot: true })``.

Reference quirks mirrored exactly:
- the regex-literal detector is ``/^\\/(.*)\\/([gimsuy]*)$/`` — flags
  outside [gimsuy] (or a newline in the body, since JS ``.`` never crosses
  one) keep the string a glob;
- a regex literal whose body does not COMPILE falls through to the glob
  branch (Base.ts:350-353 catches and continues);
- matching uses ``regexp.test(url)`` = substring search, while minimatch
  globs are whole-string;
- with no include patterns every link passes; with no exclude patterns
  nothing is excluded.

Deliberate deviations (documented, not observable in the contract tests):
- JS regex dialect is approximated by Python ``re`` ('i'/'m'/'s' flags map,
  'g'/'u'/'y' are treated as stateless no-ops — the reference reuses one
  RegExp object across URLs so 'g'/'y' leak ``lastIndex`` state between
  candidates, a bug-for-bug mirror we decline);
- validity of the body is judged by Python's parser, so a body valid in
  exactly one dialect flips between regex and glob treatment (e.g. ``\\p{L}``
  without 'u' is a valid identity escape in JS but a Python error).
- the engine matches patterns against the CANONICAL URL (the frontier's key
  space), where crawlee matches the raw absolutized href.

Patterns are compiled ONCE on the driver and broadcast; matching runs inside
the fused candidate-gate pandas UDF (Arrow-batched, compiled matchers hit
``capture._compile_glob``'s lru cache) — never per-row Python UDFs.
"""

from __future__ import annotations

import re

from anycrawl_spark.functions.capture import glob_match

# JS: /^\/(.*)\/([gimsuy]*)$/ — no DOTALL ('.' stops at \n) and \Z not $
# (Python '$' would tolerate a trailing newline JS rejects)
_REGEX_LITERAL = re.compile(r"^/(.*)/([gimsuy]*)\Z")

_JS_FLAG_MAP = {"i": re.IGNORECASE, "m": re.MULTILINE, "s": re.DOTALL}


def split_regex_literal(pattern: str) -> re.Pattern | None:
    """``/body/flags`` -> compiled Python regex, or None when the string is
    not a regex literal or its body fails to compile (both keep it a glob
    in the reference)."""
    m = _REGEX_LITERAL.match(pattern)
    if not m:
        return None
    flags = 0
    for ch in m.group(2):
        flags |= _JS_FLAG_MAP.get(ch, 0)
    try:
        # JS parity: '[[:alpha:]]' is a plain class of literal chars in JS
        # (no POSIX classes) — exactly Python's CURRENT reading. Python 3.12+
        # warns it may someday grow POSIX semantics (FutureWarning "Possible
        # nested set"); silence it here since the JS-compatible reading is
        # the one we want, and hostile user patterns must not spam stderr.
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", FutureWarning)
            return re.compile(m.group(1), flags)
    except re.error:
        return None


def compile_include_patterns(
    patterns: list[str] | None,
) -> tuple[tuple[str, ...], tuple[re.Pattern, ...]] | None:
    """Base.ts:339-358 include split -> (globs, regexps); None = no
    patterns = every link passes. Globs are trimmed and empties dropped at
    the crawlee boundary (validateGlobPattern + the shared.ts filter)."""
    if not patterns:
        return None
    globs: list[str] = []
    regexps: list[re.Pattern] = []
    for p in patterns:
        if not isinstance(p, str):
            continue  # Base.ts:343 skips non-strings
        rx = split_regex_literal(p)
        if rx is not None:
            regexps.append(rx)
        elif p.strip():
            globs.append(p.strip())
    if not globs and not regexps:
        return None
    return tuple(globs), tuple(regexps)


def compile_exclude_patterns(patterns: list[str] | None) -> tuple[str, ...]:
    """Base.ts:361-365 / crawlee shared.ts: excludes are GLOBS (string
    excludes never get the regex-literal split), trimmed, empties dropped.
    The current-page URL is appended at match time, not here (it varies per
    row). A non-list config contributes nothing (Array.isArray guard —
    a STRING here would otherwise iterate into per-character globs)."""
    if not isinstance(patterns, (list, tuple)) or not patterns:
        return ()
    return tuple(
        p.strip() for p in patterns if isinstance(p, str) and p.strip()
    )


def excludes_configured(patterns) -> bool:
    """Base.ts:361: `Array.isArray(excludePaths) && excludePaths.length > 0`
    — the current-URL self-exclude triggers on the RAW array being
    non-empty, even when every entry trims away to nothing (code review:
    exclude_paths=['  '] still excludes the current page URL in the
    reference while compiling to zero usable globs)."""
    return isinstance(patterns, (list, tuple)) and len(patterns) > 0


def url_passes(
    url: str,
    include: tuple[tuple[str, ...], tuple[re.Pattern, ...]] | None,
    exclude: tuple[str, ...],
    current_url: str | None = None,
    exclude_active: bool | None = None,
) -> bool:
    """U3: include minus exclude, crawlee-side semantics. Exclude wins and
    is checked first (createRequests filters excludes before the include
    loop); when ANY exclude is CONFIGURED (raw-array check — pass
    ``exclude_active=excludes_configured(raw)``; defaults to the compiled
    tuple's truthiness) the current page URL joins the exclude set as one
    more glob (Base.ts:362-364)."""
    if exclude_active is None:
        exclude_active = bool(exclude)
    if exclude_active:
        for g in exclude:
            if glob_match(url, g, dot=False, nocase=True):
                return False
        if current_url and glob_match(url, current_url, dot=False, nocase=True):
            return False
    if include is None:
        return True
    globs, regexps = include
    for rx in regexps:
        if rx.search(url):  # RegExp.prototype.test
            return True
    for g in globs:
        if glob_match(url, g, dot=False, nocase=True):
            return True
    return False


def should_scrape_url(url: str, scrape_paths: list[str] | None) -> bool:
    """F2 ``shouldScrapeUrl`` (Base.ts:465-495): empty config scrapes
    everything; else the FIRST matching pattern wins — a valid regex
    literal is consumed as a regex (``continue`` on non-match, no glob
    retry), everything else is ``minimatch(url, pattern, { dot: true })``.
    A pattern whose glob compilation throws is skipped (the reference
    try/catches and continues)."""
    if not scrape_paths:
        return True
    for p in scrape_paths:
        if not isinstance(p, str):
            continue
        rx = split_regex_literal(p)
        if rx is not None:
            if rx.search(url):
                return True
            continue
        if glob_match(url, p, dot=True):
            return True
    return False


def compile_patterns(patterns: list[str] | None):
    """Back-compat shim for the include side (old single-regex API callers);
    returns the compile_include_patterns tuple."""
    return compile_include_patterns(patterns)
