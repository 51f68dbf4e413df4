"""Glob / regex path-pattern compilation (SURVEY §2.2 F1-F2, §2.8 X8-X9).

The reference splits ``include_paths`` into minimatch globs and ``/body/flags``
regex literals and hands them to Crawlee's enqueueLinks
(reference: packages/scrape/src/engines/Base.ts:339-379,475-489). Patterns are
compiled ONCE on the driver and broadcast; matching runs vectorized inside
pandas UDFs / ``rlike`` — never per-row Python.
"""

from __future__ import annotations

import re

_REGEX_LITERAL = re.compile(r"^/(?P<body>.*)/(?P<flags>[a-z]*)$", re.DOTALL)


def glob_to_regex(glob: str) -> str:
    """minimatch-ish: ``**`` -> any chars, ``*`` -> any chars except '/',
    ``?`` -> one char. Anchored."""
    out, i = [], 0
    while i < len(glob):
        c = glob[i]
        if c == "*":
            if glob[i : i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def compile_patterns(patterns: list[str] | None) -> re.Pattern | None:
    """Compile a mixed glob/``/re/flags`` list into ONE alternation regex
    (single vectorized pass per batch). Returns None when the list is empty
    (= match-all for includes, match-none for excludes, decided by caller)."""
    if not patterns:
        return None
    alts = []
    for p in patterns:
        m = _REGEX_LITERAL.match(p)
        if m:
            body = m.group("body")
            if "i" in m.group("flags"):
                body = f"(?i:{body})"
            alts.append(f"(?:{body})")
        else:
            alts.append(f"(?:{glob_to_regex(p)})")
    return re.compile("|".join(alts))


def url_passes(
    url: str, include: re.Pattern | None, exclude: re.Pattern | None
) -> bool:
    """U3: include minus exclude; exclude overrides include
    (reference: Base.ts:360-365)."""
    if exclude is not None and exclude.search(url):
        return False
    if include is not None:
        return include.search(url) is not None
    return True
