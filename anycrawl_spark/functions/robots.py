"""RFC 9309 robots.txt parsing + wildcard rule matching.

The crawl engine gates candidates on per-host allow/disallow rules
(``crawl/params.robots_decision`` — longest-PREFIX match over pre-parsed
rule tuples, the fast path the simulator shares). This module adds the
layer above it: parsing REAL robots.txt *text* (the north-star names
"robots.txt gating" as part of the frontier scheduler) and the full
RFC 9309 matching semantics the prefix kernel cannot express:

- ``*`` matches any character sequence inside a pattern; a trailing ``$``
  anchors the pattern at the end of the path (RFC 9309 §2.2.3).
- Precedence = MOST SPECIFIC rule wins, specificity = octet length of the
  pattern; at equal length ``allow`` wins (§2.2.2).
- Group selection: a group applies to a crawler when one of its
  user-agent lines is ``*`` or its product token is a case-insensitive
  prefix of the crawler's product token; the crawler obeys the group(s)
  with the LONGEST matching token, and multiple groups that tie merge
  their rules (§2.2.1 "combine"). Product token = leading run of
  ``[a-zA-Z0-9_-]``.
- Rules with no preceding user-agent line are ignored; ``sitemap`` is a
  non-group line collected globally; ``crawl-delay`` (non-standard but
  ubiquitous) is collected per group and feeds the engine's politeness
  token table.
- Empty-pattern rules (``Disallow:`` = allow everything) are dropped at
  parse time — they can never win a longest-match decision (length 0).

Scale shape: robots.txt is per-HOST configuration — a broadcast-sized dim
next to the candidate stream. ``compile_robots`` parses each text ONCE on
the driver (or in a dim-side Arrow stage) into compiled rule lists; the
per-candidate hot path is :func:`robots_allowed_rfc` inside the same
Arrow-vectorized gate UDF the prefix kernel uses, with per-pattern
compiled-regex caching. Wildcard-free rulesets compile down to the
existing prefix kernel unchanged (``as_prefix_rules``).

Reference note: the reference (xienanzheng/AnyCrawl) has NO robots
handling — this is rebuild-added functionality (SURVEY §2.3 J6), specced
from the public RFC 9309 and the documented behavior of Google's public
robotstxt matcher (longest-match precedence, allow-wins ties, prefix
user-agent matching).
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

_TOKEN_RE = re.compile(r"[a-zA-Z0-9_-]+")
_DIRECTIVE_RE = re.compile(r"^\s*([A-Za-z][A-Za-z-]*)\s*:\s*(.*?)\s*$")


def product_token(agent: str) -> str:
    """Leading ``[a-zA-Z0-9_-]`` run of a user-agent string, lowercased.

    ``"FooBot/2.1 (+http://foo.example)"`` -> ``"foobot"``.
    """
    m = _TOKEN_RE.match(agent.strip())
    return m.group(0).lower() if m else ""


def parse_robots_txt(text: str) -> dict:
    """Parse robots.txt text into groups + global lines.

    Returns ``{"groups": [{"agents": [token, ...], "rules":
    [(rule, pattern), ...], "crawl_delay": float | None}, ...],
    "sitemaps": [url, ...]}``. ``rule`` is ``"allow"``/``"disallow"``;
    patterns keep their raw octets (matching is byte-oriented per the RFC;
    we operate on str since the frontier stores str paths). Unknown
    directives are skipped; ``#`` starts a comment; a user-agent line
    after rules starts a NEW group, consecutive user-agent lines stack.
    """
    groups: list[dict] = []
    sitemaps: list[str] = []
    cur: dict | None = None
    stacking_agents = False  # the last seen line was a user-agent line
    for raw_line in (text or "").splitlines():
        line = raw_line.split("#", 1)[0]
        m = _DIRECTIVE_RE.match(line)
        if not m:
            continue
        key, value = m.group(1).lower(), m.group(2)
        if key == "user-agent":
            if cur is None or not stacking_agents:
                cur = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(cur)
            tok = "*" if value.strip() == "*" else product_token(value)
            if tok:
                cur["agents"].append(tok)
            stacking_agents = True
            continue
        if key == "sitemap":
            if value:
                sitemaps.append(value)
            # sitemap is a non-group record: does not end agent stacking
            continue
        if key not in ("allow", "disallow", "crawl-delay"):
            # RFC 9309 §2.2.4: unrecognized records (Host:, Clean-param:, …)
            # must not interfere with parsing — in particular they must not
            # split a stacked user-agent run into two groups
            continue
        stacking_agents = False
        if cur is None:
            continue  # rules before any user-agent line: ignored
        if key in ("allow", "disallow"):
            if value:  # empty pattern can never win a longest-match
                cur["rules"].append((key, value))
        elif key == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                continue
            # 'inf'/'nan' parse as floats but would blow up the ms
            # conversion (and are hostile-input nonsense anyway)
            if math.isfinite(delay):
                cur["crawl_delay"] = delay
    return {"groups": groups, "sitemaps": sitemaps}


def select_group(parsed: dict, agent: str) -> dict | None:
    """Pick (and merge) the group(s) for a crawler per RFC 9309 §2.2.1.

    The applicable groups are those carrying the LONGEST user-agent token
    that is a case-insensitive prefix of the crawler's product token;
    ``*`` groups apply only when no named group matches. Ties merge:
    rules concatenate, crawl_delay takes the first non-None.
    """
    me = product_token(agent)
    best_len = -1
    best: list[dict] = []
    for g in parsed.get("groups", []):
        glen = max(
            (len(tok) for tok in g["agents"] if tok != "*" and me.startswith(tok)),
            default=-1,
        )
        if glen < 0:
            continue
        if glen > best_len:
            best_len, best = glen, [g]
        elif glen == best_len:
            best.append(g)
    if not best:
        best = [g for g in parsed.get("groups", []) if "*" in g["agents"]]
    if not best:
        return None
    merged = {"agents": [], "rules": [], "crawl_delay": None}
    for g in best:
        merged["agents"] += g["agents"]
        merged["rules"] += g["rules"]
        if merged["crawl_delay"] is None:
            merged["crawl_delay"] = g["crawl_delay"]
    return merged


@lru_cache(maxsize=4096)
def _compile_pattern(pattern: str) -> tuple[tuple[str, ...], bool]:
    """robots pattern -> (literal segments split on ``*``, end-anchored?).
    A trailing ``$`` anchors at the end; elsewhere ``$`` is a literal."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    return tuple(body.split("*")), anchored_end


def match_pattern(pattern: str, target: str) -> bool:
    """Does an RFC 9309 pattern match a URL's path+query match target?

    Greedy leftmost segment scan — LINEAR in len(target), deliberately not
    ``*``->``.*`` regex, whose backtracking is exponential on multi-star
    patterns (a hostile ``/*a*a*...*a$`` robots.txt would wedge the
    candidate-gate executor task for that host's URLs). Greedy is exact
    here: with only ``*`` wildcards, placing each literal segment at its
    leftmost occurrence never forecloses a later match; the end anchor is
    checked against the fixed tail instead of scanned.
    """
    parts, anchored = _compile_pattern(pattern)
    if not target.startswith(parts[0]):
        return False
    if len(parts) == 1:
        return target == parts[0] if anchored else True
    i = len(parts[0])
    middle, last = parts[1:-1], parts[-1]
    for seg in middle:
        idx = target.find(seg, i)
        if idx < 0:
            return False
        i = idx + len(seg)
    if anchored:
        return len(target) - len(last) >= i and target.endswith(last)
    idx = target.find(last, i)
    return idx >= 0


def robots_allowed_rfc(rules: list[tuple[str, str]], path: str) -> bool:
    """Full-precedence decision: most-specific (longest-pattern) match wins,
    ``allow`` wins length ties, no match => allowed (§2.2.2).

    Same signature/shape as ``crawl/params.robots_decision`` (the prefix
    fast path) so gate UDFs can swap kernels per host.
    """
    best_len, allowed = -1, True
    for rule, pattern in rules:
        if match_pattern(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and rule == "allow"):
                best_len, allowed = plen, (rule == "allow")
    return allowed


_WILDCARD_RE = re.compile(r"[*$]")


def as_prefix_rules(rules: list[tuple[str, str]]) -> list[tuple[str, str]] | None:
    """Compile a wildcard-free ruleset down to the engine's longest-PREFIX
    kernel tuples (``crawl/params.robots_decision``) — byte-identical
    decisions, zero regex on the hot path. Returns None when any pattern
    uses ``*``/``$`` (caller keeps the RFC matcher for that host)."""
    if any(_WILDCARD_RE.search(p) for _, p in rules):
        return None
    return list(rules)


def robots_rows_from_texts(texts_by_host: dict[str, str], agent: str) -> list[dict]:
    """Compile raw robots.txt texts into the crawl engine's rule-row format.

    ``CrawlEngine`` / ``ReferenceSimulator`` consume ``{host, rule,
    path_prefix, crawl_delay_ms}`` rows (the pre-parsed shape
    ``synth.robots_rules`` emits). This is the bridge from REAL robots.txt
    text: parse + group-select once per host, emit prefix rows for
    wildcard-free hosts and ``wildcard: True`` rows (``path_prefix`` holds
    the raw RFC pattern) for hosts that use ``*``/``$`` — the engine routes
    those to :func:`robots_allowed_rfc` instead of the prefix kernel.
    Crawl-delay seconds become ``crawl_delay_ms`` and feed the politeness
    token table unchanged.
    """
    rows: list[dict] = []
    compiled = compile_robots(texts_by_host, agent)
    delay_ms = {h: int(round(d * 1000)) for h, d in compiled["delays"].items()}
    for host, rules in compiled["prefix"].items():
        for rule, pattern in rules:
            rows.append(
                {
                    "host": host,
                    "rule": rule,
                    "path_prefix": pattern,
                    "crawl_delay_ms": delay_ms.get(host, 0),
                }
            )
    for host, rules in compiled["rfc"].items():
        for rule, pattern in rules:
            rows.append(
                {
                    "host": host,
                    "rule": rule,
                    "path_prefix": pattern,
                    "crawl_delay_ms": delay_ms.get(host, 0),
                    "wildcard": True,
                }
            )
    # delay-only hosts (a crawl-delay but zero surviving rules) still need a
    # row so the politeness table hears about them
    for host, ms in delay_ms.items():
        if host not in compiled["prefix"] and host not in compiled["rfc"]:
            rows.append(
                {"host": host, "rule": "allow", "path_prefix": "/",
                 "crawl_delay_ms": ms}
            )
    return rows


def compile_robots(texts_by_host: dict[str, str], agent: str) -> dict:
    """Parse every host's robots.txt once and split hosts by kernel.

    Returns ``{"prefix": {host: [(rule, prefix)]}, "rfc": {host:
    [(rule, pattern)]}, "delays": {host: seconds}, "sitemaps": {host:
    [url]}}``. ``prefix`` hosts run the existing engine kernel; ``rfc``
    hosts need the wildcard matcher. Both dicts are broadcast-sized
    (per-host config, O(hosts) not O(urls))."""
    prefix: dict[str, list] = {}
    rfc: dict[str, list] = {}
    delays: dict[str, float] = {}
    sitemaps: dict[str, list] = {}
    for host, text in texts_by_host.items():
        parsed = parse_robots_txt(text)
        if parsed["sitemaps"]:
            sitemaps[host] = parsed["sitemaps"]
        group = select_group(parsed, agent)
        if group is None:
            continue
        if group["crawl_delay"] is not None:
            delays[host] = group["crawl_delay"]
        pre = as_prefix_rules(group["rules"])
        if pre is not None:
            if pre:
                prefix[host] = pre
        else:
            rfc[host] = group["rules"]
    return {"prefix": prefix, "rfc": rfc, "delays": delays, "sitemaps": sitemaps}
