"""Public-suffix list parsing + the PSL matching algorithm.

The reference resolves the ``same-domain`` crawl scope through Crawlee/tldts,
which embeds the Mozilla Public Suffix List (publicsuffix.org — public data,
MPL 2.0). This module ships a vendored snapshot of that list in the REAL
``public_suffix_list.dat`` format (``data/public_suffix_list.dat`` — curated:
every multi-label ccTLD family in wide use, all wildcard/exception families,
the regular .us-state and .jp-prefecture blocks, and the common private
platform suffixes; the live download is a byte-format drop-in), parses it per
the spec at https://publicsuffix.org/list/ and implements the standard match
semantics:

- a rule matches when the domain ends with the rule's labels ('*' matches
  exactly one label);
- exception rules ('!') beat wildcard rules and yield the suffix minus their
  leading label;
- the longest (most labels) matching rule wins;
- if nothing matches, the implicit default rule '*' applies (the bare TLD is
  the suffix).

The registrable domain (eTLD+1) is the public suffix plus one more label.
``registrable_domain_psl`` keeps the engine's convenience convention (a host
that IS a suffix maps to itself); ``etld_plus_one`` follows the official
``checkPublicSuffix`` semantics (None in that case) and is what the ported
test vectors exercise.
"""

from importlib import resources


def parse_psl(text: str) -> tuple[list[str], list[str]]:
    """Parse ``public_suffix_list.dat`` content into (icann_rules,
    private_rules) per the spec: a rule per line, ``//`` comments and blank
    lines ignored, everything after the first whitespace dropped, section
    markers splitting ICANN from PRIVATE entries."""
    icann: list[str] = []
    private: list[str] = []
    section = icann
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("//"):
            if "===BEGIN PRIVATE DOMAINS===" in line:
                section = private
            elif "===BEGIN ICANN DOMAINS===" in line:
                section = icann
            continue
        if not line:
            continue
        section.append(line.split()[0].lower())
    return icann, private


def _load_snapshot() -> tuple[list[str], list[str]]:
    # importlib.resources works both on-disk AND inside the addPyFile zip
    with resources.files("anycrawl_spark.data").joinpath(
        "public_suffix_list.dat"
    ).open("r", encoding="utf-8") as f:
        return parse_psl(f.read())


ICANN_RULES, PRIVATE_RULES = _load_snapshot()
RULES = ICANN_RULES + PRIVATE_RULES  # tldts default: both sections active

# index: rules by label tuple, pre-split, for the matcher
_EXCEPTIONS: set[tuple[str, ...]] = set()
_WILDCARDS: set[tuple[str, ...]] = set()
_EXACT: set[tuple[str, ...]] = set()
for _r in RULES:
    if _r.startswith("!"):
        _EXCEPTIONS.add(tuple(_r[1:].split(".")))
    elif _r.startswith("*."):
        _WILDCARDS.add(tuple(_r.split(".")))
    else:
        _EXACT.add(tuple(_r.split(".")))


def public_suffix(host: str) -> str | None:
    """The public suffix of ``host`` per the PSL algorithm (longest match,
    exceptions beat wildcards, implicit '*' default)."""
    if not host:
        return None
    labels = host.lower().rstrip(".").split(".")
    if "" in labels:
        return None
    best = 1  # implicit default rule '*': the bare TLD
    n = len(labels)
    # exception rules: suffix = exception minus its leading label
    for k in range(1, n + 1):
        tail = tuple(labels[n - k:])
        if tail in _EXCEPTIONS:
            return ".".join(tail[1:])
    for k in range(1, n + 1):
        tail = tuple(labels[n - k:])
        if tail in _EXACT and k > best:
            best = k
        if k >= 2 and (("*",) + tail[1:]) in _WILDCARDS and k > best:
            best = k
    return ".".join(labels[n - best:])


def registrable_domain_psl(host: str | None) -> str | None:
    """eTLD+1: the public suffix plus one label; the host itself when it IS
    a public suffix or a bare TLD (engine convention — scope gating wants
    every host to land in SOME bucket)."""
    if not host:
        return None
    host = host.lower().rstrip(".")
    # hosts with ports or IPs: no PSL semantics, return as-is
    if ":" in host or host.replace(".", "").isdigit():
        return host
    suffix = public_suffix(host)
    if suffix is None:
        return host
    labels = host.split(".")
    s_len = len(suffix.split(".")) if suffix else 0
    if len(labels) <= s_len:
        return host
    return ".".join(labels[len(labels) - s_len - 1:])


def etld_plus_one(host: str | None) -> str | None:
    """Official ``checkPublicSuffix`` semantics (the PSL's own test_psl.txt):
    None for empty/malformed input, for a host that is itself a public
    suffix, and for single-label hosts; otherwise suffix + one label."""
    if not host:
        return None
    host = host.lower().rstrip(".")
    if not host or host.startswith("."):
        return None
    labels = host.split(".")
    if "" in labels:
        return None
    suffix = public_suffix(host)
    if suffix is None:
        return None
    s_len = len(suffix.split("."))
    if len(labels) <= s_len:
        return None
    return ".".join(labels[len(labels) - s_len - 1:])
