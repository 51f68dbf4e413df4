"""PII detection + redaction over text columns — pure JVM column math.

A standard stage of every large-scale training-data pipeline (CCNet /
Dolma / RefinedWeb all ship one): detect emails, phone numbers, IP
addresses and payment-card-shaped digit runs, count them per document, and
replace them with typed placeholder tokens. The reference crawler has no
PII stage (it stores raw markdown) — this is beyond-reference surface for
the 100 TB training-data path, like the dedup families.

Scale shape: everything here is ``regexp_count`` / ``regexp_replace`` on
the JVM inside whole-stage codegen — zero Python, zero shuffles, linear
scan over the text column. At 100 TB this runs at parquet-scan speed.

Pattern-dialect note: the same patterns run under Java ``java.util.regex``
(Spark) and RE2 (the DuckDB oracle), so they deliberately use only the
portable subset — character classes, bounded quantifiers, non-capturing
groups, ``\\b`` — no backreferences or lookaround (RE2 has neither).

Replacement ORDER is semantic, not cosmetic: IPs redact before phones
(otherwise ``10.0.0.1`` matches the loose phone shape), and cards before
phones (a 16-digit card is also a long digit run). Emails go first so
their local parts can't be chewed up as digit runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (category, pattern, placeholder) in REDACTION ORDER (see module note)
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "card",
        # 16 digits in 4-groups with optional space/dash separators
        r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b",
        "<CARD>",
    ),
    (
        "ip",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        # international-ish: optional +, then 8-15 digits with (), -, ., space
        # separators, anchored on digits at both ends
        r"\+?\d[\d().\- ]{6,13}\d\b",
        "<PHONE>",
    ),
]


def pii_counts(text: Column) -> list[Column]:
    """One count column per category, measured on the ORIGINAL text but in
    redaction order (each category counted after the previous categories
    are removed, so a card never double-counts as a phone). Returns columns
    aliased n_email / n_card / n_ip / n_phone."""
    cols = []
    remaining = text
    for cat, pat, token in PII_PATTERNS:
        cols.append(F.regexp_count(remaining, F.lit(pat)).alias(f"n_{cat}"))
        remaining = F.regexp_replace(remaining, pat, token)
    return cols


def redact_pii(text: Column) -> Column:
    """Replace every PII span with its typed placeholder, in order."""
    out = text
    for _cat, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def sql_pii_counts(text_expr: str) -> list[str]:
    """The DuckDB restatement of pii_counts (RE2 'g' flag; same order)."""
    exprs = []
    remaining = text_expr
    for cat, pat, token in PII_PATTERNS:
        lit = pat.replace("'", "''")
        exprs.append(
            f"length(regexp_extract_all({remaining}, '{lit}')) AS n_{cat}"
        )
        remaining = f"regexp_replace({remaining}, '{lit}', '{token}', 'g')"
    return exprs


def sql_redact_pii(text_expr: str) -> str:
    """The DuckDB restatement of redact_pii."""
    out = text_expr
    for _cat, pat, token in PII_PATTERNS:
        lit = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{lit}', '{token}', 'g')"
    return out
