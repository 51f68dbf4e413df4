"""Parallel-corpus (bitext) candidate mining from URL structure.

Multilingual training sets start from page PAIRS: the same document
published under /en/ and /de/. The canonical public recipe (Resnik &
Smith's STRAND, Comp. Ling. 2003; industrialized by ParaCrawl/WMT) is
(1) match URLs that are identical except a language marker, then
(2) keep pairs whose lengths are compatible. The reference crawls and
stores single documents with no cross-language linking — this is
rebuild-added corpus machinery.

Spark shapes:

- marker detection/keying is scan-stage column math: one regex over a
  CLOSED language-code set finds a full path segment (``/en/``) or a
  ``lang=en`` query param; the pair key is the url with the marker
  wildcarded. Spark's regexp_replace is global and DuckDB's needs the
  'g' flag — pinned in the oracle; with at most one marker per URL
  (the validity condition) both agree either way.
- pairing is a self-join on the key with ``lang_a < lang_b`` — the key
  groups are bounded by the language-set size (≤ |langs| rows), so the
  join cannot degenerate; one hash exchange on the key.
- the STRAND length filter is the usual exact-integer ratio:
  ``ratio_x100 = min(len)·100 div max(len) >= threshold``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anycrawl_spark.functions.text import tokens

LANGS = ("de", "en", "es", "fr", "it", "ja", "nl", "pl", "pt", "ru", "zh")
_SEG = "/(" + "|".join(LANGS) + ")/"
_PARAM = r"[?&]lang=(" + "|".join(LANGS) + r")\b"


def lang_marker(url: Column) -> Column:
    """The URL's language marker ('' when none): a full path segment
    from the closed set, else a lang= query param."""
    seg = F.regexp_extract(url, _SEG, 1)
    par = F.regexp_extract(url, _PARAM, 1)
    return F.when(seg != "", seg).otherwise(par)


def pair_key(url: Column) -> Column:
    """The url with its language marker wildcarded — equal keys =
    translation candidates."""
    return F.regexp_replace(
        F.regexp_replace(url, _SEG, "/*/"), _PARAM.replace("(", "(?:", 1), "?lang=*"
    )


def bitext_candidates(
    docs: DataFrame,
    min_ratio_x100: int = 50,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(key, lang_a, lang_b, url_a, url_b, len_a, len_b, ratio_x100,
    accepted) — STRAND-style candidate pairs with the length filter."""
    keyed = docs.select(
        F.col(url_col).alias("url"),
        lang_marker(F.col(url_col)).alias("lang"),
        pair_key(F.col(url_col)).alias("key"),
        F.size(tokens(F.col(text_col))).cast("long").alias("len"),
    ).filter(F.col("lang") != "")
    a = keyed.select(
        "key",
        F.col("lang").alias("lang_a"),
        F.col("url").alias("url_a"),
        F.col("len").alias("len_a"),
    )
    b = keyed.select(
        "key",
        F.col("lang").alias("lang_b"),
        F.col("url").alias("url_b"),
        F.col("len").alias("len_b"),
    )
    pairs = a.join(b, "key").filter(F.col("lang_a") < F.col("lang_b"))
    ratio = F.expr(
        "CASE WHEN greatest(len_a, len_b) > 0 THEN"
        " (least(len_a, len_b) * 100) div greatest(len_a, len_b)"
        " ELSE 0 END"
    )
    return pairs.select(
        "key",
        "lang_a",
        "lang_b",
        "url_a",
        "url_b",
        "len_a",
        "len_b",
        ratio.cast("long").alias("ratio_x100"),
        (ratio >= min_ratio_x100).cast("long").alias("accepted"),
    )
