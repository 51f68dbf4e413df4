"""Dedup-key text normalization — the CCNet-style cleanup pass.

Every large-scale dedup pipeline normalizes text before hashing so that
trivial variants (case, accents, unicode compatibility forms, digits,
curly punctuation, exotic whitespace) collapse to one key. The semantics
here follow the public CCNet normalizer (Wenzek et al. 2019,
facebookresearch/cc_net ``text_normalizer.py`` — re-derived from the
paper's description, not transliterated): lowercase, NFKC (later
versions: NFD + accent strip), digit bucketing to ``0``, unicode
punctuation mapped to ASCII or stripped, whitespace collapsed.

The kernel is pure ``unicodedata`` + ``str.translate`` and runs as ONE
Arrow pass in the scan stage (same shape as the lang-id/repetition
kernels: per-row python beats any pure-column restatement because Spark
has no NFKC/category builtins). The NFKC step is differential-verified
against the JVM's independent ``java.text.Normalizer`` in tests.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: common unicode punctuation -> ASCII (CCNet's replace_unicode_punct table
#: is the public precedent; this mapping is the widely-shared MosesPunctNorm
#: subset)
UNICODE_PUNCT = {
    "，": ",", "。": ".", "、": ",", "„": '"', "”": '"', "“": '"', "«": '"',
    "»": '"', "」": '"', "「": '"', "《": '"', "》": '"', "´": "'",
    "’": "'", "‘": "'", "′": "'", "‚": "'", "〝": '"', "〞": '"', "…": "...",
    "—": "-", "–": "-", "−": "-", "﹏": "_", "！": "!", "？": "?", "；": ";",
    "：": ":", "（": "(", "）": ")", "【": "[", "】": "]", "％": "%",
}
_PUNCT_TRANS = str.maketrans(UNICODE_PUNCT)
_WS_RE = re.compile(r"\s+")


def strip_accents(s: str) -> str:
    """NFD-decompose, drop combining marks (category Mn), recompose."""
    return "".join(
        ch for ch in unicodedata.normalize("NFD", s)
        if unicodedata.category(ch) != "Mn"
    )


def normalize_text(
    s: str | None,
    *,
    lowercase: bool = True,
    nfkc: bool = True,
    accents: bool = True,
    digits: bool = True,
    punct: bool = True,
    whitespace: bool = True,
) -> str:
    """The per-document normalization kernel (each step independently
    toggleable; defaults = the dedup-key profile).

    Order matters and mirrors CCNet: punct table first (curly quotes etc.
    are NOT NFKC-normalizable), then NFKC (fullwidth/ligature/compat
    forms), then case fold, then accent strip, then digit bucketing, then
    whitespace collapse + trim. Control characters (category Cc/Cf other
    than \\t\\n\\r) are always dropped — zero-width joiners and BOMs must
    never distinguish dedup keys."""
    if not s:
        return ""
    if punct:
        s = s.translate(_PUNCT_TRANS)
    if nfkc:
        s = unicodedata.normalize("NFKC", s)
    if lowercase:
        s = s.lower()
    if accents:
        s = strip_accents(s)
    if digits:
        s = "".join("0" if ch.isdigit() else ch for ch in s)
    s = "".join(
        ch for ch in s
        if ch in "\t\n\r" or unicodedata.category(ch) not in ("Cc", "Cf")
    )
    if whitespace:
        s = _WS_RE.sub(" ", s).strip()
    return s


#: (raw, expected) golden pairs for the oracle + tests — each expectation
#: is hand-derived from the Unicode rules the kernel implements:
#: NFD/Mn-strip for accents, NFKC for fullwidth/ligature/digraph/compat
#: forms (U+2044 FRACTION SLASH survives NFKC of vulgar fractions — it is
#: not ASCII '/'), the punct table for curly quotes/dashes/ellipsis,
#: isdigit() bucketing (covers fullwidth digits post-NFKC), Cc/Cf strip
#: for ZWSP/BOM, and \s+ collapse (NBSP and U+3000 become plain spaces
#: via NFKC before the collapse).
NORMALIZE_FIXTURES: list[tuple[str, str]] = [
    ("Café Déjà-Vu", "cafe deja-vu"),
    ("ＡＢＣ１２３", "abc000"),
    ("ﬁnancial ﬂow aﬀair", "financial flow affair"),
    ("“Smart” ‘quotes’ — and… more", "\"smart\" 'quotes' - and... more"),
    ("room\xa0404,  floor\t3", "room 000, floor 0"),
    ("zero​width﻿join", "zerowidthjoin"),
    ("naïve Über ñandú", "naive uber nandu"),
    ("ＨＥＬＬＯ Ｗｏｒｌｄ!", "hello world!"),
    ("The QUICK Brown FOX 2024", "the quick brown fox 0000"),
    ("ǅungla Ǌegoš", "dzungla njegos"),
    ("½ + ¼ = ¾?", "0⁄0 + 0⁄0 = 0⁄0?"),
    ("ab　cd（e）：ok", "ab cd(e):ok"),
]


def with_normalized(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text", **opts
) -> DataFrame:
    """Append the normalized text column (one Arrow pass, no shuffle)."""

    @F.pandas_udf(T.StringType())
    def kernel(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: normalize_text(t, **opts))

    return df.withColumn(out_col, kernel(F.col(text_col)))


def normalized_dedup_key(
    df: DataFrame, text_col: str = "text", key_col: str = "dedup_key", **opts
) -> DataFrame:
    """Append md5(normalized text) — the key exact/near dedup hashes on.
    Composes with operators/dedup.py: ``exact_duplicates`` over this column
    collapses case/accent/digit/punct variants the raw-text key misses."""
    out = with_normalized(df, text_col, "_norm_tmp", **opts)
    return out.withColumn(key_col, F.md5(F.col("_norm_tmp"))).drop("_norm_tmp")
