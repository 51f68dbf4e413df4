"""Repetition statistics + the Gopher-style repetition quality gate.

The canonical repetitious-text filters from Gopher (Rae et al. 2021,
table A1) and RefinedWeb/Dolma: documents dominated by a repeated token,
n-gram or passage are low-quality training data. Per document we measure:

- ``n_tokens`` / ``n_distinct_tokens`` — duplicate-token mass;
- ``top_token_count`` — occurrences of the most frequent token;
- ``top_bigram_count`` / ``top_trigram_count`` — occurrences of the most
  frequent 2-/3-gram (Gopher's "fraction of characters in the most common
  n-gram", re-based on tokens);
- ``n_5grams`` / ``n_distinct_5grams`` — duplicate-5-gram mass (Gopher's
  "fraction of characters in duplicated n-grams" family).

All stats are COUNTS (exact integers), not fractions: the DuckDB oracle
compares them bit-exactly with no float-rounding dialect risk; the gate
derives its fractions from the counts at the caller's thresholds.

Scale shape: one Arrow-batched kernel computes every stat in a single
pass over the text column inside the scan stage (Counter per row — the
same precedent as the lang-id kernel, where per-row dict math beats any
pure-column restatement by >2x). No token ever crosses an exchange; the
pure-SQL alternative (explode tokens -> three groupBys) would shuffle
O(corpus tokens) rows per statistic. Tokenization is the shared
lowercase-whitespace model (identical to operators/decontaminate.py).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

REPETITION_STATS = T.StructType(
    [
        T.StructField("n_tokens", T.LongType()),
        T.StructField("n_distinct_tokens", T.LongType()),
        T.StructField("top_token_count", T.LongType()),
        T.StructField("top_bigram_count", T.LongType()),
        T.StructField("top_trigram_count", T.LongType()),
        T.StructField("n_5grams", T.LongType()),
        T.StructField("n_distinct_5grams", T.LongType()),
    ]
)

#: Gopher table A1 thresholds (token-based restatement): drop when the top
#: 2-gram covers >20% of bigram slots, the top 3-gram >18%, or duplicated
#: 5-gram mass exceeds 30%; plus the degenerate single-token domination.
GOPHER_THRESHOLDS = {
    "top_token_frac": 0.30,
    "top_bigram_frac": 0.20,
    "top_trigram_frac": 0.18,
    "dup_5gram_frac": 0.30,
}


def repetition_stats_row(text: str) -> tuple[int, int, int, int, int, int, int]:
    """The per-document kernel (shared by the Spark stage and tests):
    lowercase whitespace tokens -> the seven exact counts."""
    toks = [t for t in (text or "").lower().split() if t]
    n = len(toks)
    uni = Counter(toks)
    top_tok = max(uni.values()) if uni else 0
    if n >= 2:
        big = Counter(zip(toks, toks[1:]))
        top_big = max(big.values())
    else:
        top_big = 0
    if n >= 3:
        tri = Counter(zip(toks, toks[1:], toks[2:]))
        top_tri = max(tri.values())
    else:
        top_tri = 0
    if n >= 5:
        five = Counter(zip(toks, toks[1:], toks[2:], toks[3:], toks[4:]))
        n5 = n - 4
        d5 = len(five)
    else:
        n5 = d5 = 0
    return n, len(uni), top_tok, top_big, top_tri, n5, d5


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", out_col: str = "rep"
) -> DataFrame:
    """Append a ``rep`` struct column of the seven counts (one Arrow pass,
    no shuffle; the text column never leaves the scan stage)."""

    @F.pandas_udf(REPETITION_STATS)
    def kernel(texts: pd.Series) -> pd.DataFrame:
        rows = [repetition_stats_row(t) for t in texts]
        return pd.DataFrame(rows, columns=[f.name for f in REPETITION_STATS.fields])

    return df.withColumn(out_col, kernel(F.col(text_col)))


def gopher_repetition_gate(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict | None = None,
) -> DataFrame:
    """Append ``rep`` + a ``keep`` boolean per the Gopher repetition rules.

    Fractions derive from the exact counts as JVM column math (the Arrow
    kernel only ever emits integers); a document with too few tokens for a
    statistic trivially passes that rule (0-count)."""
    th = dict(GOPHER_THRESHOLDS, **(thresholds or {}))
    out = with_repetition_stats(df, text_col)
    r = F.col("rep")
    n = r["n_tokens"].cast("double")
    keep = (
        (r["n_tokens"] == 0)
        | (
            (r["top_token_count"] / n <= th["top_token_frac"])
            & (
                (r["n_tokens"] < 2)
                | (r["top_bigram_count"] / (n - 1) <= th["top_bigram_frac"])
            )
            & (
                (r["n_tokens"] < 3)
                | (r["top_trigram_count"] / (n - 2) <= th["top_trigram_frac"])
            )
            & (
                (r["n_5grams"] == 0)
                | (
                    (r["n_5grams"] - r["n_distinct_5grams"])
                    / r["n_5grams"].cast("double")
                    <= th["dup_5gram_frac"]
                )
            )
        )
    )
    return out.withColumn("keep", keep)
