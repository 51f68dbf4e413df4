"""Byte-pair-encoding tokenizer: deterministic training + Arrow encode.

`functions/text.py` counts tokens by whitespace; a training-data pipeline
ultimately bills and packs by TOKENIZER pieces. This module implements
real BPE (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units", public) end-to-end:

- **Training** (`train_bpe`) is inherently sequential in the merge loop —
  each merge depends on the counts the previous one produced — so it runs
  driver-side over a word-frequency dict. The DISTRIBUTED part is getting
  that dict: `word_counts` is one explode→two-phase groupBy over the
  corpus, collected capped at `max_vocab` distinct words (token-frequency
  distributions are Zipfian; the reference vocabularies — GPT-2's 50k,
  Llama's 32k — train on exactly this kind of capped count table, and the
  collect is O(vocab), never O(corpus)). Tie-breaks are lexicographic on
  the pair, so training is bit-deterministic for a given count table.

- **Encoding** (`encode_word` / `bpe_pieces`) applies merges greedily by
  RANK: repeatedly find the lowest-rank pair present and fuse all its
  non-overlapping occurrences left-to-right (the GPT-2 `bpe()` loop
  shape, public). Words carry an explicit ``</w>`` end marker (Sennrich
  style) so "est" mid-word and "est" word-finally are distinct symbols.
  The Spark surface is ONE Arrow-batched pandas UDF mapping text →
  array<string> of pieces — merges ship inside the closure as a plain
  rank dict (O(merges) bytes, broadcast once per stage), the loop is
  per-row CPU with no shuffle, and every downstream count/pack/bill
  stays in JVM column math.

The fixture corpus below is the textbook Sennrich example ({low:5,
lower:2, newest:6, widest:3}); its first five merges and all
`BPE_FIXTURES` expectations are HAND-DERIVED in the docstrings so the
oracle checks the pipeline against paper semantics, not the kernel
against itself.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from anycrawl_spark.functions.text import tokens

#: Sennrich et al. §3.2 example corpus. Hand-traced merges, in order:
#: 1 (e,s)    — (e,s)/(s,t)/(t,</w>) all count 9, (e,s) wins the tie
#: 2 (es,t)   — (es,t)/(t,</w>) at 9, 'es' < 't'
#: 3 (est,</w>)
#: 4 (l,o)    — (l,o)/(o,w) at 7, 'l' < 'o'
#: 5 (lo,w)
SENNRICH_CORPUS: dict[str, int] = {"low": 5, "lower": 2, "newest": 6, "widest": 3}

END = "</w>"


def word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    c: Counter = Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += n
    return c


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    fused = pair[0] + pair[1]
    out: dict[tuple[str, ...], int] = {}
    for syms, n in vocab.items():
        merged: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                merged.append(fused)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + n
    return out


def train_bpe(
    word_counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Sennrich BPE training: repeatedly fuse the most frequent adjacent
    symbol pair; ties break lexicographically on the pair, so the merge
    list is a pure function of the count table."""
    vocab = {word_symbols(w): n for w, n in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], _neg_lex(kv[0])))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def _neg_lex(pair: tuple[str, str]):
    # max() helper: higher count wins; on equal counts the lexicographically
    # SMALLEST pair wins, so invert each char for the key.
    return tuple(tuple(-ord(ch) for ch in s) for s in pair)


def word_counts(docs: DataFrame, text_col: str = "text", max_vocab: int = 2**20
                ) -> dict[str, int]:
    """Distributed corpus word counts for training: explode → two-phase
    groupBy → top-`max_vocab` by (count desc, word) — O(vocab) rows to
    the driver, never O(corpus)."""
    rows = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_vocab)
        .collect()
    )
    return {r["w"]: r["n"] for r in rows}


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy encode: while any adjacent pair has a merge
    rank, fuse ALL non-overlapping occurrences of the lowest-ranked pair,
    left to right."""
    if not word:
        return []
    syms = list(word_symbols(word))
    while len(syms) > 1:
        pairs = {(a, b) for a, b in zip(syms, syms[1:])}
        ranked = [p for p in pairs if p in ranks]
        if not ranked:
            break
        best = min(ranked, key=lambda p: ranks[p])
        fused = best[0] + best[1]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                out.append(fused)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


def bpe_pieces(
    text: Column, merges: list[tuple[str, str]]
) -> Column:
    """array<string> of BPE pieces for every whitespace word of ``text``
    (lowercased), via ONE Arrow-batched kernel; merges ride the closure
    as an O(merges) rank dict."""
    ranks = merge_ranks(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        def run(t):
            if t is None:
                return None
            out: list[str] = []
            for w in t.lower().split():
                out.extend(encode_word(w, ranks))
            return out

        return s.map(run)

    return _enc(text)


#: (word, expected pieces) under the 5 Sennrich merges — HAND-DERIVED:
#:   low    l·o·w·</w> →(l,o)→ lo·w·</w> →(lo,w)→ low·</w>
#:   lower  →(l,o),(lo,w)→ low·e·r·</w>   (no (e,r)/(r,</w>) merges)
#:   newest →(e,s)→(es,t)→(est,</w>)→ n·e·w·est</w>
#:   widest → w·i·d·est</w>
#:   lowest (e,s) outranks (l,o): → l·o·w·est</w> → low·est</w>
#:   slow   → s·low·</w>
#:   esses  (e,s) fuses BOTH occurrences left-to-right → es·s·es·</w>
#:   test   → t·est</w>
#:   zoo    no merges apply → z·o·o·</w>
BPE_FIXTURES: list[tuple[str, str]] = [
    ("low", "low </w>"),
    ("lower", "low e r </w>"),
    ("newest", "n e w est</w>"),
    ("widest", "w i d est</w>"),
    ("lowest", "low est</w>"),
    ("slow", "s low </w>"),
    ("esses", "es s es </w>"),
    ("test", "t est</w>"),
    ("zoo", "z o o </w>"),
]
