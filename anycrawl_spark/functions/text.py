"""Text-analysis column expressions for training-data pipelines.

All of these are pure ``pyspark.sql.functions`` column math (JVM-side,
whole-stage-codegen'd — no Python in the hot path), so they run at 100 TB scan
speed and are exactly mirrorable in the DuckDB oracle SQL
(``anycrawl_spark/queries.py``).

Ops: token counting (whitespace model), quality scoring (length/punctuation/
stopword ratios), language ID (stopword-hit heuristic over small embedded
lists), document fingerprinting (content hash + shingle sketch).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Small embedded stopword samples per language (heuristic lang-id only).
# Function-word lists per language (top closed-class words; the standard
# n-gram/stopword language-ID signal). Expanded in round 2 from 10-word toys
# to ~40 words x 8 languages — still a heuristic, not fasttext (which is the
# documented production swap via a pandas UDF), but enough separation that
# real mixed-language corpora classify sensibly. The DuckDB oracles are
# GENERATED from these lists, so they cannot drift.
STOPWORDS = {
    "en": ["the", "a", "an", "and", "of", "to", "in", "is", "that", "for",
           "with", "as", "on", "at", "by", "it", "this", "be", "are", "was",
           "were", "from", "or", "not", "but", "have", "has", "had", "they",
           "their", "which", "will", "would", "can", "could", "there", "what",
           "when", "who", "all"],
    "es": ["el", "la", "los", "las", "de", "del", "que", "y", "en", "un",
           "una", "por", "con", "para", "es", "son", "se", "su", "sus", "al",
           "lo", "como", "mas", "pero", "le", "ya", "o", "este", "esta",
           "cuando", "muy", "sin", "sobre", "tambien", "me", "hasta", "hay",
           "donde", "quien", "ni"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "eine",
           "zu", "den", "dem", "des", "im", "in", "auf", "fur", "an", "als",
           "auch", "es", "sich", "nicht", "werden", "aus", "er", "hat",
           "dass", "sie", "nach", "wird", "bei", "einer", "um", "am", "sind",
           "noch", "wie", "einem", "uber"],
    "fr": ["le", "la", "les", "de", "des", "du", "et", "est", "un", "une",
           "dans", "que", "pour", "qui", "sur", "se", "pas", "plus", "par",
           "avec", "au", "aux", "ce", "il", "elle", "sont", "mais", "ou",
           "comme", "dont", "nous", "vous", "leur", "si", "tout", "etre",
           "fait", "son", "ses", "cette"],
    "it": ["il", "lo", "la", "i", "gli", "le", "di", "che", "e", "un", "una",
           "per", "con", "del", "della", "dei", "delle", "in", "da", "su",
           "al", "alla", "sono", "si", "non", "come", "ma", "anche", "piu",
           "questo", "questa", "quando", "nel", "nella", "ha", "hanno",
           "essere", "stato", "tra", "molto"],
    "pt": ["o", "a", "os", "as", "de", "do", "da", "dos", "das", "que", "e",
           "em", "um", "uma", "para", "com", "por", "no", "na", "nos",
           "nas", "se", "mais", "como", "mas", "ou", "ao", "sua", "seu",
           "foi", "ser", "tem", "quando", "muito", "sem", "sobre", "entre",
           "isso", "ele", "ela"],
    "nl": ["de", "het", "een", "van", "en", "in", "is", "dat", "op", "te",
           "die", "voor", "met", "zijn", "aan", "niet", "ook", "als", "er",
           "maar", "om", "door", "naar", "bij", "uit", "dan", "worden",
           "wordt", "heeft", "nog", "wat", "meer", "deze", "over", "of",
           "tot", "ze", "hij", "was", "kan"],
    "sv": ["och", "att", "det", "som", "en", "ett", "av", "for", "med",
           "den", "till", "om", "har", "inte", "pa", "ar", "han", "hon",
           "de", "vi", "du", "sig", "men", "fran", "var", "vid", "kan",
           "ska", "nar", "efter", "upp", "ut", "under", "over", "mot",
           "alla", "sin", "hur", "da", "vad"],
}

ENGLISH_STOPWORDS = STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace token array (empty-string elements removed)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    kept = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return kept / F.greatest(F.length(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] doc-quality score: rewards mid-length docs and a sane
    punctuation rate, penalizes stopword-free (keyword-stuffed) text.

    score = 0.4*len_term + 0.3*stop_term + 0.3*punct_term
    """
    n = token_count(text).cast("double")
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 10.0, F.lit(1.0))
    return F.round(0.4 * len_term + 0.3 * stop_term + 0.3 * punct_term, 4)


def lang_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))


def _word_mask_entries() -> list[tuple[str, int]]:
    """word -> bitmask of languages whose function-word list contains it
    (one bit per language, alphabetical order)."""
    masks: dict[str, int] = {}
    for i, lg in enumerate(sorted(STOPWORDS)):
        for w in STOPWORDS[lg]:
            masks[w] = masks.get(w, 0) | (1 << i)
    return sorted(masks.items())


def lang_id(text: Column) -> Column:
    """argmax over per-language stopword hits; 'und' (undetermined) when all
    zero. Deterministic tie-break: alphabetical language order wins.

    Shape: an Arrow-batched pandas UDF doing one hash lookup per token
    against a word->language-bitmask dict closed over the UDF. Measured on
    this box (sf0.1, warm, median-of-5): 0.37 s vs 1.5 s for the pure-column
    variants (naive 8x InSet, literal word->mask map + bitmask filters,
    array_except counting) — every JVM shape pays per-row construction /
    linear scans of the ~300-entry literal collections plus a multi-second
    codegen compile of the resulting mega-expression, while the dict lookup
    is O(1) per token and ships only the text column through Arrow. This is
    the repo's accepted per-document-string-work shape (same family as the
    extract/gate kernels); at 100 TB the stage stays narrow (no shuffle) and
    the production swap (fasttext) is a drop-in inside the same UDF.
    """
    langs = sorted(STOPWORDS)
    word_mask = dict(_word_mask_entries())
    n = len(langs)
    # Java's \s (the ``tokens`` split class and the DuckDB oracle's) is
    # ASCII-only; Python str.split() would also split on unicode whitespace
    ws_split = re.compile(r"[ \t\n\x0b\f\r]+").split

    @F.pandas_udf(T.StringType())
    def _lang_id(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            counts = [0] * n
            for tok in ws_split((t or "").lower()):
                m = word_mask.get(tok)
                if m:
                    for i in range(n):
                        if m >> i & 1:
                            counts[i] += 1
            best = max(counts)
            out.append(langs[counts.index(best)] if best > 0 else "und")
        return pd.Series(out)

    return _lang_id(text)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.

    md5 (not xxhash64) so the DuckDB oracle computes the identical value.
    """
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def chunk_tokens(text: Column, chunk_size: int = 64, overlap: int = 16) -> Column:
    """X14 token-aware chunking: overlapping token windows for LLM context
    packing (reference concept: packages/ai/src/agents/TextChunker.ts:21-80,
    line-based chunks with overlap — rebuilt token-based, JVM-side).

    Returns array<struct<chunk_id:int, text:string, n_tokens:int>> where
    chunk i covers tokens [i*stride, i*stride + chunk_size), stride =
    chunk_size - overlap. Pure higher-order functions — scans at column speed.
    """
    stride = chunk_size - overlap
    toks = tokens(text)
    n = F.size(toks)
    n_chunks = F.when(n <= 0, 0).otherwise(
        F.ceil((F.greatest(n - F.lit(overlap), F.lit(1))) / F.lit(stride)).cast("int")
    )
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    return F.when(n <= 0, F.array()).otherwise(
        F.transform(
            idx,
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_size)).alias("text"),
                F.least(n - i * stride, F.lit(chunk_size)).cast("int").alias("n_tokens"),
            ),
        )
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as strings ('w1 w2 w3'), distinct."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
        )
    )
