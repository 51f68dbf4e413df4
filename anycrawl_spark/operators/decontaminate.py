"""Benchmark decontamination: drop training documents that overlap a
held-out evaluation set by any token n-gram.

The standard hygiene stage of LLM training-data pipelines (GPT-3 appendix
C "13-gram dedup against benchmarks"; Dolma's decontamination pass runs
the same shape at 8-grams): the benchmark side is tiny (thousands of
snippets), the corpus side is the full 100 TB — so the scalable plan is a
BROADCAST semi-join from exploded document n-grams onto the benchmark
n-gram set, never a shuffle of corpus text:

- benchmark snippets -> distinct n-grams (O(benchmark), broadcast);
- documents -> n-grams via higher-order functions (split/transform/slice,
  pure JVM, no Python) exploded INSIDE the scan stage;
- the broadcast hash join keeps only matching grams, so the only shuffle
  in the plan is the final groupBy(doc_id) over MATCHES — O(contaminated
  grams), not O(corpus tokens);
- matching is exact on the gram STRING (the broadcast side is small enough
  to carry strings, so no hash-collision false positives).

The reference crawler has no decontamination (it ships raw scrapes); this
is beyond-reference surface for the training-data path, same tier as the
dedup families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_lower(text: Column) -> Column:
    """Whitespace tokens, lowercased, empties dropped (leading/trailing
    whitespace would otherwise inject '' tokens)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def ngrams(text: Column, n: int = 8) -> Column:
    """Array of space-joined token n-grams (empty array when the text has
    fewer than n tokens — guarded, since sequence(0,-1) would error)."""
    toks = tokens_lower(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contaminated_docs(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    snippet_col: str = "snippet",
) -> DataFrame:
    """(doc_id, n_contaminated_grams) for every document sharing >=1
    n-gram with the benchmark. Benchmark side broadcasts; corpus text
    never shuffles."""
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(ngrams(F.col(snippet_col), n))).alias("gram")
        )
        .distinct()
    )
    doc_grams = documents.select(
        "doc_id",
        F.explode(F.array_distinct(ngrams(F.col(text_col), n))).alias("gram"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_contaminated_grams"))
    )


def remove_contaminated(
    documents: DataFrame, benchmark: DataFrame, n: int = 8, **kw
) -> DataFrame:
    """The filtering form: documents with every contaminated doc dropped
    (left anti join on the contaminated set — the set is O(contaminated
    docs), so the anti join broadcasts in practice)."""
    bad = contaminated_docs(documents, benchmark, n, **kw).select("doc_id")
    return documents.join(bad, "doc_id", "left_anti")
