"""Inbound anchor-text aggregation per link target.

The text OTHER pages use to link to a URL is one of the strongest
public relevance/label signals a crawl produces (anchor corpora back
MS MARCO-style ranking sets and title synthesis for pages with bad
<title>s). The reference extracts links during scraping
(`apps/api/src/core/engines/*`, rebuilt in `crawl/superstep.py` /
`functions/htmlmd.py`) but never aggregates the inbound view; this
operator adds it: group every (target, anchor-text) observation,
count term frequencies per target, keep the top-k terms.

Scale shape: anchors explode to (target, term) pairs — the count is a
two-phase groupBy (map-side partial, fixed-width shuffle rows). The
top-k cut is a rank window over (target) ordered by (count desc, term);
Spark ≥3.5 plants a map-side WindowGroupLimit below the window's
exchange, so only ≤k rows per (partition, target) ever shuffle — the
same plan shape the sitemap dedup rank uses (plan-checked). Ties break
on the term string, so the cut is deterministic and the DuckDB
restatement matches exactly. No floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anycrawl_spark.functions.text import tokens


def top_anchor_terms(
    anchors: DataFrame,
    k: int = 3,
    target_col: str = "target_id",
    anchor_col: str = "anchor",
) -> DataFrame:
    """(target_id, term, cnt, rnk) — the k most frequent lowercase anchor
    terms per target; rank ties break lexicographically on the term."""
    terms = anchors.select(
        F.col(target_col).alias("target_id"),
        F.explode(tokens(F.lower(F.col(anchor_col)))).alias("term"),
    )
    counts = terms.groupBy("target_id", "term").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.partitionBy("target_id").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def edge_anchors_from_docs(
    edges: DataFrame,
    docs: DataFrame,
    n_words: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Synthesize an (target_id, anchor) table from a link graph: the
    anchor for edge (src, dst) is the first ``n_words`` tokens of the
    SOURCE document (a real crawl records the <a> element text at link
    extraction; the synthetic corpus has no markup, so the excerpt stands
    in — deterministically, so the oracle can restate it). The join is a
    plain shuffle join on src — co-partitioned with the edge table."""
    excerpts = docs.select(
        F.col(id_col).alias("src"),
        F.concat_ws(" ", F.slice(tokens(F.lower(F.col(text_col))), 1, n_words)).alias(
            "anchor"
        ),
    )
    return edges.join(excerpts, "src").select(
        F.col("dst").alias("target_id"), "anchor"
    )
