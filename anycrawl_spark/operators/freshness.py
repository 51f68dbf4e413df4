"""Recrawl scheduling: change-rate estimation + staleness priorities.

An incremental crawler must decide WHICH known URLs to refetch each
round. The public literature (Cho & Garcia-Molina, "The Evolution of
the Web and Implications for an Incremental Crawler", VLDB 2000, and
"Effective Page Refresh Policies for Web Crawlers", TODS 2003) models
page change as a per-page Poisson process: estimate each page's change
rate from its revisit history, then prioritize refresh by expected
staleness. The reference (xienanzheng/AnyCrawl) has no revisit policy
at all — jobs crawl once and finish (`apps/api/src/core/engines/*`,
rebuilt in `crawl/superstep.py`) — so like robots/sitemaps/WARC this is
rebuild-added crawl-tier functionality.

Exact-integer variant: the λ-optimal estimator needs a logarithm
(λ̂ = -ln((n-c+0.5)/(n+0.5))/Δ); transcendentals would make results
depend on each engine's libm and break bit-reproducibility, so the
operator uses the rate×age staleness heuristic in fixed point —
``rate = (changes·SCALE) div intervals`` and ``priority = rate·age`` —
which preserves the POLICY ORDERING (more-frequently-changing and
longer-unvisited pages first) with pure int64 math. Cold-start URLs
(a single visit, no intervals) get a documented half-scale prior.

Scale shapes (design target: 10^10 visit rows):

- change detection is a lag window PARTITIONed BY url — a partition is
  ONE url's revisit history (bounded by policy, O(10^2) rows), so the
  window never sees corpus-scale skew;
- per-url stats are a two-phase groupBy (map-side partial counts);
- the per-host refresh budget is a rank window whose limit Spark plants
  map-side (WindowGroupLimit) — at most k rows per (partition, host)
  cross the exchange, same shape as the sitemap/anchor rank cuts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1000
COLD_START_RATE = SCALE // 2  # single-visit prior: change odds unknown, assume 1/2


def visit_change_stats(
    visits: DataFrame,
    url_col: str = "url_id",
    seq_col: str = "seq",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-URL revisit statistics from a (url, visit seq, content digest)
    history: n_visits, n_changes (digest differs from the PREVIOUS visit
    in seq order), last_seq."""
    w = Window.partitionBy(url_col).orderBy(seq_col)
    changed = (
        F.lag(digest_col).over(w).isNotNull()
        & (F.col(digest_col) != F.lag(digest_col).over(w))
    ).cast("long")
    return (
        visits.withColumn("_chg", changed)
        .groupBy(url_col)
        .agg(
            F.count("*").cast("long").alias("n_visits"),
            F.sum("_chg").cast("long").alias("n_changes"),
            F.max(seq_col).cast("long").alias("last_seq"),
        )
    )


def recrawl_priorities(
    stats: DataFrame, horizon_seq: int, scale: int = SCALE
) -> DataFrame:
    """Adds the fixed-point change rate and the staleness priority:
    ``rate_scaled = (n_changes·scale) div (n_visits-1)`` (half-scale
    cold-start prior when there are no intervals) and
    ``priority = rate_scaled · (horizon_seq - last_seq)``."""
    intervals = F.col("n_visits") - F.lit(1)
    rate = F.when(
        intervals > 0, F.expr(f"(n_changes * {scale}) div (n_visits - 1)")
    ).otherwise(F.lit(scale // 2)).cast("long")
    return (
        stats.withColumn("rate_scaled", rate)
        .withColumn("age", (F.lit(horizon_seq) - F.col("last_seq")).cast("long"))
        .withColumn("priority", (F.col("rate_scaled") * F.col("age")).cast("long"))
    )


def recrawl_batch(
    priorities: DataFrame, k: int, host_col: str = "host", url_col: str = "url_id"
) -> DataFrame:
    """The per-host refresh budget: top-k URLs by (priority desc, url
    asc — deterministic tie-break), ranked. Map-side WindowGroupLimit
    keeps the shuffle at O(hosts·k)."""
    w = Window.partitionBy(host_col).orderBy(F.desc("priority"), F.asc(url_col))
    return (
        priorities.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
