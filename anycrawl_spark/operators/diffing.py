"""Snapshot content diffing: per-URL change magnitude between crawls.

The freshness scheduler (`operators/freshness.py`) learns change RATE
from digests — a 1-bit signal. Re-crawl policy papers (Cho &
Garcia-Molina TODS 2003; Olston & Najork's crawling survey, 2010)
weight revisits by change MAGNITUDE too: a page that rewrites its
boilerplate footer every day matters less than one replacing half its
body. This operator computes that magnitude between two text snapshots
of the same URL set, as pure JVM array math:

- each snapshot tokenizes and shingles into DISTINCT token 3-grams
  (the shingle-set change measure of Broder's syntactic-similarity
  family — public, and the same shingling the dedup stack uses);
- ``n_added`` / ``n_removed`` / ``n_common`` are set differences /
  intersection sizes (array_except / array_intersect on the distinct
  arrays);
- ``change_x1000 = (added + removed)·1000 div |union|`` — the scaled
  Jaccard distance as an exact integer.

Scale shape: everything is row-local projection — the two snapshots
join on url (co-partitioned or sort-merge on the url key, the ONLY
exchange), and the shingle arrays never shuffle: they are built and
consumed inside the joined row's projection. No explode, no python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anycrawl_spark.functions.text import tokens


def shingle_set(text: Column, n: int = 3) -> Column:
    """Distinct token n-grams of lowercased text (empty array when the
    text has fewer than n tokens)."""
    toks = tokens(F.lower(text))
    # NB: Spark's sequence(1, 0) steps DOWN ([1, 0]) rather than being
    # empty, so the short-text case needs an explicit guard
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-URL diff stats between two snapshots (inner join on url —
    arrival/departure of whole URLs is frontier accounting, not
    diffing): n_old, n_new, n_added, n_removed, n_common,
    change_x1000."""
    a = old.select(F.col(url_col).alias("url"), shingle_set(F.col(text_col), n).alias("_a"))
    b = new.select(F.col(url_col).alias("url"), shingle_set(F.col(text_col), n).alias("_b"))
    j = a.join(b, "url")
    added = F.size(F.array_except(F.col("_b"), F.col("_a")))
    removed = F.size(F.array_except(F.col("_a"), F.col("_b")))
    common = F.size(F.array_intersect(F.col("_a"), F.col("_b")))
    return j.select(
        "url",
        F.size("_a").cast("long").alias("n_old"),
        F.size("_b").cast("long").alias("n_new"),
        added.cast("long").alias("n_added"),
        removed.cast("long").alias("n_removed"),
        common.cast("long").alias("n_common"),
    ).withColumn(
        "change_x1000",
        F.expr(
            "CASE WHEN n_added + n_removed + n_common > 0 THEN"
            " ((n_added + n_removed) * 1000) div (n_added + n_removed + n_common)"
            " ELSE 0 END"
        ).cast("long"),
    )
