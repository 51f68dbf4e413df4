"""Sitemap ingestion source: fetched sitemap bodies -> frontier seed rows.

Completes the robots->seeds loop (SURVEY §2.3 J6 neighborhood): the robots
layer (``functions/robots.py``) surfaces per-host ``Sitemap:`` directives;
this module turns a corpus of FETCHED sitemap documents into deduplicated,
scope-checked frontier seeds. The reference (xienanzheng/AnyCrawl) has no
sitemap ingestion — like the robots layer this is rebuild-added crawl-tier
functionality specced from the public sitemaps.org protocol; the parsing
kernel and the protocol rules live in ``functions/sitemaps.py``.

Trust model (protocol "Sitemap file location" section):

- A sitemap submitted via robots.txt (``submitted``) is trusted at HOST
  scope; its in-scope entries become seeds.
- A ``<sitemapindex>`` child is trusted iff the index itself is submitted
  AND the child ``<loc>`` is in the index's scope; the child document's own
  entries are then checked against the CHILD's own (strict, directory-level)
  scope — index membership does not relax the child's location rule, only
  an explicit robots.txt submission does.
- Anything else in the corpus (fetched but neither submitted nor referenced
  by a submitted index) contributes no seeds.

Scale shape (design target: 100 TB corpus, O(10^8) hosts):

- Bodies (<=50 MB each) are parsed exactly ONCE in a single Arrow
  ``mapInPandas`` stage; the parsed output is persisted (MEMORY_AND_DISK)
  because the seed derivation is a genuine self-join — index docs reference
  child docs — and without the persist both consumers would re-scan and
  re-parse every body. Parsed rows are O(urls) x ~100 bytes, a tiny
  fraction of body bytes; bodies themselves never shuffle.
- The trusted-children relation is O(sitemap documents) — broadcast side of
  the trust join. Entries (O(urls)) stream past it map-side.
- The final per-URL dedup is ONE hash exchange on ``loc`` (window
  row_number), the only O(urls) shuffle in the plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from anycrawl_spark.functions.sitemaps import parse_sitemap

# Union-shaped parse output: row_kind 'entry' (urlset/txt URL), 'child'
# (sitemapindex reference), or 'error' (undecodable/unparseable document —
# kept as a row so callers can COUNT failures; never an exception).
SITEMAP_ROWS_SCHEMA = (
    "sitemap_url string, robots_submitted boolean, kind string, row_kind string, "
    "loc string, lastmod string, changefreq string, priority double, "
    "in_scope boolean, error string"
)
_COLS = [f.split(" ")[0] for f in SITEMAP_ROWS_SCHEMA.split(", ")]


def robots_submitted_sitemaps(texts_by_host: dict[str, str]) -> set[str]:
    """The cross-submitted sitemap URL set from raw robots.txt texts
    (``Sitemap:`` non-group directives, RFC 9309 / sitemaps.org)."""
    from anycrawl_spark.functions.robots import compile_robots

    compiled = compile_robots(texts_by_host, agent="*")
    return {u for urls in compiled["sitemaps"].values() for u in urls}


def parse_sitemap_corpus(corpus: DataFrame, submitted: set[str]) -> DataFrame:
    """ONE Arrow stage over (sitemap_url, body) -> SITEMAP_ROWS_SCHEMA rows.

    ``submitted`` (the robots-cross-submitted URL set, O(hosts), task-
    serialized) decides per document whether scope is host-wide or
    directory-strict BEFORE parsing, so each body is parsed exactly once.
    Per-document failure isolation: a hostile/truncated body yields one
    'error' row, never a stage failure (same contract as the PNG codec).
    """
    sub = frozenset(submitted)

    def _parse(batches):
        for pdf in batches:
            rows = []
            for su, body in zip(pdf["sitemap_url"], pdf["body"]):
                su = "" if su is None else str(su)
                rs = su in sub
                res = parse_sitemap(body, su, robots_submitted=rs)
                err = res["error"]
                if not res["entries"] and not res["children"]:
                    rows.append(
                        (su, rs, res["kind"], "error", None, None, None, None,
                         None, err or "empty")
                    )
                    continue
                for e in res["entries"]:
                    rows.append(
                        (su, rs, res["kind"], "entry", e["loc"], e["lastmod"],
                         e["changefreq"], e["priority"], e["in_scope"], err)
                    )
                for c in res["children"]:
                    rows.append(
                        (su, rs, res["kind"], "child", c["loc"], None, None,
                         None, c["in_scope"], err)
                    )
            yield pd.DataFrame(rows, columns=_COLS)

    return corpus.select("sitemap_url", "body").mapInPandas(_parse, SITEMAP_ROWS_SCHEMA)


def sitemap_seeds(
    corpus: DataFrame,
    submitted: set[str],
    parsed: DataFrame | None = None,
) -> DataFrame:
    """Deduplicated frontier seeds from a fetched sitemap corpus.

    corpus: (sitemap_url string, body binary|string) — one row per fetched
    sitemap document. submitted: robots.txt-cross-submitted sitemap URLs
    (see ``robots_submitted_sitemaps``). Returns (url, host, lastmod,
    changefreq, priority, source_sitemap), one row per distinct URL; when a
    URL appears in several trusted sitemaps the winner is deterministic:
    highest priority, then lowest source sitemap URL, then latest lastmod.

    Trust = directly submitted OR referenced in-scope by a submitted
    <sitemapindex> (one level deep, per the protocol's no-nested-index
    rule). Pass ``parsed`` (a ``parse_sitemap_corpus`` result you manage
    yourself) to control persistence; otherwise the parse output is
    persisted MEMORY_AND_DISK here so bodies are parsed once, not once per
    consumer branch.
    """
    if parsed is None:
        parsed = parse_sitemap_corpus(corpus, submitted).persist(
            StorageLevel.MEMORY_AND_DISK
        )

    entries = parsed.filter((F.col("row_kind") == "entry") & F.col("in_scope"))
    # O(sitemap docs) rows: the broadcast side of the trust join.
    trusted_children = (
        parsed.filter(
            (F.col("row_kind") == "child")
            & F.col("in_scope")
            & F.col("robots_submitted")
        )
        .select(F.col("loc").alias("sitemap_url"))
        .distinct()
        .withColumn("via_index", F.lit(True))
    )

    trusted = (
        entries.join(F.broadcast(trusted_children), "sitemap_url", "left")
        .filter(F.col("robots_submitted") | F.coalesce("via_index", F.lit(False)))
    )

    # JVM-side host extraction (parse_url), mirroring functions.urls.url_host
    # (lowercased hostname, trailing dots stripped) — no python stage on the
    # O(urls) seed rows; the only Arrow stage in the plan is the body parse.
    host_col = F.expr("lower(rtrim('.', parse_url(loc, 'HOST')))")
    w = Window.partitionBy("loc").orderBy(
        F.col("priority").desc(),
        F.col("sitemap_url").asc(),
        F.coalesce(F.col("lastmod"), F.lit("")).desc(),
        F.coalesce(F.col("changefreq"), F.lit("")).asc(),
    )
    return (
        trusted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("loc").alias("url"),
            host_col.alias("host"),
            "lastmod",
            "changefreq",
            "priority",
            F.col("sitemap_url").alias("source_sitemap"),
        )
    )
