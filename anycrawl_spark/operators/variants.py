"""URL variant folding: collapse presentation variants of one resource.

The same page commonly lives at ``www.site/…``, ``m.site/…``,
``site/…?utm_campaign=x``, ``…/index.html`` and an ``/amp`` twin —
distinct URLs, one resource. The WHATWG layer (`functions/urls.py`)
canonicalizes SYNTAX; this operator folds the PRESENTATION conventions
above it (the rule families Google's own URL guidelines and the AMP
spec document publicly), producing the key a crawler deduplicates and
a training pipeline groups by:

- drop the fragment;
- drop tracking query params (closed set: ``utm_*``, ``gclid``,
  ``fbclid``, ``ref``, ``mc_cid``, ``mc_eid``), KEEPING real params in
  their original order — this is a display canonical, not a sort key
  (SURT, `functions/surt.py`, is the sort key);
- fold ONE leading ``www.`` / ``m.`` / ``amp.`` host label;
- fold a trailing ``/index.html`` / ``/index.htm`` to ``/`` and strip
  one trailing ``/amp`` segment.

Everything is scan-stage column math (regex + array filter); the
cluster rollup is one two-phase groupBy on the folded key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|ref|mc_cid|mc_eid)="


def variant_key(url: Column) -> Column:
    u = F.split(url, "#").getItem(0)
    # split off the query before touching the path
    base = F.split(u, r"\?").getItem(0)
    q = F.when(
        F.instr(u, "?") > 0, F.substr(u, F.instr(u, "?") + F.lit(1))
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(q, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_RE),
    )
    base = F.regexp_replace(base, r"^(https?://)(?:www|m|amp)\.", "$1")
    base = F.regexp_replace(base, r"/index\.html?$", "/")
    base = F.regexp_replace(base, r"/amp$", "")
    qs = F.array_join(kept, "&")
    return F.when(qs != "", F.concat(base, F.lit("?"), qs)).otherwise(base)


def variant_clusters(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(variant_key, n_variants, sample_url) — folded groups; clusters
    with n_variants > 1 are the dedup targets."""
    keyed = urls.select(
        F.col(url_col).alias("url"), variant_key(F.col(url_col)).alias("variant_key")
    )
    return keyed.groupBy("variant_key").agg(
        F.count("*").cast("long").alias("n_variants"),
        F.min("url").alias("sample_url"),
    )
