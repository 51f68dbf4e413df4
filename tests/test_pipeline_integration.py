"""End-to-end training-data pipeline over the engine's OWN crawl output:
crawl -> documents(spans) -> dedup + text metrics + media features.

This is the 'switch from the reference' user journey: crawl a site, then run
the corpus ops on what the crawl produced."""

import shutil

import pytest
from pyspark.sql import functions as F

from anycrawl_spark import synth
from anycrawl_spark.crawl.params import CrawlParams
from anycrawl_spark.crawl.superstep import CrawlEngine


@pytest.fixture(scope="module")
def crawl_docs(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("pipe"))
    jobs = [dict(synth.seed_jobs(1)[0], limit=40, strategy="all")]
    eng = CrawlEngine(spark, wd, jobs, synth.robots_rules(), CrawlParams())
    eng.init_state()
    eng.run()
    docs = eng.store.read_appends("documents").persist()
    yield docs
    docs.unpersist()
    shutil.rmtree(wd, ignore_errors=True)


def test_exact_dedup_over_crawl(crawl_docs):
    from anycrawl_spark.operators.dedup import exact_duplicates

    groups = exact_duplicates(crawl_docs, id_col="doc_id", text_col="markdown").collect()
    assert sum(g.n_docs for g in groups) == crawl_docs.count()
    # synthetic pages are distinct per URL
    assert all(g.n_docs == 1 for g in groups)


def test_near_dup_finds_planted(crawl_docs, spark):
    from anycrawl_spark.operators.dedup import near_duplicates

    base = crawl_docs.select("doc_id", F.col("markdown").alias("text")).limit(10)
    mutated = base.select(
        F.concat(F.lit("copy_"), F.col("doc_id")).alias("doc_id"),
        F.substring("text", 1, F.greatest(F.length("text") - 15, F.lit(10)).cast("int")).alias("text"),
    )
    pairs = near_duplicates(base.unionByName(mutated), threshold=0.5).collect()
    found = {(a, b) for a, b in ((r.id_a, r.id_b) for r in pairs)}
    planted = {tuple(sorted((r.doc_id, "copy_" + r.doc_id))) for r in base.collect()}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.8, (recall, found)


def test_text_metrics_over_crawl(crawl_docs):
    from anycrawl_spark.functions import text as TX

    out = crawl_docs.select(
        TX.token_count(F.col("markdown")).alias("n"),
        TX.quality_score(F.col("markdown")).alias("q"),
    ).collect()
    assert all(r.n > 0 for r in out)
    assert all(0.0 <= r.q <= 1.0 for r in out)


def test_media_features_over_crawl(crawl_docs):
    from anycrawl_spark.operators.multimodal import (
        extract_features, materialize_media, media_refs_from_documents,
    )

    refs = media_refs_from_documents(crawl_docs)
    n_refs = refs.count()
    assert n_refs > 0  # the synthetic pages embed images
    feats = extract_features(materialize_media(refs), dim=8)
    ok = feats.filter(F.col("ok")).count()
    assert ok == n_refs
