"""Int8-quantized two-stage ANN (similarity.quantize_int8/quantized_topk)
— quantization error bound, recall vs the exact baseline, self-match,
and repartition determinism."""

import numpy as np
from pyspark.sql import functions as F

from anycrawl_spark.operators.similarity import (
    cosine_topk,
    quantize_int8,
    quantized_topk,
)


def _vectors(spark, n=300, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_quantization_error_bound_and_range(spark):
    v = _vectors(spark, n=50)
    out = quantize_int8(v).join(v, "vec_id").collect()
    for r in out:
        assert all(-127 <= q <= 127 for q in r.qvec)
        assert r.scale > 0
        for x, q in zip(r.embedding, r.qvec):
            assert abs(q * r.scale - x) <= r.scale / 2 + 1e-12


def test_recall_vs_exact_baseline(spark):
    v = _vectors(spark)
    qs = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(v, qs, k=10)
    approx = quantized_topk(v, qs, k=10, refine_factor=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall


def test_self_match_is_rank_one(spark):
    v = _vectors(spark, n=100)
    qs = v.filter(F.col("vec_id") == 33).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = quantized_topk(v, qs, k=3).filter(F.col("rank") == 1).collect()[0]
    assert top.vec_id == 33 and top.cosine == 1.0


def test_deterministic_under_repartition(spark):
    v = _vectors(spark)
    qs = v.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = {(r.query_id, r.vec_id, r.cosine, r.rank)
         for r in quantized_topk(v, qs, k=8).collect()}
    b = {(r.query_id, r.vec_id, r.cosine, r.rank)
         for r in quantized_topk(v.repartition(11), qs, k=8).collect()}
    assert a == b
