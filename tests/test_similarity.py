"""Similarity search: brute-force cosine top-k correctness + LSH ANN recall."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _vectors(spark, n=200, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(float)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def test_cosine_topk_matches_numpy(spark):
    from anycrawl_spark.operators.similarity import cosine_topk

    df, vecs = _vectors(spark)
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(df, q, k=5)
    rows = got.collect()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for qid in range(3):
        expected = np.argsort(-np.round(sims[qid], 6), kind="stable")[:5].tolist()
        mine = [r.vec_id for r in sorted(rows, key=lambda r: r.rank) if r.query_id == qid]
        assert mine == expected, f"query {qid}"
        # self always rank 1 with cosine 1.0
        top = [r for r in rows if r.query_id == qid and r.rank == 1][0]
        assert top.vec_id == qid and abs(top.cosine - 1.0) < 1e-6


def test_ann_lsh_recall(spark):
    from anycrawl_spark.operators.similarity import ann_topk_lsh, cosine_topk

    df, _ = _vectors(spark, n=400, dim=16)
    q = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(df, q, k=5).collect()
    approx = ann_topk_lsh(df, q, dim=16, k=5, bits=4, multiprobe=0).collect()
    ex = {(r.query_id, r.vec_id) for r in exact}
    ap = {(r.query_id, r.vec_id) for r in approx}
    recall = len(ex & ap) / len(ex)
    # self-match always survives (same bucket); random vectors at 4 bits
    # should retain a solid fraction of true neighbors
    assert recall >= 0.4, recall
    for qid in range(10):
        assert (qid, qid) in ap  # self found


def test_ivf_assign(spark):
    from anycrawl_spark.operators.similarity import ivf_assign

    df, vecs = _vectors(spark, n=50, dim=8)
    centroids = [vecs[0].tolist(), vecs[1].tolist(), vecs[2].tolist()]
    out = {r.vec_id: r.ivf_list for r in ivf_assign(df, centroids).collect()}
    # the centroid vectors themselves map to their own list
    assert out[0] == 0 and out[1] == 1 and out[2] == 2


def test_ann_lsh_multiprobe_recall(spark):
    """Planted-neighbor fixture: each query has 4 true near neighbors (small
    perturbations, cosine ~0.99). Hamming-1 multiprobe must reach recall
    >=0.9 at bits=8 and never fall below single-probe recall."""
    from anycrawl_spark.operators.similarity import ann_topk_lsh, cosine_topk

    rng = np.random.default_rng(11)
    dim, n_q, per = 16, 10, 4
    base = rng.normal(size=(n_q, dim))
    rows = []
    vid = 0
    for qi in range(n_q):
        rows.append((vid, base[qi].tolist())); vid += 1
        for _ in range(per):  # planted neighbors: tiny angular perturbation
            rows.append((vid, (base[qi] + 0.05 * rng.normal(size=dim)).tolist())); vid += 1
    # background noise vectors
    for _ in range(300):
        rows.append((vid, rng.normal(size=dim).tolist())); vid += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    q = df.filter(F.col("vec_id") % (per + 1) == 0).filter(F.col("vec_id") < n_q * (per + 1))           .select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.vec_id) for r in cosine_topk(df, q, k=per + 1).collect()}
    single = {(r.query_id, r.vec_id)
              for r in ann_topk_lsh(df, q, dim=dim, k=per + 1, bits=8, multiprobe=0).collect()}
    multi = {(r.query_id, r.vec_id)
             for r in ann_topk_lsh(df, q, dim=dim, k=per + 1, bits=8, multiprobe=1).collect()}
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.9, (r_single, r_multi)


def test_embedding_near_duplicates(spark):
    """Dedup-family member over vectors: planted perturbed copies must be
    recovered as pairs; no false pairs among background noise; equals the
    exact all-pairs result on this block."""
    from anycrawl_spark.operators.similarity import embedding_near_duplicates

    rng = np.random.default_rng(5)
    dim = 32
    base = rng.normal(size=(30, dim))
    rows = [(i, base[i].tolist()) for i in range(30)]
    rows += [(i + 1000, (base[i] * 1.001 + 0.01).tolist()) for i in range(30)]
    rows += [(i + 5000, rng.normal(size=dim).tolist()) for i in range(200)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    got = embedding_near_duplicates(df, dim=dim, threshold=0.99, bits=8, multiprobe=2)
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    # exact ground truth via numpy
    all_rows = sorted(rows)
    import itertools
    vecs = {i: np.array(v) for i, v in all_rows}
    exact = set()
    for a, b in itertools.combinations(sorted(vecs), 2):
        va, vb = vecs[a], vecs[b]
        c = round(float(va @ vb / max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-12)), 4)
        if c >= 0.99:
            exact.add((a, b))
    assert pairs == exact
    assert all((i, i + 1000) in pairs for i in range(30))


def test_ivf_topk_recall(spark):
    """IVF search: clustered fixture (queries near centroid of their own
    cluster); nprobe=2 over 4 lists must find >=0.9 of true top-k, and
    nprobe=len(centroids) must equal exact."""
    from anycrawl_spark.operators.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(3)
    dim, n_clusters = 16, 4
    centers = rng.normal(size=(n_clusters, dim)) * 3
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(100):
            rows.append((vid, (centers[c] + rng.normal(size=dim)).tolist())); vid += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    q = df.filter(F.col("vec_id").isin([0, 100, 200, 300])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = [c.tolist() for c in centers]
    exact = {(r.query_id, r.vec_id) for r in cosine_topk(df, q, k=5).collect()}
    probed = {(r.query_id, r.vec_id)
              for r in ivf_topk(df, q, cents, k=5, nprobe=2).collect()}
    full = {(r.query_id, r.vec_id)
            for r in ivf_topk(df, q, cents, k=5, nprobe=len(cents)).collect()}
    assert len(exact & probed) / len(exact) >= 0.9
    assert full == exact  # probing every list degenerates to exact
