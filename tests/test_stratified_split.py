"""Exact-quota stratified split (sampling.stratified_split) — quota
exactness per stratum, python-mirror position equality, repartition
invariance, prefix-nesting across quota changes, salt independence."""

import hashlib

from pyspark.sql import functions as F

from anycrawl_spark.operators.sampling import stratified_split


def _df(spark):
    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(35)]
        + [(2000 + i, "c") for i in range(5)]
    )
    return spark.createDataFrame(rows, "doc_id: long, source: string")


def _py_split(rows, n_val, n_test, salt=""):
    by_src = {}
    for did, src in rows:
        h = int(hashlib.md5(f"{salt}{did}".encode()).hexdigest()[:15], 16)
        by_src.setdefault(src, []).append((h, did))
    out = {}
    for src, hs in by_src.items():
        for pos, (_, did) in enumerate(sorted(hs), start=1):
            out[did] = "val" if pos <= n_val else ("test" if pos <= n_val + n_test else "train")
    return out


def test_quotas_exact_per_stratum(spark):
    out = stratified_split(_df(spark), n_val=20, n_test=10).collect()
    counts = {}
    for r in out:
        counts[(r.source, r.split)] = counts.get((r.source, r.split), 0) + 1
    assert counts[("a", "val")] == 20 and counts[("a", "test")] == 10
    assert counts[("a", "train")] == 70
    assert counts[("b", "val")] == 20 and counts[("b", "test")] == 10
    assert counts[("b", "train")] == 5
    # stratum smaller than n_val: everything is val, no spillover labels
    assert counts[("c", "val")] == 5
    assert ("c", "test") not in counts and ("c", "train") not in counts


def test_matches_python_mirror(spark):
    rows = [(r.doc_id, r.source) for r in _df(spark).collect()]
    want = _py_split(rows, 20, 10)
    got = {r.doc_id: r.split for r in stratified_split(_df(spark), 20, 10).collect()}
    assert got == want


def test_membership_invariant_under_repartition(spark):
    base = {r.doc_id: r.split for r in stratified_split(_df(spark), 20, 10).collect()}
    rep = {
        r.doc_id: r.split
        for r in stratified_split(_df(spark).repartition(13), 20, 10).collect()
    }
    assert rep == base


def test_val_sets_nest_as_quota_grows(spark):
    """Hash-order positions are fixed, so the n_val=10 val set is a strict
    subset of the n_val=20 one — growing an eval set never churns it."""
    v10 = {r.doc_id for r in stratified_split(_df(spark), 10, 0).collect() if r.split == "val"}
    v20 = {r.doc_id for r in stratified_split(_df(spark), 20, 0).collect() if r.split == "val"}
    assert v10 < v20


def test_salt_draws_independent_splits(spark):
    a = {r.doc_id for r in stratified_split(_df(spark), 20, 10).collect() if r.split == "val"}
    b = {
        r.doc_id
        for r in stratified_split(_df(spark), 20, 10, salt="v2").collect()
        if r.split == "val"
    }
    assert a != b
