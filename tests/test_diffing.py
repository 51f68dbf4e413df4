"""Snapshot diffing (operators/diffing.py).

Layer 1: hand-computed diffs (identical, disjoint, partial, short-text
         edge cases).
Layer 2: sequential set-reference differential + metric properties
         (symmetry, bounds).
Layer 3: plan guards (no explode, no python, one join exchange pair).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from anycrawl_spark.operators.diffing import shingle_set, snapshot_diff


def _ref_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _diff(spark, old_text, new_text):
    old = spark.createDataFrame([("u", old_text)], ["url", "text"])
    new = spark.createDataFrame([("u", new_text)], ["url", "text"])
    return snapshot_diff(old, new).collect()[0]


def test_identical(spark):
    r = _diff(spark, "a b c d e", "a b c d e")
    assert (r["n_added"], r["n_removed"], r["n_common"]) == (0, 0, 3)
    assert r["change_x1000"] == 0


def test_disjoint(spark):
    r = _diff(spark, "a b c d", "x y z w")
    assert (r["n_added"], r["n_removed"], r["n_common"]) == (2, 2, 0)
    assert r["change_x1000"] == 1000


def test_partial_overlap_hand_case(spark):
    # old: {abc,bcd}; new: {abc,bcx} -> added 1, removed 1, common 1
    r = _diff(spark, "a b c d", "a b c x")
    assert (r["n_added"], r["n_removed"], r["n_common"]) == (1, 1, 1)
    assert r["change_x1000"] == (2 * 1000) // 3


def test_short_texts(spark):
    r = _diff(spark, "a b", "a b")
    assert (r["n_old"], r["n_new"], r["change_x1000"]) == (0, 0, 0)
    r = _diff(spark, "", "now three tokens here")
    assert (r["n_old"], r["n_added"], r["change_x1000"]) == (0, 2, 1000)


def test_case_folding(spark):
    r = _diff(spark, "A B C", "a b c")
    assert r["change_x1000"] == 0


def test_reference_differential(spark):
    docs = [
        (f"u{i}", " ".join(f"w{(i * 7 + j) % 11}" for j in range(i % 15)))
        for i in range(60)
    ]
    muts = [
        (u, t if i % 3 == 0 else (t + " zz yy xx" if i % 3 == 1 else "pp " + t))
        for i, (u, t) in enumerate(docs)
    ]
    old = spark.createDataFrame(docs, ["url", "text"])
    new = spark.createDataFrame(muts, ["url", "text"])
    got = {r["url"]: r for r in snapshot_diff(old, new).collect()}
    for (u, t_old), (_, t_new) in zip(docs, muts):
        a, b = _ref_shingles(t_old), _ref_shingles(t_new)
        r = got[u]
        assert (r["n_old"], r["n_new"]) == (len(a), len(b)), u
        assert (r["n_added"], r["n_removed"]) == (len(b - a), len(a - b)), u
        assert r["n_common"] == len(a & b), u
        union = len(a | b)
        want = ((len(b - a) + len(a - b)) * 1000) // union if union else 0
        assert r["change_x1000"] == want, u


def test_symmetry(spark):
    old = spark.createDataFrame(
        [("u", "alpha beta gamma delta epsilon")], ["url", "text"]
    )
    new = spark.createDataFrame(
        [("u", "alpha beta zeta delta epsilon")], ["url", "text"]
    )
    fwd = snapshot_diff(old, new).collect()[0]
    rev = snapshot_diff(new, old).collect()[0]
    assert fwd["change_x1000"] == rev["change_x1000"]
    assert fwd["n_added"] == rev["n_removed"]


def test_plan_shape(spark):
    from anycrawl_spark.queries import q_snapshot_diff

    p = q_snapshot_diff(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "Generate" not in p, "shingles must stay array-local (no explode)"
    assert "Cartesian" not in p


def test_shingle_column(spark):
    df = spark.createDataFrame([("The Quick brown fox jumps",)], ["t"])
    [row] = df.select(shingle_set(F.col("t")).alias("s")).collect()
    assert set(row["s"]) == _ref_shingles("The Quick brown fox jumps")
