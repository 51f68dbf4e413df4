"""Incremental near-dup detection from persisted signature state
(dedup.incremental_near_duplicates) — planted dup/mutation/fresh cases,
candidate-equality with the full batch pipeline, and the state-append
flow a continuously-ingesting pipeline runs."""

from pyspark.sql import functions as F

from anycrawl_spark.operators.dedup import (
    incremental_near_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
)

OLD = {
    1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2: "one two three four five six seven eight nine ten eleven twelve",
    3: "red orange yellow green blue indigo violet ultraviolet infrared",
}
NEW = {
    101: "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # copy of 1
    102: "one two three four five six seven eight nine ten",          # 2 minus tail
    103: "completely different content about spark shuffles and joins",
}


def _docs(spark, d):
    return spark.createDataFrame(
        [(k, v) for k, v in d.items()], "doc_id: long, text: string"
    )


def test_planted_copy_mutation_fresh(spark):
    out = incremental_near_duplicates(
        minhash_signatures(_docs(spark, NEW)),
        minhash_signatures(_docs(spark, OLD)),
        threshold=0.5,
    ).collect()
    pairs = {(r.new_id, r.old_id): r.est_jaccard for r in out}
    assert pairs[(101, 1)] == 1.0                     # exact copy: all seeds agree
    assert (102, 2) in pairs and pairs[(102, 2)] >= 0.5
    assert not any(n == 103 for n, _ in pairs)        # fresh doc pairs with nothing


def test_candidates_equal_full_batch_cross_pairs(spark):
    """threshold=0 keeps every band-join candidate — must equal the full
    batch pipeline's candidate pairs restricted to (old, new)."""
    old_df, new_df = _docs(spark, OLD), _docs(spark, NEW)
    inc = incremental_near_duplicates(
        minhash_signatures(new_df), minhash_signatures(old_df), threshold=0.0
    )
    got = {(r.old_id, r.new_id) for r in inc.collect()}
    full = lsh_candidate_pairs(old_df.unionByName(new_df))
    want = {
        (r.id_a, r.id_b)
        for r in full.collect()
        if r.id_a in OLD and r.id_b in NEW
    }
    assert got == want


def test_state_append_across_slices(spark):
    """Slice 2 deduped against old + slice-1 signatures (a plain unionByName
    of signature rows — the state is just a table): a doc duplicating a
    SLICE-1 doc is caught even though it never saw the original corpus."""
    slice1 = _docs(spark, {201: "brand new page about frontier scheduling in spark"})
    slice2 = _docs(spark, {301: "brand new page about frontier scheduling in spark"})
    state = minhash_signatures(_docs(spark, OLD)).unionByName(
        minhash_signatures(slice1)
    )
    out = incremental_near_duplicates(
        minhash_signatures(slice2), state, threshold=0.5
    ).collect()
    assert {(r.new_id, r.old_id, r.est_jaccard) for r in out} == {(301, 201, 1.0)}
