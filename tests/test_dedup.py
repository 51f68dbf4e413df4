"""Deduplication operator tests: exact, MinHash-LSH, SimHash, Jaccard."""

import pandas as pd
from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog near the river"),        # near dup of 0
        (3, "completely different content about spark shuffle partitions and bloom filters"),
        (4, "THE  Quick   Brown fox jumps over the lazy dog near the river bank"),  # ws/case dup of 0
        (5, "another unrelated document mentioning politeness budgets and robots gating"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(spark):
    from anycrawl_spark.operators.dedup import exact_dedup, exact_duplicates

    d = _docs(spark)
    groups = {r.keep_id: r.n_docs for r in exact_duplicates(d).collect()}
    # 0,1,4 normalize to the same fingerprint
    assert groups[0] == 3
    kept = {r.doc_id for r in exact_dedup(d).collect()}
    assert kept == {0, 2, 3, 5}


def test_minhash_lsh_near_duplicates(spark):
    from anycrawl_spark.operators.dedup import lsh_candidate_pairs, near_duplicates

    d = _docs(spark)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in near_duplicates(d, threshold=0.5).collect()}
    # exact dups have jaccard 1.0; near dup 0-2 above 0.5
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 4)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5
    # unrelated docs never pair
    assert not any(3 in p or 5 in p for p in pairs)
    # LSH candidates are a superset of verified pairs
    cands = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(d).collect()}
    assert set(pairs) <= cands


def test_jaccard_values(spark):
    from anycrawl_spark.operators.dedup import jaccard_pairs

    d = _docs(spark)
    pairs = spark.createDataFrame(pd.DataFrame({"id_a": [0], "id_b": [3]}))
    j = jaccard_pairs(pairs, d).collect()[0].jaccard
    assert j < 0.1  # disjoint shingle sets


def test_simhash_properties(spark):
    from anycrawl_spark.operators.dedup import simhash

    d = _docs(spark)
    sh = {r.doc_id: r.simhash for r in simhash(d).collect()}
    # identical token streams => identical simhash
    assert sh[0] == sh[1] == sh[4]
    # near-dup differs in few bits; unrelated differs in many
    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(sh[0], sh[2]) <= 16
    assert hamming(sh[0], sh[3]) > 16


def test_simhash_buckets(spark):
    from anycrawl_spark.operators.dedup import simhash_buckets

    d = _docs(spark)
    b = {r.doc_id: r.bucket for r in simhash_buckets(d, prefix_bits=8).collect()}
    assert b[0] == b[1] == b[4]


def test_simhash_hamming_locality(spark):
    """SimHash property: near-identical docs land at small Hamming distance,
    unrelated docs far — for BOTH the xxhash64 and the md5 (oracle) variant."""
    import pandas as pd
    from pyspark.sql import functions as F

    from anycrawl_spark.operators.dedup import simhash, simhash_md5

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to find some food for the day")
    near = base.replace("lazy", "sleepy")               # 1-token change
    far = ("completely unrelated text about spark sql window functions "
           "catalyst optimizer exchange partitioning codegen stages tasks")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": [base, near, far]})
    )

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for fn, col in ((simhash, "simhash"), (simhash_md5, "simhash60")):
        out = {r.doc_id: getattr(r, col) for r in fn(df).collect()}
        d_near = hamming(out[0], out[1])
        d_far = hamming(out[0], out[2])
        assert d_near < d_far, (fn.__name__, d_near, d_far)
        assert d_near <= 12, (fn.__name__, d_near)


def test_duplicate_passages_hand_case(spark):
    """Passage-level exact-substring dedup: doc1[0:4]==doc2[2:6] and
    doc1[2:6]==doc2[4:8] are the only duplicated stride-aligned windows;
    doc3 shares nothing."""
    from anycrawl_spark.operators.dedup import duplicate_passages

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y a b c d e f"), (3, "q r s t u v w z")],
        "doc_id long, text string",
    )
    out = duplicate_passages(docs, window=4, stride=2, min_count=2).collect()
    got = sorted((r.doc_id, r.token_start, r.n_occurrences, r.n_docs) for r in out)
    assert got == [(1, 0, 2, 2), (1, 2, 2, 2), (2, 2, 2, 2), (2, 4, 2, 2)]
    # digests pair up across docs: doc1@0 == doc2@2 ("a b c d")
    by = {(r.doc_id, r.token_start): r.digest for r in out}
    assert by[(1, 0)] == by[(2, 2)] and by[(1, 2)] == by[(2, 4)]
    # a doc shorter than the window produces no rows and no crash
    short = spark.createDataFrame([(9, "a b"), (10, "a b")], "doc_id long, text string")
    assert duplicate_passages(short, window=4, stride=2).count() == 0


def test_duplicate_passages_exact_dup_docs_fully_flagged(spark):
    """Two byte-identical docs: every stride window is duplicated."""
    from anycrawl_spark.operators.dedup import duplicate_passages

    t = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    out = duplicate_passages(docs, window=8, stride=4, min_count=2).collect()
    # starts 0,4,8,12 per doc -> 8 rows, all n_occurrences=2, n_docs=2
    assert len(out) == 8
    assert all(r.n_occurrences == 2 and r.n_docs == 2 for r in out)
    # digest variants flag the same (doc, offset) set: xxhash64 is the
    # scale default (8-byte shuffle rows), md5 the oracle-checkable form
    md5_out = duplicate_passages(docs, window=8, stride=4, digest="md5").collect()
    assert {(r.doc_id, r.token_start) for r in md5_out} == \
        {(r.doc_id, r.token_start) for r in out}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        duplicate_passages(docs, digest="sha1")


# --- duplicate_clusters (connected components over pairs) -------------------

def _pairs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id_a", "id_b"]))


def test_duplicate_clusters_chain_transitivity(spark):
    """A 5-vertex chain (diameter 4) needs >1 propagation round; the whole
    chain must land in one cluster rooted at the min id."""
    from anycrawl_spark.operators.dedup import duplicate_clusters

    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])
    out = {r.doc_id: r for r in duplicate_clusters(pairs).collect()}
    assert {r.cluster_id for r in out.values() if r.doc_id <= 5} == {1}
    assert all(out[i].cluster_size == 5 for i in (1, 2, 3, 4, 5))
    assert out[10].cluster_id == 10 and out[10].cluster_size == 2
    assert {i for i, r in out.items() if r.is_canonical} == {1, 10}


def test_duplicate_clusters_symmetric_and_duplicate_edges(spark):
    """Repeated and reversed input pairs collapse to the same components."""
    from anycrawl_spark.operators.dedup import duplicate_clusters

    pairs = _pairs(spark, [(7, 3), (3, 7), (3, 7), (3, 9)])
    out = {r.doc_id: (r.cluster_id, r.cluster_size) for r in duplicate_clusters(pairs).collect()}
    assert out == {3: (3, 3), 7: (3, 3), 9: (3, 3)}


def test_duplicate_clusters_string_ids(spark):
    """Labels are generic: string doc ids order lexicographically."""
    from anycrawl_spark.operators.dedup import duplicate_clusters

    pairs = _pairs(spark, [("b", "c"), ("a", "c")])
    out = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    assert out == {"a": "a", "b": "a", "c": "a"}


def test_duplicate_clusters_nonconvergence_raises(spark):
    """A diameter-4 chain cannot converge in 2 rounds (hash-min moves the min
    one hop per round, plus the final no-change round) — must raise, never
    return partial clusters."""
    import pytest

    from anycrawl_spark.operators.dedup import duplicate_clusters

    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iters=2)


def test_duplicate_clusters_matches_union_find(spark):
    """Randomized cross-check: components from label propagation must equal a
    pure-Python union-find on the same edge set (fixed seed, mixed topology —
    cliques, chains, stars, isolated pairs)."""
    import random

    from anycrawl_spark.operators.dedup import duplicate_clusters

    rng = random.Random(20260818)
    nodes = list(range(200))
    edges = []
    # random sparse edges -> long chains + odd shapes
    for _ in range(120):
        a, b = rng.sample(nodes, 2)
        edges.append((min(a, b), max(a, b)))
    # a guaranteed 12-node chain (diameter 11) and an 8-clique
    chain = rng.sample(range(200, 260), 12)
    edges += list(zip(chain, chain[1:]))
    clique = rng.sample(range(300, 340), 8)
    edges += [(min(a, b), max(a, b)) for i, a in enumerate(clique) for b in clique[i + 1:]]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}

    out = {r.doc_id: r for r in duplicate_clusters(_pairs(spark, edges)).collect()}
    assert {k: v.cluster_id for k, v in out.items()} == expected
    from collections import Counter

    sizes = Counter(expected.values())
    assert all(r.cluster_size == sizes[r.cluster_id] for r in out.values())
    assert all(r.is_canonical == (k == r.cluster_id) for k, r in out.items())
