"""Large-star/small-star connected components (Kiveris et al. 2014) —
the O(log n)-round upgrade over hash-min label propagation for
adversarially long duplicate chains (dedup.connected_components_star).

Cross-checks: hand topologies, a pure-Python union-find on a random
mixed graph, agreement with duplicate_clusters on its own shapes, and
the headline case — a 512-vertex path that label propagation cannot
finish within its default round budget but star resolves in O(log n).
"""

import random

import pytest

from anycrawl_spark.operators.dedup import (
    connected_components_star,
    duplicate_clusters,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a: string, id_b: string"
    ) if edges and isinstance(edges[0][0], str) else spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a: long, id_b: long"
    )


def test_star_chain_and_isolated_pair(spark):
    out = {
        r.doc_id: r
        for r in connected_components_star(
            _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])
        ).collect()
    }
    assert {r.cluster_id for r in out.values() if r.doc_id <= 5} == {1}
    assert all(out[i].cluster_size == 5 for i in (1, 2, 3, 4, 5))
    assert out[10].cluster_id == 10 and out[10].cluster_size == 2
    assert {i for i, r in out.items() if r.is_canonical} == {1, 10}


def test_star_symmetric_duplicate_edges_and_string_ids(spark):
    out = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in connected_components_star(
            _pairs(spark, [("b", "c"), ("c", "b"), ("a", "c"), ("a", "c")])
        ).collect()
    }
    assert out == {"a": ("a", 3), "b": ("a", 3), "c": ("a", 3)}


def test_star_matches_union_find_random_graph(spark):
    """Same randomized harness as the label-prop test, fresh seed: cliques,
    chains, stars, isolated pairs — star output must equal union-find."""
    rng = random.Random(20260821)
    edges = []
    for _ in range(150):
        a, b = rng.sample(range(250), 2)
        edges.append((min(a, b), max(a, b)))
    chain = rng.sample(range(300, 400), 20)
    edges += list(zip(chain, chain[1:]))
    clique = rng.sample(range(500, 540), 7)
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

    out = {r.doc_id: r for r in connected_components_star(_pairs(spark, edges)).collect()}
    assert {k: v.cluster_id for k, v in out.items()} == expected
    from collections import Counter

    sizes = Counter(expected.values())
    assert all(r.cluster_size == sizes[r.cluster_id] for r in out.values())
    assert all(r.is_canonical == (k == r.cluster_id) for k, r in out.items())


def test_star_agrees_with_label_propagation(spark):
    """Both algorithms are exact — identical output on a shape label-prop
    can still handle (diameter 6)."""
    edges = [(i, i + 1) for i in range(1, 7)] + [(20, 21), (21, 22), (20, 22)]
    pairs = _pairs(spark, edges)
    a = {(r.doc_id, r.cluster_id, r.cluster_size, r.is_canonical)
         for r in duplicate_clusters(pairs).collect()}
    b = {(r.doc_id, r.cluster_id, r.cluster_size, r.is_canonical)
         for r in connected_components_star(pairs).collect()}
    assert a == b


def test_star_long_chain_beyond_labelprop_budget(spark):
    """A 512-vertex path (diameter 511): label propagation's default
    25-round budget must raise; star must resolve it — and within the
    O(log n) alternation bound, not the diameter."""
    edges = [(i, i + 1) for i in range(512)]
    pairs = _pairs(spark, edges)
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs)
    out = connected_components_star(pairs, max_iters=20).collect()
    assert len(out) == 513
    assert {r.cluster_id for r in out} == {0}
    assert all(r.cluster_size == 513 for r in out)
    assert sum(r.is_canonical for r in out) == 1


def test_star_nonconvergence_budget_raises(spark):
    """max_iters=1 cannot finish a diameter-8 path — must raise, never
    return partial clusters."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(pairs, max_iters=1)
