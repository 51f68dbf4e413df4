"""Link-graph centrality for frontier prioritization (integer-mass PageRank).

AnyCrawl's frontier pops URLs in queue order within per-host politeness
buckets (`RequestQueueV2`-style FIFO; see `crawl/superstep.py` for the
rebuilt ordering). A production crawler at 10^10 URLs additionally wants a
GLOBAL priority signal — crawl well-linked pages first — which the
reference leaves to queue insertion order. This module adds the classic
signal: PageRank over the observed link graph, recomputed periodically
from the crawl's own `links` output and joined back onto the frontier as
a priority column.

Two design decisions, both about determinism and scale:

1. **Exact integer mass, not floats.** Every node starts with ``m0``
   integer mass units; one round moves ``(mass * damp_num) div
   (damp_den * outdeg)`` units along each out-edge (per-edge floor) and
   refills every node with the constant teleport ``m0 * (damp_den -
   damp_num) div damp_den``. Integer addition is associative, so the
   per-destination sum is independent of shuffle/partition order — the
   result is BIT-IDENTICAL across runs, partitionings, and engines
   (the DuckDB oracle re-runs the same unrolled rounds and must match
   exactly; float PageRank could never hash-match across engines because
   reduction order differs). Rounding loss per edge is < 1 unit, i.e.
   < outdeg/m0 relative — with m0 = 10^12 that is noise far below any
   ranking decision. Overflow headroom: a node's mass is bounded by the
   total injected mass ``n * m0``; ``mass * damp_num`` must stay under
   2^63, so m0 = 10^12 is safe to n ~ 10^8 nodes and m0 = 10^9 to
   n ~ 10^11 — the caller picks m0 for the corpus (documented in
   docs/SCALE.md).

2. **Pregel shape, same as duplicate-cluster resolution.** Each round is
   ONE shuffle join of the (src, dst, outdeg) edge table with the rank
   frame on src + ONE groupBy(dst) sum — both sides carry fixed-width
   ints only. Edges are persisted once and reused every round; the rank
   frame is ``localCheckpoint``-ed per round to truncate lineage (the
   same pattern as `dedup.duplicate_clusters`). No driver-side collect
   anywhere. Dangling nodes (no out-edges after self-loop removal) keep
   their teleport refill and silently drop their damped mass — the
   standard "sink mass" simplification; redistribution would need a
   global scalar per round and changes no ordering at our fanouts.

The synthetic graph generator exists so tests and the oracle can build
the SAME graph from the `documents` table with pure int64 arithmetic
(multiplicative mixing, no hash functions a SQL dialect might lack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Knuth's multiplicative-hash constant (2654435761 = floor(2^32/phi)),
#: public domain folklore; any odd multiplier works — the tests pin it.
_MIX_A = 2654435761
_MIX_B = 40503
_MIX_C = 12345
_MIX_MOD = 2147483647


def synthetic_link_graph(
    docs: DataFrame, n_nodes: int, fanout: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic pseudo-random digraph over ``docs``'s id column:
    each node emits ``fanout`` edges to ``((id*A + (j+1)*B + C) % M) %
    n_nodes``; self-loops dropped, parallel edges collapsed. Pure int64
    column math — the DuckDB oracle regenerates it bit-exactly."""
    j = F.explode(F.sequence(F.lit(0), F.lit(fanout - 1))).alias("j")
    e = docs.select(F.col(id_col).cast("long").alias("src"), j)
    dst = (
        (F.col("src") * _MIX_A + (F.col("j") + 1) * _MIX_B + _MIX_C) % _MIX_MOD
    ) % n_nodes
    return (
        e.select("src", dst.cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iterations: int = 3,
    m0: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Integer-mass PageRank (see module docstring for the arithmetic).

    ``edges`` = (src, dst) int64, assumed deduped/self-loop-free;
    ``nodes`` = one ``id`` column (defaults to the endpoints of
    ``edges``, but a frontier pass should hand the full URL/node table so
    isolated nodes still rank). Returns (id, rank_mass, out_deg, in_deg)
    — all exact int64, shuffle-order independent."""
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    nodes = nodes.select(F.col("id").cast("long")).localCheckpoint(eager=True)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (src, dst, outdeg) reused every round — persist once.
    ed = edges.join(outdeg, "src").persist()
    teleport = m0 * (damp_den - damp_num) // damp_den

    ranks = nodes.select("id", F.lit(int(m0)).cast("long").alias("mass"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                "dst",
                F.expr(f"(mass * {damp_num}) div ({damp_den} * outdeg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .select(
                "id",
                (F.lit(int(teleport)) + F.coalesce(F.col("in_mass"), F.lit(0)))
                .cast("long")
                .alias("mass"),
            )
            .localCheckpoint(eager=True)
        )

    indeg = edges.groupBy("dst").agg(F.count("*").alias("in_deg"))
    out = (
        ranks.join(outdeg, ranks["id"] == outdeg["src"], "left")
        .select("id", "mass", F.coalesce("outdeg", F.lit(0)).alias("out_deg"))
        .join(indeg, F.col("id") == indeg["dst"], "left")
        .select(
            "id",
            F.col("mass").alias("rank_mass"),
            F.col("out_deg").cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )
    ed.unpersist()
    return out


def pagerank_int_sequential(
    edges: list[tuple[int, int]],
    node_ids: list[int],
    iterations: int = 3,
    m0: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> dict[int, int]:
    """Single-process reference implementation (same integer arithmetic,
    plain dicts) — the differential-test oracle for `pagerank_int`."""
    outdeg: dict[int, int] = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    teleport = m0 * (damp_den - damp_num) // damp_den
    mass = {v: m0 for v in node_ids}
    for _ in range(iterations):
        incoming: dict[int, int] = {}
        for s, d in edges:
            c = (mass.get(s, 0) * damp_num) // (damp_den * outdeg[s])
            incoming[d] = incoming.get(d, 0) + c
        mass = {v: teleport + incoming.get(v, 0) for v in node_ids}
    return mass
