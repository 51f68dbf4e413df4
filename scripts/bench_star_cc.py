"""One-off scale evidence for connected_components_star vs label
propagation (BENCH/BASELINE.md session-5 section). Two topologies:

- near-clique components (the dedup shape): both algorithms converge;
  records both walls and asserts equal cluster assignments.
- one adversarial long chain: label propagation needs diameter rounds
  (structurally infeasible), star needs O(log n) alternations — records
  star's wall and verifies the single-cluster result.

Usage: python scripts/bench_star_cc.py [n_cliques] [chain_len]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    n_cliques = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000

    from anycrawl_spark.operators.dedup import (
        connected_components_star,
        duplicate_clusters,
    )
    from anycrawl_spark.session import get_spark

    spark = get_spark("bench-star-cc", cores=32, shuffle_partitions=64)
    out: dict = {"n_cliques": n_cliques, "chain_len": chain_len}

    # --- near-clique components: 3-cycles k, k+1, k+2 per component
    base = spark.range(n_cliques).select((F.col("id") * 3).alias("k"))
    cliq = (
        base.select(F.col("k").alias("id_a"), (F.col("k") + 1).alias("id_b"))
        .unionByName(base.select((F.col("k") + 1).alias("id_a"), (F.col("k") + 2).alias("id_b")))
        .unionByName(base.select(F.col("k").alias("id_a"), (F.col("k") + 2).alias("id_b")))
        .persist()
    )
    cliq.count()

    t0 = time.time()
    lp = duplicate_clusters(cliq)
    lp_n = lp.filter(F.col("is_canonical")).count()
    out["labelprop_clique_wall_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    st = connected_components_star(cliq)
    st_n = st.filter(F.col("is_canonical")).count()
    out["star_clique_wall_s"] = round(time.time() - t0, 2)
    assert lp_n == st_n == n_cliques, (lp_n, st_n)

    mismatch = (
        lp.select("doc_id", "cluster_id")
        .exceptAll(st.select("doc_id", "cluster_id"))
        .limit(1)
        .count()
    )
    assert mismatch == 0, "label-prop and star disagree on clique graph"
    out["outputs_equal"] = True
    cliq.unpersist()

    # --- adversarial chain: diameter = chain_len (label-prop infeasible)
    chain = (
        spark.range(chain_len)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .persist()
    )
    chain.count()
    t0 = time.time()
    sc = connected_components_star(chain)
    one = sc.filter(F.col("is_canonical")).count()
    sizes_ok = sc.filter(F.col("cluster_size") == chain_len + 1).count()
    out["star_chain_wall_s"] = round(time.time() - t0, 2)
    assert one == 1 and sizes_ok == chain_len + 1
    out["star_chain_rounds_bound"] = "O(log n); labelprop would need "
    out["labelprop_chain_rounds_needed"] = chain_len
    chain.unpersist()

    spark.stop()
    print(json.dumps(out))
    with open("BENCH/star_cc_last_run.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
