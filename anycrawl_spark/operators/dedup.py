"""Deduplication operators for training-data pipelines over ``documents``.

Five families, each scale-designed:

- **exact**: md5-fingerprint groupBy, keep min doc_id. One shuffle on the
  16-byte hash; at 100 TB the shuffle carries (hash, doc_id) only — never the
  text (project before shuffle).
- **MinHash + LSH**: shingle -> per-seed min of md5(seed||shingle) -> band the
  signature -> join on (band, band_hash) -> candidate pairs -> exact Jaccard
  verify. All JVM-side higher-order functions; the only join is on band
  buckets (tiny vs all-pairs). This is the standard scale path for near-dup:
  candidates ~ O(true dups), not O(n^2).
- **SimHash**: 64-bit bitwise-majority of token hashes via bit-position
  explode + groupBy — Hamming-near docs bucket by simhash prefix.
- **n-gram Jaccard**: exact verify kernel used by LSH; also exposed directly
  with a length-bucket blocking key for small candidate sets.

- **passage-level exact-substring** (``duplicate_passages``): Lee et al.
  2021 ExactSubstr recast as stride-window fingerprint groupBy — finds
  verbatim passages REPEATED WITHIN otherwise-distinct documents, which
  none of the doc-level families can.

MinHash/exact/jaccard/passage are DuckDB-oracle-checkable (md5 on both
engines); SimHash uses xxhash64 (JVM) => value-checked via the md5
variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anycrawl_spark.functions.text import fingerprint, shingles

MINHASH_SEEDS = 12
LSH_BANDS = 4  # 3 rows per band


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) texts: (fingerprint, n_docs, keep_id)."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row (min id) per distinct normalized text."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(id_col)
    return docs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_seeds: int = MINHASH_SEEDS,
    k: int = 3,
) -> DataFrame:
    """(id, seed, minhash) — minhash = min over shingles of md5(seed||shingle).

    Stays JVM-side: shingling + per-seed min via higher-order functions on the
    shingle array — no explode, no Python. One row per (doc, seed).
    """
    sh = docs.select(F.col(id_col), shingles(F.col(text_col), k).alias("sh"))

    def _hasher(seed: int):
        # single-arg lambda required: 2-arg form means (element, index) in Spark
        return lambda x: F.md5(F.concat(F.lit(f"{seed}|"), x))

    per_seed = [
        F.struct(
            F.lit(s).alias("seed"),
            F.array_min(F.transform(F.col("sh"), _hasher(s))).alias("minhash"),
        )
        for s in range(num_seeds)
    ]
    return (
        sh.select(F.col(id_col), F.explode(F.array(*per_seed)).alias("ms"))
        .select(id_col, F.col("ms.seed").alias("seed"), F.col("ms.minhash").alias("minhash"))
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_seeds: int = MINHASH_SEEDS,
    bands: int = LSH_BANDS,
    k: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs (id_a < id_b) sharing >=1 LSH band bucket."""
    sig = minhash_signatures(docs, id_col, text_col, num_seeds, k)
    banded = band_index(sig, id_col, num_seeds, bands)
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def band_index(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_seeds: int = MINHASH_SEEDS,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """(id, band, band_hash) from a (id, seed, minhash) signature table —
    the persistable LSH index. ``lsh_candidate_pairs`` derives it inline;
    the incremental path stores it (O(bands) fixed-width rows per doc)
    and joins each new crawl slice against it."""
    rows_per_band = num_seeds // bands
    return (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws("|", F.sort_array(F.collect_list("minhash")))
            ).alias("band_hash")
        )
    )


def incremental_near_duplicates(
    new_sigs: DataFrame,
    old_sigs: DataFrame,
    id_col: str = "doc_id",
    num_seeds: int = MINHASH_SEEDS,
    bands: int = LSH_BANDS,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dups of a NEW crawl slice against the EXISTING corpus, from
    signature state alone — the shape a continuously-ingesting pipeline
    actually runs: the corpus side is never re-shingled, never re-read;
    its persisted (id, seed, minhash) table (~num_seeds fixed-width rows
    per document, O(corpus) but text-free) IS the dedup state, and each
    ingest appends the new slice's signatures to it.

    Candidates: band-bucket join of the new slice's band index against
    the stored corpus band index — O(matching buckets), never all-pairs.
    Verification: signature-estimated Jaccard (fraction of agreeing
    minhash seeds — the standard unbiased MinHash estimator), so no text
    or shingle sets are needed for the old side. est_jaccard resolution
    is 1/num_seeds; callers wanting exact Jaccard re-join flagged NEW
    docs' texts only (O(candidates)).

    Returns (new_id, old_id, est_jaccard >= threshold). Pure JVM; the
    seed-agreement join carries (pair, seed) fixed-width rows.
    """
    new_b = band_index(new_sigs, id_col, num_seeds, bands).select(
        F.col(id_col).alias("new_id"), "band", "band_hash"
    )
    old_b = band_index(old_sigs, id_col, num_seeds, bands).select(
        F.col(id_col).alias("old_id"), "band", "band_hash"
    )
    cand = (
        new_b.join(old_b, ["band", "band_hash"])
        .select("new_id", "old_id")
        .distinct()
    )
    ns = new_sigs.select(
        F.col(id_col).alias("new_id"), "seed", F.col("minhash").alias("mh_new")
    )
    os_ = old_sigs.select(
        F.col(id_col).alias("old_id"), "seed", F.col("minhash").alias("mh_old")
    )
    agree = (
        cand.join(ns, "new_id")
        .join(os_, ["old_id", "seed"])
        .groupBy("new_id", "old_id")
        .agg(
            F.round(
                F.sum((F.col("mh_new") == F.col("mh_old")).cast("int"))
                / F.lit(num_seeds),
                4,
            ).alias("est_jaccard")
        )
    )
    return agree.filter(F.col("est_jaccard") >= threshold)


def jaccard_pairs(
    pairs: DataFrame, docs: DataFrame,
    id_col: str = "doc_id", text_col: str = "text", k: int = 3,
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs: (id_a, id_b, jaccard)."""
    sh = docs.select(F.col(id_col), shingles(F.col(text_col), k).alias("sh"))
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .select(
            "id_a", "id_b",
            F.round(F.col("inter") / F.greatest(F.col("uni"), F.lit(1)), 4).alias("jaccard"),
        )
    )
    return out


def near_duplicates(
    docs: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_seeds: int = MINHASH_SEEDS,
    bands: int = LSH_BANDS,
    k: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates -> verified pairs."""
    cands = lsh_candidate_pairs(docs, id_col, text_col, num_seeds, bands, k)
    return jaccard_pairs(cands, docs, id_col, text_col, k).filter(
        F.col("jaccard") >= threshold
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc: majority vote over token xxhash64 bits.

    Shuffle profile: explode tokens -> explode 64 bit positions would be 64x
    rows; instead aggregate bit counts via a 64-element vector per token and
    sum element-wise with ``F.aggregate`` on the grouped token-hash array —
    one groupBy on the doc id only.
    """
    from anycrawl_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col),
        F.transform(tokens(F.lower(F.col(text_col))), lambda t: F.xxhash64(t)).alias("th"),
    )
    # Variable-shift bit math needs SQL expressions (the Python shiftleft/
    # shiftright wrappers only take literal shift amounts). All JVM-side:
    # bitcount[i] = sum over token hashes of bit i; simhash bit i set when
    # bitcount[i]*2 >= n_tokens (majority vote).
    sim = F.expr(
        "aggregate("
        "  zip_with("
        "    transform(sequence(0, 63),"
        "              i -> aggregate(th, 0, (acc, h) -> acc + int(shiftright(h, i) & 1))),"
        "    sequence(0, 63),"
        "    (cnt, i) -> IF(cnt * 2 >= size(th), shiftleft(1L, i), 0L)),"
        "  0L, (acc, x) -> acc | x)"
    )
    return toks.select(F.col(id_col), sim.alias("simhash"), F.size("th").alias("n_tokens"))


def simhash_buckets(docs: DataFrame, prefix_bits: int = 16, **kw) -> DataFrame:
    """Bucket docs by simhash prefix — Hamming-near candidates co-bucket."""
    sh = simhash(docs, **kw)
    return sh.withColumn(
        "bucket", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    )


def simhash_md5(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash with an md5 token hash — the ORACLE-CHECKABLE variant.

    Token hash = the first 15 hex digits of md5(token) read as a base-16
    integer (< 2^60, so the arithmetic never overflows BIGINT under ANSI
    mode); simhash bit i is the majority vote of bit i over token hashes.
    Both md5 and the digit arithmetic are bit-identical in DuckDB, so the
    whole pipeline is value-hash verifiable (the xxhash64 variant in
    :func:`simhash` stays as the fast JVM path — same shape, same shuffle
    profile: one groupBy-free aggregate per doc).
    """
    from anycrawl_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("tk")
    ).filter(F.size("tk") > 0)
    th = F.expr(
        "transform(tk, t -> aggregate("
        "  transform(sequence(1, 15),"
        "            d -> bigint(instr('0123456789abcdef', substr(md5(t), d, 1)) - 1)),"
        "  0L, (acc, x) -> acc * 16 + x))"
    )
    sim = F.expr(
        "aggregate("
        "  zip_with("
        "    transform(sequence(0, 59),"
        "              i -> aggregate(th60, 0, (acc, h) -> acc + int(shiftright(h, i) & 1))),"
        "    sequence(0, 59),"
        "    (cnt, i) -> IF(cnt * 2 >= size(th60), shiftleft(1L, i), 0L)),"
        "  0L, (acc, x) -> acc | x)"
    )
    return (
        toks.withColumn("th60", th)
        .select(F.col(id_col), sim.alias("simhash60"), F.size("th60").alias("n_tokens"))
    )


def _propagate_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One hash-min round: every vertex takes min(own label, neighbour labels).

    Shape (audited in scripts/explain_plans.py): shuffle join on dst + a
    two-phase groupBy(src) min — fixed-width id/label columns only — then a
    left join back onto labels. Pure JVM; no python stage."""
    nbr_min = (
        edges.join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("dlabel")),
            "dst",
        )
        .groupBy("src")
        .agg(F.min("dlabel").alias("nbr_min"))
    )
    return labels.join(nbr_min.withColumnRenamed("src", "id"), "id", "left").select(
        "id",
        F.least(F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))).alias("label"),
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS (connected components).

    The pair-producing families (LSH+Jaccard verify, embedding near-dup,
    SimHash buckets) emit edges; an actual dedup pass needs components:
    if A~B and B~C, then {A, B, C} is ONE cluster and exactly one document
    survives. This is the keep/drop decision stage of the pipeline —
    cluster_id = min member id, is_canonical marks the survivor (the
    min-id keep rule every family here already uses).

    Algorithm: hash-min label propagation. Every vertex starts labelled
    with its own id; each round every vertex takes the min of its own
    label and its neighbours' labels; converged when no label changes.
    Rounds needed = max component DIAMETER, and near-dup components are
    near-cliques (LSH+verify emits most intra-cluster pairs directly), so
    2-4 rounds is typical regardless of corpus size. For adversarial
    long-chain graphs the O(log n)-round alternating large-star/small-star
    algorithm (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond", public) is the known upgrade — not needed for dedup graphs,
    documented so the trade-off is explicit.

    Scale shape, per round: ONE shuffle join of edges with labels on the
    dst id + ONE groupBy(src) min — both carry two fixed-width columns,
    never text; plus one O(V) convergence count. The label frame is
    ``localCheckpoint``-ed each round to truncate lineage (iterative plans
    otherwise grow unboundedly); on a real cluster with a checkpoint dir,
    reliable ``checkpoint`` is the drop-in upgrade. Edges are persisted
    once and reused every round. No driver-side collect anywhere — the
    convergence signal is a count, not the data.

    Raises RuntimeError if not converged within ``max_iters`` (silent
    partial clusters would under-delete duplicates).

    Returns (id_col, cluster_id, cluster_size, is_canonical) for every
    document that appears in >= 1 pair (singletons are their own trivial
    cluster and never reach this operator).
    """
    sym = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).distinct()
    edges = sym.persist()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iters):
        new_labels = _propagate_round(edges, labels).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters; raise max_iters or use "
            "large-star/small-star)"
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("id").alias(id_col),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al. 2014, public).

    For every node u with neighbour set N(u): connect every STRICTLY LARGER
    neighbour v > u to m(u) = min(N(u) + {u}). Input/output are SYMMETRIC
    edge lists held as (u, v) rows with both directions present.

    Shape: ONE two-phase groupBy(u) min + ONE shuffle join back on u +
    distinct — fixed-width id columns only, pure JVM.
    """
    mins = (
        edges.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", "u").alias("m"))
    )
    out = (
        edges.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient edges large->small, then for every node u
    connect all of its SMALLER-OR-EQUAL neighbours (and u itself) to
    m(u) = min over that set. Output is a directed (child, parent) list with
    child > parent."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    j = directed.join(mins, "u")
    # (v, m) for every small neighbour v != m, plus (u, m)
    out = (
        j.filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(j.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def connected_components_star(
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 40,
) -> DataFrame:
    """Connected components via alternating large-star/small-star — the
    O(log n)-round algorithm of Kiveris et al. 2014 ("Connected Components
    in MapReduce and Beyond", public) that ``duplicate_clusters``'s
    docstring names as the long-chain upgrade. Hash-min label propagation
    converges in diameter rounds — fine for near-clique dedup components,
    quadratic-wall on adversarial chains (a 10^4-long chain of pairwise
    near-dup boilerplate pages is 10^4 rounds). Large/small-star halves
    component "height" every alternation, so rounds = O(log n) REGARDLESS
    of diameter.

    Same input/output contract as ``duplicate_clusters``: pairs
    (id_a, id_b) in, (id_col, cluster_id, cluster_size, is_canonical) out,
    cluster_id = min member id. Cross-checked against label propagation and
    a driver-side union-find in tests/test_dedup_clusters_star.py.

    Scale shape, per alternation: large-star is one two-phase groupBy min +
    one shuffle join + distinct; small-star the same over the directed
    orientation — every exchange carries two fixed-width id columns, never
    text. Convergence is detected on the small-star output (already a
    (child, parent) star forest when fixed): ONE count of changed rows via
    a full-row subtract, O(E) fixed-width. ``localCheckpoint`` truncates
    the iterative lineage each round (reliable ``checkpoint`` on a real
    cluster). Raises RuntimeError if not converged in ``max_iters``
    (log2(10^10) ~ 34 alternations bounds any realistic component).
    """
    sym = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    vertices = sym.select(F.col("u").alias("id")).distinct().localCheckpoint(eager=True)
    star = sym.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    converged = False
    for _ in range(max_iters):
        ls = _large_star(star.unionByName(star.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct())
        new_star = _small_star(ls).localCheckpoint(eager=True)
        changed = (
            new_star.subtract(star).limit(1).count()
            + star.subtract(new_star).limit(1).count()
        )
        star = new_star
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "alternations (unexpected: rounds are O(log n)); raise max_iters"
        )
    # star is now a (child, parent) forest of height 1: parent = component min
    labels = vertices.join(
        star.select(F.col("u").alias("id"), F.col("v").alias("label")), "id", "left"
    ).select("id", F.coalesce("label", "id").alias("label"))
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("id").alias(id_col),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )


def duplicate_passages(
    docs: DataFrame,
    window: int = 20,
    stride: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    digest: str = "xxhash64",
) -> DataFrame:
    r"""Passage-level EXACT-substring dedup — the fifth dedup family.

    The reference point is the ExactSubstr dedup of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499, public), which finds verbatim passages repeated
    across a corpus with a suffix array. A suffix array is a single-node
    data structure; the Spark-native restatement fingerprints every
    ``stride``-th window of ``window`` whitespace tokens and groups on the
    fingerprint: any window whose digest occurs >= ``min_count`` times is
    a duplicated passage (stride trades recall granularity for cost; with
    stride=1 it is exhaustive over token offsets).

    Scale shape: window construction is pure JVM higher-order functions
    (split -> sequence -> transform(slice + hash) -> posexplode), so ONLY
    (doc_id, digest, token_start) rows ever reach the shuffle — never
    window text. The digests are near-unique, so map-side partial
    aggregation cannot shrink the shuffle: its size is O(tokens/stride)
    fixed-width rows and the per-row width is the lever. The default
    ``digest="xxhash64"`` ships an 8-byte long (~24 B/row: at a 25T-token
    100 TB corpus with stride 5 that is ~120 TB of shuffle — heavy but
    linear and embarrassingly partitioned; double the stride to halve it).
    ``digest="md5"`` ships the 32-char hex string instead (~2.3x the
    shuffle) and exists because DuckDB computes identical md5 — it is the
    oracle-checkable variant (q_duplicate_passages); both variants share
    every other plan node. The dup-digest join back is on the digest
    (candidates ~ O(true duplicate windows)).

    Collision honesty: both digests make this APPROXIMATE-exact — at 5e12
    windows a 64-bit digest expects ~n^2/2^65 = ~7e5 colliding unrelated
    window PAIRS (md5: ~0). Before deleting text on the output, recheck
    candidates against the window text (a join back to ``docs`` on
    (doc_id, token_start) — O(flagged windows), not O(corpus)).

    Tokenization is the explicit class ``[ \t\n\x0B\f\r]+`` rather
    than ``\s`` because Java and RE2 disagree on ``\s`` membership
    (Java includes vertical tab, RE2 does not) — the oracle splits with
    the byte-identical RE2 class.

    Returns (doc_id, token_start, digest, n_occurrences, n_docs) for every
    window that is part of a duplicated passage.
    """
    if digest not in ("xxhash64", "md5"):
        raise ValueError(f"digest must be 'xxhash64' or 'md5', got {digest!r}")
    hash_fn = F.md5 if digest == "md5" else F.xxhash64
    toks = F.split(F.col(text_col), "[ \t\n\x0B\f\r]+")
    starts = F.when(
        F.size("tk") >= window,
        F.sequence(F.lit(0), F.size("tk") - window, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    win = (
        docs.select(F.col(id_col), toks.alias("tk"))
        .select(F.col(id_col), F.posexplode(
            F.transform(
                starts,
                lambda i: hash_fn(
                    F.concat_ws(" ", F.slice(F.col("tk"), i + F.lit(1), F.lit(window)))
                ),
            )
        ).alias("w_idx", "digest"))
        .select(
            F.col(id_col),
            (F.col("w_idx") * stride).cast("bigint").alias("token_start"),
            "digest",
        )
    )
    dup = (
        win.groupBy("digest")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )
    return win.join(dup, "digest").select(
        id_col, "token_start", "digest", "n_occurrences", "n_docs"
    )


def source_overlap(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix — the curation view OVER the
    near-dup pair stream: roll verified pairs up by unordered source
    pair. Sixth consumer of the dedup stack (Dolma/RefinedWeb-style
    pipelines publish exactly this matrix to decide which overlapping
    corpus to keep). The labels join is broadcast-sized relative to
    pairs at contract scale and hash-co-partitioned at corpus scale;
    the rollup is one two-phase groupBy over (src_lo, src_hi)."""
    s = docs.select(F.col(id_col), F.col(source_col))
    a = s.withColumnRenamed(id_col, "id_a").withColumnRenamed(source_col, "_sa")
    b = s.withColumnRenamed(id_col, "id_b").withColumnRenamed(source_col, "_sb")
    joined = pairs.join(a, "id_a").join(b, "id_b")
    return (
        joined.select(
            F.least("_sa", "_sb").alias("src_lo"),
            F.greatest("_sa", "_sb").alias("src_hi"),
        )
        .groupBy("src_lo", "src_hi")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
