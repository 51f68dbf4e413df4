"""The crawl superstep driver: BFS rounds over snapshot tables.

Re-architecture of the reference's event-driven crawl loop (SURVEY §3.2 —
BullMQ worker + Crawlee RequestQueue + Redis counters, reference:
packages/scrape/src/Worker.ts, engines/Base.ts:314-457, managers/
Progress.ts) as deterministic Spark supersteps:

    per round r:
      pending  -> politeness window -> budget window -> (host-hash, salted)
               -> fetch (mapInPandas, simulated)  -> status classify (F7)
      ok       -> extract spans/links (mapInPandas) -> documents append
      links    -> posexplode -> canonicalize -> depth/scope/path/robots gates
               -> intra-round first-wins dedup -> bloom+anti-join vs seen
               -> discovery_seq assignment (window) -> frontier append
      retries  -> attempt+1, next_eligible_round = r + 2^attempt
      progress -> per-job aggregates -> finalize check -> snapshot commit

Scale design (explicit, per north_rule):
- The frontier snapshot holds PENDING rows only; terminal rows go to an
  append-only ``frontier_log`` (lineage). The per-round rewrite is O(pending),
  not O(all URLs ever seen) — at 10^10 URLs the pending set is the working
  set, and in Iceberg this becomes a MERGE writing only changed files.
- ``seen`` is append-only keys; dedup runs through sharded blooms
  (operators/seen.py) so the exact anti-join sees only bloom-positives.
- Fetch input is repartitioned by ``xxhash64(url)`` — this IS the salting:
  after the politeness window has enforced per-host caps, fetch rows are
  independent, so spreading a mega-host across partitions is free. The
  politeness window itself partitions by (job, host); its skew at mega-host
  scale is bounded because a host can contribute at most its pending rows,
  and the window is rank-then-filter (no buffering of the full partition in
  Python).
- Determinism: every ordering is an explicit sort key (depth, discovery_seq,
  link ordinal) — never partition iteration order. Same seeds => same crawl,
  byte-identical tables, which the parity + resume tests assert.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anycrawl_spark import synth
from anycrawl_spark.crawl.params import CrawlParams, is_retryable_col
from anycrawl_spark.operators.gates import (
    AUTO_SKEW_THRESHOLD_ROWS,
    ROBOTS_DIM_THRESHOLD_HOSTS,
    apply_robots_dim,
    detect_host_skew,
    dim_tokens_expr,
    make_candidate_gate,
    robots_dim_df,
    tokens_expr,
    with_dim_delays,
)
from anycrawl_spark.operators.seen import (
    BROADCAST_SHARDS_MAX_BYTES, ShardBroadcast, filter_fresh,
    merge_bloom_shards, with_dedup_key,
)
from anycrawl_spark.operators.spans import fetch_extract
from anycrawl_spark.functions.urls import canonicalize_url, url_host
from anycrawl_spark.schemas import FRONTIER, JOBS, PROGRESS
from anycrawl_spark.storage import SnapshotStore


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        jobs: list[dict],
        robots: list[dict],
        params: CrawlParams | None = None,
        web: synth.WebConfig = synth.DEFAULT_WEB,
        num_buckets: int = 32,
        fetch_partitions: int | None = None,
        profile: bool = False,
        two_phase_politeness: bool | str = "auto",
        auto_skew_threshold: int | None = None,
        shard_refresh_rounds: int = 8,
        tiered_proxies: list[list[str]] | None = None,
        proxy_rules: list | None = None,
        robots_mode: str = "auto",
        robots_dim: DataFrame | None = None,
        robots_dim_threshold_hosts: int | None = None,
    ):
        self.spark = spark
        self.store = SnapshotStore(workdir, spark)
        self.jobs = jobs
        self.params = params or CrawlParams()
        self.web = web
        self.num_buckets = num_buckets
        self.fetch_partitions = fetch_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        self.profile = profile
        # False = exact window, True = salted two-phase, "auto" (default) =
        # per-round skew detection (free while the crawl is small: the
        # driver-tracked enqueued total bounds every host partition)
        if two_phase_politeness not in (True, False, "auto"):
            raise ValueError(
                "two_phase_politeness must be True, False or 'auto' "
                f"(got {two_phase_politeness!r}); any other string would "
                "silently coerce truthy"
            )
        self.two_phase_politeness = two_phase_politeness
        self.auto_skew_threshold = (
            auto_skew_threshold if auto_skew_threshold is not None
            else AUTO_SKEW_THRESHOLD_ROWS
        )
        # small driver-side policy state (broadcast-sized; jobs dim, J3).
        # Rows marked wildcard=True (from functions/robots.py
        # robots_rows_from_texts — raw robots.txt with */$ patterns) route to
        # the RFC 9309 longest-match kernel; plain rows stay on the
        # longest-prefix fast path. A host lives in exactly one dict.
        #
        # Two robots regimes (docs/SCALE.md §robots):
        #   closure — rules ride as dicts inside the fused candidate gate
        #             (zero joins; right while the ruleset broadcasts, i.e.
        #             below ROBOTS_DIM_THRESHOLD_HOSTS distinct hosts);
        #   dim     — rules live ONLY in a host-keyed Spark table
        #             (self.robots_dim), resolved by a co-partitioned
        #             shuffle-hash join at admission time and a delay join
        #             in the scheduling stage. The driver keeps rules for
        #             the O(jobs) SEED hosts only.
        # "auto" picks by distinct-host count; pass robots_dim= directly for
        # the production shape (an Iceberg robots table, never a driver list).
        if robots_mode not in ("auto", "closure", "dim"):
            raise ValueError(
                f"robots_mode must be 'auto', 'closure' or 'dim' (got {robots_mode!r})"
            )
        dim_threshold = (
            robots_dim_threshold_hosts
            if robots_dim_threshold_hosts is not None
            else ROBOTS_DIM_THRESHOLD_HOSTS
        )
        n_robots_hosts = len({r["host"] for r in robots}) if robots else 0
        use_dim = robots_dim is not None or robots_mode == "dim" or (
            robots_mode == "auto" and n_robots_hosts > dim_threshold
        )
        self.robots_by_host: dict[str, list[tuple[str, str]]] = {}
        self.robots_rfc_by_host: dict[str, list[tuple[str, str]]] = {}
        self.host_delays: dict[str, int] = {}
        self.robots_dim: DataFrame | None = None
        if use_dim:
            self.robots_dim = (
                robots_dim if robots_dim is not None else robots_dim_df(spark, robots)
            ).persist()
            # driver needs rules for seed admission only — O(jobs) rows
            seed_hosts = [
                h for h in (
                    url_host(canonicalize_url(j["seed_url"]) or "") for j in jobs
                ) if h
            ]
            if seed_hosts:
                for row in self.robots_dim.filter(
                    F.col("host").isin(seed_hosts)
                ).collect():
                    rules = [(r["rule"], r["pattern"]) for r in row["rules"]]
                    if rules:
                        target = (
                            self.robots_rfc_by_host if row["wildcard"]
                            else self.robots_by_host
                        )
                        target[row["host"]] = rules
            # host_delays stays empty: scheduling tokens come from the dim
            # join (with_dim_delays + dim_tokens_expr), never a driver map
        else:
            for r in robots:
                target = (
                    self.robots_rfc_by_host if r.get("wildcard") else self.robots_by_host
                )
                target.setdefault(r["host"], []).append((r["rule"], r["path_prefix"]))
                if r.get("crawl_delay_ms"):
                    self.host_delays[r["host"]] = max(
                        self.host_delays.get(r["host"], 0), r["crawl_delay_ms"]
                    )
            for h in list(self.robots_rfc_by_host):
                # mixed host: precedence spans the whole ruleset, so the RFC
                # kernel (a superset of prefix matching on literal patterns)
                # takes all of it
                if h in self.robots_by_host:
                    self.robots_rfc_by_host[h] += self.robots_by_host.pop(h)
        self._candidate_gate = make_candidate_gate(
            jobs,
            {} if use_dim else self.robots_by_host,
            {} if use_dim else self.robots_rfc_by_host,
        )
        # F2 shouldScrapeUrl (Base.ts:465-495,992-1002): pages always crawl
        # and expand links, but only scrape_paths-matching pages persist a
        # document. Jobs without scrape_paths save everything (the common
        # case — the filter stage is skipped entirely then).
        self._scrape_paths_by_job = {
            j["job_id"]: list(j["scrape_paths"])
            for j in jobs
            if j.get("scrape_paths")
        }
        # the current-URL exclude quirk needs the parent URL in the gate;
        # without any excludes the column is a pruned-away constant (the
        # frontier hot path ships no extra Arrow data). Raw-array check:
        # exclude_paths=['  '] still triggers the quirk (Base.ts:361)
        from anycrawl_spark.functions.patterns import excludes_configured

        self._gate_needs_parent = any(
            excludes_configured(j.get("exclude_paths")) for j in jobs
        )
        self._scrape_gate = None
        if self._scrape_paths_by_job:
            scrape_map = self._scrape_paths_by_job

            @F.pandas_udf(T.BooleanType())
            def _scrape_gate(job_id: pd.Series, url: pd.Series) -> pd.Series:
                from anycrawl_spark.functions.patterns import should_scrape_url

                return pd.Series(
                    [
                        should_scrape_url(u, scrape_map.get(jid))
                        for jid, u in zip(job_id, url)
                    ]
                )

            self._scrape_gate = _scrape_gate
        self.max_depth_by_job = {j["job_id"]: j["max_depth"] for j in jobs}
        self.limit_by_job = {j["job_id"]: j["limit"] for j in jobs}
        # mutable per-job counters (recovered from progress on resume)
        self.done: dict[str, int] = {}
        self.enqueued: dict[str, int] = {}
        self.succeeded: dict[str, int] = {}
        self.failed: dict[str, int] = {}
        self.next_seq: dict[str, int] = {}
        self.pending: dict[str, int] = {}   # frontier pending-row count per job
        self.finalized: set[str] = set()
        self.round_stats: list[dict] = []
        # incremental bloom-shard state: maintained across rounds (per-round
        # cost is O(fresh keys + dirtied blobs), never O(|seen|) — see
        # operators/seen.py merge_bloom_shards). Lineage is reset from a full
        # parquet snapshot every shard_refresh_rounds to bound plan depth.
        self._shards = None
        self.shard_refresh_rounds = shard_refresh_rounds
        # Driver-cached shard broadcast, patched per round from dirty-gen
        # deltas only (O(dirty blobs) driver traffic, predecessor broadcast
        # unpersisted+destroyed). Dropped once the shard bytes outgrow the
        # broadcast cap — the probe then runs co-partitioned (cogroup regime).
        self._shard_bc = ShardBroadcast(spark)
        # S3/F12 retry ladder: attempt-indexed proxy tier stepping
        self.tiered_proxies = tiered_proxies or []
        self.proxy_rules = proxy_rules or []

    # ------------------------------------------------------------------ init

    def init_state(self) -> None:
        """Seed the frontier/seen tables (round -1 commit)."""
        rows = []
        seen_rows = []
        for j in self.jobs:
            jid = j["job_id"]
            self.done[jid] = 0
            self.succeeded[jid] = 0
            self.failed[jid] = 0
            seed = canonicalize_url(j["seed_url"])
            ok = seed is not None and self._robots_ok_driver(seed)
            if ok:
                rows.append(
                    (jid, seed, None, url_host(seed), 0, 0, None, 0,
                     "pending", 0, 0, 0.0)
                )
                seen_rows.append((jid, seed))
                self.enqueued[jid] = 1
                self.next_seq[jid] = 1
                self.pending[jid] = 1
            else:
                self.enqueued[jid] = 0
                self.next_seq[jid] = 0
                self.pending[jid] = 0
                self.finalized.add(jid)
        frontier = self.spark.createDataFrame(rows, FRONTIER)
        # url_hash is always assigned JVM-side for consistency
        frontier = frontier.withColumn("url_hash", F.xxhash64("url"))
        self.store.write("frontier", frontier)
        seen = self.spark.createDataFrame(seen_rows, "job_id string, url string")
        seen = seen.select(
            "job_id", F.xxhash64("url").alias("url_hash"), F.lit(-1).alias("first_round")
        )
        self.store.append("seen", seen, round_no=-1)
        seed_keyed = with_dedup_key(seen, self.num_buckets)
        seed_dirty = [
            r.bucket for r in seed_keyed.select("bucket").distinct().collect()
        ]
        self._commit_shard_delta(
            merge_bloom_shards(None, seed_keyed, dirty_buckets=seed_dirty), -1
        )
        jobs_df = self.spark.createDataFrame(
            [tuple(j[f.name] for f in JOBS.fields) for j in self.jobs], JOBS
        )
        self.store.write("jobs", jobs_df)
        self.store.append(
            "webhook_events",
            self.spark.createDataFrame(
                [(j["job_id"], "crawl.started", -1) for j in self.jobs],
                "job_id string, event string, round int",
            ),
            round_no=-1,
        )
        # round -1 progress baseline so resume() recovers init-time state
        self.store.append(
            "progress",
            self.spark.createDataFrame(
                [
                    (j["job_id"], -1, self.enqueued[j["job_id"]], 0, 0, 0,
                     j["job_id"] in self.finalized, self.next_seq[j["job_id"]])
                    for j in self.jobs
                ],
                PROGRESS,
            ),
            round_no=-1,
        )
        self.store.commit_round(-1)

    def _robots_ok_driver(self, url: str) -> bool:
        from anycrawl_spark.crawl.params import robots_decision, robots_target

        host = url_host(url)
        rules = self.robots_by_host.get(host)
        if rules:
            return robots_decision(rules, robots_target(url))
        rfc = self.robots_rfc_by_host.get(host)
        if rfc:
            from anycrawl_spark.functions.robots import robots_allowed_rfc

            return robots_allowed_rfc(rfc, robots_target(url))
        return True

    # ----------------------------------------------------- shard maintenance

    def _commit_shard_delta(self, merged, rnd: int) -> None:
        """Swap in the round's new shard state; persist ONLY dirty generations.

        ``merged`` is MERGED_SHARD_SCHEMA rows (full state + updated flag).
        The append log gets just the updated rows (the Iceberg-MERGE analog:
        per-round write cost is O(dirtied blobs), not O(all shards)); the
        in-memory state is the cached full DataFrame. Every
        ``shard_refresh_rounds`` the full state is rewritten as a snapshot and
        reloaded so cross-round lineage depth stays bounded.
        """
        # localCheckpoint truncates lineage to a leaf plan: the merge
        # references the previous state TWICE (dirty cogroup + clean
        # pass-through), so without truncation the logical plan DOUBLES per
        # round and Catalyst analysis goes exponential (measured: 2 s -> 220 s
        # per round by round 6). Eager checkpoint = one materializing job;
        # every later use (probe broadcast, next merge, the delta append)
        # reads executor-local blocks. Production (Iceberg) reads the shard
        # table fresh per round, which is the same leaf-plan property.
        new_state = merged.localCheckpoint(eager=True)
        delta = new_state.filter(F.col("updated"))
        self.store.append(
            "bloom_shards",
            delta.select(
                "bucket", "gen", "n_keys", "bloom", F.lit(rnd).alias("round")
            ),
            round_no=rnd,
        )
        # Patch the cached probe broadcast from the SAME dirty generations —
        # collect cost O(dirty blobs), never the full shard state. Past the
        # broadcast cap the map is dropped for good (filter_fresh's auto
        # strategy switches to the cogroup probe at the same threshold).
        if self._shard_bc is not None:
            self._shard_bc.apply_delta(delta.select("bucket", "gen", "bloom").collect())
            if self._shard_bc.nbytes > BROADCAST_SHARDS_MAX_BYTES:
                self._shard_bc.close()
                self._shard_bc = None
        if (rnd + 1) % self.shard_refresh_rounds == 0:
            # periodic full snapshot: bounds resume replay (resume = snapshot
            # + committed deltas after it), not needed for lineage anymore
            self.store.write(
                "bloom_shards_state",
                new_state.select(
                    "bucket", "gen", "n_keys", "bloom", F.lit(rnd).alias("round")
                ),
            )
        self._shards = new_state.select("bucket", "gen", "n_keys", "bloom")

    def _load_shard_state(self):
        """Reconstruct shard state on resume: last full snapshot + replay of
        committed per-round deltas after it (last-writer-wins per bucket/gen).
        Returns None for stores that predate the shard log (callers fall back
        to a one-time rebuild from the seen table)."""
        cols = ["bucket", "gen", "n_keys", "bloom", "round"]
        state_round = -2
        parts = []
        try:
            snap = self.store.read("bloom_shards_state").select(*cols)
            state_round = snap.select(F.max("round")).first()[0]
            parts.append(snap)
        except KeyError:
            pass
        log = self.store.read_appends("bloom_shards")
        if log is not None:
            parts.append(log.select(*cols).filter(F.col("round") > state_round))
        if not parts:
            return None
        allrows = parts[0]
        for d in parts[1:]:
            allrows = allrows.unionByName(d)
        w = Window.partitionBy("bucket", "gen").orderBy(F.col("round").desc())
        return (
            allrows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("bucket", "gen", "n_keys", "bloom")
            .persist()
        )

    # ---------------------------------------------------------------- resume

    def resume(self) -> int:
        """Recover driver counters from the last committed round; return the
        next round number to run (north_rule: resumable from snapshots)."""
        self.store.rollback_to_committed()
        last = self.store.last_round
        prog = self.store.read_appends("progress")
        for j in self.jobs:
            jid = j["job_id"]
            self.done[jid] = 0
            self.enqueued[jid] = 0
            self.succeeded[jid] = 0
            self.failed[jid] = 0
            self.next_seq[jid] = 0
            self.pending[jid] = 0
        if prog is not None:
            w = Window.partitionBy("job_id").orderBy(F.col("round").desc())
            latest = (
                prog.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .collect()
            )
            for r in latest:
                self.done[r.job_id] = r.done
                self.enqueued[r.job_id] = r.enqueued
                self.succeeded[r.job_id] = r.succeeded
                self.failed[r.job_id] = r.failed
                self.next_seq[r.job_id] = r.next_seq
                if r.finalized:
                    self.finalized.add(r.job_id)
        # pending counts recovered from the frontier snapshot itself
        for r in (
            self.store.read("frontier").groupBy("job_id").count().collect()
        ):
            self.pending[r.job_id] = r["count"]
        self._shards = self._load_shard_state()
        # One-time seed of the cached probe broadcast from the recovered
        # state (bounded by the broadcast cap via the tracked seen count —
        # past it, stay in the cogroup regime and never build the map).
        est_bytes = sum(self.enqueued.values()) * 10 // 8
        if self._shards is None or est_bytes > BROADCAST_SHARDS_MAX_BYTES:
            if self._shard_bc is not None:
                self._shard_bc.close()
                self._shard_bc = None
        else:
            self._shard_bc = ShardBroadcast(self.spark)
            self._shard_bc.apply_delta(
                self._shards.select("bucket", "gen", "bloom").collect()
            )
        return last + 1

    # ------------------------------------------------------------------ run

    def run(self, max_rounds: int | None = None) -> None:
        start = self.store.last_round + 1
        limit_rounds = max_rounds if max_rounds is not None else self.params.max_rounds
        for r in range(start, start + limit_rounds):
            if len(self.finalized) == len(self.jobs):
                break
            self.run_round(r)

    def _politeness_two_phase(self, frontier: DataFrame) -> bool:
        """Resolve the per-round politeness strategy. ``auto`` costs nothing
        while the crawl is small: the driver-tracked total-enqueued counter
        upper-bounds every (job, host) pending partition, so the sampled
        detection job only ever runs once the crawl could actually be
        skewed past the window-sort crossover."""
        mode = self.two_phase_politeness
        if mode != "auto":
            return bool(mode)
        return detect_host_skew(
            frontier,
            threshold_rows=self.auto_skew_threshold,
            upper_bound=sum(self.enqueued.values()),
        )

    def run_round(self, rnd: int) -> dict:
        frontier = self.store.read("frontier")  # pending rows only
        active = [j["job_id"] for j in self.jobs if j["job_id"] not in self.finalized]
        remaining = {
            jid: max(0, self.limit_by_job[jid] - self.done.get(jid, 0)) for jid in active
        }
        # Flag-based scheduling: one pass, two windows, zero self-joins.
        #   _eligible: pending + backoff elapsed + job active
        #   politeness: rank within (job, host) by (depth, seq) <= host tokens
        #   budget:     rank within job over politeness-passing rows <= remaining
        # The budget window orders by (_pass1 desc, depth, seq): non-passing
        # rows sort last, so passing rows get ranks 1..n exactly — the same
        # greedy order as the reference simulator.
        if self.robots_dim is not None:
            # dim regime: crawl-delays resolve via the host-keyed dim join.
            # HashPartitioning(host) from this join satisfies the (job_id,
            # host) politeness window's clustering, so the window below adds
            # no exchange — same single frontier shuffle as the closure path.
            # The skew probe (_politeness_two_phase) keeps the raw frontier.
            sched_input = with_dim_delays(frontier, self.robots_dim)
            host_tokens = dim_tokens_expr(self.params)
        else:
            sched_input = frontier
            host_tokens = tokens_expr(self.host_delays, self.params)
        remaining_map = (
            F.create_map(*[F.lit(x) for kv in remaining.items() for x in kv])
            if remaining
            else F.create_map()
        )
        # ineligible (backoff) rows must sort last so eligible rows get dense
        # ranks 1..n within each window
        w_host = Window.partitionBy("job_id", "host").orderBy(
            F.col("_eligible").desc(), F.col("depth").asc(), F.col("discovery_seq").asc()
        )
        w_budget = Window.partitionBy("job_id").orderBy(
            F.col("_pass1").desc(), F.col("depth").asc(), F.col("discovery_seq").asc()
        )
        import time as _time

        t0 = _time.time()
        flagged = sched_input.withColumn(
            "_eligible",
            (F.col("status") == "pending")
            & (F.col("next_eligible_round") <= rnd)
            & F.col("job_id").isin(active),
        )
        use_two_phase = self._politeness_two_phase(frontier)
        if use_two_phase:
            # salted pre-cap bounds any mega-host's window partition to
            # salt_buckets x tokens survivors (§4.2 skew); equivalence with
            # the exact window proven in tests/test_gates.py
            w_salt = Window.partitionBy(
                "job_id", "host", F.pmod(F.col("url_hash"), F.lit(16))
            ).orderBy(
                F.col("_eligible").desc(), F.col("depth").asc(),
                F.col("discovery_seq").asc(),
            )
            flagged = flagged.withColumn(
                "_eligible",
                F.col("_eligible")
                & (F.row_number().over(w_salt) <= host_tokens),
            )
        flagged = (
            flagged.withColumn(
                "_host_rank",
                F.when(F.col("_eligible"), F.row_number().over(w_host)),
            )
            .withColumn(
                "_pass1",
                F.col("_eligible") & (F.col("_host_rank") <= host_tokens),
            )
            .withColumn("_budget_rank", F.row_number().over(w_budget))
            .withColumn(
                "_sched",
                F.col("_pass1")
                & (F.col("_budget_rank") <= F.coalesce(remaining_map[F.col("job_id")], F.lit(0))),
            )
            .persist()
        )
        frontier_cols = [f.name for f in FRONTIER.fields]
        sched = flagged.filter(F.col("_sched")).select(*frontier_cols)
        # deferred + eligible-but-capped rows stay pending unchanged
        not_sched = flagged.filter(~F.col("_sched")).select(*frontier_cols)

        # --- fetch+extract: one fused python stage (no raw HTML through
        # Arrow, one worker per task chain); salt/spread by url hash
        # (politeness already enforced by the windows above) ----------------
        sched = sched.repartition(
            self.fetch_partitions, F.pmod(F.col("url_hash"), F.lit(self.fetch_partitions))
        )
        if self.tiered_proxies:
            # retry ladder: attempt-indexed tier stepping + rule short-circuit
            # (columns only; the synthetic fetch ignores them, the proxy log
            # below is the observable surface)
            from anycrawl_spark.operators.rules import with_proxy_tier

            assigned = with_proxy_tier(sched, self.tiered_proxies, self.proxy_rules)
            self.store.append(
                "proxy_log",
                assigned.select(
                    "job_id", "url_hash", "attempt", "proxy_tier", "proxy_url",
                    F.lit(rnd).alias("round"),
                ),
                round_no=rnd,
            )
        fetched = fetch_extract(sched, self.web).persist()

        ok = fetched.filter(F.col("status_code") == 200)
        retryable = fetched.filter(
            is_retryable_col(F.col("status_code"))
            & (F.col("attempt") + 1 < self.params.max_attempts)
        )
        dead = fetched.filter(
            (F.col("status_code") != 200)
            & ~(
                is_retryable_col(F.col("status_code"))
                & (F.col("attempt") + 1 < self.params.max_attempts)
            )
        )

        docs = ok  # extraction already ran in the fused stage

        # --- documents + metrics appends -----------------------------------
        t_defs = _time.time()
        docs_saved = docs
        if self._scrape_gate is not None:
            docs_saved = docs.filter(
                self._scrape_gate(F.col("job_id"), F.col("url"))
            )
        self.store.append(
            "documents",
            docs_saved.select(
                "job_id",
                F.concat(F.lit("doc_"), F.conv(F.abs(F.col("url_hash")).cast("string"), 10, 16)).alias("doc_id"),
                "url", "url_hash", "host", "depth",
                F.lit(rnd).alias("round"),
                "status_code", "title", "markdown", "spans",
                F.size("links").alias("n_links"),
            ),
            round_no=rnd,
        )
        t_docs_append = _time.time()
        metrics_df = fetched.select(
            "job_id", F.lit(rnd).alias("round"), "url_hash", "host",
            "status_code", "latency_ms", "size_bytes",
        )

        # --- link expansion -> candidates ----------------------------------
        seen = self.store.read_appends("seen")
        links = docs.select(
            "job_id",
            F.col("depth").alias("parent_depth"),
            F.col("discovery_seq").alias("parent_seq"),
            F.col("url_hash").alias("parent_url_hash"),
            F.col("url").alias("parent_url"),
            F.posexplode("links").alias("ordinal", "url"),
        )
        max_depth_map = F.create_map(
            *[F.lit(x) for kv in self.max_depth_by_job.items() for x in kv]
        )
        # one fused python stage: canonicalize + scope + paths + robots
        cand = (
            links.withColumn("depth", F.col("parent_depth") + 1)
            .filter(F.col("depth") <= max_depth_map[F.col("job_id")])
            .withColumn(
                "_g",
                self._candidate_gate(
                    F.col("job_id"),
                    F.col("url"),
                    F.col("parent_url") if self._gate_needs_parent
                    else F.lit(None).cast("string"),
                ),
            )
            .filter(F.col("_g.keep"))
            .withColumn("url", F.col("_g.url"))
            .withColumn("host", F.col("_g.host"))
            .drop("_g", "parent_url")
            .withColumn("url_hash", F.xxhash64("url"))
        )

        # intra-round first-wins dedup: min (parent_depth, parent_seq, ordinal)
        w_first = Window.partitionBy("job_id", "url_hash").orderBy(
            "parent_depth", "parent_seq", "ordinal"
        )
        cand = cand.withColumn("_rn", F.row_number().over(w_first)).filter(
            F.col("_rn") == 1
        ).drop("_rn")

        fresh = filter_fresh(
            cand, seen, self.num_buckets,
            shards=self._shards,
            # |seen| == total enqueued across jobs; tracked driver-side so the
            # auto strategy never fires an O(|seen|) count() action per round
            seen_count=sum(self.enqueued.values()),
            # cross-round cached broadcast (patched from dirty-gen deltas at
            # commit time); None past the broadcast cap => cogroup probe
            shards_bc=self._shard_bc.bc if self._shard_bc is not None else None,
        )

        if self.robots_dim is not None:
            # dim regime: admission-time robots decision as a co-partitioned
            # host join over the POST-dedup POST-seen fresh set (the minimal
            # row volume — the closure path decides pre-dedup inside the
            # fused gate, but robots is a pure function of the URL, so
            # filtering the deduped fresh stream admits the identical set).
            fresh = apply_robots_dim(fresh, self.robots_dim)

        # --- discovery_seq assignment (deterministic BFS ordinal) ----------
        base_seq_map = F.create_map(
            *[F.lit(x) for kv in self.next_seq.items() for x in kv]
        )
        w_seq = Window.partitionBy("job_id").orderBy(
            "parent_depth", "parent_seq", "ordinal"
        )
        fresh = fresh.withColumn(
            "discovery_seq",
            F.row_number().over(w_seq) - 1 + base_seq_map[F.col("job_id")],
        ).persist()

        fresh_frontier = fresh.select(
            "job_id", "url", "url_hash", "host", "depth", "discovery_seq",
            "parent_url_hash",
            F.lit(rnd).alias("round_added"),
            F.lit("pending").alias("status"),
            F.lit(0).alias("attempt"),
            F.lit(0).alias("next_eligible_round"),
            F.lit(0.0).alias("priority"),
        )

        retry_rows = retryable.select(
            "job_id", "url", "url_hash", "host", "depth", "discovery_seq",
            "parent_url_hash", "round_added",
            F.lit("pending").alias("status"),
            (F.col("attempt") + 1).alias("attempt"),
            (F.lit(rnd) + F.pow(F.lit(2), F.col("attempt") + 1).cast("int")).alias(
                "next_eligible_round"
            ),
            "priority",
        )

        next_frontier = (
            not_sched
            .unionByName(retry_rows.select(*frontier_cols))
            .unionByName(fresh_frontier.select(*frontier_cols))
        ).persist()

        # --- terminal log + seen append ------------------------------------
        # (fused fetch output doesn't carry next_eligible_round; terminal
        # rows are never rescheduled so it is constant 0 in the log)
        term_cols = [c for c in frontier_cols if c not in ("status", "next_eligible_round")]
        terminal = ok.select(
            *term_cols,
            F.lit(0).alias("next_eligible_round"),
            F.lit("fetched").alias("status"),
        ).unionByName(
            dead.select(
                *term_cols,
                F.lit(0).alias("next_eligible_round"),
                F.lit("failed").alias("status"),
            )
        ).select(*frontier_cols)

        # --- per-job aggregates -> driver counters (ONE collect action) ----
        fetch_summary = (
            fetched.withColumn(
                "k",
                F.when(F.col("status_code") == 200, "ok")
                .when(
                    is_retryable_col(F.col("status_code"))
                    & (F.col("attempt") + 1 < self.params.max_attempts),
                    "retry",
                )
                .otherwise("dead"),
            )
            .groupBy("job_id", "k")
            .agg(F.count("*").alias("c"))
        )
        fresh_summary = fresh.groupBy("job_id").agg(F.count("*").alias("c")).select(
            "job_id", F.lit("fresh").alias("k"), "c"
        )
        # Overlap the independent per-round actions: metrics + terminal-log
        # appends run while the summary collect materializes the fresh chain
        # (fetched is already cached by the documents append above; each
        # append targets a distinct table — see SnapshotStore locking).
        with ThreadPoolExecutor(max_workers=3) as pool:
            f_metrics = pool.submit(self.store.append, "metrics", metrics_df, rnd)
            f_log = pool.submit(
                self.store.append, "frontier_log",
                terminal.select(*frontier_cols), rnd,
            )
            summary_rows = fetch_summary.unionByName(fresh_summary).collect()
            f_metrics.result()
            f_log.result()
        t_summary = _time.time()

        agg: dict = {}
        fresh_counts: dict = {}
        for r_ in summary_rows:
            if r_.k == "fresh":
                fresh_counts[r_.job_id] = r_.c
            else:
                agg[(r_.job_id, r_.k)] = r_.c

        progress_rows = []
        event_rows = []   # S11 webhook side table (reference: WebhookEvents.ts:6-36)
        sched_total = 0
        for jid in active:
            n_ok = agg.get((jid, "ok"), 0)
            n_dead = agg.get((jid, "dead"), 0)
            n_retry = agg.get((jid, "retry"), 0)
            sched_total += n_ok + n_dead + n_retry
            n_fresh = fresh_counts.get(jid, 0)
            self.done[jid] += n_ok + n_dead
            self.succeeded[jid] += n_ok
            self.failed[jid] += n_dead
            self.enqueued[jid] += n_fresh
            self.next_seq[jid] += n_fresh
            # pending' = pending - terminal(ok+dead) + fresh  (retries stay)
            self.pending[jid] = self.pending.get(jid, 0) - n_ok - n_dead + n_fresh
            if self.done[jid] >= self.limit_by_job[jid] or self.pending[jid] == 0:
                self.finalized.add(jid)
                event_rows.append(
                    (jid, "crawl.completed" if self.failed[jid] < self.done[jid]
                     else "crawl.failed", rnd)
                )
            progress_rows.append(
                (jid, rnd, self.enqueued[jid], self.done[jid], self.succeeded[jid],
                 self.failed[jid], jid in self.finalized, self.next_seq[jid])
            )

        # finalized jobs' leftover pending rows become 'skipped' in the log
        nf_cached = next_frontier
        leftovers = None
        if self.finalized:
            leftovers = next_frontier.filter(F.col("job_id").isin(list(self.finalized)))
            next_frontier = next_frontier.filter(
                ~F.col("job_id").isin(list(self.finalized))
            )

        # final writes: independent tables in parallel (fresh/next_frontier
        # are already materialized in caches by the summary collect). The
        # shard merge (checkpoint + dirty-gen append) rides the same pool —
        # it reads only the cached fresh set and the previous shard state,
        # and SnapshotStore.append reserves slots under its lock.
        fresh_keyed = with_dedup_key(
            fresh.select("job_id", "url_hash"), self.num_buckets
        )
        dirty = [
            r.bucket for r in fresh_keyed.select("bucket").distinct().collect()
        ]
        with ThreadPoolExecutor(max_workers=4) as pool:
            f_shards = pool.submit(
                self._commit_shard_delta,
                merge_bloom_shards(self._shards, fresh_keyed, dirty_buckets=dirty),
                rnd,
            )
            futures = [
                pool.submit(
                    self.store.append,
                    "seen",
                    fresh.select("job_id", "url_hash", F.lit(rnd).alias("first_round")),
                    rnd,
                ),
                pool.submit(self.store.write, "frontier", next_frontier),
                pool.submit(
                    self.store.append,
                    "progress",
                    self.spark.createDataFrame(progress_rows, PROGRESS),
                    rnd,
                ),
            ]
            if leftovers is not None:
                futures.append(
                    pool.submit(
                        self.store.append,
                        "frontier_log",
                        leftovers.withColumn("status", F.lit("skipped")).select(*frontier_cols),
                        rnd,
                    )
                )
            if event_rows:
                futures.append(
                    pool.submit(
                        self.store.append,
                        "webhook_events",
                        self.spark.createDataFrame(
                            event_rows, "job_id string, event string, round int"
                        ),
                        rnd,
                    )
                )
            for f in futures:
                f.result()
            f_shards.result()
        t_final = _time.time()
        self.store.commit_round(rnd)
        stats = {
            "round": rnd,
            "scheduled": sched_total,
            "fresh": sum(fresh_counts.values()),
            "active_jobs": len(active),
            # per-round wall: the soak-flatness evidence (round cost must not
            # grow with lifetime |seen|/frontier size)
            "wall_sec": round(t_final - t0, 2),
            "politeness": "two_phase" if use_two_phase else "exact",
        }
        if self.profile:
            stats["t_phases"] = {
                "defs": round(t_defs - t0, 2),
                "fetch_extract_docs": round(t_docs_append - t_defs, 2),
                "metrics_log_summary": round(t_summary - t_docs_append, 2),
                "final_writes": round(t_final - t_summary, 2),
            }
        self.round_stats.append(stats)
        flagged.unpersist()
        fetched.unpersist()
        docs.unpersist()
        fresh.unpersist()
        nf_cached.unpersist()
        return stats

    # -------------------------------------------------------------- outputs

    def seen_sets(self) -> dict[str, set]:
        """job_id -> set of canonical urls ever admitted (for parity tests)."""
        log = self.store.read_appends("frontier_log")
        frontier = self.store.read("frontier")
        dfs = [frontier.select("job_id", "url")]
        if log is not None:
            dfs.append(log.select("job_id", "url"))
        allrows = dfs[0]
        for d in dfs[1:]:
            allrows = allrows.unionByName(d)
        out: dict[str, set] = {j["job_id"]: set() for j in self.jobs}
        for r in allrows.distinct().collect():
            out[r.job_id].add(r.url)
        return out

    def discovery(self) -> dict[str, dict]:
        """job_id -> {url: (depth, discovery_seq)}."""
        log = self.store.read_appends("frontier_log")
        frontier = self.store.read("frontier")
        allrows = frontier.select("job_id", "url", "depth", "discovery_seq")
        if log is not None:
            allrows = allrows.unionByName(
                log.select("job_id", "url", "depth", "discovery_seq")
            )
        out: dict[str, dict] = {j["job_id"]: {} for j in self.jobs}
        for r in allrows.distinct().collect():
            out[r.job_id][r.url] = (r.depth, r.discovery_seq)
        return out

    def terminal_status(self) -> dict[str, dict]:
        log = self.store.read_appends("frontier_log")
        out: dict[str, dict] = {j["job_id"]: {} for j in self.jobs}
        if log is None:
            return out
        for r in log.filter(F.col("status").isin("fetched", "failed")).collect():
            out[r.job_id][r.url] = r.status
        return out
