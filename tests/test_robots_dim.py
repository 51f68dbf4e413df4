"""Robots rules as a host-keyed dim table (the 100x regime of J6).

The closure path ships compiled rules inside the fused candidate gate — fine
while the ruleset broadcasts, wrong at 10^8 hosts (docs/SCALE.md §robots).
These tests pin the dim path: identical decisions, identical crawls, zero
extra frontier exchanges, and NO driver-side rules dict past the threshold.
"""

import random
import re
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from anycrawl_spark import synth
from anycrawl_spark.crawl.params import (
    CrawlParams,
    robots_decision,
    robots_target,
)
from anycrawl_spark.crawl.simulator import ReferenceSimulator
from anycrawl_spark.crawl.superstep import CrawlEngine
from anycrawl_spark.functions.robots import robots_allowed_rfc, robots_rows_from_texts
from anycrawl_spark.operators.gates import (
    apply_robots_dim,
    dim_tokens_expr,
    robots_dim_df,
    robots_dim_rows,
    with_dim_delays,
)


def _engine_dicts(robots):
    """The exact dict build from CrawlEngine.__init__ (closure regime)."""
    plain, rfc = {}, {}
    for r in robots:
        (rfc if r.get("wildcard") else plain).setdefault(r["host"], []).append(
            (r["rule"], r["path_prefix"])
        )
    for h in list(rfc):
        if h in plain:
            rfc[h] += plain.pop(h)
    return plain, rfc


MIXED_ROWS = [
    {"host": "a.example", "rule": "disallow", "path_prefix": "/p/*7$", "wildcard": True},
    {"host": "a.example", "rule": "allow", "path_prefix": "/p/15"},
    {"host": "a.example", "rule": "disallow", "path_prefix": "/p/1"},
    {"host": "b.example", "rule": "disallow", "path_prefix": "/x", "crawl_delay_ms": 250},
    {"host": "b.example", "rule": "allow", "path_prefix": "/x/ok", "crawl_delay_ms": 250},
    {"host": "delay-only.example", "rule": "allow", "path_prefix": "/", "crawl_delay_ms": 900},
]


def test_dim_rows_mirror_engine_dict_build():
    rows = {h: (w, rules, d) for h, w, rules, d in robots_dim_rows(MIXED_ROWS)}
    plain, rfc = _engine_dicts(MIXED_ROWS)
    # mixed host: wildcard rules first, plain appended — same as the dict merge
    assert rows["a.example"][0] is True
    assert rows["a.example"][1] == rfc["a.example"]
    assert rows["b.example"][0] is False
    assert rows["b.example"][1] == plain["b.example"]
    assert rows["b.example"][2] == 250
    assert rows["a.example"][2] is None
    assert rows["delay-only.example"][2] == 900


def test_apply_robots_dim_matches_closure_kernels(spark):
    """Fuzzed decision equality: the dim join + Arrow kernel must admit
    exactly the URLs the closure kernels admit, host by host."""
    rng = random.Random(7)
    robots = list(MIXED_ROWS)
    for i in range(40):
        h = f"fz{i}.example"
        for _ in range(rng.randint(1, 4)):
            wild = rng.random() < 0.4
            seg = rng.choice(["/p/", "/q/", "/"]) + str(rng.randint(0, 9))
            robots.append(
                {
                    "host": h,
                    "rule": rng.choice(["allow", "disallow"]),
                    "path_prefix": seg + ("*" + str(rng.randint(0, 9)) + "$" if wild else ""),
                    "wildcard": wild,
                }
            )
    plain, rfc = _engine_dicts(robots)
    hosts = sorted({r["host"] for r in robots}) + ["norobots.example"]
    cand_rows = []
    for i in range(600):
        h = hosts[i % len(hosts)]
        path = rng.choice(["/p/", "/q/", "/x", "/x/ok", "/"]) + str(rng.randint(0, 99))
        cand_rows.append((f"job-{i % 3}", f"http://{h}{path}", h))
    expected = set()
    for jid, u, h in cand_rows:
        t = robots_target(u)
        if h in rfc:
            ok = robots_allowed_rfc(rfc[h], t)
        elif h in plain:
            ok = robots_decision(plain[h], t)
        else:
            ok = True
        if ok:
            expected.add((jid, u))
    cand = spark.createDataFrame(cand_rows, "job_id string, url string, host string")
    got = {
        (r.job_id, r.url)
        for r in apply_robots_dim(cand, robots_dim_df(spark, robots)).collect()
    }
    assert got == expected
    assert len(expected) < len(cand_rows)  # the gate actually bit


def test_dim_crawl_parity_with_wildcards_and_delays(spark, tmp_path):
    """E2E: closure engine == dim engine == reference simulator on a crawl
    whose robots.txt uses wildcard rules AND a token-constraining crawl-delay
    (200ms -> 5 tokens < the default 8, so the dim token join must bite)."""
    job = dict(synth.seed_jobs(1)[0], limit=40, max_depth=6)
    from anycrawl_spark.functions.urls import url_host

    seed_host = url_host(job["seed_url"])
    texts = {
        seed_host: (
            "User-agent: anycrawl\n"
            "Disallow: /p/*7$\n"
            "Disallow: /p/1\n"
            "Allow: /p/15\n"
            "Crawl-delay: 0.2\n"
        ),
        "unrelated.example": "User-agent: *\nDisallow: /\n",
    }
    rows = robots_rows_from_texts(texts, "AnyCrawl/1.0 (+https://example)")
    params = CrawlParams(max_rounds=20)
    sim = ReferenceSimulator([job], rows, params)
    sim.run()
    outs = {}
    for mode in ("closure", "dim"):
        wd = str(tmp_path / mode)
        shutil.rmtree(wd, ignore_errors=True)
        eng = CrawlEngine(
            spark, wd, [job], rows, params, num_buckets=4, robots_mode=mode
        )
        eng.init_state()
        eng.run()
        docs = sorted(
            tuple(r)
            for r in eng.store.read_appends("documents")
            .select("job_id", "doc_id", "url", "depth", "round")
            .collect()
        )
        outs[mode] = (eng.seen_sets(), eng.discovery(), eng.terminal_status(), docs)
        if mode == "dim":
            assert eng.robots_dim is not None
            assert eng.host_delays == {}, "dim mode must not hold a delay dict"
            # driver retains rules for the SEED host only (O(jobs))
            held = set(eng.robots_by_host) | set(eng.robots_rfc_by_host)
            assert held <= {seed_host}
    jid = job["job_id"]
    assert outs["closure"][0] == outs["dim"][0] == {jid: sim.seen_sets()[jid]}
    assert outs["closure"][1] == outs["dim"][1]
    assert outs["closure"][2] == outs["dim"][2] == {jid: sim.terminal_status()[jid]}
    assert outs["closure"][3] == outs["dim"][3]
    assert len(outs["dim"][3]) > 0


def test_auto_threshold_picks_dim(spark, tmp_path):
    job = dict(synth.seed_jobs(1)[0], limit=5)
    robots = synth.robots_rules()
    # auto + tiny threshold => dim regime, and the gate closure holds no rules
    eng = CrawlEngine(
        spark, str(tmp_path / "auto"), [job], robots,
        CrawlParams(), robots_mode="auto", robots_dim_threshold_hosts=1,
    )
    assert eng.robots_dim is not None
    non_seed = {r["host"] for r in robots} - {synth.host_name(0)}
    held = set(eng.robots_by_host) | set(eng.robots_rfc_by_host)
    assert not (held & non_seed), "non-seed rules must not live on the driver"
    # auto + default threshold on a small ruleset => closure regime
    eng2 = CrawlEngine(
        spark, str(tmp_path / "auto2"), [job], robots, CrawlParams(),
    )
    assert eng2.robots_dim is None and eng2.robots_by_host
    with pytest.raises(ValueError):
        CrawlEngine(
            spark, str(tmp_path / "bad"), [job], robots, CrawlParams(),
            robots_mode="broadcast",
        )


def test_dim_plans_copartition_without_extra_exchange(spark):
    """Plan shape: the delays join partitions the frontier stream by host and
    the (job_id, host) politeness window REUSES it (HashPartitioning(host)
    satisfies the window's ClusteredDistribution) — no (job_id, host)
    exchange anywhere; the admission join is a ShuffledHashJoin on host."""
    dim = robots_dim_df(spark, synth.robots_rules())
    frontier = spark.range(500).select(
        F.concat(F.lit("job-"), (F.col("id") % 3).cast("string")).alias("job_id"),
        F.concat(
            F.lit("http://h"), (F.col("id") % 50).cast("string"),
            F.lit(".example/p/"), F.col("id").cast("string"),
        ).alias("url"),
        F.xxhash64("id").alias("url_hash"),
        F.concat(
            F.lit("h"), (F.col("id") % 50).cast("string"), F.lit(".example")
        ).alias("host"),
        (F.col("id") % 5).cast("int").alias("depth"),
        F.col("id").alias("discovery_seq"),
    )
    w = Window.partitionBy("job_id", "host").orderBy("depth", "discovery_seq")
    sched = (
        with_dim_delays(frontier, dim)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= dim_tokens_expr(CrawlParams()))
    )
    plan = sched._jdf.queryExecution().executedPlan().toString()
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts, plan
    assert all(p.split(",")[0].startswith("host") for p in parts), parts
    assert "ShuffledHashJoin" in plan
    adm = apply_robots_dim(frontier, dim)
    plan2 = adm._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan2 and "BroadcastHashJoin" not in plan2
