"""Crawl-loop parity: Spark superstep engine vs the pure-Python reference
simulator on the deterministic synthetic web (north_rule gate: same crawl
ordering + URL-seen set under the same seed list and politeness budget).

The two implementations share only the policy module (crawl/params.py) and the
URL kernel; frontier management, dedup, scheduling windows and seq assignment
are implemented independently (sequential loop vs DataFrame windows)."""

import shutil

import pytest

from anycrawl_spark import synth
from anycrawl_spark.crawl.params import CrawlParams
from anycrawl_spark.crawl.simulator import ReferenceSimulator
from anycrawl_spark.crawl.superstep import CrawlEngine


@pytest.fixture(scope="module")
def parity_run(spark, tmp_path_factory):
    jobs = [dict(j, limit=40) for j in synth.seed_jobs(3)]
    # exercise path filters on one job
    jobs[1] = dict(jobs[1], include_paths=["**/p/**", "/\\/p\\/\\d+$/"], exclude_paths=["**/p/7"])
    robots = synth.robots_rules()
    # 4th job: same-origin strategy seeded on a crawl-delay (politeness) host
    delay_hosts = [r["host"] for r in robots if r.get("crawl_delay_ms")]
    jobs.append(
        dict(
            synth.seed_jobs(1)[0],
            job_id="job-origin",
            seed_url=f"http://{delay_hosts[0]}/p/0",
            strategy="same-origin",
            limit=30,
        )
    )
    params = CrawlParams(max_rounds=40)

    sim = ReferenceSimulator(jobs, robots, params)
    sim.run()

    wd = str(tmp_path_factory.mktemp("crawl"))
    eng = CrawlEngine(spark, wd, jobs, robots, params, num_buckets=8)
    eng.init_state()
    eng.run()
    yield sim, eng
    shutil.rmtree(wd, ignore_errors=True)


def test_seen_set_equality(parity_run):
    sim, eng = parity_run
    s, r = eng.seen_sets(), sim.seen_sets()
    for jid in r:
        assert s[jid] == r[jid], f"{jid}: seen-set mismatch"
        assert len(s[jid]) > 5  # non-trivial crawl


def test_crawl_order_equality(parity_run):
    """(depth, discovery_seq) per URL — the BFS ordering invariant (O1)."""
    sim, eng = parity_run
    s, r = eng.discovery(), sim.discovery()
    for jid in r:
        assert s[jid] == r[jid], f"{jid}: discovery order mismatch"


def test_terminal_status_equality(parity_run):
    sim, eng = parity_run
    s, r = eng.terminal_status(), sim.terminal_status()
    for jid in r:
        assert s[jid] == r[jid]


def test_frontier_log_equality(parity_run):
    """FULL frontier_log parity — fetched/failed AND finalize-time 'skipped'
    leftovers, with depth/seq (backs the q_crawl_round golden oracle)."""
    sim, eng = parity_run
    log = eng.store.read_appends("frontier_log")
    eng_rows = {
        (r.job_id, r.url, r.depth, r.discovery_seq, r.status)
        for r in log.select("job_id", "url", "depth", "discovery_seq", "status").collect()
    }
    sim_rows = set(sim.frontier_log())
    assert eng_rows == sim_rows


def test_progress_counters(parity_run):
    sim, eng = parity_run
    for jid, st in sim.states.items():
        assert eng.done[jid] == st.done
        assert eng.succeeded[jid] == st.succeeded
        assert eng.failed[jid] == st.failed
        assert eng.enqueued[jid] == st.enqueued
        assert jid in eng.finalized


def test_limit_respected(parity_run):
    _, eng = parity_run
    for j in eng.jobs:
        assert eng.done[j["job_id"]] <= j["limit"]


def test_robots_gating(parity_run):
    """No fetched URL may violate a disallow rule."""
    sim, eng = parity_run
    from anycrawl_spark.crawl.params import robots_decision
    from anycrawl_spark.functions.urls import url_host

    for jid, statuses in eng.terminal_status().items():
        for url in statuses:
            host = url_host(url)
            rules = eng.robots_by_host.get(host)
            if rules:
                path = url.split(host, 1)[1]
                assert robots_decision(rules, path), f"robots violation: {url}"


def test_same_domain_github_io_parity(spark, tmp_path):
    """E2E same-domain crawl seeded on a private-suffix (*.github.io) host:
    engine == simulator, and nothing outside the seed's registrable domain
    (i.e. no sibling *.github.io site, no cross-host example.* link) is
    admitted. Guards the PSL-backed scope key (urls.registrable_domain)."""
    from anycrawl_spark.functions.urls import registrable_domain, url_host

    jobs = [dict(
        synth.seed_jobs(1)[0],
        job_id="gh", seed_url="http://host0003.github.io/p/0",
        strategy="same-domain", max_depth=3, limit=15,
    )]
    params = CrawlParams(max_rounds=12)
    sim = ReferenceSimulator(jobs, [], params)
    sim.run()
    eng = CrawlEngine(spark, str(tmp_path / "gh"), jobs, [], params, num_buckets=4)
    eng.init_state()
    eng.run()
    assert eng.seen_sets()["gh"] == sim.seen_sets()["gh"]
    assert len(sim.seen_sets()["gh"]) > 5
    for url in eng.seen_sets()["gh"]:
        assert registrable_domain(url_host(url)) == "host0003.github.io"
