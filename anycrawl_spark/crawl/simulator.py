"""Pure-Python reference crawl simulator — the parity oracle.

Implements the reference's crawl loop (SURVEY §3.2: seed -> fetch -> extract ->
enqueueLinks -> dedup -> counters -> finalize) sequentially and independently
of Spark, using the deterministic synthetic web (``synth.py``) as ground truth
for fetch results and ``synth.page_hrefs`` for link order (NOT the Spark HTML
extractor — so the parity test also exercises the extractor).

The Spark superstep (``superstep.py``) must produce, per job:
- the identical final URL-seen set (canonical URLs),
- identical ``(url, depth, discovery_seq)`` assignments,
- identical fetched/failed/skipped status per URL,
- identical progress counters per round.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from anycrawl_spark import synth
from anycrawl_spark.crawl.params import CrawlParams, is_retryable, robots_decision, robots_target
from anycrawl_spark.functions.patterns import (
    compile_exclude_patterns,
    compile_include_patterns,
    excludes_configured,
    should_scrape_url,
    url_passes,
)
from anycrawl_spark.functions.urls import (
    canonicalize_url,
    registrable_domain,
    resolve_url,
    url_host,
    url_origin,
)


@dataclass
class SimJobState:
    job: dict
    seen: dict = field(default_factory=dict)       # canonical url -> (depth, seq)
    status: dict = field(default_factory=dict)     # canonical url -> terminal status
    pending: list = field(default_factory=list)    # [url, depth, seq, attempt, eligible_round]
    next_seq: int = 0
    enqueued: int = 0
    done: int = 0
    succeeded: int = 0
    failed: int = 0
    finalized: bool = False
    scraped: set = field(default_factory=set)      # fetched urls passing F2


def _scope_ok(url: str, seed_url: str, strategy: str) -> bool:
    if strategy == "all":
        return True
    if strategy == "same-hostname":
        return url_host(url) == url_host(seed_url)
    if strategy == "same-origin":
        return url_origin(url) == url_origin(seed_url)
    # default 'same-domain' (reference default, CrawlSchema.ts:43)
    return registrable_domain(url_host(url)) == registrable_domain(url_host(seed_url))


class ReferenceSimulator:
    def __init__(
        self,
        jobs: list[dict],
        robots: list[dict],
        params: CrawlParams | None = None,
        web: synth.WebConfig = synth.DEFAULT_WEB,
    ):
        self.params = params or CrawlParams()
        self.web = web
        # mirrors CrawlEngine: wildcard rows (raw-robots.txt */$ patterns)
        # route to the RFC 9309 kernel, mixed hosts fold entirely into it
        self.robots_by_host: dict[str, list[tuple[str, str]]] = {}
        self.robots_rfc_by_host: dict[str, list[tuple[str, str]]] = {}
        self.delay_by_host: dict[str, int] = {}
        for r in robots:
            target = (
                self.robots_rfc_by_host if r.get("wildcard") else self.robots_by_host
            )
            target.setdefault(r["host"], []).append((r["rule"], r["path_prefix"]))
            if r.get("crawl_delay_ms"):
                self.delay_by_host[r["host"]] = max(
                    self.delay_by_host.get(r["host"], 0), r["crawl_delay_ms"]
                )
        for h in list(self.robots_rfc_by_host):
            if h in self.robots_by_host:
                self.robots_rfc_by_host[h] += self.robots_by_host.pop(h)
        self.states: dict[str, SimJobState] = {}
        self.progress_rows: list[dict] = []
        for job in jobs:
            st = SimJobState(job=dict(job))
            st.job["_include"] = compile_include_patterns(job.get("include_paths"))
            st.job["_exclude"] = compile_exclude_patterns(job.get("exclude_paths"))
            st.job["_exclude_active"] = excludes_configured(job.get("exclude_paths"))
            seed = canonicalize_url(job["seed_url"])
            if seed is not None and self._robots_ok(seed):
                st.seen[seed] = (0, 0)
                st.pending.append([seed, 0, 0, 0, 0])
                st.next_seq = 1
                st.enqueued = 1
            self.states[job["job_id"]] = st

    def _robots_ok(self, url: str) -> bool:
        host = url_host(url)
        rules = self.robots_by_host.get(host)
        if rules:
            return robots_decision(rules, robots_target(url))
        rfc = self.robots_rfc_by_host.get(host)
        if rfc:
            from anycrawl_spark.functions.robots import robots_allowed_rfc

            return robots_allowed_rfc(rfc, robots_target(url))
        return True

    def run(self) -> None:
        for rnd in range(self.params.max_rounds):
            if not self._round(rnd):
                break

    def _round(self, rnd: int) -> bool:
        for st in self.states.values():
            if st.finalized:
                continue
            scheduled = self._schedule(st, rnd)
            fresh_count = self._fetch_and_expand(st, scheduled, rnd)
            st.enqueued += fresh_count
            # finalize: done>=limit, or queue drained (batch analog of the
            # reference's Lua policy, Progress.ts:279-298)
            if st.done >= st.job["limit"] or not st.pending:
                st.finalized = True
            self.progress_rows.append(
                {
                    "job_id": st.job["job_id"],
                    "round": rnd,
                    "enqueued": st.enqueued,
                    "done": st.done,
                    "succeeded": st.succeeded,
                    "failed": st.failed,
                    "finalized": st.finalized,
                }
            )
        return any(not st.finalized for st in self.states.values())

    def _schedule(self, st: SimJobState, rnd: int) -> list:
        eligible = [e for e in st.pending if e[4] <= rnd]
        eligible.sort(key=lambda e: (e[1], e[2]))  # (depth, discovery_seq)
        # politeness: per-host token cap
        taken, host_used = [], {}
        for e in eligible:
            host = url_host(e[0])
            cap = self.params.host_tokens(self.delay_by_host.get(host))
            if host_used.get(host, 0) < cap:
                host_used[host] = host_used.get(host, 0) + 1
                taken.append(e)
        # budget: remaining job limit, by (depth, seq)
        remaining = st.job["limit"] - st.done
        taken = taken[: max(0, remaining)]
        taken_ids = {id(e) for e in taken}
        st.pending = [e for e in st.pending if id(e) not in taken_ids]
        return taken

    def _fetch_and_expand(self, st: SimJobState, scheduled: list, rnd: int) -> int:
        fresh = 0
        for url, depth, seq, attempt, _ in scheduled:
            status = synth.page_status(url)
            if status == 200:
                st.status[url] = "fetched"
                st.done += 1
                st.succeeded += 1
                if should_scrape_url(url, st.job.get("scrape_paths")):
                    st.scraped.add(url)
                fresh += self._expand(st, url, depth, seq)
            elif is_retryable(status) and attempt + 1 < self.params.max_attempts:
                st.pending.append(
                    [url, depth, seq, attempt + 1,
                     rnd + self.params.backoff_rounds(attempt + 1)]
                )
            else:
                st.status[url] = "failed"
                st.done += 1
                st.failed += 1
        return fresh

    def _expand(self, st: SimJobState, url: str, depth: int, parent_seq: int) -> int:
        if depth + 1 > st.job["max_depth"]:
            return 0
        job = st.job
        added = 0
        for href in synth.page_hrefs(url, self.web):
            cand = canonicalize_url(resolve_url(url, href))
            if cand is None:
                continue
            if not _scope_ok(cand, job["seed_url"], job["strategy"]):
                continue
            if not url_passes(cand, job["_include"], job["_exclude"],
                              current_url=url,
                              exclude_active=job["_exclude_active"]):
                continue
            if not self._robots_ok(cand):
                continue
            if cand in st.seen:
                continue
            st.seen[cand] = (depth + 1, st.next_seq)
            st.pending.append([cand, depth + 1, st.next_seq, 0, 0])
            st.next_seq += 1
            added += 1
        return added

    # --- outputs for parity assertions ------------------------------------

    def seen_sets(self) -> dict[str, set]:
        return {jid: set(st.seen) for jid, st in self.states.items()}

    def scraped_urls(self) -> dict[str, set]:
        """F2 oracle: fetched urls whose documents are persisted
        (shouldScrapeUrl, Base.ts:465-495,992-1002)."""
        return {jid: set(st.scraped) for jid, st in self.states.items()}

    def discovery(self) -> dict[str, dict]:
        """job_id -> {url: (depth, discovery_seq)}"""
        return {jid: dict(st.seen) for jid, st in self.states.items()}

    def frontier_log(self) -> list[tuple]:
        """(job_id, url, depth, discovery_seq, status) — the engine's
        append-only frontier_log mirror: one row per URL that reached a
        terminal state ('fetched'/'failed'), plus each finalized job's
        leftover pending rows as 'skipped' (the engine logs those the round
        the job finalizes; non-finalized jobs' pending rows stay in the live
        frontier and are logged by neither side)."""
        rows = []
        for jid, st in self.states.items():
            for url, status in st.status.items():
                d, s = st.seen[url]
                rows.append((jid, url, d, s, status))
            if st.finalized:
                for url, depth, seq, _attempt, _elig in st.pending:
                    rows.append((jid, url, depth, seq, "skipped"))
        return rows

    def terminal_status(self) -> dict[str, dict]:
        return {jid: dict(st.status) for jid, st in self.states.items()}
