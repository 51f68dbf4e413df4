"""Deterministic crawl-loop policy, shared by the Spark superstep and the
pure-Python reference simulator — the single place crawl semantics live.

Semantics (each maps to a reference behavior, SURVEY §2/§3):
- BFS order: pages are scheduled by ``(depth, discovery_seq)`` — the explicit,
  repartition-stable form of the reference's FIFO RequestQueue ordering
  (reference: Crawlee RequestQueueV2 FIFO + BullMQ FIFO; SURVEY §2.6 O1).
- discovery_seq: per job, seeds get seq 0; every accepted fresh link gets the
  next counter value, assigned in ``(parent_discovery_seq, link_ordinal)``
  order — DOM document order within a page (cheerio .each traversal).
- dedup: per-job on canonical-URL hash — ``${jobId}-${computeUniqueKey(url)}``
  (reference: Base.ts:413-420). First discovery wins (min (parent_seq, ordinal)).
- depth: child = parent + 1, dropped when > max_depth (Base.ts:396-401).
- limit: at most ``limit`` pages ever scheduled per job; enforced as a
  top-k window by (depth, seq) (reference: done>=limit abort,
  EngineConfigurator.ts:93-121).
- retries: HTTP 403/5xx retried up to MAX_ATTEMPTS with exponential round
  backoff 2^attempt (reference: BullMQ attempts=3, exponential delay,
  Queue.ts:83-88); 404 fails immediately (no retry — matches the reference's
  4xx client-error classification, Base.ts:60-113).
- politeness (new functionality, required by north_rule): per-host per-round
  token bucket — ``tokens = max(1, ROUND_WINDOW_MS // crawl_delay_ms)`` for
  hosts with a robots crawl delay, else ``DEFAULT_HOST_TOKENS``.
- robots gating (new functionality): longest-prefix-match allow/disallow over
  (host, path); disallowed candidates are dropped before dedup/enqueue.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CrawlParams:
    max_attempts: int = 3           # total tries per URL (1 + 2 retries)
    round_window_ms: int = 1000     # nominal wall-clock a round represents
    default_host_tokens: int = 8    # per-host per-round schedule cap
    max_rounds: int = 64            # driver-loop safety bound

    def host_tokens(self, crawl_delay_ms: int | None) -> int:
        if crawl_delay_ms and crawl_delay_ms > 0:
            return max(1, self.round_window_ms // crawl_delay_ms)
        return self.default_host_tokens

    def backoff_rounds(self, attempt: int) -> int:
        """Rounds to wait before retry attempt N (1-based): 2^attempt."""
        return 2 ** attempt


RETRYABLE_STATUSES = frozenset({403, 500, 502, 503, 504, 429})


def is_retryable(status: int) -> bool:
    return status in RETRYABLE_STATUSES or status >= 500


def is_retryable_col(status_col):
    """JVM column equivalent of :func:`is_retryable` — the engine and the
    sequential simulator MUST share one retry predicate (a backend emitting
    e.g. 501/599 must be retried by both)."""
    from pyspark.sql import functions as F  # local import: params is UDF-shippable

    return status_col.isin(list(RETRYABLE_STATUSES)) | (status_col >= 500)


def robots_path(url: str) -> str:
    """URL -> path for robots matching. urlsplit-based: a naive
    ``url.split(host)`` returns ':8080/p' for port-bearing URLs, which would
    silently mis-match every robots prefix."""
    from urllib.parse import urlsplit

    try:
        return urlsplit(url).path or "/"
    except ValueError:
        return "/"


def robots_target(url: str) -> str:
    """URL -> RFC 9309 match target: path plus ``?query`` when present.

    RFC 9309 §2.2.2 matches rules against the path AND optional query —
    ``Disallow: /*.php$`` must NOT block ``/x.php?id=1`` (the target ends
    in the query), and ``Disallow: /*?sessionid=`` can only ever match
    with the query attached. For ``?``-free patterns this decides
    identically to the bare path, so the prefix kernel keeps its
    semantics on every pre-parsed ruleset."""
    from urllib.parse import urlsplit

    try:
        parts = urlsplit(url)
    except ValueError:
        return "/"
    path = parts.path or "/"
    return f"{path}?{parts.query}" if parts.query else path


def robots_decision(rules: list[tuple[str, str]], path: str) -> bool:
    """Longest-prefix-match allow/disallow; allowed by default.

    ``rules``: [(rule, path_prefix)] for one host. Ties prefer 'allow'
    (standard robots.txt longest-match semantics).
    """
    best_len, allowed = -1, True
    for rule, prefix in rules:
        if path.startswith(prefix):
            plen = len(prefix)
            if plen > best_len or (plen == best_len and rule == "allow"):
                best_len, allowed = plen, (rule == "allow")
    return allowed
