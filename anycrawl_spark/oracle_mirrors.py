"""Sequential mirrors that render VALUES-based DuckDB oracles for the
contract queries whose operators aren't expressible over the shared parquet
views (SERP fixtures, the crawl loop, media features).

Each mirror enumerates the EXPECTED result rows with plain sequential Python
— no Spark, no mapInPandas, no DataFrame machinery — and serializes them as a
``SELECT ... FROM (VALUES ...)`` DuckDB statement, so the driver's
value-hash compare covers these queries end to end instead of rows-only.

Independence levels (documented per mirror):
- ``crawl_round``: the :class:`~anycrawl_spark.crawl.simulator.
  ReferenceSimulator` — a from-scratch sequential BFS sharing only the
  policy module (``crawl/params.py``) with the engine. Strongest oracle.
- SERP mirrors: rows derived directly from the fixture-generation
  parameters (digest -> host/url/title/... , reference field mappings
  restated inline) — independent of the HTML/JSON *parsers* and of the
  whole Spark path (mapInPandas, window rank, limit join).
- ``serp_enrich`` / ``media_features``: sequential recomputation through
  the same extraction/decode kernels (``extract_document`` /
  ``fake_decode``) — these validate the distributed plumbing (Arrow
  batching, joins, explodes) equals the sequential run; the kernels
  themselves are golden-fixture-tested in pytest.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from anycrawl_spark.synth import _digest, host_name

RESULTS_PER_PAGE = 10


# --------------------------------------------------------------------- SQL

def _lit(v, ducktype: str) -> str:
    if v is None:
        return f"CAST(NULL AS {ducktype})"
    if ducktype in ("INTEGER", "BIGINT"):
        return f"CAST({int(v)} AS {ducktype})"
    if ducktype == "DOUBLE":
        return f"CAST({float(v)!r} AS DOUBLE)"
    if ducktype == "BOOLEAN":
        return "true" if v else "false"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def values_sql(rows: list[dict], columns: list[tuple[str, str]]) -> str:
    """rows + [(name, ducktype)] -> a standalone VALUES select.

    Every cell is CAST explicitly so the pandas dtypes DuckDB hands the
    driver match the Spark result's dtypes column-for-column.
    """
    if not rows:
        cols = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in columns)
        return f"SELECT {cols} WHERE 1=0"
    body = ",\n".join(
        "(" + ", ".join(_lit(r.get(n), t) for n, t in columns) + ")" for r in rows
    )
    names = ", ".join(n for n, _ in columns)
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({names})"


def _round_half_up(x: float, dp: int) -> float:
    """Spark's F.round semantics on doubles: BigDecimal(exact double value)
    .setScale(dp, HALF_UP) — Decimal(float) is the same exact expansion."""
    return float(Decimal(x).quantize(Decimal(1).scaleb(-dp), ROUND_HALF_UP))


# ------------------------------------------------------------ SERP mirrors

_SERP_COLUMNS: list[tuple[str, str]] = [
    ("query_id", "VARCHAR"), ("page", "INTEGER"), ("position", "INTEGER"),
    ("category", "VARCHAR"), ("title", "VARCHAR"), ("url", "VARCHAR"),
    ("description", "VARCHAR"), ("source", "VARCHAR"),
    ("image_url", "VARCHAR"), ("image_width", "INTEGER"),
    ("image_height", "INTEGER"), ("thumbnail_src", "VARCHAR"),
    ("img_format", "VARCHAR"), ("filesize", "VARCHAR"),
    ("snippet", "VARCHAR"), ("date", "VARCHAR"), ("rank", "INTEGER"),
]


def _sliced(rows: list[dict], limit: int) -> list[dict]:
    """The reference's final slice (O4): rank over (page, position) order,
    keep rank <= limit. Mirrors the window+limit join without Spark."""
    rows = sorted(rows, key=lambda r: (r["page"], r["position"]))
    out = []
    for rank, r in enumerate(rows, start=1):
        if rank > limit:
            break
        out.append({**r, "rank": rank})
    return out


def google_serp_rows(queries: list[tuple[str, str, int]], n_hosts: int = 50) -> list[dict]:
    """Expected ``serp_search`` rows from the fixture parameters alone
    (Google.ts block shapes; parser and DOM never involved)."""
    out = []
    for qid, query, limit in queries:
        rows = []
        for page in range(math.ceil(limit / RESULTS_PER_PAGE)):
            for i in range(RESULTS_PER_PAGE):
                rank_abs = page * RESULTS_PER_PAGE + i
                d = _digest("serp", query, rank_abs)
                host = host_name(d % n_hosts)
                rows.append({
                    "query_id": qid, "page": page,
                    "position": page * RESULTS_PER_PAGE + i,
                    "category": "web",
                    "title": f"Result {rank_abs} for {query}",
                    "url": f"http://{host}/p/{d % 37}",
                    "description": f"Description {rank_abs} about {query} on {host}",
                    "source": "google",
                })
        out.extend(_sliced(rows, limit))
    return out


def searxng_serp_rows(
    queries: list[tuple[str, str, int, str]], n_hosts: int = 50
) -> list[dict]:
    """Expected ``serp_search_engine(engine='searxng')`` rows (page-wise,
    1-based pageno; Searxng.ts:103-181 field mappings restated)."""
    out = []
    for qid, query, limit, sources in queries:
        rows = []
        for page in range(math.ceil(limit / RESULTS_PER_PAGE)):
            for i in range(RESULTS_PER_PAGE):
                rank = page * RESULTS_PER_PAGE + i  # (pageno-1)*10 + i
                d = _digest("searxng", query, sources, rank)
                host = host_name(d % n_hosts)
                engine = ["duckduckgo", "brave", "qwant"][d % 3]
                row = {
                    "query_id": qid, "page": page, "category": sources,
                    "title": f"Result {rank} for {query}",
                    "url": f"http://{host}/p/{d % 37}",
                    "description": f"Content {rank} about {query} on {host}",
                    "source": f"SearXNG ({engine})",
                }
                if sources == "images":
                    row.update(
                        position=rank + 1,  # fixture positions[0], 1-based
                        image_url=f"http://{host}/img/{d % 97}.jpg",
                        image_width=640 + d % 1280,
                        image_height=480 + (d >> 8) % 720,
                        thumbnail_src=f"http://{host}/thumb/{d % 97}.jpg",
                        img_format=["jpeg", "png", "webp"][d % 3],
                        filesize=f"{(d % 900) + 100}.{d % 100:02d} KB",
                    )
                elif sources == "news":
                    row.update(
                        position=page * RESULTS_PER_PAGE + i,
                        snippet=f"Content {rank} about {query} on {host}",
                        date=f"2026-{1 + d % 12:02d}-{1 + d % 28:02d}",
                        image_url=f"http://{host}/news-thumb/{d % 97}.jpg",
                    )
                else:
                    row["category"] = "web"
                    row["position"] = page * RESULTS_PER_PAGE + i
                rows.append(row)
        out.extend(_sliced(rows, limit))
    return out


def ac_serp_rows(
    queries: list[tuple[str, str, int]], sources: str = "web", n_hosts: int = 50
) -> list[dict]:
    """Expected ``serp_search_engine(engine='ac')`` rows (direct-limit: one
    page-0 request returns exactly ``limit`` results; ACEngine.ts:63-114)."""
    out = []
    for qid, query, limit in queries:
        rows = []
        for rank in range(limit):
            d = _digest("ac", query, sources, rank)
            host = host_name(d % n_hosts)
            row = {
                "query_id": qid, "page": 0, "category": sources,
                "title": f"Result {rank} for {query}",
                "url": f"http://{host}/p/{d % 37}",
                "description": f"Description {rank} about {query}",
                "source": "AC-Engine",
            }
            if sources == "images":
                row.update(
                    position=rank + 1,
                    image_url=f"http://{host}/img/{d % 97}.jpg",
                    image_width=640 + d % 1280,
                    image_height=480 + (d >> 8) % 720,
                    thumbnail_src=f"http://{host}/thumb/{d % 97}.jpg",
                    img_format=["jpeg", "png", "webp"][d % 3],
                    filesize=f"{(d % 900) + 100} KB",
                )
            elif sources == "news":
                row.update(
                    position=rank,
                    snippet=f"Snippet {rank} about {query}",
                    date=f"2026-{1 + d % 12:02d}-{1 + d % 28:02d}",
                    image_url=f"http://{host}/news-thumb/{d % 97}.jpg",
                )
            else:
                row["category"] = "web"
                row["position"] = rank
            rows.append(row)
        out.extend(_sliced(rows, limit))
    return out


def sql_serp_search(queries: list[tuple[str, str, int]]) -> str:
    return values_sql(google_serp_rows(queries), _SERP_COLUMNS)


def sql_serp_searxng(queries: list[tuple[str, str, int, str]]) -> str:
    return values_sql(searxng_serp_rows(queries), _SERP_COLUMNS)


def sql_serp_ac(queries: list[tuple[str, str, int]]) -> str:
    return values_sql(ac_serp_rows(queries), _SERP_COLUMNS)


def sql_serp_enrich(queries: list[tuple[str, str, int]]) -> str:
    """Expected J2 enrichment: SERP mirror rows left-joined with the
    sequential fetch+extract of each distinct result URL (status-200 only)."""
    from anycrawl_spark import synth
    from anycrawl_spark.functions.htmlmd import extract_document

    serp = google_serp_rows(queries)
    docs: dict[str, tuple[str, str]] = {}
    for url in {r["url"] for r in serp}:
        if synth.page_status(url) == 200:
            doc = extract_document(synth.page_html(url), url)
            docs[url] = (doc["title"], doc["markdown"])
    rows = [
        {**r, "doc_title": docs.get(r["url"], (None, None))[0],
         "markdown": docs.get(r["url"], (None, None))[1]}
        for r in serp
    ]
    cols = _SERP_COLUMNS + [("doc_title", "VARCHAR"), ("markdown", "VARCHAR")]
    return values_sql(rows, cols)


# ------------------------------------------------------------- crawl round

def sql_crawl_round(n_jobs: int = 2, limit: int = 20, max_rounds: int = 20) -> str:
    """Expected terminal frontier log from the sequential ReferenceSimulator
    (the independent BFS oracle the parity tests run) for the exact
    configuration ``q_crawl_round`` drives through the Spark engine."""
    from anycrawl_spark import synth
    from anycrawl_spark.crawl.params import CrawlParams
    from anycrawl_spark.crawl.simulator import ReferenceSimulator

    jobs = [dict(j, limit=limit) for j in synth.seed_jobs(n_jobs)]
    sim = ReferenceSimulator(jobs, synth.robots_rules(), CrawlParams(max_rounds=max_rounds))
    sim.run()
    rows = [
        {"job_id": jid, "url": url, "depth": depth,
         "discovery_seq": seq, "status": status}
        for jid, url, depth, seq, status in sim.frontier_log()
    ]
    cols = [("job_id", "VARCHAR"), ("url", "VARCHAR"), ("depth", "INTEGER"),
            ("discovery_seq", "BIGINT"), ("status", "VARCHAR")]
    return values_sql(rows, cols)


# ----------------------------------------------------------- media features

def sql_media_features(max_doc_id: int = 50, dim: int = 8) -> str:
    """Expected (media_ref, dim, value, ok) rows: the feature pipeline
    recomputed sequentially per ref — REAL stdlib decode for every fixture
    format (PNG/JPEG/GIF/lossless-WebP) — joined against the documents
    view so only doc_ids present in the table at this sf survive."""
    from anycrawl_spark.operators.multimodal import feature_for_payload, synth_media

    rows = []
    for doc_id in range(max_doc_id):
        ref = f"http://media.synth/img/{doc_id}"
        payload, _ = synth_media(ref)
        vec = feature_for_payload(payload, dim)
        for i, v in enumerate(vec):
            rows.append({
                "media_ref": ref, "dim": i,
                "value": _round_half_up(float(v), 6), "ok": True,
            })
    cols = [("media_ref", "VARCHAR"), ("dim", "INTEGER"),
            ("value", "DOUBLE"), ("ok", "BOOLEAN")]
    feat = values_sql(rows, cols)
    return f"""
WITH refs AS (
  SELECT 'http://media.synth/img/' || doc_id AS media_ref
  FROM documents WHERE doc_id < {max_doc_id}),
feat AS ({feat})
SELECT f.media_ref, f.dim, f.value, f.ok
FROM feat f JOIN refs USING (media_ref)
"""


def sql_frame_samples(max_doc_id: int = 40, every_ms: int = 100) -> str:
    """Expected (media_ref, frame_idx, ts_ms, frame_md5) rows: the frame
    sampler recomputed sequentially per ref through the SAME kernel the
    Spark stage runs (frames_for_payload — real composited GIF animation
    frames as PNG bytes, deterministic fake elsewhere), joined against the
    documents view so only doc_ids present at this sf survive."""
    import hashlib as _hashlib

    from anycrawl_spark.operators.multimodal import frames_for_payload, synth_media

    rows = []
    for doc_id in range(max_doc_id):
        ref = f"http://media.synth/img/{doc_id}"
        payload, meta = synth_media(ref)
        for i, ts, frame in frames_for_payload(payload, meta, every_ms):
            rows.append({
                "media_ref": ref, "frame_idx": i, "ts_ms": ts,
                "frame_md5": _hashlib.md5(frame).hexdigest(),
            })
    cols = [("media_ref", "VARCHAR"), ("frame_idx", "INTEGER"),
            ("ts_ms", "INTEGER"), ("frame_md5", "VARCHAR")]
    feat = values_sql(rows, cols)
    return f"""
WITH refs AS (
  SELECT 'http://media.synth/img/' || doc_id AS media_ref
  FROM documents WHERE doc_id < {max_doc_id}),
feat AS ({feat})
SELECT f.media_ref, f.frame_idx, f.ts_ms, f.frame_md5
FROM feat f JOIN refs USING (media_ref)
"""


def sql_audio_features(max_doc_id: int = 40, dim: int = 8) -> str:
    """Expected (media_ref, dim, value, ok) rows for the AUDIO namespace:
    the feature pipeline recomputed sequentially per ref — REAL stdlib
    RIFF/WAV decode (functions/wav.py) + chunked-RMS audio_feature — joined
    against the documents view so only doc_ids present at this sf
    survive."""
    from anycrawl_spark.operators.multimodal import feature_for_payload, synth_media

    rows = []
    for doc_id in range(max_doc_id):
        ref = f"http://media.synth/aud/{doc_id}"
        payload, _ = synth_media(ref)
        vec = feature_for_payload(payload, dim)
        for i, v in enumerate(vec):
            rows.append({
                "media_ref": ref, "dim": i,
                "value": _round_half_up(float(v), 6), "ok": True,
            })
    cols = [("media_ref", "VARCHAR"), ("dim", "INTEGER"),
            ("value", "DOUBLE"), ("ok", "BOOLEAN")]
    feat = values_sql(rows, cols)
    return f"""
WITH refs AS (
  SELECT 'http://media.synth/aud/' || doc_id AS media_ref
  FROM documents WHERE doc_id < {max_doc_id}),
feat AS ({feat})
SELECT f.media_ref, f.dim, f.value, f.ok
FROM feat f JOIN refs USING (media_ref)
"""


def sql_audio_clips(
    max_doc_id: int = 30, every_ms: int = 100, clip_ms: int = 50
) -> str:
    """Expected (media_ref, clip_idx, ts_ms, clip_md5) rows: the clip
    sampler recomputed sequentially per ref through the SAME kernel the
    Spark stage runs (clips_for_payload — real decoded sample windows
    re-encoded as 16-bit-PCM WAV), joined against the documents view so
    only doc_ids present at this sf survive."""
    import hashlib as _hashlib

    from anycrawl_spark.operators.multimodal import clips_for_payload, synth_media

    rows = []
    for doc_id in range(max_doc_id):
        ref = f"http://media.synth/aud/{doc_id}"
        payload, _meta = synth_media(ref)
        for i, ts, clip in clips_for_payload(payload, every_ms, clip_ms):
            rows.append({
                "media_ref": ref, "clip_idx": i, "ts_ms": ts,
                "clip_md5": _hashlib.md5(clip).hexdigest(),
            })
    cols = [("media_ref", "VARCHAR"), ("clip_idx", "INTEGER"),
            ("ts_ms", "INTEGER"), ("clip_md5", "VARCHAR")]
    feat = values_sql(rows, cols)
    return f"""
WITH refs AS (
  SELECT 'http://media.synth/aud/' || doc_id AS media_ref
  FROM documents WHERE doc_id < {max_doc_id}),
feat AS ({feat})
SELECT f.media_ref, f.clip_idx, f.ts_ms, f.clip_md5
FROM feat f JOIN refs USING (media_ref)
"""


def sql_pii_redact(max_doc_id: int = 300) -> str:
    """Full SQL restatement of q_pii_redact: the SAME portable regex
    patterns (functions/pii.py PII_PATTERNS — no backreferences/lookaround,
    so Java regex and RE2 agree) run through DuckDB's RE2 with the 'g'
    flag, over the same deterministic per-doc_id plant. A true value
    oracle: counts AND the md5 of the redacted bytes."""
    from anycrawl_spark.functions.pii import sql_pii_counts, sql_redact_pii

    counts = ",\n       ".join(sql_pii_counts("t"))
    redact = sql_redact_pii("t")
    return f"""
WITH base AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)
                || '@mail.example.com call +1-415-555-0'
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
           WHEN 1 THEN ' from 10.' || CAST(doc_id % 250 AS VARCHAR)
                || '.0.1 pay 4111 1111 1111 '
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE '' END AS t
  FROM documents WHERE doc_id < {max_doc_id})
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {counts},
       md5({redact}) AS redacted_md5
FROM base
"""


def sql_decontaminate(
    max_doc_id: int = 400,
    n: int = 8,
    bench_mod: int = 37,
    bench_rem: int = 3,
    snippet_tokens: int = 12,
) -> str:
    """Full SQL restatement of q_decontaminate: the same lowercase
    whitespace tokenization, benchmark snippets (first ``snippet_tokens``
    tokens of every doc_id % bench_mod == bench_rem document), token
    n-grams via correlated UNNEST(range(...)), and the gram-equality join
    + per-doc distinct-gram count."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents WHERE doc_id < {max_doc_id}),
bench AS (
  SELECT DISTINCT array_to_string(t[i:i+{n - 1}], ' ') AS gram
  FROM toks, UNNEST(range(1, least(len(t), {snippet_tokens}) - {n - 2})) AS u(i)
  WHERE doc_id % {bench_mod} = {bench_rem} AND len(t) >= {n}),
doc_grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS gram
  FROM toks, UNNEST(range(1, len(t) - {n - 2})) AS u(i)
  WHERE len(t) >= {n})
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(DISTINCT gram) AS BIGINT) AS n_contaminated_grams
FROM doc_grams JOIN bench USING (gram)
GROUP BY doc_id
"""


def sql_repetition_stats(max_doc_id: int = 300) -> str:
    """Full SQL restatement of q_repetition_stats: same lowercase
    whitespace tokenization, n-grams via correlated UNNEST(range(...)),
    per-doc groupBy counts. Gram keys join tokens with ' ' — collision-free
    because whitespace-split tokens cannot contain spaces (the python
    kernel's tuple keys are equivalent). All outputs cast to BIGINT
    (DuckDB sum() would otherwise widen to HUGEINT and fail the dtype-
    sensitive compare)."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents WHERE doc_id < {max_doc_id}),
uni AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY doc_id, w),
unistats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct_tokens,
         CAST(max(c) AS BIGINT) AS top_token_count
  FROM uni GROUP BY doc_id),
big AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count FROM (
    SELECT doc_id, g, count(*) AS c FROM (
      SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
      FROM toks, UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2)
    GROUP BY doc_id, g) GROUP BY doc_id),
tri AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_trigram_count FROM (
    SELECT doc_id, g, count(*) AS c FROM (
      SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
      FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3)
    GROUP BY doc_id, g) GROUP BY doc_id),
five AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_5grams,
         CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_5grams FROM (
    SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
    FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5)
  GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       coalesce(n_tokens, 0) AS n_tokens,
       coalesce(n_distinct_tokens, 0) AS n_distinct_tokens,
       coalesce(top_token_count, 0) AS top_token_count,
       coalesce(top_bigram_count, 0) AS top_bigram_count,
       coalesce(top_trigram_count, 0) AS top_trigram_count,
       coalesce(n_5grams, 0) AS n_5grams,
       coalesce(n_distinct_5grams, 0) AS n_distinct_5grams
FROM (SELECT DISTINCT doc_id FROM toks) d
LEFT JOIN unistats USING (doc_id)
LEFT JOIN big USING (doc_id)
LEFT JOIN tri USING (doc_id)
LEFT JOIN five USING (doc_id)
"""


def sql_normalize_text(max_doc_id: int = 60) -> str:
    """Oracle for q_normalize_text: HAND-DERIVED golden expectations per
    fixture (NORMALIZE_FIXTURES carries (raw, expected) pairs justified
    char-by-char against the Unicode rules), joined to the documents view
    by case_id = doc_id % k. The Spark side computes through the Arrow
    kernel; the oracle side never runs the kernel."""
    from anycrawl_spark.functions.normalize import NORMALIZE_FIXTURES

    k = len(NORMALIZE_FIXTURES)
    rows = [
        {"case_id": i, "normalized": exp}
        for i, (_raw, exp) in enumerate(NORMALIZE_FIXTURES)
    ]
    feat = values_sql(rows, [("case_id", "INTEGER"), ("normalized", "VARCHAR")])
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(doc_id % {k} AS INTEGER) AS case_id
  FROM documents WHERE doc_id < {max_doc_id}),
g AS ({feat})
SELECT d.doc_id, d.case_id, g.normalized
FROM d JOIN g USING (case_id)
"""


def sql_pack_manifest(max_doc_id: int = 500, budget: int = 64) -> str:
    """Full SQL restatement of q_pack_manifest: the sequential form of the
    prefix sum (a plain window cumsum — fine in an oracle, a scale trap in
    the engine), pack ids via exact integer division (//), slice bounds via
    greatest/least, manifest rows via generate_series."""
    return f"""
WITH docs AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents WHERE doc_id < {max_doc_id}),
off AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_tok
  FROM docs),
spans AS (
  SELECT doc_id, n_tokens, start_tok,
         start_tok // {budget} AS fp,
         (start_tok + n_tokens - 1) // {budget} AS lp
  FROM off WHERE n_tokens > 0)
SELECT CAST(p AS BIGINT) AS pack_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(greatest(start_tok, p * {budget}) - start_tok AS BIGINT)
         AS doc_tok_start,
       CAST(greatest(start_tok, p * {budget}) - p * {budget} AS BIGINT)
         AS pack_tok_start,
       CAST(least(start_tok + n_tokens, (p + 1) * {budget})
            - greatest(start_tok, p * {budget}) AS BIGINT) AS slice_len
FROM spans, UNNEST(generate_series(fp, lp)) AS g(p)
"""


def sql_mixture_sample(shares: dict[str, float]) -> str:
    """Full SQL restatement of q_mixture_sample: the rates re-derive from
    the SAME per-source counts inside SQL (shares LEFT JOIN counts, so a
    share naming an absent source forces N* = 0 exactly like the python
    solver), and the keep decision is the identical lexicographic
    substr(md5(...), 1, 8) < threshold compare. IEEE double ops in the
    rate math are identical in both engines (same division/multiply
    order), so the printf('%08x', floor(rate * 2^32)) thresholds match
    the python side bit-exactly."""
    share_rows = ", ".join(
        f"('{s}', {v!r})" for s, v in sorted(shares.items())
    )
    return f"""
WITH shares(source, share) AS (VALUES {share_rows}),
counts AS (
  SELECT source, count(*) AS c FROM documents GROUP BY source),
lim AS (
  SELECT min(coalesce(c, 0) / share) AS nstar
  FROM shares LEFT JOIN counts USING (source) WHERE share > 0),
rates AS (
  SELECT c.source,
         least(1.0, (SELECT nstar FROM lim) * coalesce(s.share, 0.0) / c.c)
           AS rate
  FROM counts c LEFT JOIN shares s USING (source)),
thr AS (
  SELECT source,
         CASE WHEN rate >= 1.0 THEN 'g'
              ELSE printf('%08x', CAST(floor(rate * 4294967296) AS BIGINT))
         END AS t
  FROM rates)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source
FROM documents d JOIN thr USING (source)
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < t
"""


def sql_curriculum_buckets(n_buckets: int = 10) -> str:
    """Full SQL restatement of q_curriculum_buckets in the SEQUENTIAL form
    — a plain per-source row_number window (fine for an oracle, the skew
    trap the engine's two-phase histogram form exists to avoid). The
    total order (n_tokens, doc_id) and the ((rank-1)*B) // n bucket
    formula match the engine exactly."""
    toks = (
        "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"
    )
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM documents),
r AS (
  SELECT doc_id, source, n_tokens,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY n_tokens, doc_id
         ) AS BIGINT) AS rank,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM d)
SELECT doc_id, source, n_tokens, rank,
       CAST(((rank - 1) * {n_buckets}) // n AS BIGINT) AS bucket
FROM r
"""


def sql_anchor_terms(
    n_nodes: int = 200, fanout: int = 4, n_words: int = 3, k: int = 3
) -> str:
    """Full SQL restatement of q_anchor_terms: the synthetic graph is
    regenerated with the identical int64 mixing, each edge's anchor is the
    source doc's first n_words lowercase tokens, and the per-target top-k
    uses the same (cnt desc, term) deterministic ordering."""
    toks = (
        "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
        " x -> x <> '')"
    )
    return f"""
WITH nodes AS (
  SELECT CAST(doc_id AS BIGINT) AS id, {toks} AS toks
  FROM documents WHERE doc_id < {n_nodes}),
raw_edges AS (
  SELECT id AS src,
         ((id * 2654435761 + (j + 1) * 40503 + 12345) % 2147483647)
           % {n_nodes} AS dst
  FROM nodes, UNNEST(generate_series(0, {fanout - 1})) AS g(j)),
edges AS (SELECT DISTINCT src, dst FROM raw_edges WHERE src <> dst),
anchors AS (
  SELECT e.dst AS target_id, unnest(list_slice(n.toks, 1, {n_words})) AS term
  FROM edges e JOIN nodes n ON n.id = e.src),
counts AS (
  SELECT target_id, term, CAST(count(*) AS BIGINT) AS cnt
  FROM anchors GROUP BY target_id, term),
ranked AS (
  SELECT target_id, term, cnt,
         CAST(row_number() OVER (
           PARTITION BY target_id ORDER BY cnt DESC, term
         ) AS BIGINT) AS rnk
  FROM counts)
SELECT target_id, term, cnt, rnk FROM ranked WHERE rnk <= {k}
"""


def sql_warc_manifest() -> str:
    """Full SQL restatement of q_warc_manifest: the WARC/1.1 response
    record header grammar (functions/warc.py) rebuilt as DuckDB string
    math — CRLF as chr(13)||chr(10), the record id and block digest as
    md5(), the constant-width sha1-base32 payload digest as a 32-char
    placeholder (length-only), Content-Length as octet_length of the
    UTF-8 payload, and per-segment byte offsets as a cumsum window over
    URL order."""
    crlf = "chr(13) || chr(10)"
    head = f"""
           'WARC/1.1' || {crlf} ||
           'WARC-Type: response' || {crlf} ||
           'WARC-Record-ID: <urn:anycrawl:' || md5(url || '|' || warc_date) || '>' || {crlf} ||
           'WARC-Date: ' || warc_date || {crlf} ||
           'WARC-Target-URI: ' || url || {crlf} ||
           'Content-Type: text/plain; charset=utf-8' || {crlf} ||
           'WARC-Block-Digest: md5:' || md5(text) || {crlf} ||
           'WARC-Payload-Digest: sha1:' || repeat('A', 32) || {crlf} ||
           'Content-Length: ' || CAST(octet_length(encode(text)) AS VARCHAR) || {crlf} ||
           {crlf}"""
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         'http://h' || CAST(doc_id % 40 AS VARCHAR) || '.example/p/'
            || CAST(doc_id AS VARCHAR) AS url,
         'h' || CAST(doc_id % 40 AS VARCHAR) || '.example' AS segment,
         '2026-08-20T'
            || lpad(CAST(((doc_id * 977) % 86400) // 3600 AS VARCHAR), 2, '0') || ':'
            || lpad(CAST((((doc_id * 977) % 86400) // 60) % 60 AS VARCHAR), 2, '0') || ':'
            || lpad(CAST(((doc_id * 977) % 86400) % 60 AS VARCHAR), 2, '0') || 'Z'
            AS warc_date
  FROM documents),
m AS (
  SELECT doc_id, url, segment, warc_date,
         'urn:anycrawl:' || md5(url || '|' || warc_date) AS record_id,
         'md5:' || md5(text) AS block_digest,
         CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
         CAST(octet_length(encode({head}
         )) + octet_length(encode(text)) + 4 AS BIGINT) AS record_len
  FROM d)
SELECT doc_id, url, segment, warc_date, record_id, block_digest,
       content_length, record_len,
       CAST(coalesce(sum(record_len) OVER (
         PARTITION BY segment ORDER BY url
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) AS BIGINT) AS byte_offset
FROM m
"""


def sql_cdx_index() -> str:
    """Full SQL restatement of q_cdx_index: the messy-URL synthesis, the
    complete SURT canonicalization (lowercase, scheme/fragment drop, www
    strip, default-port drop, host-label reversal, query-param sort —
    DuckDB list/regex functions mirroring the Spark column math), the
    WARC response-record length grammar, and the absolute offset.

    The warcinfo framing constant 267 is HAND-DERIVED from the grammar
    in functions/warc.py (never imported from it — the kernel must not
    oracle itself): version line 10 + 'WARC-Type: warcinfo'+CRLF 21 +
    record-id line (30 constant chars + 32 hex + '>'+CRLF) 65 +
    'WARC-Date: '+20+CRLF 33 + 'WARC-Filename: '+CRLF 17 (+ filename
    octets, added per-row) + 'Content-Type: application/warc-fields'+
    CRLF 39 + 'Content-Length: 56'+CRLF 20 + blank CRLF 2 + 56-octet
    warc-fields payload + record trailer 4 = 267.
    tests/test_surt_cdx.py pins the same 267 against the live kernel."""
    crlf = "chr(13) || chr(10)"
    head = f"""
           'WARC/1.1' || {crlf} ||
           'WARC-Type: response' || {crlf} ||
           'WARC-Record-ID: <urn:anycrawl:' || md5(url || '|' || warc_date) || '>' || {crlf} ||
           'WARC-Date: ' || warc_date || {crlf} ||
           'WARC-Target-URI: ' || url || {crlf} ||
           'Content-Type: text/plain; charset=utf-8' || {crlf} ||
           'WARC-Block-Digest: md5:' || md5(text) || {crlf} ||
           'WARC-Payload-Digest: sha1:' || repeat('A', 32) || {crlf} ||
           'Content-Length: ' || CAST(octet_length(encode(text)) AS VARCHAR) || {crlf} ||
           {crlf}"""
    return f"""
WITH d AS (
  SELECT text,
         (CASE WHEN doc_id % 3 = 0 THEN 'https://' ELSE 'http://' END)
           || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
           || 'H' || CAST(doc_id % 40 AS VARCHAR) || '.Example.ORG'
           || (CASE doc_id % 5 WHEN 0 THEN ':8080' WHEN 1 THEN ':80'
               WHEN 2 THEN ':443' ELSE '' END)
           || '/Page/' || CAST(doc_id AS VARCHAR)
           || (CASE doc_id % 4
               WHEN 0 THEN '?b=' || CAST(doc_id AS VARCHAR) || '&a=1&A=2'
               WHEN 1 THEN '?z=9' WHEN 2 THEN '?' ELSE '' END)
           || (CASE WHEN doc_id % 7 = 0 THEN '#Sec-2' ELSE '' END) AS url,
         'h' || CAST(doc_id % 40 AS VARCHAR) || '.example' AS segment,
         '2026-08-20T'
           || lpad(CAST(((doc_id * 977) % 86400) // 3600 AS VARCHAR), 2, '0') || ':'
           || lpad(CAST((((doc_id * 977) % 86400) // 60) % 60 AS VARCHAR), 2, '0') || ':'
           || lpad(CAST(((doc_id * 977) % 86400) % 60 AS VARCHAR), 2, '0') || 'Z'
           AS warc_date
  FROM documents),
u0 AS (
  SELECT *, str_split(regexp_replace(lower(url), '^https?://', ''), '#')[1] AS u
  FROM d),
p0 AS (
  SELECT *,
         regexp_extract(u, '^([^/?]*)', 1) AS hostport,
         substr(u, length(regexp_extract(u, '^([^/?]*)', 1)) + 1) AS rest
  FROM u0),
h0 AS (
  SELECT *,
         regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
         regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                        '^www\\.', '') AS host
  FROM p0),
s0 AS (
  SELECT *,
         array_to_string(list_reverse(str_split(host, '.')), ',')
           || (CASE WHEN port <> '' AND port NOT IN ('80', '443')
               THEN ':' || port ELSE '' END) AS revh,
         CASE WHEN regexp_extract(rest, '^([^?]*)', 1) = '' THEN '/'
              ELSE regexp_extract(rest, '^([^?]*)', 1) END AS path,
         strpos(rest, '?') AS qpos
  FROM h0),
k0 AS (
  SELECT *,
         CASE WHEN qpos > 0
           THEN revh || ')' || path || '?' || array_to_string(
                  list_sort(str_split(substr(rest, qpos + 1), '&')), '&')
           ELSE revh || ')' || path END AS surt_key
  FROM s0),
m AS (
  SELECT surt_key, url, segment, warc_date,
         'md5:' || md5(text) AS block_digest,
         CAST(octet_length(encode({head}
         )) + octet_length(encode(text)) + 4 AS BIGINT) AS record_len
  FROM k0)
SELECT surt_key,
       regexp_replace(warc_date, '[-T:Z]', '', 'g') AS cdx_ts,
       url,
       segment || '.warc' AS filename,
       CAST(267 + octet_length(encode(segment || '.warc'))
         + coalesce(sum(record_len) OVER (
             PARTITION BY segment ORDER BY url
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS abs_offset,
       record_len, block_digest
FROM m
"""


def sql_recrawl_priority(horizon: int = 10000, k: int = 5, scale: int = 1000) -> str:
    """Full SQL restatement of q_recrawl_priority: the same digest
    mixing, lag-window change detection, fixed-point rate (half-scale
    cold-start prior), staleness priority, and per-host top-k with
    (priority desc, url asc) tie-breaks."""
    return f"""
WITH v AS (
  SELECT CAST(user_id AS BIGINT) AS url_id,
         CAST(event_id AS BIGINT) AS seq,
         CAST(((event_id % 7) * 2654435761) % 13 AS VARCHAR) AS digest
  FROM events),
c AS (
  SELECT url_id, seq, digest,
         CASE WHEN lag(digest) OVER (PARTITION BY url_id ORDER BY seq)
                   IS NOT NULL
               AND digest <> lag(digest) OVER (PARTITION BY url_id ORDER BY seq)
              THEN 1 ELSE 0 END AS chg
  FROM v),
s AS (
  SELECT url_id,
         CAST(count(*) AS BIGINT) AS n_visits,
         CAST(sum(chg) AS BIGINT) AS n_changes,
         CAST(max(seq) AS BIGINT) AS last_seq
  FROM c GROUP BY url_id),
p AS (
  SELECT 'h' || CAST(url_id % 20 AS VARCHAR) AS host,
         url_id, n_visits, n_changes, last_seq,
         CAST(CASE WHEN n_visits > 1
              THEN (n_changes * {scale}) // (n_visits - 1)
              ELSE {scale // 2} END AS BIGINT) AS rate_scaled,
         CAST({horizon} - last_seq AS BIGINT) AS age
  FROM s),
r AS (
  SELECT *, CAST(rate_scaled * age AS BIGINT) AS priority FROM p),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY host ORDER BY priority DESC, url_id
         ) AS BIGINT) AS rnk
  FROM r)
SELECT host, url_id, n_visits, n_changes, last_seq, rate_scaled, age,
       priority, rnk
FROM ranked WHERE rnk <= {k}
"""


def sql_frontier_sharding(n_old: int = 16, n_new: int = 17) -> str:
    """Full SQL restatement of q_frontier_sharding in the RELATIONAL
    form (UNNEST shards + arg_max by md5 weight) — deliberately a
    different computational shape than the engine's greatest-of-structs
    projection, so the two derivations cross-check each other."""

    def assign(n: int, alias: str) -> str:
        return f"""
  SELECT host, CAST(arg_max(s, md5(host || ':' || CAST(s AS VARCHAR)))
               AS BIGINT) AS {alias}
  FROM hosts, UNNEST(generate_series(0, {n - 1})) AS g(s)
  GROUP BY host"""

    return f"""
WITH hosts AS (
  SELECT 'h' || CAST(doc_id AS VARCHAR) || '.example.net' AS host
  FROM documents),
w_old AS ({assign(n_old, "shard_old")}),
w_new AS ({assign(n_new, "shard_new")}),
j AS (
  SELECT w_new.host, shard_old, shard_new
  FROM w_new JOIN w_old USING (host))
SELECT shard_new AS shard,
       CAST(count(*) AS BIGINT) AS n_hosts_new,
       CAST(sum(CASE WHEN shard_old = shard_new THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stayed,
       CAST(sum(CASE WHEN shard_old <> shard_new THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved_in
FROM j GROUP BY shard_new
"""


def sql_trap_signals() -> str:
    """Full SQL restatement of q_trap_signals with the RELATIONAL
    repeat-segment derivation (UNNEST each URL's path segments, group,
    HAVING count>=3) — cross-checking the engine's sorted-adjacency
    zip_with form."""
    return r"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         'trap' || CAST(doc_id % 30 AS VARCHAR) || '.example' AS host,
         'http://trap' || CAST(doc_id % 30 AS VARCHAR) || '.example' ||
         (CASE (doc_id % 30) % 3
          WHEN 0 THEN '/p/' || CAST(doc_id AS VARCHAR)
          WHEN 1 THEN '/a/' || CAST(doc_id % 5 AS VARCHAR)
                   || '/a/' || CAST(doc_id AS VARCHAR) || '/a/x'
          ELSE '/q?x=' || CAST(doc_id AS VARCHAR) || '&y=1&z=2' END) AS url
  FROM documents),
p AS (
  SELECT doc_id, host,
         list_filter(str_split(
           regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1), '/'),
           x -> x <> '') AS segs,
         regexp_extract(url, '\?([^#]*)', 1) AS q
  FROM d),
rep AS (
  SELECT doc_id, CAST(1 AS BIGINT) AS rep3 FROM (
    SELECT doc_id, seg, count(*) AS c
    FROM p, UNNEST(segs) AS t(seg)
    GROUP BY doc_id, seg HAVING count(*) >= 3)
  GROUP BY doc_id),
per_url AS (
  SELECT p.doc_id, host,
         CAST(len(segs) AS BIGINT) AS depth,
         coalesce(rep.rep3, 0) AS rep3,
         CAST(CASE WHEN q <> '' THEN len(str_split(q, '&')) ELSE 0 END
              AS BIGINT) AS params
  FROM p LEFT JOIN rep ON p.doc_id = rep.doc_id),
agg AS (
  SELECT host,
         CAST(count(*) AS BIGINT) AS n_urls,
         CAST(max(depth) AS BIGINT) AS max_depth,
         CAST(sum(rep3) AS BIGINT) AS n_repeat_urls,
         CAST((sum(params) * 100) // count(*) AS BIGINT) AS params_x100
  FROM per_url GROUP BY host)
SELECT host, n_urls, max_depth, n_repeat_urls, params_x100,
       CAST(CASE WHEN max_depth >= 5 THEN 1 ELSE 0 END AS BIGINT) AS deep,
       CAST(CASE WHEN n_repeat_urls * 5 >= n_urls THEN 1 ELSE 0 END AS BIGINT)
         AS repeaty,
       CAST(CASE WHEN params_x100 >= 200 THEN 1 ELSE 0 END AS BIGINT) AS paramy,
       CAST((CASE WHEN max_depth >= 5 THEN 1 ELSE 0 END)
          + 2 * (CASE WHEN n_repeat_urls * 5 >= n_urls THEN 1 ELSE 0 END)
          + 2 * (CASE WHEN params_x100 >= 200 THEN 1 ELSE 0 END) AS BIGINT)
         AS trap_score
FROM agg
"""


def sql_compaction_plan(target_kb: int = 4096, small_kb: int = 2048) -> str:
    """Full SQL restatement of q_compaction_plan: identical manifest
    synthesis and the same (bytes asc, file asc) prefix-sum next-fit
    packing; big files contribute 0 to the prefix and get bin -1."""
    return f"""
WITH m AS (
  SELECT 'p' || CAST(doc_id % 8 AS VARCHAR) AS partition,
         CAST(doc_id AS BIGINT) AS file_id,
         CAST(CASE WHEN doc_id % 11 = 0 THEN ((doc_id * 37) % 3000) + 4096
              ELSE ((doc_id * 7919) % 1990) + 10 END AS BIGINT) AS kb
  FROM documents),
c AS (
  SELECT partition, file_id, kb,
         CAST(coalesce(sum(CASE WHEN kb < {small_kb} THEN kb ELSE 0 END) OVER (
           PARTITION BY partition ORDER BY kb, file_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_before
  FROM m)
SELECT partition, file_id, kb, cum_before,
       CAST(CASE WHEN kb < {small_kb} THEN cum_before // {target_kb}
            ELSE -1 END AS BIGINT) AS bin
FROM c
"""


def sql_snapshot_diff() -> str:
    """Full SQL restatement of q_snapshot_diff: identical mutation
    synthesis, the same lowercase-token 3-gram distinct sets, and the
    set-difference/intersection counts + scaled Jaccard distance."""
    toks = (
        "list_filter(regexp_split_to_array(trim(lower({t})), '\\s+'),"
        " x -> x <> '')"
    )
    grams = (
        "list_distinct(list_transform("
        " generate_series(1, greatest(len({l}) - 2, 0)),"
        " i -> array_to_string(list_slice({l}, i, i + 2), ' ')))"
    )
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         'u' || CAST(doc_id AS VARCHAR) AS url, text
  FROM documents),
pair AS (
  SELECT url, text AS t_old,
         CASE WHEN id % 3 = 0 THEN text
              WHEN id % 3 = 1 THEN text || ' fresh update section '
                   || CAST(id AS VARCHAR)
              ELSE substr(text, 15) || ' tail note ' || CAST(id AS VARCHAR)
         END AS t_new
  FROM d),
toksed AS (
  SELECT url, {toks.format(t='t_old')} AS lo, {toks.format(t='t_new')} AS ln
  FROM pair),
sh AS (
  SELECT url, {grams.format(l='lo')} AS da, {grams.format(l='ln')} AS db
  FROM toksed),
cnt AS (
  SELECT url,
         CAST(len(da) AS BIGINT) AS n_old,
         CAST(len(db) AS BIGINT) AS n_new,
         CAST(len(list_filter(db, x -> NOT list_contains(da, x))) AS BIGINT)
           AS n_added,
         CAST(len(list_filter(da, x -> NOT list_contains(db, x))) AS BIGINT)
           AS n_removed,
         CAST(len(list_filter(da, x -> list_contains(db, x))) AS BIGINT)
           AS n_common
  FROM sh)
SELECT url, n_old, n_new, n_added, n_removed, n_common,
       CAST(CASE WHEN n_added + n_removed + n_common > 0
            THEN ((n_added + n_removed) * 1000)
                 // (n_added + n_removed + n_common)
            ELSE 0 END AS BIGINT) AS change_x1000
FROM cnt
"""


def sql_fair_alloc() -> str:
    """Full SQL restatement of q_fair_alloc: same demand/capacity
    synthesis and the same closed-form water-filling — rank window,
    prefix sums, the monotone break condition, the largest satisfied
    rank K per host, and the base+remainder split for the rest."""
    return """
WITH d AS (
  SELECT 'h' || CAST(doc_id % 25 AS VARCHAR) AS host,
         CAST(doc_id AS BIGINT) AS job_id,
         CAST((doc_id * 7919) % 97 AS BIGINT) AS demand,
         CAST(100 + ((doc_id % 25) * 53) % 400 AS BIGINT) AS capacity
  FROM documents),
r AS (
  SELECT *,
         CAST(row_number() OVER w AS BIGINT) AS k,
         CAST(count(*) OVER (PARTITION BY host) AS BIGINT) AS n,
         CAST(sum(demand) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS prefix
  FROM d
  WINDOW w AS (PARTITION BY host ORDER BY demand, job_id)),
s AS (
  SELECT *,
         (demand * (n - k + 1) + prefix - demand) <= capacity AS sat
  FROM r),
m AS (
  SELECT *,
         CAST(max(CASE WHEN sat THEN k ELSE 0 END)
              OVER (PARTITION BY host) AS BIGINT) AS bigk,
         CAST(max(CASE WHEN sat THEN prefix ELSE 0 END)
              OVER (PARTITION BY host) AS BIGINT) AS prefk
  FROM s)
SELECT host, job_id, demand, capacity, k,
       CAST(CASE WHEN k <= bigk THEN demand
            ELSE (CASE WHEN n - bigk > 0
                  THEN (capacity - prefk) // (n - bigk)
                       + (CASE WHEN k - bigk <= (capacity - prefk) % (n - bigk)
                          THEN 1 ELSE 0 END)
                  ELSE 0 END)
       END AS BIGINT) AS alloc,
       CAST(CASE WHEN k <= bigk THEN 1 ELSE 0 END AS BIGINT) AS fully_served
FROM m
"""


def sql_latency_percentiles(percentiles: list[int]) -> str:
    """Full SQL restatement of q_latency_percentiles: same histogram,
    cumulative window, integer ceil threshold, and min-value-at-rank
    lookup (NOT DuckDB's quantile_disc — restating the derivation keeps
    the definition under test)."""
    plist = ", ".join(f"({p})" for p in sorted(set(percentiles)))
    return f"""
WITH d AS (
  SELECT event_type AS grp,
         CAST((event_id * 37) % 1000 AS BIGINT) AS value
  FROM events),
hist AS (
  SELECT grp, value, CAST(count(*) AS BIGINT) AS c
  FROM d GROUP BY grp, value),
cum AS (
  SELECT grp, value,
         CAST(sum(c) OVER (PARTITION BY grp ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM hist),
ps(p) AS (VALUES {plist}),
x AS (
  SELECT grp, value, cum, n, CAST(p AS BIGINT) AS p,
         CAST((p * n + 99) // 100 AS BIGINT) AS rank_needed
  FROM cum, ps)
SELECT grp, p, n, rank_needed, CAST(min(value) AS BIGINT) AS q_value
FROM x WHERE cum >= rank_needed
GROUP BY grp, p, n, rank_needed
"""


def sql_sessionize(gap_s: int = 1800) -> str:
    """Full SQL restatement of q_sessionize — the same gaps-and-islands
    lag + running-sum derivation over integer epoch seconds."""
    return f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s  -- floor, not round:
         -- Spark's timestamp->long cast truncates sub-second fractions
  FROM events),
g AS (
  SELECT user_id, epoch_s,
         CASE WHEN lag(epoch_s) OVER w IS NULL
               OR epoch_s - lag(epoch_s) OVER w > {gap_s}
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s)),
s AS (
  SELECT user_id, epoch_s,
         CAST(sum(new_session) OVER (
           PARTITION BY user_id ORDER BY epoch_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM g)
SELECT user_id, session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(epoch_s) AS BIGINT) AS start_s,
       CAST(max(epoch_s) AS BIGINT) AS end_s,
       CAST(max(epoch_s) - min(epoch_s) AS BIGINT) AS duration_s
FROM s GROUP BY user_id, session_seq
"""


def sql_aimd_rates(
    n_rounds: int = 6, init: int = 8, incr: int = 2, cap: int = 64, floor_min: int = 1
) -> str:
    """Full SQL restatement of q_aimd_rates with the recurrence UNROLLED
    round-by-round as chained CTEs — a different computational shape
    than the engine's higher-order fold, proving the fold semantics."""
    flags = ", ".join(
        f"max(CASE WHEN r = {i} THEN t END) AS t{i}" for i in range(n_rounds)
    )
    steps = []
    prev = "s0"
    for i in range(n_rounds):
        steps.append(f"""
s{i + 1} AS (
  SELECT k,
         CAST(CASE WHEN t{i} = 1 THEN greatest(rate // 2, {floor_min})
              ELSE least(rate + {incr}, {cap}) END AS BIGINT) AS rate,
         CAST(h + t{i} AS BIGINT) AS h,
         CAST(least(mn, CASE WHEN t{i} = 1 THEN greatest(rate // 2, {floor_min})
              ELSE least(rate + {incr}, {cap}) END) AS BIGINT) AS mn,
         CAST(greatest(mx, CASE WHEN t{i} = 1 THEN greatest(rate // 2, {floor_min})
              ELSE least(rate + {incr}, {cap}) END) AS BIGINT) AS mx,
         {', '.join(f't{j}' for j in range(i + 1, n_rounds)) or 'NULL AS _pad'}
  FROM {prev})""")
        prev = f"s{i + 1}"
    return f"""
WITH base AS (
  SELECT CAST(doc_id % 25 AS BIGINT) AS k,
         CAST(doc_id // 25 AS BIGINT) AS r,
         CASE WHEN ((doc_id % 25) * 7 + (doc_id // 25) * 13) % 5 = 0
              THEN 1 ELSE 0 END AS t
  FROM documents WHERE doc_id < 150),
f AS (SELECT k, {flags} FROM base GROUP BY k),
s0 AS (
  SELECT k, CAST({init} AS BIGINT) AS rate, CAST(0 AS BIGINT) AS h,
         CAST({init} AS BIGINT) AS mn, CAST({init} AS BIGINT) AS mx,
         {', '.join(f't{j}' for j in range(n_rounds))}
  FROM f),{','.join(steps)}
SELECT 'h' || CAST(k AS VARCHAR) AS host,
       CAST({n_rounds} AS BIGINT) AS n_rounds,
       rate AS final_rate, h AS n_halvings, mn AS min_rate, mx AS max_rate
FROM {prev}
"""


def sql_bitext_pairs(min_ratio_x100: int = 50) -> str:
    """Full SQL restatement of q_bitext_pairs: same URL synthesis, the
    same closed-set marker regex (DuckDB regexp_replace needs 'g' to
    match Spark's global semantics), the self-join on the wildcarded
    key, and the integer STRAND ratio."""
    langs = "de|en|es|fr|it|ja|nl|pl|pt|ru|zh"
    toks = (
        "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"
    )
    return f"""
WITH d AS (
  SELECT 'http://site' || CAST((doc_id // 3) % 20 AS VARCHAR) || '.example/' ||
         (CASE WHEN doc_id % 17 = 0 THEN 'nolang'
          ELSE (CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                ELSE 'fr' END) END) ||
         '/page/' || CAST(doc_id // 3 AS VARCHAR) AS url,
         CAST(len({toks}) AS BIGINT) AS len
  FROM documents),
keyed AS (
  SELECT url,
         regexp_extract(url, '/({langs})/', 1) AS lang,
         regexp_replace(url, '/({langs})/', '/*/', 'g') AS key,
         len
  FROM d
  WHERE regexp_extract(url, '/({langs})/', 1) <> ''),
pairs AS (
  SELECT a.key, a.lang AS lang_a, b.lang AS lang_b,
         a.url AS url_a, b.url AS url_b,
         a.len AS len_a, b.len AS len_b
  FROM keyed a JOIN keyed b ON a.key = b.key AND a.lang < b.lang)
SELECT key, lang_a, lang_b, url_a, url_b, len_a, len_b,
       CAST(CASE WHEN greatest(len_a, len_b) > 0
            THEN (least(len_a, len_b) * 100) // greatest(len_a, len_b)
            ELSE 0 END AS BIGINT) AS ratio_x100,
       CAST(CASE WHEN (CASE WHEN greatest(len_a, len_b) > 0
            THEN (least(len_a, len_b) * 100) // greatest(len_a, len_b)
            ELSE 0 END) >= {min_ratio_x100} THEN 1 ELSE 0 END AS BIGINT)
         AS accepted
FROM pairs
"""


def sql_index_delta() -> str:
    """Oracle for q_index_delta as the BATCH REBUILD: tokenize the
    effective corpus (base minus tombstones, plus re-adds and fresh
    docs) from scratch and roll up (term, df, sum_tf). The engine
    answers with the arithmetic-adjustment path — the hash gate
    therefore checks the incremental == batch equivalence itself."""
    return r"""
WITH eff AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id < 400 AND doc_id % 10 <> 0
  UNION ALL
  SELECT doc_id, text || ' updated revision' AS text FROM documents
  WHERE doc_id < 400 AND doc_id % 20 = 0
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id >= 400),
docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> x <> '') AS toks
  FROM eff),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  GROUP BY doc_id, term)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS sum_tf
FROM tf GROUP BY term
"""


def sql_variant_clusters() -> str:
    """Full SQL restatement of q_variant_clusters: identical URL
    synthesis and the same fold rules (DuckDB backrefs are \\1 where
    Java's are $1; every fold pattern is anchored so single-vs-global
    replace semantics cannot diverge)."""
    return r"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         CAST(doc_id // 4 AS BIGINT) AS k,
         CAST(doc_id % 4 AS BIGINT) AS v
  FROM documents),
u AS (
  SELECT 'http://' ||
         (CASE v WHEN 1 THEN 'www.' WHEN 2 THEN 'm.' ELSE '' END) ||
         'shop' || CAST(k % 15 AS VARCHAR) || '.example' ||
         (CASE WHEN k % 2 = 0
          THEN '/p/' || CAST(k AS VARCHAR)
               || (CASE WHEN v = 3 THEN '/index.html' ELSE '/' END)
          ELSE '/item/' || CAST(k AS VARCHAR)
               || (CASE WHEN v = 3 THEN '/amp' ELSE '' END) END) ||
         (CASE v WHEN 1 THEN '?utm_source=x&utm_campaign=y'
          WHEN 2 THEN '?gclid=' || CAST(did AS VARCHAR)
               || (CASE WHEN k % 5 = 0 THEN '&color=red' ELSE '' END)
          WHEN 3 THEN '?ref=tw' ELSE '' END) AS url
  FROM d),
parts AS (
  SELECT url,
         str_split(str_split(url, '#')[1], '?')[1] AS base,
         CASE WHEN strpos(url, '?') > 0
              THEN substr(str_split(url, '#')[1], strpos(url, '?') + 1)
              ELSE '' END AS q
  FROM u),
folded AS (
  SELECT url,
         regexp_replace(
           regexp_replace(
             regexp_replace(base, '^(https?://)(?:www|m|amp)\.', '\1'),
             '/index\.html?$', '/'),
           '/amp$', '') AS fbase,
         array_to_string(list_filter(str_split(q, '&'),
           x -> x <> '' AND NOT regexp_matches(x,
             '^(utm_[^=]*|gclid|fbclid|ref|mc_cid|mc_eid)=')), '&') AS qs
  FROM parts),
keyed AS (
  SELECT url,
         CASE WHEN qs <> '' THEN fbase || '?' || qs ELSE fbase END
           AS variant_key
  FROM folded)
SELECT variant_key, CAST(count(*) AS BIGINT) AS n_variants,
       min(url) AS sample_url
FROM keyed GROUP BY variant_key
"""


def sql_source_overlap(threshold: float = 0.5) -> str:
    """Oracle for q_source_overlap: the exact ALL-PAIRS Jaccard over the
    same planted corpus (the SQL_NEAR_DUPLICATES derivation, carrying
    source labels) rolled up by unordered source pair — value-checking
    the engine's LSH path under the max-recall banding convention."""
    return rf"""
WITH base AS (
  SELECT doc_id, text, source FROM documents WHERE doc_id < 30),
tokd AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM base),
mutated AS (
  SELECT t.doc_id + 10000 AS doc_id,
         array_to_string(tk[1:greatest(len(tk) - 3, 1)], ' ') AS text,
         'recrawl' AS source
  FROM tokd t),
alldocs AS (
  SELECT doc_id, text, source FROM base
  UNION ALL SELECT doc_id, text, source FROM mutated),
sh AS (
  SELECT doc_id, source,
         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
              ELSE list_distinct([array_to_string(tk[i:i+2], ' ')
                                 FOR i IN range(1, greatest(len(tk) - 2, 1) + 1)])
         END AS sh
  FROM (SELECT doc_id, source,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS tk
        FROM alldocs)),
pairs AS (
  SELECT a.source AS sa, b.source AS sb,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 4)
           AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT least(sa, sb) AS src_lo, greatest(sa, sb) AS src_hi,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs WHERE jaccard >= {threshold}
GROUP BY least(sa, sb), greatest(sa, sb)
"""


def sql_retention_plan(
    now_s: int, keep_last: int = 5, keep_days: int = 7, keep_weeks: int = 4
) -> str:
    """Full SQL restatement of q_retention_plan: same snapshot
    synthesis, recency rank, day/week bucketing, oldest-of-bucket
    selection, and the tiered keep decision."""
    return f"""
WITH s AS (
  SELECT CAST(doc_id AS BIGINT) AS snapshot_id,
         CAST({now_s} - (doc_id * 17995 + (doc_id * doc_id) % 4999) AS BIGINT)
           AS ts_s
  FROM documents WHERE doc_id < 200),
b AS (
  SELECT snapshot_id, ts_s,
         CAST(row_number() OVER (ORDER BY ts_s DESC, snapshot_id DESC)
              AS BIGINT) AS recency_rank,
         CAST(({now_s} - ts_s) // 86400 AS BIGINT) AS day_bucket,
         CAST(({now_s} - ts_s) // 604800 AS BIGINT) AS week_bucket
  FROM s),
f AS (
  SELECT *,
         CAST(CASE WHEN recency_rank <= {keep_last} THEN 1 ELSE 0 END
              AS BIGINT) AS keep_recent,
         CAST(CASE WHEN row_number() OVER (
                PARTITION BY day_bucket ORDER BY ts_s, snapshot_id) = 1
              AND day_bucket >= 0 AND day_bucket < {keep_days}
              THEN 1 ELSE 0 END AS BIGINT) AS keep_daily,
         CAST(CASE WHEN row_number() OVER (
                PARTITION BY week_bucket ORDER BY ts_s, snapshot_id) = 1
              AND week_bucket >= 0 AND week_bucket < {keep_weeks}
              THEN 1 ELSE 0 END AS BIGINT) AS keep_weekly
  FROM b)
SELECT snapshot_id, ts_s, recency_rank, day_bucket, week_bucket,
       keep_recent, keep_daily, keep_weekly,
       CAST(greatest(keep_recent, keep_daily, keep_weekly) AS BIGINT) AS keep
FROM f
"""


def sql_bpe_encode(max_doc_id: int = 45) -> str:
    """Oracle for q_bpe_encode: HAND-DERIVED golden piece sequences per
    fixture word (BPE_FIXTURES docstring traces every merge against the
    Sennrich et al. paper example), joined to the documents view by
    case_id = doc_id % k. The Spark side trains + encodes through the
    real kernel; the oracle side never runs it."""
    from anycrawl_spark.functions.bpe import BPE_FIXTURES

    k = len(BPE_FIXTURES)
    rows = [
        {"case_id": i, "word": w, "pieces": exp, "n_pieces": len(exp.split())}
        for i, (w, exp) in enumerate(BPE_FIXTURES)
    ]
    feat = values_sql(
        rows,
        [("case_id", "INTEGER"), ("word", "VARCHAR"),
         ("pieces", "VARCHAR"), ("n_pieces", "BIGINT")],
    )
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(doc_id % {k} AS INTEGER) AS case_id
  FROM documents WHERE doc_id < {max_doc_id}),
g AS ({feat})
SELECT d.doc_id, d.case_id, g.word, g.pieces, g.n_pieces
FROM d JOIN g USING (case_id)
"""


def sql_bm25_topk(query_terms: list[str], k: int = 10) -> str:
    """Full SQL restatement of q_bm25_topk: the same exact-integer BM25
    variant (operators/retrieval.py module docstring) — pre-log Robertson
    idf scaled by 10^4, cleared-denominator TF saturation scaled by 10^6,
    per-(doc,term) integer division, int64 sum, (score desc, doc_id) tie
    break. DuckDB's sum() widens to HUGEINT, so the final score is cast
    back to BIGINT to match Spark's long."""
    from anycrawl_spark.operators.retrieval import IDF_SCALE, SAT_SCALE

    terms = sorted({t.lower() for t in query_terms})
    qvals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS t
  FROM docs),
qterms(term) AS (VALUES {qvals}),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  WHERE term IN (SELECT term FROM qterms)
  GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ((2 * ((SELECT n FROM stats) - dfreq.df) + 1) * {IDF_SCALE})
           // (2 * dfreq.df + 1) AS idf,
         (44 * tf.tf * (SELECT t FROM stats) * {SAT_SCALE})
           // (20 * tf.tf * (SELECT t FROM stats)
               + 6 * (SELECT t FROM stats)
               + 18 * dl.dl * (SELECT n FROM stats)) AS sat
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id))
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(sum((idf * sat) // {SAT_SCALE}) AS BIGINT) AS bm25_scaled,
       CAST(count(*) AS BIGINT) AS matched_terms
FROM scored
GROUP BY doc_id
ORDER BY bm25_scaled DESC, doc_id
LIMIT {k}
"""


def sql_link_rank(
    n_nodes: int = 300,
    fanout: int = 4,
    iterations: int = 3,
    m0: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> str:
    """Full SQL restatement of q_link_rank: the synthetic digraph is
    regenerated with the identical int64 mixing arithmetic, and each
    PageRank round is unrolled into a (contrib, rank) CTE pair using the
    same per-edge floor division ``(mass * 85) // (100 * outdeg)``.
    Integer sums are order-independent, so this matches the distributed
    engine bit-exactly — the whole point of the integer-mass design."""
    teleport = m0 * (damp_den - damp_num) // damp_den
    rounds = []
    prev = "r0"
    for i in range(1, iterations + 1):
        rounds.append(f"""
c{i} AS (
  SELECT e.dst,
         sum((r.mass * {damp_num}) // ({damp_den} * o.od)) AS in_mass
  FROM edges e
  JOIN {prev} r ON r.id = e.src
  JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst),
r{i} AS (
  SELECT n.id, CAST({teleport} + coalesce(c{i}.in_mass, 0) AS BIGINT) AS mass
  FROM nodes n LEFT JOIN c{i} ON c{i}.dst = n.id)""")
        prev = f"r{i}"
    return f"""
WITH nodes AS (
  SELECT CAST(doc_id AS BIGINT) AS id FROM documents WHERE doc_id < {n_nodes}),
raw_edges AS (
  SELECT id AS src,
         ((id * 2654435761 + (j + 1) * 40503 + 12345) % 2147483647)
           % {n_nodes} AS dst
  FROM nodes, UNNEST(generate_series(0, {fanout - 1})) AS g(j)),
edges AS (SELECT DISTINCT src, dst FROM raw_edges WHERE src <> dst),
outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
indeg AS (SELECT dst, count(*) AS ind FROM edges GROUP BY dst),
r0 AS (SELECT id, CAST({m0} AS BIGINT) AS mass FROM nodes),{",".join(rounds)}
SELECT n.id AS doc_id,
       {prev}.mass AS rank_mass,
       CAST(coalesce(o.od, 0) AS BIGINT) AS out_deg,
       CAST(coalesce(i.ind, 0) AS BIGINT) AS in_deg
FROM nodes n
JOIN {prev} ON {prev}.id = n.id
LEFT JOIN outdeg o ON o.src = n.id
LEFT JOIN indeg i ON i.dst = n.id
"""


# ----------------------------------------------------------------- ANN LSH

def sql_ann_lsh(dim: int = 64, k: int = 10, bits: int = 4, round_dp: int = 4) -> str:
    """Full SQL restatement of ``ann_topk_lsh`` over the embeddings view:
    the hyperplanes are deterministic constants (blake2b-derived), so the
    bucket assignment, Hamming-1 multiprobe fan-out, bucket join, cosine and
    rank are all plain DuckDB — a true value oracle, not a golden."""
    from anycrawl_spark.operators.similarity import _hyperplane, _probe_masks

    planes = [_hyperplane(dim, b) for b in range(bits)]
    plane_sql = ", ".join(
        f"[{', '.join(repr(x) for x in p)}]::DOUBLE[] AS hp{b}"
        for b, p in enumerate(planes)
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(emb, hp.hp{b}) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    masks = [0] + _probe_masks(bits, 1)
    return f"""
WITH hp AS (SELECT {plane_sql}),
v AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
             CAST({bucket_expr} AS BIGINT) AS bucket
      FROM embeddings CROSS JOIN hp),
q AS (SELECT vec_id AS query_id, emb AS qemb, bucket AS qbucket FROM v WHERE vec_id < 5),
probes AS (SELECT query_id, qemb, xor(qbucket, m.m) AS bucket
           FROM q CROSS JOIN (SELECT unnest([{', '.join(str(m) for m in masks)}]::BIGINT[]) AS m) m),
s AS (SELECT p.query_id, v.vec_id,
             round(list_dot_product(v.emb, p.qemb) /
                   greatest(sqrt(list_dot_product(v.emb, v.emb)) *
                            sqrt(list_dot_product(p.qemb, p.qemb)), 1e-12),
                   {round_dp}) AS cosine
      FROM v JOIN probes p USING (bucket)),
r AS (SELECT query_id, vec_id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
      FROM s)
SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= {k}
"""


# ----------------------------------------------------- template render mirror

_TEMPLATE_RENDER_COLUMNS: list[tuple[str, str]] = [
    ("request_id", "VARCHAR"), ("ok", "BOOLEAN"), ("error", "VARCHAR"),
    ("engine", "VARCHAR"), ("url", "VARCHAR"), ("original_url", "VARCHAR"),
    ("query", "VARCHAR"), ("variables_json", "VARCHAR"),
    ("options_json", "VARCHAR"), ("credits", "DOUBLE"),
    ("captures_json", "VARCHAR"),
]

# Expected outputs for operators.templates.contract_fixture(), derived BY
# HAND from the reference semantics (templateHandler.ts / urlTemplate.ts /
# optionMerger.ts / templateValidator.ts) — independent of the Python
# kernels. Notes per row:
#   r01/r02: defaults fill lang=en, mapping creates options.locale (explicit
#            request fields would win), reqOptions merge under, render with
#            query/path filters (encodeURIComponent semantics).
#   r07:     required 'id' missing (no default, no mapping target present).
#   r08:     append-transform runs on the UN-rendered query at merge time,
#            the controller renders afterwards; search drops url.
#   r09:     regexExtract group 1 of //(.+)$ then template mode; original
#            url preserved; no reqOptions => {}.
#   r10:     enum rejection message mirrors JSON.stringify quoting.
#   r12:     no request user => self-hosted rule: any template accessible.
_TEMPLATE_RENDER_EXPECTED: list[dict] = [
    {"request_id": "r01", "ok": True, "error": None, "engine": "cheerio",
     "url": "https://ex.com/p/42?l=en", "original_url": None, "query": None,
     "variables_json": '{"id":"42","lang":"en"}',
     "options_json": '{"engine":"cheerio","formats":["markdown"],"options":{"locale":"en"}}',
     "credits": 2.0, "captures_json": "[]"},
    {"request_id": "r02", "ok": True, "error": None, "engine": "cheerio",
     "url": "https://ex.com/a%20b/c", "original_url": None, "query": None,
     "variables_json": '{"id":"a b/c","lang":"en"}',
     "options_json": '{"engine":"cheerio","formats":["markdown"],"options":{"locale":"en"}}',
     "credits": 2.0, "captures_json": "[]"},
    {"request_id": "r03", "ok": False, "error": "Template not found",
     "engine": None, "url": None, "original_url": None, "query": None,
     "variables_json": None, "options_json": None, "credits": 0.0},
    {"request_id": "r04", "ok": False,
     "error": "When using template_id, only template-allowed fields are "
              "permitted. Invalid fields: engine",
     "engine": None, "url": None, "original_url": None, "query": None,
     "variables_json": None, "options_json": None, "credits": 0.0},
    {"request_id": "r05", "ok": False, "error": "Access denied to this template",
     "engine": None, "url": None, "original_url": None, "query": None,
     "variables_json": None, "options_json": None, "credits": 0.0},
    {"request_id": "r06", "ok": False,
     "error": "Template type mismatch: expected crawl, got scrape",
     "engine": None, "url": None, "original_url": None, "query": None,
     "variables_json": None, "options_json": None, "credits": 0.0},
    {"request_id": "r07", "ok": False,
     "error": "Template variable validation failed: "
              "Required variable 'id' is missing",
     "engine": None, "url": None, "original_url": None, "query": None,
     "variables_json": None, "options_json": None, "credits": 0.0},
    {"request_id": "r08", "ok": True, "error": None, "engine": "google",
     "url": None, "original_url": None,
     "query": "site:docs.example.com spark news",
     "variables_json": '{"q":"spark"}',
     "options_json": '{"engine":"google","limit":10}', "credits": 0.0,
     "captures_json": "[]"},
    {"request_id": "r09", "ok": True, "error": None, "engine": None,
     "url": "https://render.svc/X.com/a b", "original_url": "http://X.com/a b",
     "query": None, "variables_json": None, "options_json": "{}",
     "credits": 0.0, "captures_json": "[]"},
    {"request_id": "r10", "ok": False,
     "error": 'Template variable validation failed: Variable \'mode\' must '
              'be one of ["fast", "slow"], got "turbo"',
     "engine": None, "url": None, "original_url": None, "query": None,
     "variables_json": None, "options_json": None, "credits": 0.0},
    {"request_id": "r11", "ok": True, "error": None, "engine": "playwright",
     "url": "https://e.com/?m=fast&n=5", "original_url": None, "query": None,
     "variables_json": '{"mode":"fast","n":5}',
     "options_json": '{"engine":"playwright"}', "credits": 0.0,
     "captures_json": "[]"},
    {"request_id": "r12", "ok": True, "error": None, "engine": None,
     "url": "https://ex.com/x", "original_url": None, "query": None,
     "variables_json": None, "options_json": "{}", "credits": 0.0,
     "captures_json": "[]"},
    # r13/r14: glob allowedDomains (domainValidator.ts candidates incl. bare
    # hostname); r15/r16: search allowedKeywords via validatePattern.
    {"request_id": "r13", "ok": True, "error": None, "engine": None,
     "url": "https://api.example.com/x", "original_url": None, "query": None,
     "variables_json": None, "options_json": "{}", "credits": 0.0,
     "captures_json": "[]"},
    {"request_id": "r14", "ok": False,
     "error": "URL 'https://evil.com/x' is not allowed for this template. "
              "Allowed patterns: *.example.com, example.com",
     "engine": None, "url": None, "original_url": None, "query": None,
     "variables_json": None, "options_json": None, "credits": 0.0},
    {"request_id": "r15", "ok": True, "error": None, "engine": "google",
     "url": None, "original_url": None, "query": "sparkling water",
     "variables_json": None, "options_json": '{"engine":"google"}',
     "credits": 0.0, "captures_json": "[]"},
    {"request_id": "r16", "ok": False,
     "error": "Search query 'hadoop tips' is not allowed for this template. "
              "Allowed patterns: spark*",
     "engine": None, "url": None, "original_url": None, "query": None,
     "variables_json": None, "options_json": None, "credits": 0.0},
    # r17: preNav captures, derived by hand from EngineConfigurator.ts:
    #   seq0 (login) matches 'auth' exact but body is empty and there is no
    #     content-length -> skipped, key stays pending (ts:388-394);
    #   seq1 (v1/data.json) matches the 'api' glob (** spans v1); headers
    #     lowercase with list-first ("set-cookie" -> first element), raw
    #     set-cookie list survives in setCookieRaw (ts:411-414);
    #   seq2 (auth/42) matches the 'auth' regex ^(?:...)$; no method given
    #     -> null; no set-cookie -> [];
    #   seq3 never evaluated (all keys done -> listener detached, ts:452).
    # Payload JSON is canonical (sorted keys, no whitespace).
    {"request_id": "r17", "ok": True, "error": None, "engine": "playwright",
     "url": "https://ex.com/page", "original_url": None, "query": None,
     "variables_json": None, "options_json": '{"engine":"playwright"}',
     "credits": 0.0,
     "captures_json":
         '[{"body":"{\\"d\\":1}","cookiesRaw":[],'
         '"headers":{"content-type":"application/json",'
         '"set-cookie":"sid=1; Path=/"},"key":"api","matched_seq":1,'
         '"method":"GET","setCookieRaw":["sid=1; Path=/","t=2"],'
         '"status":200,"url":"https://api.ex.com/v1/data.json"},'
         '{"body":"tok","cookiesRaw":[],"headers":{"x-token":"abc"},'
         '"key":"auth","matched_seq":2,"method":null,"setCookieRaw":[],'
         '"status":201,"url":"https://ex.com/auth/42"}]'},
    # r18: responses present but the template declares no preNav rules ->
    # captures stay the empty list; otherwise an ordinary tpl-s render.
    {"request_id": "r18", "ok": True, "error": None, "engine": "cheerio",
     "url": "https://ex.com/p/9", "original_url": None, "query": None,
     "variables_json": '{"id":"9","lang":"en"}',
     "options_json": '{"engine":"cheerio","formats":["markdown"],"options":{"locale":"en"}}',
     "credits": 2.0, "captures_json": "[]"},
]


def sql_template_render() -> str:
    return values_sql(_TEMPLATE_RENDER_EXPECTED, _TEMPLATE_RENDER_COLUMNS)


# ------------------------------------------------------- duplicate passages

def sql_duplicate_passages(
    window: int = 8, stride: int = 4, min_count: int = 2, max_doc_id: int = 200
) -> str:
    """Full SQL restatement of ``dedup.duplicate_passages`` (passage-level
    exact-substring dedup): identical whitespace tokenization, window
    construction and md5 fingerprints, so this is a true value oracle."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(text, '[ \t\n\x0B\f\r]+') AS t
  FROM documents WHERE doc_id < {max_doc_id}),
win AS (
  SELECT doc_id,
         CAST((i-1)*{stride} AS BIGINT) AS token_start,
         md5(array_to_string(
             list_slice(t, (i-1)*{stride}+1, (i-1)*{stride}+{window}), ' ')) AS digest
  FROM toks, UNNEST(generate_series(
      1, CASE WHEN len(t) >= {window}
              THEN (len(t)-{window})//{stride} + 1 ELSE 0 END)) AS u(i)),
dup AS (
  SELECT digest,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM win GROUP BY digest HAVING count(*) >= {min_count})
SELECT w.doc_id, w.token_start, w.digest, d.n_occurrences, d.n_docs
FROM win w JOIN dup d USING (digest)
"""
