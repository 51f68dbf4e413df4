"""Text analysis, SERP pipeline, multimodal plumbing tests."""

import pandas as pd
from pyspark.sql import functions as F


def test_text_metrics(spark):
    from anycrawl_spark.functions import text as TX

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "the cat and the dog, in the house.",
                    "zxqv wvut bnmp",
                    "el la de que y en un por",
                    "   spaced    out   tokens   ",
                    "",
                ]
            }
        )
    )
    rows = df.select(
        TX.token_count(F.col("text")).alias("n"),
        TX.lang_id(F.col("text")).alias("lang"),
        F.round(TX.stopword_ratio(F.col("text")), 4).alias("swr"),
        TX.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert rows[0].n == 8 and rows[0].lang == "en"
    assert rows[1].lang == "und"  # no function words from any language
    assert rows[2].lang == "es"
    assert rows[3].n == 3
    assert rows[4].n == 0
    # whitespace normalization makes fingerprints insensitive to spacing
    df2 = spark.createDataFrame(
        pd.DataFrame({"text": ["a  b\tc", "A b C "]})
    ).select(TX.fingerprint(F.col("text")).alias("fp"))
    fps = [r.fp for r in df2.collect()]
    assert fps[0] == fps[1]


def test_shingles(spark):
    from anycrawl_spark.functions.text import shingles

    df = spark.createDataFrame(pd.DataFrame({"text": ["a b c d", "a b"]}))
    rows = df.select(shingles(F.col("text"), 3).alias("sh")).collect()
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].sh == ["a b"]  # shorter than k -> whole text


def test_serp_pipeline(spark):
    from anycrawl_spark.operators.serp import (
        RESULTS_PER_PAGE, enrich_with_documents, serp_search,
    )

    q = spark.createDataFrame(
        [("q0", "alpha beta", 15), ("q1", "gamma", 7)],
        "query_id string, query string, limit int",
    )
    res = serp_search(q).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    # O4 slice: exactly `limit` results per query, contiguous ranks
    assert len(by_q["q0"]) == 15 and len(by_q["q1"]) == 7
    for qid, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        for r in rows:
            assert r.url.startswith("http://host")
            assert r.title and r.category == "web" and r.source == "google"
            assert r.position == r.rank - 1  # page*10+pos ordering

    # determinism: second run identical
    res2 = serp_search(q).collect()
    assert sorted(map(tuple, res)) == sorted(map(tuple, res2))

    # J2 enrichment join
    docs = spark.createDataFrame(
        [(res[0].url, "Doc title", "md body")], "url string, title string, markdown string"
    )
    enr = enrich_with_documents(serp_search(q), docs).collect()
    hit = [r for r in enr if r.url == res[0].url]
    assert hit and hit[0].doc_title == "Doc title"
    assert all(r.doc_title is None for r in enr if r.url != res[0].url)


def test_serp_parse_selector_semantics():
    from anycrawl_spark.operators.serp import parse_serp_html

    html = (
        '<div jscontroller="SC7lYd"><a href="http://x/1"><h3>T1</h3></a>'
        '<div data-sncf="1">D1</div></div>'
        '<div jscontroller="OTHER"><a href="http://x/2"><h3>skip</h3></a></div>'
        '<div jscontroller="SC7lYd"><a href="http://x/3"><h3>T3</h3></a></div>'
    )
    out = parse_serp_html(html)
    assert [(r["title"], r["url"], r["description"]) for r in out] == [
        ("T1", "http://x/1", "D1"),
        ("T3", "http://x/3", None),
    ]


def test_multimodal_plumbing(spark):
    from anycrawl_spark.functions.png import PNG_SIGNATURE, decode_png
    from anycrawl_spark.operators.multimodal import (
        extract_features, feature_for_payload, materialize_media, synth_media,
    )

    refs = spark.createDataFrame(
        [(f"http://m/{i}",) for i in range(20)], "media_ref string"
    )
    media = materialize_media(refs)
    rows = media.collect()
    assert len(rows) == 20
    by_fmt = {}
    for r in rows:
        assert isinstance(r.payload, (bytes, bytearray))
        assert r.meta.media_type == "image"
        assert r.meta.size_bytes == len(r.payload)
        by_fmt.setdefault(r.meta.format, []).append(r)
    # png refs carry REAL png bytes whose IHDR dims match the metadata
    assert by_fmt.get("png"), "expect at least one png in 20 hash-picked refs"
    for r in by_fmt["png"]:
        assert bytes(r.payload[:8]) == PNG_SIGNATURE
        img = decode_png(bytes(r.payload))
        assert (img.shape[0], img.shape[1]) == (r.meta.height, r.meta.width)
    # jpeg refs carry REAL baseline JPEG bytes that decode to the meta dims
    from anycrawl_spark.functions.jpeg import decode_baseline

    for r in by_fmt.get("jpeg", []):
        assert bytes(r.payload[:2]) == b"\xff\xd8"
        img = decode_baseline(bytes(r.payload))
        assert (img.shape[0], img.shape[1]) == (r.meta.height, r.meta.width)
    # webp refs carry REAL lossless VP8L bytes that decode to the meta dims
    from anycrawl_spark.functions.webp import decode_webp, is_webp

    for r in by_fmt.get("webp", []):
        assert is_webp(bytes(r.payload[:12]))
        img = decode_webp(bytes(r.payload))
        assert (img.shape[0], img.shape[1]) == (r.meta.height, r.meta.width)
    # gif refs carry REAL GIF87a/89a bytes that decode to the meta dims
    from anycrawl_spark.functions.gif import GIF87A, GIF89A, decode_gif

    for r in by_fmt.get("gif", []):
        assert bytes(r.payload[:6]) in (GIF87A, GIF89A)
        img = decode_gif(bytes(r.payload))
        assert (img.shape[0], img.shape[1]) == (r.meta.height, r.meta.width)

    feats = extract_features(media, dim=8).collect()
    assert all(r.ok and len(r.feature) == 8 for r in feats)
    # deterministic: feature equals the sequential-kernel output per payload
    for ref in ("http://m/0", "http://m/1", "http://m/2"):
        payload, _ = synth_media(ref)
        expected = feature_for_payload(payload, 8).tolist()
        got = [r.feature for r in feats if r.media_ref == ref][0]
        assert [round(x, 5) for x in got] == [round(x, 5) for x in expected]

    # real-decode path: PNG/JPEG/GIF/lossless-webp all decode for real now,
    # so every synthetic payload succeeds even with use_real (the stub only
    # triggers for lossy formats, which the fixtures no longer emit)
    for r in extract_features(media, dim=8, use_real=True).collect():
        assert r.ok and len(r.feature) == 8


def test_media_refs_from_documents(spark):
    from anycrawl_spark.operators.multimodal import media_refs_from_documents

    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    {"kind": "text", "text": "t", "media_ref": None, "offset": 0},
                    {"kind": "media", "text": None, "media_ref": "http://m/a.png", "offset": 1},
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    refs = [r.media_ref for r in media_refs_from_documents(docs).collect()]
    assert refs == ["http://m/a.png"]


def test_searxng_parse_mapping_semantics():
    """Field-mapping parity with Searxng.ts:103-181 on hand-built payloads."""
    from anycrawl_spark.operators.serp import parse_searxng_results

    payload = {
        "results": [
            {"title": "suggestion", "content": "no url"},          # skipped
            {"url": "http://a/1", "title": "t", "content": "c", "engine": "brave"},
            {"url": "http://a/2", "snippet": "snip only"},         # content fallback
            {"url": "http://img/1", "category": "images", "title": "i",
             "resolution": "1000×1500", "img_src": "http://img/1.jpg",
             "positions": [3, 9], "thumbnail_src": "http://t/1.jpg",
             "img_format": "png", "filesize": "245.76 KB", "engine": "qwant"},
            {"url": "http://img/2", "category": "images", "resolution": "800 x 600"},
            {"url": "http://n/1", "category": "news", "content": "news body",
             "publishedDate": "2026-01-02", "thumbnail": "http://n/t.jpg"},
            {"url": "http://n/2", "category": "news", "pubdate": "2026-02-03"},
        ]
    }
    out = parse_searxng_results(payload)
    assert len(out) == 6  # no-url item skipped
    web = out[0]
    assert web["category"] == "web" and web["source"] == "SearXNG (brave)"
    assert out[1]["description"] == "snip only"
    assert out[1]["source"] == "SearXNG (unknown)"
    img = out[2]
    assert img["category"] == "images"
    assert (img["image_width"], img["image_height"]) == (1000, 1500)
    assert img["position"] == 3  # positions[0]
    assert img["img_format"] == "png" and img["filesize"] == "245.76 KB"
    assert out[3]["image_width"] == 800 and out[3]["image_height"] == 600
    news = out[4]
    assert news["category"] == "news" and news["date"] == "2026-01-02"
    assert news["snippet"] == "news body" and news["image_url"] == "http://n/t.jpg"
    assert out[5]["date"] == "2026-02-03"


def test_ac_parse_mapping_semantics():
    from anycrawl_spark.operators.serp import parse_ac_results

    payload = {
        "results": [
            {"title": "no url"},
            {"url": "http://a/1", "title": "t", "snippet": "s"},
            {"url": "http://i/1", "category": "images", "imageUrl": "http://i/x.jpg",
             "imageWidth": 10, "imageHeight": 20, "position": 2},
            {"url": "http://n/1", "category": "news", "snippet": "sn",
             "date": "2026-03-04", "imageUrl": "http://n/x.jpg"},
        ]
    }
    out = parse_ac_results(payload)
    assert len(out) == 3
    assert out[0]["description"] == "s" and out[0]["source"] == "AC-Engine"
    assert out[1]["image_width"] == 10 and out[1]["position"] == 2
    assert out[2]["date"] == "2026-03-04" and out[2]["image_url"] == "http://n/x.jpg"


def test_serp_engine_dispatch(spark):
    """SearchService.ts:210-219: page-wise engines fetch ceil(limit/10)
    pages; direct-limit engines fetch once. Union schema on all paths."""
    from anycrawl_spark.operators.serp import serp_search_engine

    q = spark.createDataFrame(
        [("q0", "alpha beta", 15), ("q1", "gamma", 7)],
        "query_id string, query string, limit int",
    )
    for engine in ("searxng", "ac"):
        rows = serp_search_engine(q, engine=engine).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        assert len(by_q["q0"]) == 15 and len(by_q["q1"]) == 7
        for r in rows:
            assert r.category == "web" and r.url.startswith("http://host")
        if engine == "ac":
            assert {r.page for r in rows} == {0}       # one direct-limit request
        else:
            assert {r.page for r in by_q["q0"]} == {0, 1}  # ceil(15/10) pages
            assert all("SearXNG (" in r.source for r in rows)
    # images category fills the image fields, leaves news fields null
    img = serp_search_engine(q, engine="searxng", sources="images").collect()
    assert all(r.category == "images" and r.image_url and r.image_width for r in img)
    assert all(r.snippet is None and r.date is None for r in img)
    news = serp_search_engine(q, engine="ac", sources="news").collect()
    assert all(r.category == "news" and r.date for r in news)


def test_serp_json_engines_position_semantics(spark):
    """Web/news rows from the JSON engines carry a computed page-offset
    position (never NULL — the rank window orders by it); image rows keep
    the engine-reported 1-based position, matching the Google DOM path."""
    from anycrawl_spark.operators.serp import serp_search_engine

    q = spark.createDataFrame(
        [("q0", "alpha beta", 15)], "query_id string, query string, limit int")
    for engine, sources in (("searxng", "web"), ("ac", "web"), ("ac", "news")):
        rows = serp_search_engine(q, engine=engine, sources=sources).collect()
        assert rows and all(r.position is not None for r in rows)
        if engine == "ac":
            # direct-limit: one page-0 request, positions 0..n-1
            assert sorted(r.position for r in rows) == list(range(len(rows)))
        else:
            # page-wise: page-offset positions page*10+i
            for r in rows:
                assert r.page * 10 <= r.position < (r.page + 1) * 10
        # deterministic slice: rank ordering reproducible across runs
        again = serp_search_engine(q, engine=engine, sources=sources).collect()
        assert [(r.url, r.position) for r in rows] == [(r.url, r.position) for r in again]
    img = serp_search_engine(q, engine="searxng", sources="images").collect()
    assert img and all(r.position is not None and r.position >= 1 for r in img)


def test_searxng_url_building(spark):
    from anycrawl_spark.operators.serp import ac_build_url, searxng_build_url

    df = spark.createDataFrame(
        [("spark crawl", 1, "de", "images", "week", 1)],
        "query string, page int, lang string, sources string, tr string, ss int",
    )
    url = df.select(
        searxng_build_url(F.col("query"), F.col("page"), F.col("lang"),
                          F.col("sources"), F.col("tr"), F.col("ss")).alias("u")
    ).first().u
    assert url == ("http://searxng.synth/search?q=spark+crawl&format=json&pageno=1"
                   "&language=de&categories=images&time_range=week&safesearch=1")
    acu = df.select(
        ac_build_url(F.col("query"), limit=F.lit(25), offset=F.lit(0),
                     lang=F.col("lang")).alias("u")
    ).first().u
    assert acu == "http://ac-engine.synth/search?q=spark+crawl&start=0&limit=25&lang=de"


def test_multimodal_resize_and_frames(spark):
    """Resize + frame-sample plumbing: schemas, determinism, per-duration
    frame counts; decode kernels stubbed (no imaging libs in sandbox)."""
    from anycrawl_spark.operators.multimodal import (
        materialize_media, resize_images, sample_frames,
    )

    refs = spark.createDataFrame(
        [(f"http://media.synth/v/{i}",) for i in range(8)], "media_ref string"
    )
    media = materialize_media(refs)
    fmt_of = {r.media_ref: r.meta.format for r in media.collect()}
    rs = resize_images(media, 128, 128).collect()
    assert len(rs) == 8
    assert all(r.ok and r.width == 128 for r in rs)
    # png/jpeg/gif/webp resize FOR REAL: output is a decodable 128x128 image
    from anycrawl_spark.functions.gif import decode_gif as decode_gif_rt
    from anycrawl_spark.functions.jpeg import decode_baseline
    from anycrawl_spark.functions.png import decode_png
    from anycrawl_spark.functions.webp import decode_webp as decode_webp_rt
    for r in rs:
        if fmt_of[r.media_ref] == "png":
            img = decode_png(bytes(r.payload))
        elif fmt_of[r.media_ref] == "jpeg":
            img = decode_baseline(bytes(r.payload))
        elif fmt_of[r.media_ref] == "gif":
            img = decode_gif_rt(bytes(r.payload))
        else:
            img = decode_webp_rt(bytes(r.payload))
        assert img.shape[:2] == (128, 128)
    # deterministic: same input -> same resized bytes
    rs2 = {r.media_ref: r.payload for r in resize_images(media, 128, 128).collect()}
    assert all(rs2[r.media_ref] == r.payload for r in rs)

    # frame sampling: static refs carry duration_ms=None -> 1 fake frame;
    # ANIMATED GIF refs sample FOR REAL from the stream's own delays
    from anycrawl_spark.functions.gif import decode_gif_frames
    from anycrawl_spark.functions.png import decode_png as decode_png_fr
    from anycrawl_spark.operators.multimodal import synth_media

    info = {}
    for i in range(8):
        ref = f"http://media.synth/v/{i}"
        payload, meta = synth_media(ref)
        info[ref] = (payload, meta)
    animated = {r for r, (p, m) in info.items()
                if m["format"] == "gif" and m["duration_ms"]}
    fr = sample_frames(media, every_ms=500).collect()
    per = {}
    for f in fr:
        per.setdefault(f.media_ref, []).append(f)
    for ref, (payload, meta) in info.items():
        got = sorted(per[ref], key=lambda f: f.frame_idx)
        if ref in animated:
            gif_frames = decode_gif_frames(payload)
            total = sum(d for d, _ in gif_frames)
            assert len(got) == max(1, total // 500)
            # each sampled frame is a REAL PNG of the composited canvas,
            # matching the frame active at that timestamp
            starts = [0]
            for d, _ in gif_frames[:-1]:
                starts.append(starts[-1] + d)
            for f in got:
                img = decode_png_fr(bytes(f.frame))
                j = max(k for k, s in enumerate(starts) if s <= f.ts_ms)
                import numpy as np
                assert np.array_equal(img, gif_frames[j][1])
        else:
            assert len(got) == 1 and got[0].frame_idx == 0 and got[0].ts_ms == 0
    # fake a video with a duration: patch meta through a select (restrict
    # to non-animated payloads — a real animation ignores patched meta and
    # samples from its own stream)
    vid = media.filter(~F.col("media_ref").isin(*animated) if animated
                       else F.lit(True)).withColumn(
        "meta", F.named_struct(
            F.lit("media_type"), F.lit("video"), F.lit("format"), F.lit("mp4"),
            F.lit("width"), F.lit(640), F.lit("height"), F.lit(480),
            F.lit("duration_ms"), F.lit(3200), F.lit("size_bytes"), F.lit(1024).cast("long"),
        )
    )
    frames = sample_frames(vid, every_ms=1000).collect()
    # 3200ms at 1000ms interval -> 3 frames per video
    per = {}
    for f in frames:
        per.setdefault(f.media_ref, []).append(f.ts_ms)
    assert len(per) == 8 - len(animated)
    assert all(sorted(v) == [0, 1000, 2000] for v in per.values())


def test_gif_resize_preserves_animation():
    """Animated payloads resize frame-for-frame: the re-encoded stream
    plays back the nearest-neighbor-sampled canvases at the original
    delays, with transparency intact (kernel-level, no Spark needed)."""
    import numpy as np

    from anycrawl_spark.functions.gif import decode_gif_frames
    from anycrawl_spark.operators.multimodal import gif_resize, synth_media

    checked = 0
    i = 0
    while checked < 5:
        payload, meta = synth_media(f"http://media.synth/img/{i}")
        i += 1
        if meta["format"] != "gif" or not meta["duration_ms"]:
            continue
        out = gif_resize(payload, 64, 48)
        src = decode_gif_frames(payload)
        dst = decode_gif_frames(out)
        assert len(src) == len(dst)
        for (d1, c1), (d2, c2) in zip(src, dst):
            assert d1 == d2
            sh, sw = c1.shape[:2]
            ys = (np.arange(48) * sh) // 48
            xs = (np.arange(64) * sw) // 64
            exp = c1[ys][:, xs]
            assert np.array_equal(c2[..., 3] > 0, exp[..., 3] > 0)
            m = exp[..., 3] > 0
            assert np.array_equal(c2[..., :3][m], exp[..., :3][m])
        checked += 1


def test_google_locale_resolution_table_parity():
    """resolve_google_locale over the FULL tables: regions lookup, skip-list
    fallback to the first non-skip region, domain join, hl from lr value."""
    from anycrawl_spark.operators.serp import resolve_google_locale

    # explicit region match
    assert resolve_google_locale("de", "DE") == ("de", "lang_de", "DE", "www.google.de")
    # reference quirk reproduced faithfully: regions maps en-GB -> 'GB' but
    # supported_domains only has the 'UK' key, so the domain falls back to
    # www.google.com (Google.ts:107-113 + data tables)
    assert resolve_google_locale("en", "GB") == ("en", "lang_en", "GB", "www.google.com")
    # skip-listed country -> language's first non-skip region (insertion order)
    assert resolve_google_locale("en", "MY")[2] == "AG"
    assert resolve_google_locale("en", "UZ")[2] == "AG"
    # language with underscore lr value: hl language code comes from it
    lang_code, eng_lang, c, d = resolve_google_locale("zh", "HK")
    assert (lang_code, eng_lang, c, d) == ("zh-CN", "lang_zh-CN", "HK", "www.google.com.hk")
    # pt maps to lang_pt-BR (reference table) and falls back to AO
    assert resolve_google_locale("pt", None)[:3] == ("pt-BR", "lang_pt-BR", "AO")
    # unknown language -> eng_lang 'en' (no lang_ prefix), US, google.com
    assert resolve_google_locale("xx", None) == ("en", "en", "US", "www.google.com")
    # no lang, no country -> US default
    assert resolve_google_locale(None, None)[2:] == ("US", "www.google.com")
    # lang-country pair missing from regions -> falls to lang fallback
    assert resolve_google_locale("de", "JP")[2] == "AT"  # first de-* region


# --- engine resolution / graceful fallback (SearchService.ts:44-178) --------


def test_resolve_engine_reference_branches():
    from anycrawl_spark.operators.serp import (
        SearchEngineConfig, available_engines, default_engine, resolve_engine,
    )

    sx = "http://sx.local"
    ac = "http://ac.local"
    # no config at all: google is the only valid engine, everything falls back
    bare = SearchEngineConfig()
    assert available_engines(bare) == ["google"]
    assert default_engine(bare) == "google"
    for req in (None, "", "default", "bogus", "searxng", "ac-engine"):
        assert resolve_engine(req, bare) == "google"
    assert resolve_engine("GOOGLE", bare) == "google"  # normalized passthrough

    # searxng valid only with a URL (ts:73-89)
    cfg = SearchEngineConfig(searxng_url=sx)
    assert resolve_engine("searxng", cfg) == "searxng"
    assert resolve_engine("ac-engine", cfg) == "google"  # invalid -> default

    # configured default returned RAW when valid (ts:49-54)
    cfg = SearchEngineConfig(default_engine="SearXNG", searxng_url=sx)
    assert default_engine(cfg) == "SearXNG"
    assert resolve_engine("bogus", cfg) == "SearXNG"
    # invalid configured default -> first available (ts:56-65)
    cfg = SearchEngineConfig(default_engine="ac-engine", searxng_url=sx)
    assert default_engine(cfg) == "google"

    # single-engine mode forces the configured string VERBATIM for any VALID
    # request (ts:156-163); invalid requests still go to the default
    cfg = SearchEngineConfig(
        default_engine="google", enabled_engines=("SearXNG",),
        searxng_url=sx, ac_engine_url=ac,
    )
    assert resolve_engine("google", cfg) == "SearXNG"
    assert resolve_engine("ac-engine", cfg) == "SearXNG"
    assert resolve_engine("bogus", cfg) == "google"
    assert resolve_engine("default", cfg) == "google"

    # multi-engine: RAW-list membership quirk (ts:167 includes(normalized)) —
    # a capitalized enabled entry never matches, so valid requests fall back
    cfg = SearchEngineConfig(
        default_engine="searxng", enabled_engines=("Google", "searxng"),
        searxng_url=sx,
    )
    assert resolve_engine("google", cfg) == "searxng"
    assert resolve_engine("searxng", cfg) == "searxng"
    # ...and the multi-branch fallback lowercases the default (ts:171)
    cfg = SearchEngineConfig(
        default_engine="SearXNG", enabled_engines=("searxng", "ac-engine"),
        searxng_url=sx, ac_engine_url=ac,
    )
    assert resolve_engine("google", cfg) == "searxng"  # lowercased here
    assert resolve_engine("ac-engine", cfg) == "ac-engine"


def test_resolve_engine_expr_matches_mirror(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from anycrawl_spark.operators.serp import (
        SearchEngineConfig, resolve_engine, resolve_engine_expr,
    )

    sx, ac = "http://sx.local", "http://ac.local"
    configs = [
        SearchEngineConfig(),
        SearchEngineConfig(searxng_url=sx),
        SearchEngineConfig(default_engine="searxng", enabled_engines=("google", "searxng"), searxng_url=sx),
        SearchEngineConfig(default_engine="google", enabled_engines=("SearXNG",), searxng_url=sx, ac_engine_url=ac),
        SearchEngineConfig(default_engine="SearXNG", enabled_engines=("Google", "searxng"), searxng_url=sx),
    ]
    vals = ["google", "GOOGLE", " google ", "searxng", "SearXNG", "ac-engine",
            "AC-ENGINE", "default", "", "  ", "bogus", None]
    df = spark.createDataFrame(pd.DataFrame({"requested": vals}))
    for i, cfg in enumerate(configs):
        got = {
            r.requested: r.resolved
            for r in df.withColumn("resolved", resolve_engine_expr(F.col("requested"), cfg)).collect()
        }
        for v in vals:
            assert got[v] == resolve_engine(v, cfg), (i, v)
