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
                    "uno dos tres",
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
    assert rows[1].lang == "und"
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
    enr = enrich_with_documents(spark.createDataFrame(res), docs).collect()
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
    from anycrawl_spark.operators.multimodal import (
        extract_features, fake_decode, materialize_media, synth_media,
    )

    refs = spark.createDataFrame(
        [(f"http://m/{i}",) for i in range(20)], "media_ref string"
    )
    media = materialize_media(refs)
    rows = media.collect()
    assert len(rows) == 20
    for r in rows:
        assert isinstance(r.payload, (bytes, bytearray)) and len(r.payload) == 256
        assert r.meta.media_type == "image" and r.meta.size_bytes == 256

    feats = extract_features(media, dim=8).collect()
    assert all(r.ok and len(r.feature) == 8 for r in feats)
    # deterministic: feature equals the pure-fn output on the same payload
    payload, _ = synth_media("http://m/0")
    expected = fake_decode(payload, 8).tolist()
    got = [r.feature for r in feats if r.media_ref == "http://m/0"][0]
    assert [round(x, 5) for x in got] == [round(x, 5) for x in expected]

    # real-decode path is stubbed: ok=False, never crashes
    stubbed = extract_features(media, dim=8, use_real=True).collect()
    assert all(not r.ok and r.feature is None for r in stubbed)


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
