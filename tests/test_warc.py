"""WARC/1.1 kernel + Spark shapes (functions/warc.py, sources/warc.py).

Layer 1: byte-grammar round-trips and framing-failure handling.
Layer 2: the pure-JVM length/offset math agrees byte-for-byte with the
kernel's actual serialization.
Layer 3: write -> read round-trip, partitioning independence.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from anycrawl_spark.functions.warc import (
    build_response_record,
    build_segment,
    build_warcinfo_record,
    parse_warc,
    sha1_b32,
    warc_date,
)

DOCS = [
    ("http://a.example/p/1", warc_date(1, 2, 3), "hello world"),
    ("http://a.example/p/2", warc_date(4, 5, 6), "héllo — non-ascii § payload"),
    # payload that LOOKS like a WARC record: framing must come from
    # Content-Length, never from pattern-matching the payload
    ("http://a.example/p/3", warc_date(7, 8, 9),
     "WARC/1.1\r\nWARC-Type: response\r\n\r\nfake\r\n\r\n"),
    ("http://b.example/p/1", warc_date(0, 0, 0), ""),
]


# ---------------------------------------------------------------- layer 1


def test_single_record_roundtrip():
    url, date, text = DOCS[0]
    blob = build_response_record(url, date, text)
    [rec] = parse_warc(blob)
    assert rec["warc_type"] == "response"
    assert rec["headers"]["WARC-Target-URI"] == url
    assert rec["headers"]["WARC-Date"] == date
    assert rec["payload"] == text.encode()
    assert rec["offset"] == 0 and rec["length"] == len(blob)
    assert int(rec["headers"]["Content-Length"]) == len(text.encode())


def test_digests_match_hashlib():
    _, _, text = DOCS[1]
    blob = build_response_record("http://x.example/", warc_date(0, 0, 1), text)
    [rec] = parse_warc(blob)
    p = text.encode()
    assert rec["headers"]["WARC-Block-Digest"] == "md5:" + hashlib.md5(p).hexdigest()
    assert rec["headers"]["WARC-Payload-Digest"] == sha1_b32(p)
    # sha1-b32 of a 20-byte digest is ALWAYS 32 chars, no padding — the
    # invariant the JVM-side length math relies on
    assert len(rec["headers"]["WARC-Payload-Digest"]) == len("sha1:") + 32


def test_segment_roundtrip_offsets_contiguous():
    blob = build_segment("seg.warc", warc_date(0, 0, 0), DOCS)
    recs = parse_warc(blob)
    assert [r["warc_type"] for r in recs] == ["warcinfo"] + ["response"] * 4
    assert recs[0]["headers"]["WARC-Filename"] == "seg.warc"
    pos = 0
    for r in recs:
        assert r["offset"] == pos
        pos += r["length"]
    assert pos == len(blob)
    # response payloads survive byte-exactly, including the WARC lookalike
    assert [r["payload"].decode() for r in recs[1:]] == [t for _, _, t in DOCS]


def test_payload_lookalike_does_not_confuse_framing():
    url, date, text = DOCS[2]
    recs = parse_warc(build_response_record(url, date, text))
    assert len(recs) == 1 and recs[0]["payload"].decode() == text


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"XARC/1.1" + b[8:], "bad WARC version"),
        (lambda b: b[:-6], "truncated payload"),
        (lambda b: b[:-2], "missing record terminator"),
        (lambda b: b.replace(b"Content-Length: ", b"Content-Length: x"),
         "missing/bad Content-Length"),
        (lambda b: b[:20], "unterminated header block"),
    ],
)
def test_framing_failures_raise(mutate, msg):
    blob = build_response_record("http://x.example/", warc_date(0, 0, 1), "abcdef")
    with pytest.raises(ValueError, match=msg):
        parse_warc(mutate(blob))


def test_warcinfo_record_id_distinct_from_responses():
    info = parse_warc(build_warcinfo_record("f.warc", warc_date(1, 1, 1)))[0]
    resp = parse_warc(
        build_response_record("warcinfo:f.warc", warc_date(1, 1, 1), "x")
    )[0]
    assert info["headers"]["WARC-Record-ID"] == resp["headers"]["WARC-Record-ID"]
    assert info["headers"]["Content-Type"] == "application/warc-fields"


# ---------------------------------------------------------------- layer 2


def _spark_docs(spark):
    return spark.createDataFrame(
        [(u.split("/p/")[0].removeprefix("http://"), u, d, t) for u, d, t in DOCS],
        ["segment", "url", "warc_date", "text"],
    )


def test_record_meta_matches_kernel_bytes(spark):
    from anycrawl_spark.sources.warc import warc_record_meta

    rows = warc_record_meta(_spark_docs(spark)).collect()
    for r in rows:
        blob = build_response_record(r["url"], r["warc_date"], r["text"])
        [rec] = parse_warc(blob)
        assert r["record_len"] == len(blob)
        assert r["content_length"] == len(r["text"].encode())
        assert "md5:" + rec["headers"]["WARC-Block-Digest"].removeprefix("md5:") == r["block_digest"]
        assert rec["headers"]["WARC-Record-ID"] == f"<{r['record_id']}>"


def test_manifest_offsets_match_serialized_segment(spark):
    from anycrawl_spark.sources.warc import warc_manifest, write_warc_segments

    docs = _spark_docs(spark)
    man = {(r["segment"], r["url"]): r for r in warc_manifest(docs).collect()}
    segs = {r["segment"]: r for r in write_warc_segments(docs).collect()}
    for seg, sr in segs.items():
        recs = parse_warc(bytes(sr["blob"]))
        assert recs[0]["warc_type"] == "warcinfo"
        assert recs[0]["length"] == sr["warcinfo_len"]
        for rec in recs[1:]:
            m = man[(seg, rec["headers"]["WARC-Target-URI"])]
            assert sr["warcinfo_len"] + m["byte_offset" if "byte_offset" in m.asDict() else "offset"] == rec["offset"]
            assert m["record_len"] == rec["length"]
        assert sr["total_len"] == len(bytes(sr["blob"]))
        assert sr["n_records"] == len(recs) - 1


# ---------------------------------------------------------------- layer 3


def test_write_read_roundtrip(spark):
    from anycrawl_spark.sources.warc import read_warc_segments, write_warc_segments

    docs = _spark_docs(spark)
    back = read_warc_segments(write_warc_segments(docs))
    got = sorted(
        (r["segment"], r["url"], r["warc_date"], r["text"])
        for r in back.collect()
    )
    want = sorted(
        (u.split("/p/")[0].removeprefix("http://"), u, d, t) for u, d, t in DOCS
    )
    assert got == want


def test_writer_partitioning_independent(spark):
    from anycrawl_spark.sources.warc import write_warc_segments

    docs = _spark_docs(spark)
    a = {r["segment"]: bytes(r["blob"])
         for r in write_warc_segments(docs.repartition(1)).collect()}
    b = {r["segment"]: bytes(r["blob"])
         for r in write_warc_segments(docs.repartition(7, "url")).collect()}
    assert a == b


def test_manifest_plan_is_pure_jvm(spark):
    from anycrawl_spark.queries import q_warc_manifest

    p = q_warc_manifest(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert p.count("Exchange") <= 2  # one hash exchange on segment (+AQE read)
    assert "hashpartitioning(segment" in p
