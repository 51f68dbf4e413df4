"""WARC segment sink/source + pure-column manifest (Spark shapes).

The byte grammar lives in ``functions/warc.py`` (public ISO 28500 / WARC
1.1 spec; rebuild-added — the reference never emits an archival format,
see that module's docstring). This module gives it the three Spark
shapes a 100 TB crawl needs:

- ``warc_record_meta``: per-record id / digest / serialized length as
  PURE JVM column math — no Python stage, no shuffle. Possible because
  every header value is either a column expression (md5, octet_length)
  or has a KNOWN length: sha1-base32 of a 20-byte digest is always 32
  chars, so the payload-digest header contributes a constant width and
  the exact record length never needs sha1 at plan time.
- ``warc_manifest``: byte offsets per record within its segment — a
  cumulative-sum window PARTITIONed BY segment. A segment is the WARC
  unit of archival (~1 GB in practice, e.g. Common Crawl's rotation
  policy), so the window partition is bounded by the segment-assignment
  policy upstream, never by corpus size; this is NOT a whole-corpus
  sort. Offsets are relative to the first response record — the writer
  reports each segment's leading ``warcinfo`` length separately so
  absolute offsets are ``warcinfo_len + offset``.
- ``write_warc_segments`` / ``read_warc_segments``: the actual
  serializer (ONE shuffle, on the segment key, then per-group kernel
  bytes — record bytes never cross a second exchange) and the parser
  (narrow Arrow map over segment blobs, one pass, O(segment) memory).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anycrawl_spark.functions.warc import (
    CRLF,
    WARC_VERSION,
    build_segment,
    parse_warc,
)

# Header block with the two computed-width values (record id, md5 hex)
# spliced in column-side and the constant-width sha1-b32 as a literal
# placeholder (length 32 — see module docstring). Only LENGTH flows into
# the manifest, so the placeholder never leaks into output columns.
_B32_PLACEHOLDER = "A" * 32


def _header_block(url, date, rid, md5hex, payload_len):
    return F.concat(
        F.lit(WARC_VERSION + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Record-ID: <urn:anycrawl:"), rid, F.lit(">" + CRLF),
        F.lit("WARC-Date: "), date, F.lit(CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(CRLF),
        F.lit("Content-Type: text/plain; charset=utf-8" + CRLF),
        F.lit("WARC-Block-Digest: md5:"), md5hex, F.lit(CRLF),
        F.lit("WARC-Payload-Digest: sha1:" + _B32_PLACEHOLDER + CRLF),
        F.lit("Content-Length: "), payload_len.cast("string"), F.lit(CRLF),
        F.lit(CRLF),
    )


def warc_record_meta(
    df: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    text_col: str = "text",
) -> DataFrame:
    """Adds ``record_id``, ``block_digest``, ``content_length``,
    ``record_len`` — the exact serialized-record byte accounting of
    ``functions/warc.build_response_record``, as pure column math."""
    url, date, text = F.col(url_col), F.col(date_col), F.col(text_col)
    rid = F.md5(F.concat(url, F.lit("|"), date))
    md5hex = F.md5(text)
    plen = F.octet_length(text).cast("long")
    head = _header_block(url, date, rid, md5hex, plen)
    return (
        df.withColumn("record_id", F.concat(F.lit("urn:anycrawl:"), rid))
        .withColumn("block_digest", F.concat(F.lit("md5:"), md5hex))
        .withColumn("content_length", plen)
        .withColumn(
            "record_len",
            (F.octet_length(head).cast("long") + plen + F.lit(4)).cast("long"),
        )
    )


def warc_manifest(
    df: DataFrame,
    segment_col: str = "segment",
    url_col: str = "url",
    date_col: str = "warc_date",
    text_col: str = "text",
) -> DataFrame:
    """Per-record byte offsets within each segment (records ordered by
    URL inside a segment, matching the writer). Offset 0 = first
    response record; add the segment's ``warcinfo_len`` for absolute
    file positions."""
    meta = warc_record_meta(df, url_col, date_col, text_col)
    w = (
        Window.partitionBy(segment_col)
        .orderBy(url_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return meta.withColumn(
        "offset", F.coalesce(F.sum("record_len").over(w), F.lit(0)).cast("long")
    )


# Serialized length of a warcinfo record with an EMPTY filename: every
# other field is constant-width (record id = 32 hex, date = 20 chars,
# fixed warc-fields payload), so a segment's warcinfo length is exactly
# WARCINFO_BASE + octet_length(filename) — pinned to the kernel by
# tests/test_surt_cdx.py so the grammar can't drift silently.
WARCINFO_BASE = 267


def cdx_index(
    df: DataFrame,
    segment_col: str = "segment",
    url_col: str = "url",
    date_col: str = "warc_date",
    text_col: str = "text",
) -> DataFrame:
    """CDX capture-index rows over the WARC manifest: (surt_key, cdx_ts,
    filename, abs_offset, record_len, block_digest) — the pywb/wayback
    lookup tuple. abs_offset is the record's absolute byte position in
    its segment file (warcinfo framing included, via the constant-width
    argument above), so a reader can seek straight to the record. Pure
    JVM end-to-end: SURT is column string math, offsets ride the
    manifest's cumsum window."""
    from anycrawl_spark.functions.surt import surt_key_col

    man = warc_manifest(df, segment_col, url_col, date_col, text_col)
    filename = F.concat(F.col(segment_col), F.lit(".warc"))
    return man.select(
        surt_key_col(F.col(url_col)).alias("surt_key"),
        F.regexp_replace(F.col(date_col), "[-T:Z]", "").alias("cdx_ts"),
        F.col(url_col).alias("url"),
        filename.alias("filename"),
        (
            F.lit(WARCINFO_BASE).cast("long")
            + F.octet_length(filename).cast("long")
            + F.col("offset")
        ).alias("abs_offset"),
        "record_len",
        "block_digest",
    )


_SEGMENT_SCHEMA = (
    "segment string, filename string, blob binary, n_records long, "
    "warcinfo_len long, total_len long"
)


def write_warc_segments(df: DataFrame, segment_col: str = "segment") -> DataFrame:
    """(segment, filename, blob, n_records, warcinfo_len, total_len) —
    one serialized .warc blob per segment (records URL-ordered; the
    warcinfo record stamps the segment's MIN record date, so output is
    partitioning-independent). ONE shuffle, keyed on the segment."""

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        seg = key[0]
        pdf = pdf.sort_values("url")
        filename = f"{seg}.warc"
        date = min(pdf["warc_date"])
        docs = list(zip(pdf["url"], pdf["warc_date"], pdf["text"]))
        blob = build_segment(filename, date, docs)
        info_len = len(build_segment(filename, date, []))
        return pd.DataFrame(
            {
                "segment": [seg],
                "filename": [filename],
                "blob": [blob],
                "n_records": [len(docs)],
                "warcinfo_len": [info_len],
                "total_len": [len(blob)],
            }
        )

    cols = df.select(segment_col, "url", "warc_date", "text")
    return cols.groupBy(segment_col).applyInPandas(build, _SEGMENT_SCHEMA)


_READ_SCHEMA = (
    "segment string, url string, warc_date string, text string, "
    "offset long, length long"
)


def read_warc_segments(segments: DataFrame) -> DataFrame:
    """Parse segment blobs back into response rows (narrow Arrow map —
    blobs never shuffle; warcinfo records are framing, not rows)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg, blob in zip(pdf["segment"], pdf["blob"]):
                for rec in parse_warc(bytes(blob)):
                    if rec["warc_type"] != "response":
                        continue
                    rows.append(
                        (
                            seg,
                            rec["headers"]["WARC-Target-URI"],
                            rec["headers"]["WARC-Date"],
                            rec["payload"].decode("utf-8"),
                            rec["offset"],
                            rec["length"],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["segment", "url", "warc_date", "text", "offset", "length"]
            )

    return segments.select("segment", "blob").mapInPandas(parse, _READ_SCHEMA)
