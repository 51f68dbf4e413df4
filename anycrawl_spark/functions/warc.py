"""WARC/1.1 record kernel (ISO 28500 / IIPC WARC 1.1, public spec).

WARC is the canonical archive format a web crawl writes; the reference
(xienanzheng/AnyCrawl) persists scrape results as JSON rows in Postgres
(`apps/api/src/models/*`, rebuilt as the documents sink in
`crawl/superstep.py`) and never emits an archival format — this module is
rebuild-added crawl-tier functionality, specced purely from the public
WARC 1.1 standard:

- record = header block + CRLF + payload + CRLF CRLF;
- header block = version line (``WARC/1.1``) + CRLF-terminated
  ``Name: value`` fields + terminating CRLF;
- ``Content-Length`` is the OCTET length of the payload and is the only
  legal way to find the record boundary (payloads may contain anything,
  including things that look like WARC headers);
- digests are ``algorithm ":" value`` with an open algorithm token — the
  wild convention is ``sha1:`` + RFC 4648 base32, which we emit, plus an
  ``md5:`` + hex ``WARC-Block-Digest`` because the correctness oracle
  (DuckDB) has ``md5()`` but no sha1;
- every record needs a globally unique ``WARC-Record-ID`` URI.  Real
  crawlers mint ``urn:uuid:`` v1/v4 ids; those are non-deterministic, so
  this kernel derives ``urn:anycrawl:`` + md5(url | date) — a legal URN
  that both Spark and the SQL oracle can recompute column-side.

Everything here is pure stdlib and byte-deterministic; the Spark shapes
(column-math manifest, segment writer/reader) live in
``sources/warc.py``.
"""

from __future__ import annotations

import base64
import hashlib

CRLF = "\r\n"
WARC_VERSION = "WARC/1.1"


def warc_date(hh: int, mm: int, ss: int, day: str = "2026-08-20") -> str:
    """Deterministic ISO-8601 Zulu timestamp (WARC-Date grammar)."""
    return f"{day}T{hh:02d}:{mm:02d}:{ss:02d}Z"


def record_id(url: str, date: str) -> str:
    """Deterministic record URI: urn:anycrawl: + md5(url | date)."""
    return "urn:anycrawl:" + hashlib.md5(f"{url}|{date}".encode()).hexdigest()


def sha1_b32(payload: bytes) -> str:
    """The wild-convention payload digest: sha1: + RFC 4648 base32."""
    return "sha1:" + base64.b32encode(hashlib.sha1(payload).digest()).decode()


def md5_hex(payload: bytes) -> str:
    """The oracle-recomputable digest: md5: + lowercase hex."""
    return "md5:" + hashlib.md5(payload).hexdigest()


def response_headers(url: str, date: str, payload: bytes) -> list[tuple[str, str]]:
    """Ordered header fields for a ``response`` record. The order is
    FIXED (it is part of the serialized bytes the manifest's offsets and
    the oracle's length math restate)."""
    return [
        ("WARC-Type", "response"),
        ("WARC-Record-ID", f"<{record_id(url, date)}>"),
        ("WARC-Date", date),
        ("WARC-Target-URI", url),
        ("Content-Type", "text/plain; charset=utf-8"),
        ("WARC-Block-Digest", md5_hex(payload)),
        ("WARC-Payload-Digest", sha1_b32(payload)),
        ("Content-Length", str(len(payload))),
    ]


def warcinfo_headers(filename: str, date: str, payload: bytes) -> list[tuple[str, str]]:
    """Ordered header fields for the leading ``warcinfo`` record every
    segment opens with (spec: 'WARC file shall begin with a warcinfo
    record' is a SHOULD; we follow it)."""
    return [
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", f"<{record_id('warcinfo:' + filename, date)}>"),
        ("WARC-Date", date),
        ("WARC-Filename", filename),
        ("Content-Type", "application/warc-fields"),
        ("Content-Length", str(len(payload))),
    ]


def serialize_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    """header block + CRLF + payload + CRLF CRLF (spec record grammar)."""
    head = WARC_VERSION + CRLF
    head += "".join(f"{k}: {v}{CRLF}" for k, v in headers)
    head += CRLF
    return head.encode() + payload + (CRLF + CRLF).encode()


def build_response_record(url: str, date: str, text: str) -> bytes:
    payload = text.encode()
    return serialize_record(response_headers(url, date, payload), payload)


def build_warcinfo_record(filename: str, date: str) -> bytes:
    """warcinfo payload is application/warc-fields (Name: value lines)."""
    payload = (
        f"software: anycrawl-spark{CRLF}format: WARC File Format 1.1{CRLF}"
    ).encode()
    return serialize_record(warcinfo_headers(filename, date, payload), payload)


def build_segment(filename: str, date: str, docs: list[tuple[str, str, str]]) -> bytes:
    """One .warc segment: warcinfo + a response record per (url, date,
    text), in the given order."""
    out = [build_warcinfo_record(filename, date)]
    out.extend(build_response_record(u, d, t) for u, d, t in docs)
    return b"".join(out)


def parse_warc(blob: bytes) -> list[dict]:
    """Parse a WARC blob into records. Boundary-finding uses
    Content-Length ONLY (the spec's rule — payloads may contain header
    lookalikes). Returns one dict per record: ``warc_type``, ``headers``
    (dict), ``payload`` (bytes), ``offset``, ``length``. Malformed input
    raises ValueError with the failing offset (a segment is a unit of
    trust — unlike sitemap documents there is no per-row recovery once
    framing is lost)."""
    records: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        start = pos
        eol = blob.find(CRLF.encode(), pos)
        if eol < 0 or blob[pos:eol].decode("utf-8", "replace") != WARC_VERSION:
            raise ValueError(f"bad WARC version line at offset {start}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = blob.find(CRLF.encode(), pos)
            if eol < 0:
                raise ValueError(f"unterminated header block at offset {start}")
            line = blob[pos:eol].decode("utf-8")
            pos = eol + 2
            if not line:
                break
            name, sep, value = line.partition(":")
            if not sep:
                raise ValueError(f"malformed header {line!r} at offset {start}")
            headers[name.strip()] = value.strip()
        try:
            clen = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/bad Content-Length at offset {start}") from None
        payload = blob[pos : pos + clen]
        if len(payload) != clen:
            raise ValueError(f"truncated payload at offset {start}")
        pos += clen
        if blob[pos : pos + 4] != (CRLF + CRLF).encode():
            raise ValueError(f"missing record terminator at offset {start}")
        pos += 4
        records.append(
            {
                "warc_type": headers.get("WARC-Type", ""),
                "headers": headers,
                "payload": payload,
                "offset": start,
                "length": pos - start,
            }
        )
    return records
