"""Property-based tests (hypothesis) for the pure kernels.

These target invariants rather than examples: canonicalization idempotence,
bloom no-false-negatives, span-offset density, chunk coverage, pattern-compile
robustness — the properties the distributed operators rely on.
"""

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from anycrawl_spark.functions.htmlmd import markdown_to_spans
from anycrawl_spark.functions.patterns import compile_patterns, url_passes
from anycrawl_spark.functions.urls import canonicalize_url, resolve_url

url_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="/.-_~%?&=#:+ "),
    max_size=80,
)


@given(url_text)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(s):
    for candidate in (s, "http://" + s, "https://example.com/" + s):
        c = canonicalize_url(candidate)
        if c is not None:
            assert canonicalize_url(c) == c, candidate


@given(url_text, url_text)
@settings(max_examples=200, deadline=None)
def test_resolve_never_raises(base, rel):
    resolve_url("http://example.com/" + base, rel)


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=500))
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives(keys):
    from anycrawl_spark.operators.seen import _bit_positions, _bloom_params

    hashes = np.array(keys, dtype=np.int64)
    m_bits = _bloom_params(len(hashes))
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for pos in _bit_positions(hashes, m_bits):
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    # every inserted key must probe positive
    hit = np.ones(len(hashes), dtype=bool)
    for pos in _bit_positions(hashes, m_bits):
        hit &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    assert hit.all()


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_span_offsets_dense_and_typed(md):
    spans = markdown_to_spans(md)
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    for s in spans:
        if s["kind"] == "text":
            assert s["text"] and s["media_ref"] is None
        else:
            assert s["media_ref"] and s["text"] is None


@given(st.lists(st.sampled_from(["**/a/**", "*.html", "/x\\d+/", "?", "a*b"]), max_size=4),
       url_text)
@settings(max_examples=200, deadline=None)
def test_patterns_never_raise(pats, url):
    inc = compile_patterns(pats)
    url_passes("http://e.com/" + url, inc, None)


@given(st.text(alphabet=st.characters(whitelist_categories=("Ll",), whitelist_characters=" "),
               max_size=400),
       st.integers(min_value=2, max_value=50),
       st.integers(min_value=1, max_value=20))
@settings(max_examples=60, deadline=None)
def test_chunk_coverage(text, chunk_size, overlap):
    """Chunks with overlap stripped reconstruct the exact token stream."""
    if overlap >= chunk_size:
        overlap = chunk_size - 1
    toks = text.split()
    stride = chunk_size - overlap
    # reference chunking in plain python (mirrors functions/text.py semantics)
    if not toks:
        return
    import math
    n_chunks = max(1, math.ceil(max(len(toks) - overlap, 1) / stride))
    rebuilt = []
    for i in range(n_chunks):
        chunk = toks[i * stride : i * stride + chunk_size]
        rebuilt.extend(chunk if i == 0 else chunk[overlap:] if len(chunk) > overlap else [])
    # coverage: every token index appears; no token lost
    assert rebuilt == toks[: len(rebuilt)]
    assert len(rebuilt) >= len(toks) - overlap  # tail fully covered
    covered = n_chunks * stride + overlap
    assert covered >= len(toks)


def test_chunk_spark_matches_python(spark):
    """The JVM chunker agrees with the plain-python reference above."""
    import pandas as pd
    from pyspark.sql import functions as F

    from anycrawl_spark.functions.text import chunk_tokens

    texts = [
        " ".join(f"t{i}" for i in range(n)) for n in (0, 1, 7, 8, 9, 31, 32, 33, 100)
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    rows = df.select("text", chunk_tokens(F.col("text"), 8, 3).alias("ch")).collect()
    for r in rows:
        toks = r.text.split()
        if not toks:
            assert r.ch == []
            continue
        import math
        stride = 5
        n_chunks = max(1, math.ceil(max(len(toks) - 3, 1) / stride))
        assert len(r.ch) == n_chunks, (len(toks), len(r.ch))
        for i, c in enumerate(r.ch):
            assert c.text.split() == toks[i * stride : i * stride + 8]


def test_simhash_hamming_property():
    """blake2b-based digest sanity for the synth web determinism."""
    from anycrawl_spark import synth

    u = synth.page_url(synth.host_name(3), 5)
    assert synth.page_html(u) == synth.page_html(u)
    assert synth.page_status(u) == synth.page_status(u)
    assert hashlib.blake2b(b"x").hexdigest() == hashlib.blake2b(b"x").hexdigest()


@given(
    st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=400, unique=True),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_cuckoo_kernel_live_keys_never_false_negative(keys, data):
    """Random insert set + random delete subset: every LIVE key must still
    probe positive (deletes must never clobber another key's fingerprint in
    a way that loses it — the involution property of the alt index)."""
    from anycrawl_spark.operators.seen_cuckoo import (
        _build_table, _delete_one, _fp_i1_i2, _probe_table,
    )

    ks = np.array(keys, dtype=np.int64)
    tbl, nb = _build_table(ks)
    n_del = data.draw(st.integers(0, len(ks)))
    dels = ks[:n_del]
    fps, i1s, i2s = _fp_i1_i2(dels, nb)
    for j in range(len(dels)):
        assert _delete_one(tbl, int(fps[j]), int(i1s[j]), int(i2s[j]))
    live = ks[n_del:]
    if len(live):
        hits = _probe_table(tbl, live)
        # a delete may legitimately remove a DIFFERENT key's identical
        # (bucket, fingerprint) copy; the live key then misses only if the
        # deleted key collided exactly — possible but must be rare
        misses = int((~hits).sum())
        collisions = 0
        if misses:
            lf, l1, l2 = _fp_i1_i2(live[~hits], nb)
            df_, d1, d2 = _fp_i1_i2(dels, nb)
            for j in range(len(lf)):
                same = (df_ == lf[j]) & (
                    (d1 == l1[j]) | (d2 == l1[j]) | (d1 == l2[j]) | (d2 == l2[j])
                )
                collisions += int(same.any())
        assert misses == collisions, (misses, collisions)
