"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages. The decode kernels the container lacks (PIL/ffmpeg)
are STUBBED behind ``AnyCrawlDecodeUnavailable`` with a deterministic fake
used by tests — the Spark-side plumbing (schema, batch shape, partitioning,
UDF signatures) is real and tested.

Scale notes: media bytes NEVER pass through a shuffle — all media stages are
narrow maps over the storage partitioning; only extracted features (small,
fixed-width) flow into joins/aggregations downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),    # image|audio|video
        T.StructField("format", T.StringType()),        # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("ok", T.BooleanType()),
    ]
)


class AnyCrawlDecodeUnavailable(NotImplementedError):
    """Raised when a real decoder (PIL/libav) is required but not installed."""


def _try_real_decode(payload: bytes) -> np.ndarray:
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # container has no imaging libs — stub path
        raise AnyCrawlDecodeUnavailable("PIL not available in this environment") from e
    raise AnyCrawlDecodeUnavailable("real decode path not wired in sandbox")


def fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for image decode + embed: blake2b-seeded vector.

    Keeps the full pipeline (bytes -> fixed-width feature) testable without
    imaging libs; swap for a real model UDF in production.
    """
    h = hashlib.blake2b(payload, digest_size=dim * 2).digest()
    arr = np.frombuffer(h, dtype=np.uint16).astype(np.float32)
    return (arr / 65535.0) * 2.0 - 1.0


def synth_media(media_ref: str) -> tuple[bytes, dict]:
    """Deterministic fake payload + metadata for a media_ref URL."""
    payload = hashlib.blake2b(media_ref.encode(), digest_size=32).digest() * 8
    d = int.from_bytes(payload[:4], "big")
    return payload, {
        "media_type": "image",
        "format": ["png", "jpeg", "webp"][d % 3],
        "width": 64 + d % 1024,
        "height": 64 + (d >> 10) % 1024,
        "duration_ms": None,
        "size_bytes": len(payload),
    }


def materialize_media(refs: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """media_ref rows -> MEDIA rows (deterministic synthetic payloads)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref in pdf[ref_col]:
                payload, meta = synth_media(ref)
                rows.append({"media_ref": ref, "payload": payload, "meta": meta})
            yield pd.DataFrame(rows, columns=["media_ref", "payload", "meta"])

    return refs.select(ref_col).distinct().mapInPandas(gen, schema=MEDIA)


def extract_features(media: DataFrame, dim: int = 16, use_real: bool = False) -> DataFrame:
    """payload -> fixed-width feature vector (mapInPandas; Arrow batches)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    vec = (
                        _try_real_decode(r.payload)
                        if use_real
                        else fake_decode(r.payload, dim)
                    )
                    rows.append(
                        {"media_ref": r.media_ref, "feature": vec.tolist(), "ok": True}
                    )
                except AnyCrawlDecodeUnavailable:
                    rows.append({"media_ref": r.media_ref, "feature": None, "ok": False})
            yield pd.DataFrame(rows, columns=["media_ref", "feature", "ok"])

    return media.select("media_ref", "payload").mapInPandas(gen, schema=FEATURES)


def media_refs_from_documents(documents: DataFrame) -> DataFrame:
    """Pull the media side of the interleaved spans payload."""
    return (
        documents.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .filter(F.col("media_ref").isNotNull())
        .distinct()
    )


RESIZED = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for image resize: re-digest keyed by target
    size (real path: PIL thumbnail — stubbed, sandbox has no imaging libs)."""
    h = hashlib.blake2b(payload + f"|{width}x{height}".encode(), digest_size=32)
    return h.digest() * 4


def resize_images(
    media: DataFrame, width: int = 256, height: int = 256, use_real: bool = False
) -> DataFrame:
    """payload -> resized payload (mapInPandas; bytes stay in the narrow map,
    never shuffled). The real decoder is stubbed exactly like
    ``extract_features``; the Spark plumbing (schema, batching, partition
    preservation) is real and tested."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    if use_real:
                        _try_real_decode(r.payload)
                    rows.append({
                        "media_ref": r.media_ref,
                        "payload": fake_resize(r.payload, width, height),
                        "width": width, "height": height, "ok": True,
                    })
                except AnyCrawlDecodeUnavailable:
                    rows.append({
                        "media_ref": r.media_ref, "payload": None,
                        "width": None, "height": None, "ok": False,
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED.fields])

    return media.select("media_ref", "payload").mapInPandas(gen, schema=RESIZED)


FRAMES = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000, use_real: bool = False) -> DataFrame:
    """video payload -> one row per sampled frame at ``every_ms`` intervals
    (mapInPandas fan-out; frame bytes are derived deterministically from the
    payload + timestamp — the ffmpeg decode is the stubbed kernel). Row
    explosion happens INSIDE the python stage, so upstream partitioning is
    preserved and no shuffle touches the bytes."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                duration = (r.meta or {}).get("duration_ms") or 0
                n = max(1, duration // every_ms) if duration else 1
                for i in range(int(n)):
                    ts = i * every_ms
                    frame = hashlib.blake2b(
                        r.payload + f"|frame@{ts}".encode(), digest_size=32
                    ).digest()
                    rows.append({
                        "media_ref": r.media_ref, "frame_idx": i,
                        "ts_ms": ts, "frame": frame,
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES.fields])

    return media.select("media_ref", "payload", "meta").mapInPandas(gen, schema=FRAMES)
