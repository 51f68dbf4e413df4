"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages. PNG payloads are decoded FOR REAL through the
pure-stdlib codec in ``functions/png.py`` (zlib + struct; all five scanline
filters, gray/RGB/RGBA), JPEG payloads through ``functions/jpeg.py``
(baseline T.81, differential-verified against Java ImageIO), and
lossless-WebP payloads through ``functions/webp.py`` (full VP8L: all four
transforms, color cache, meta prefix codes), and GIF payloads through
``functions/gif.py`` (GIF87a/89a LZW, interlace, transparency,
differential-verified against Java ImageIO) — image features come from
actual pixels for all four. WAV audio payloads decode FOR REAL through
``functions/wav.py`` (RIFF chunk walk; PCM 8/16/24/32-bit, IEEE float,
EXTENSIBLE; differential-verified against the stdlib ``wave`` module) —
audio features, resampling and clip sampling run on actual decoded
samples. Only the kernels the container genuinely
lacks (the lossy VP8 arithmetic coder, libav) stay STUBBED behind
``AnyCrawlDecodeUnavailable`` with a deterministic fake — the Spark-side
plumbing (schema, batch shape, partitioning, UDF signatures) is real and
tested either way.

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

from anycrawl_spark.functions.gif import (
    GIF87A,
    GIF89A,
    GifFormatError,
    decode_gif,
    decode_gif_frames,
    decode_gif_indexed,
    encode_gif,
    encode_gif_animation,
)
from anycrawl_spark.functions.jpeg import (
    JPEG_SOI,
    JpegFormatError,
    decode_baseline as decode_jpeg,
    encode_baseline as encode_jpeg,
)
from anycrawl_spark.functions.png import (
    PNG_SIGNATURE,
    PngFormatError,
    decode_png,
    encode_png,
)
from anycrawl_spark.functions.wav import (
    WavFormatError,
    decode_wav,
    encode_wav,
    is_wav,
    resample_linear,
)
from anycrawl_spark.functions.webp import (
    WebpFormatError,
    classify_webp,
    decode_webp,
    encode_webp,
    has_vp8l,
    is_webp,
)

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
    """Raised when a real decoder (WebP/libav) is required but not installed."""


#: exceptions that mean "this payload failed to decode" — fail the ROW
DECODE_ROW_ERRORS = (
    AnyCrawlDecodeUnavailable, PngFormatError, JpegFormatError, WebpFormatError,
    GifFormatError, WavFormatError,
)


def _try_real_decode(payload: bytes) -> np.ndarray:
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # container has no imaging libs — stub path
        raise AnyCrawlDecodeUnavailable("PIL not available in this environment") from e
    raise AnyCrawlDecodeUnavailable("real decode path not wired in sandbox")


def fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for image decode + embed: blake2b-seeded vector.

    Keeps the full pipeline (bytes -> fixed-width feature) testable without
    imaging libs; swap for a real model UDF in production. Used only for
    the formats whose entropy coders the sandbox lacks (lossy VP8, libav)
    — PNG, JPEG and lossless WebP go through the real stdlib decoders.
    """
    h = hashlib.blake2b(payload, digest_size=dim * 2).digest()
    arr = np.frombuffer(h, dtype=np.uint16).astype(np.float32)
    return (arr / 65535.0) * 2.0 - 1.0


def png_feature(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Real-pixel feature: normalize decoded uint8 pixels to [-1, 1], then
    mean-pool contiguous chunks down to ``dim`` floats (zero-padded to a
    multiple of dim). Deterministic, resolution-tolerant, computed from
    actual image content."""
    flat = img.astype(np.float32).ravel() / 255.0 * 2.0 - 1.0
    pad = (-len(flat)) % dim
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.float32)])
    return flat.reshape(dim, -1).mean(axis=1)


def audio_feature(samples: np.ndarray, dim: int = 16) -> np.ndarray:
    """Real-sample audio feature: chunked RMS energy envelope pooled down
    to ``dim`` floats. Channels are mixed down by mean first (the envelope
    of the mixdown, like a waveform display); the frame axis is zero-padded
    to a multiple of dim so every payload yields a fixed-width vector.
    Deterministic, rate- and depth-tolerant, computed from actual decoded
    audio content — the audio analog of ``png_feature``."""
    mono = samples.astype(np.float64).mean(axis=1)
    pad = (-len(mono)) % dim
    if pad:
        mono = np.concatenate([mono, np.zeros(pad, dtype=np.float64)])
    chunks = mono.reshape(dim, -1)
    return np.sqrt((chunks * chunks).mean(axis=1)).astype(np.float32)


def feature_for_payload(payload: bytes, dim: int = 16, use_real: bool = False) -> np.ndarray:
    """The decode-select kernel shared by the Spark stage AND the sequential
    oracle mirror: PNG/JPEG/GIF/lossless-WebP bytes -> real decode +
    png_feature; WAV bytes -> real decode + audio_feature; other formats ->
    deterministic fake (or the stubbed real path when ``use_real``)."""
    head = bytes(payload[:12])
    if head[:8] == PNG_SIGNATURE:
        return png_feature(decode_png(bytes(payload)), dim)
    if head[:2] == JPEG_SOI:
        return png_feature(decode_jpeg(bytes(payload)), dim)
    if head[:6] in (GIF87A, GIF89A):
        return png_feature(decode_gif(bytes(payload)), dim)
    if is_wav(head):  # RIFF like WebP — the byte-8 fourcc disambiguates
        samples, _rate = decode_wav(bytes(payload))
        return audio_feature(samples, dim)
    if is_webp(head):
        data = bytes(payload)
        kind = classify_webp(data)
        if kind == "lossless":  # real stdlib decode
            return png_feature(decode_webp(data), dim)
        if kind == "invalid":  # corrupt container: fail the ROW
            raise WebpFormatError("malformed WEBP container")
        # lossy VP8: the one documented decode stub
        if use_real:
            return _try_real_decode(data)
        return fake_decode(payload, dim)
    if use_real:
        return _try_real_decode(bytes(payload))
    return fake_decode(payload, dim)


def synth_media(media_ref: str) -> tuple[bytes, dict]:
    """Deterministic payload + metadata for a media_ref URL.

    PNG refs (1 in 3) get a REAL PNG image — pixels drawn from a blake2b
    counter stream, color type in {gray, RGB, RGBA} and scanline filter in
    {0..4} both hash-picked, so the fixture population exercises every
    defilter path of the stdlib codec. JPEG refs (1 in 3) get a REAL
    baseline JPEG — gray/RGB, quality, 4:2:0 and restart interval all
    hash-picked, covering every decode path of ``functions/jpeg.py``. WebP
    refs (1 in 4) get a REAL lossless VP8L stream — subtract-green /
    cross-color / predictor-mode / color-cache / palette / meta-group knobs
    all hash-picked, covering every decode path of ``functions/webp.py``.
    GIF refs (1 in 4) get a REAL GIF87a/89a stream — interlace,
    transparency, local-vs-global color table and palette size all
    hash-picked; half of them are ANIMATED (2-5 frames, sub-rect deltas,
    hash-picked delays and disposal methods, real duration in the
    metadata), covering every decode path of ``functions/gif.py``
    (lossy VP8 remains the one documented decode stub)."""
    seed = hashlib.blake2b(media_ref.encode(), digest_size=32).digest()
    d = int.from_bytes(seed[:4], "big")
    if "/aud/" in media_ref:
        # AUDIO namespace: a REAL RIFF/WAVE stream — sample rate, duration,
        # channel count, bit depth (8/16/24/32-bit PCM, float32/float64) and
        # the EXTENSIBLE wrapper all hash-picked, so the fixture population
        # exercises every decode path of ``functions/wav.py``. Content is a
        # per-channel sine (hash-picked frequency/phase/amplitude) plus
        # low-level deterministic noise from a blake2b counter stream.
        return _synth_wav(seed, d)
    fmt = ["png", "jpeg", "webp", "gif"][d % 4]
    if fmt in ("png", "jpeg", "webp", "gif"):
        width = 8 + d % 25
        height = 8 + (d >> 10) % 25
        channels = (
            [1, 3, 4][(d >> 5) % 3] if fmt == "png"
            else [1, 3][(d >> 5) % 2] if fmt == "jpeg"
            else [3, 4][(d >> 5) % 2] if fmt == "webp"
            else 3
        )
        n = width * height * channels
        raw = bytearray()
        ctr = 0
        while len(raw) < n:
            raw += hashlib.blake2b(
                seed + ctr.to_bytes(4, "big"), digest_size=64
            ).digest()
            ctr += 1
        img = np.frombuffer(bytes(raw[:n]), dtype=np.uint8).reshape(
            height, width, channels
        )
        if fmt == "png":
            payload = encode_png(img, filter_type=(d >> 3) % 5)
        elif fmt == "jpeg":
            payload = encode_jpeg(
                img if channels == 3 else img[..., 0],
                quality=40 + (d >> 7) % 58,
                subsample=channels == 3 and bool((d >> 4) & 1),
                restart_interval=[0, 0, 1, 3][(d >> 14) % 4],
            )
        elif fmt == "gif":
            if (d >> 20) & 1:
                # ANIMATED (1 in 2 gif refs): 2-5 frames over a shared
                # 8-color palette — frame 0 full-canvas, later frames
                # sub-rect deltas with hash-picked offsets, delays
                # (40-200 ms, centisecond-aligned) and disposal methods,
                # so the fixture population exercises the whole GIF89a
                # compositing model; meta carries the real total duration
                palette = np.frombuffer(
                    hashlib.blake2b(seed + b"pal", digest_size=24).digest(),
                    dtype=np.uint8,
                ).reshape(8, 3)
                n_frames = 2 + (d >> 21) % 4
                frames = []
                duration_ms = 0
                for k in range(n_frames):
                    fseed = hashlib.blake2b(
                        seed + b"frame" + k.to_bytes(2, "big"), digest_size=32
                    ).digest()
                    fd = int.from_bytes(fseed[:4], "big")
                    if k == 0:
                        fh, fw, left, top = height, width, 0, 0
                    else:
                        fw = 1 + fd % width
                        fh = 1 + (fd >> 8) % height
                        left = (fd >> 16) % (width - fw + 1)
                        top = (fd >> 24) % (height - fh + 1)
                    nn = fw * fh
                    fraw = bytearray()
                    ctr = 0
                    while len(fraw) < nn:
                        fraw += hashlib.blake2b(
                            fseed + ctr.to_bytes(4, "big"), digest_size=64
                        ).digest()
                        ctr += 1
                    idx = (
                        np.frombuffer(bytes(fraw[:nn]), dtype=np.uint8) % 8
                    ).reshape(fh, fw)
                    delay = 40 + 10 * ((fd >> 5) % 17)
                    duration_ms += delay
                    frames.append({
                        "indices": idx, "left": left, "top": top,
                        "delay_ms": delay, "disposal": (fd >> 10) % 4,
                    })
                payload = encode_gif_animation(
                    frames, palette,
                    transparent_index=0 if (d >> 16) & 1 else None,
                )
                return payload, {
                    "media_type": "image", "format": fmt,
                    "width": width, "height": height,
                    "duration_ms": duration_ms, "size_bytes": len(payload),
                }
            # static: <=64 distinct colors (GIF palettes cap at 256):
            # quantize hard; knobs hash-picked across the decode matrix
            img = (img >> 6) << 6
            payload = encode_gif(
                img,
                interlace=bool((d >> 17) & 1),
                # index 0 always exists (palette has >=1 entry)
                transparent_index=0 if (d >> 16) & 1 else None,
                local_color_table=bool((d >> 18) & 1),
                version=GIF87A if (d >> 19) & 1 and not (d >> 16) & 1 else GIF89A,
            )
        else:  # lossless VP8L, knobs hash-picked across the decode matrix
            if (d >> 16) % 4 == 0:
                # palette path needs few distinct colors: quantize hard
                img = (img >> 6) << 6
                payload = encode_webp(img, use_palette=True)
            else:
                payload = encode_webp(
                    img,
                    use_subtract_green=bool((d >> 4) & 1),
                    predictor_mode=((d >> 18) % 14) if (d >> 7) & 1 else None,
                    color_transform=(
                        (d >> 9) & 0xFF, (d >> 13) & 0xFF, (d >> 3) & 0xFF,
                    ) if (d >> 8) & 1 else None,
                    cache_bits=[0, 0, 4, 7][(d >> 14) % 4],
                    use_meta=bool((d >> 22) & 1),
                )
    else:  # pragma: no cover — no fourth format today
        width = 64 + d % 1024
        height = 64 + (d >> 10) % 1024
        payload = seed * 8
    return payload, {
        "media_type": "image",
        "format": fmt,
        "width": width,
        "height": height,
        "duration_ms": None,
        "size_bytes": len(payload),
    }


def _synth_wav(seed: bytes, d: int) -> tuple[bytes, dict]:
    """Deterministic WAV fixture: see synth_media's audio branch."""
    rate = [8000, 16000, 22050, 44100][d % 4]
    duration_ms = 60 + (d >> 6) % 340
    frames = rate * duration_ms // 1000
    channels = 1 + ((d >> 2) & 1)
    bits, float_fmt = [
        (8, False), (16, False), (24, False), (32, False), (32, True), (64, True),
    ][(d >> 8) % 6]
    extensible = bool((d >> 11) & 1)
    t = np.arange(frames, dtype=np.float64) / rate
    chans = []
    for c in range(channels):
        cd = int.from_bytes(
            hashlib.blake2b(seed + b"chan" + bytes([c]), digest_size=8).digest(),
            "big",
        )
        freq = 100.0 + cd % 3900
        amp = 0.25 + 0.6 * ((cd >> 12) % 256) / 255.0
        phase = 2.0 * np.pi * ((cd >> 20) % 256) / 256.0
        x = amp * np.sin(2.0 * np.pi * freq * t + phase)
        if (cd >> 28) & 1:  # low-level deterministic noise stream
            raw = bytearray()
            ctr = 0
            while len(raw) < frames:
                raw += hashlib.blake2b(
                    seed + b"noise" + bytes([c]) + ctr.to_bytes(4, "big"),
                    digest_size=64,
                ).digest()
                ctr += 1
            noise = np.frombuffer(bytes(raw[:frames]), dtype=np.uint8)
            x = x + (noise.astype(np.float64) - 127.5) / 127.5 * 0.05
        chans.append(np.clip(x, -0.999, 0.999))
    samples = np.stack(chans, axis=1)
    payload = encode_wav(samples, rate, bits=bits, float_fmt=float_fmt,
                         extensible=extensible)
    return payload, {
        "media_type": "audio",
        "format": "wav",
        "width": None,
        "height": None,
        "duration_ms": duration_ms,
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
    """payload -> fixed-width feature vector (mapInPandas; Arrow batches).

    PNG/JPEG/GIF/lossless-WebP payloads always decode for real (stdlib
    codecs); lossy formats use the deterministic fake, or — with
    ``use_real`` — the stubbed real path (ok=False until a lossy decoder
    exists in the environment)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    vec = feature_for_payload(r.payload, dim, use_real)
                    rows.append(
                        {"media_ref": r.media_ref, "feature": vec.tolist(), "ok": True}
                    )
                except DECODE_ROW_ERRORS:
                    # a malformed payload (PNG/JPEG signature but truncated/
                    # corrupt bytes, unsupported variant) must fail ROW-wise,
                    # never kill the Spark task
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
    """Deterministic stand-in for lossy-webp/libav resize: re-digest keyed
    by target size (their decoders are the documented stub)."""
    h = hashlib.blake2b(payload + f"|{width}x{height}".encode(), digest_size=32)
    return h.digest() * 4


def png_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for PNG payloads: decode, nearest-neighbor sample the
    pixel grid to (height, width), re-encode. Pure numpy index math —
    deterministic and library-free."""
    img = decode_png(payload)
    src_h, src_w = img.shape[:2]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return encode_png(img[ys][:, xs])


def jpeg_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for JPEG payloads: decode (functions/jpeg.py),
    nearest-neighbor sample, re-encode at a fixed deterministic quality."""
    img = decode_jpeg(payload)
    src_h, src_w = img.shape[:2]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return encode_jpeg(img[ys][:, xs], quality=85)


def gif_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for GIF payloads. Static: decode to the INDEX grid
    (functions/gif.py), nearest-neighbor sample the indices, re-encode with
    the same palette — lossless, and transparency survives because the
    transparent INDEX is preserved rather than round-tripped through RGB.
    Animated: render the composited canvases, nearest-neighbor each one,
    re-quantize the union of colors (raises row-wise past GIF's 256-color
    cap) and re-emit FULL frames at the original delays — playback at the
    new size looks identical, frame for frame, regardless of how the
    source distributed its sub-rects and disposal methods."""
    frames = decode_gif_frames(bytes(payload))
    if len(frames) == 1:
        idx, palette, transparent = decode_gif_indexed(payload)
        src_h, src_w = idx.shape
        ys = (np.arange(height) * src_h) // height
        xs = (np.arange(width) * src_w) // width
        return encode_gif(
            indices=idx[ys][:, xs], palette=palette, transparent_index=transparent
        )
    _SENTINEL = np.uint32(1) << 24  # alpha-0 pixels, outside 24-bit RGB space
    keyed = []
    for delay, canvas in frames:
        src_h, src_w = canvas.shape[:2]
        ys = (np.arange(height) * src_h) // height
        xs = (np.arange(width) * src_w) // width
        c = canvas[ys][:, xs]
        keys = (
            (c[..., 0].astype(np.uint32) << 16)
            | (c[..., 1].astype(np.uint32) << 8)
            | c[..., 2].astype(np.uint32)
        )
        keys[c[..., 3] == 0] = _SENTINEL
        keyed.append((delay, keys))
    uniq = np.unique(np.concatenate([k.ravel() for _, k in keyed]))
    has_transparent = bool(uniq[-1] == _SENTINEL)
    colors = uniq[:-1] if has_transparent else uniq
    if colors.size + has_transparent > 256:
        raise GifFormatError(
            f"{colors.size + has_transparent} colors after compositing; "
            "GIF palettes cap at 256"
        )
    palette = np.stack(
        [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF], axis=1
    ).astype(np.uint8)
    transparent_index = int(colors.size) if has_transparent else None
    if has_transparent:
        palette = np.vstack([palette, np.zeros((1, 3), np.uint8)])
    return encode_gif_animation(
        [
            {
                "indices": np.searchsorted(uniq, k).astype(np.uint8),
                "delay_ms": delay,
                # full frames must NOT inherit the previous frame through
                # their transparent holes: clear to transparent (disposal 2)
                # so each canvas is exactly the rendered source canvas
                "disposal": 2,
            }
            for delay, k in keyed
        ],
        palette,
        transparent_index=transparent_index,
    )


def webp_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for lossless-WebP payloads: decode (functions/webp.py),
    nearest-neighbor sample, re-encode losslessly."""
    img = decode_webp(payload)
    src_h, src_w = img.shape[:2]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return encode_webp(img[ys][:, xs])


def resize_images(
    media: DataFrame, width: int = 256, height: int = 256, use_real: bool = False
) -> DataFrame:
    """payload -> resized payload (mapInPandas; bytes stay in the narrow map,
    never shuffled). PNG/JPEG/GIF/lossless-WebP payloads resize for real
    (decode -> nearest-neighbor -> re-encode); lossy webp uses the
    deterministic fake, or the stubbed real path with ``use_real``. The
    Spark plumbing (schema, batching, partition preservation) is identical
    across all."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    if bytes(r.payload[:8]) == PNG_SIGNATURE:
                        out = png_resize(bytes(r.payload), width, height)
                    elif bytes(r.payload[:2]) == JPEG_SOI:
                        out = jpeg_resize(bytes(r.payload), width, height)
                    elif is_webp(bytes(r.payload[:12])) and has_vp8l(bytes(r.payload)):
                        out = webp_resize(bytes(r.payload), width, height)
                    elif bytes(r.payload[:6]) in (GIF87A, GIF89A):
                        out = gif_resize(bytes(r.payload), width, height)
                    elif use_real:
                        _try_real_decode(bytes(r.payload))
                        out = None  # unreachable until a real decoder exists
                    else:
                        out = fake_resize(r.payload, width, height)
                    rows.append({
                        "media_ref": r.media_ref,
                        "payload": out,
                        "width": width, "height": height, "ok": True,
                    })
                except DECODE_ROW_ERRORS:
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
    """video/animation payload -> one row per sampled frame at ``every_ms``
    intervals (mapInPandas fan-out; row explosion happens INSIDE the python
    stage, so upstream partitioning is preserved and no shuffle touches the
    bytes).

    Animated GIF payloads sample FOR REAL: the stream's frames are
    composited per the GIF89a disposal model (functions/gif.py), the frame
    active at each ``every_ms`` tick is selected by the stream's own GCE
    delays, and the sampled canvas is emitted as PNG bytes (RGBA-capable;
    functions/png.py). A malformed GIF emits zero rows for that ref
    (row-wise failure, same policy as extract_features). Everything else
    — static images and the container's absent video decoders (libav) —
    keeps the deterministic fake derived from payload + timestamp, with
    the frame count driven by metadata duration."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                for i, ts, frame in frames_for_payload(r.payload, r.meta, every_ms):
                    rows.append({
                        "media_ref": r.media_ref, "frame_idx": i,
                        "ts_ms": ts, "frame": frame,
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES.fields])

    return media.select("media_ref", "payload", "meta").mapInPandas(gen, schema=FRAMES)


def frames_for_payload(
    payload: bytes, meta: dict | None, every_ms: int
) -> list[tuple[int, int, bytes]]:
    """The per-payload sampling kernel shared by the Spark stage AND the
    sequential oracle mirror: (frame_idx, ts_ms, frame_bytes) tuples.
    Animated GIF -> real composited PNG frames; corrupt GIF -> zero rows;
    everything else -> metadata-driven deterministic fake."""
    if bytes(payload[:6]) in (GIF87A, GIF89A):
        try:
            frames = decode_gif_frames(bytes(payload))
        except GifFormatError:
            return []  # corrupt payload: fail the ROW, not the task
        if len(frames) > 1:
            starts = [0]
            for delay, _ in frames[:-1]:
                starts.append(starts[-1] + delay)
            total = starts[-1] + frames[-1][0]
            n = max(1, total // every_ms)
            out = []
            j = 0
            for i in range(int(n)):
                ts = i * every_ms
                while j + 1 < len(frames) and starts[j + 1] <= ts:
                    j += 1
                out.append((i, ts, encode_png(frames[j][1])))
            return out
    duration = (meta or {}).get("duration_ms") or 0
    n = max(1, duration // every_ms) if duration else 1
    return [
        (
            i,
            i * every_ms,
            hashlib.blake2b(
                payload + f"|frame@{i * every_ms}".encode(), digest_size=32
            ).digest(),
        )
        for i in range(int(n))
    ]


RESAMPLED = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("frames", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def wav_resample(payload: bytes, target_rate: int) -> tuple[bytes, int]:
    """REAL resample for WAV payloads: decode (functions/wav.py), linear-
    interpolate the sample grid to ``target_rate``, re-encode as 16-bit PCM
    (the canonical interchange depth). Returns (bytes, frames) — the audio
    analog of png_resize."""
    samples, rate = decode_wav(payload)
    out = resample_linear(samples, rate, target_rate)
    return encode_wav(out, target_rate, bits=16), out.shape[0]


def resample_audio(media: DataFrame, target_rate: int = 16000) -> DataFrame:
    """payload -> resampled WAV payload (mapInPandas; bytes stay in the
    narrow map, never shuffled — same plan shape as resize_images). WAV
    payloads resample for real; non-audio payloads and malformed WAVs fail
    row-wise (ok=False), mirroring the image policy."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    if not is_wav(bytes(r.payload[:12])):
                        raise WavFormatError("not a WAV payload")
                    out, frames = wav_resample(bytes(r.payload), target_rate)
                    rows.append({
                        "media_ref": r.media_ref, "payload": out,
                        "sample_rate": target_rate, "frames": frames, "ok": True,
                    })
                except DECODE_ROW_ERRORS:
                    rows.append({
                        "media_ref": r.media_ref, "payload": None,
                        "sample_rate": None, "frames": None, "ok": False,
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in RESAMPLED.fields])

    return media.select("media_ref", "payload").mapInPandas(gen, schema=RESAMPLED)


CLIPS = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("clip_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("clip", T.BinaryType()),
    ]
)


def clips_for_payload(
    payload: bytes, every_ms: int, clip_ms: int
) -> list[tuple[int, int, bytes]]:
    """The per-payload clip kernel shared by the Spark stage AND the
    sequential oracle mirror: WAV payload -> (clip_idx, ts_ms, wav_bytes)
    windows of ``clip_ms`` starting every ``every_ms`` — real decoded
    sample slices re-encoded as 16-bit PCM at the source rate (the audio
    analog of frames_for_payload's real GIF path). Non-audio or corrupt
    payloads emit zero rows (row-wise failure)."""
    if not is_wav(bytes(payload[:12])):
        return []
    try:
        samples, rate = decode_wav(bytes(payload))
    except WavFormatError:
        return []
    frames = samples.shape[0]
    total_ms = frames * 1000 // rate
    n = max(1, total_ms // every_ms) if total_ms else 1
    out = []
    for i in range(int(n)):
        ts = i * every_ms
        lo = ts * rate // 1000
        hi = min(frames, (ts + clip_ms) * rate // 1000)
        if lo >= frames:
            break
        out.append((i, ts, encode_wav(samples[lo:hi], rate, bits=16)))
    return out


def sample_clips(
    media: DataFrame, every_ms: int = 100, clip_ms: int = 50
) -> DataFrame:
    """audio payload -> one row per sampled clip (mapInPandas fan-out; the
    row explosion happens INSIDE the python stage, so upstream partitioning
    is preserved and no shuffle touches the bytes — same plan shape as
    sample_frames)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                for i, ts, clip in clips_for_payload(r.payload, every_ms, clip_ms):
                    rows.append({
                        "media_ref": r.media_ref, "clip_idx": i,
                        "ts_ms": ts, "clip": clip,
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in CLIPS.fields])

    return media.select("media_ref", "payload").mapInPandas(gen, schema=CLIPS)
