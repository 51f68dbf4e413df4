"""Pure-stdlib PNG codec (zlib + struct) for the multimodal pipeline.

The sandbox has no imaging libraries, but PNG itself needs none: the
container format is length-prefixed chunks around a zlib stream of
filtered scanlines (RFC 2083 / the W3C PNG spec, both public). This
module implements the subset the synthetic media fixtures exercise —
8-bit depth, color types 0 (grayscale), 2 (RGB), 3 (palette), 4
(gray+alpha) and 6 (RGBA), all five scanline filters, non-interlaced —
so ``operators/multimodal.extract_features`` computes features from REAL
decoded pixels for PNG payloads instead of the deterministic stub (which
remains for jpeg/webp; reference parity target: the screenshot payloads
of `ScreenshotTransformer.ts` / `s3.ts`, which the reference stores as
opaque bytes + metadata, never decoding server-side).

Everything here is per-row kernel code: it runs inside Arrow-batched
``mapInPandas`` stages, bytes never cross a shuffle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per color type (PNG spec §11.2.2)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_COLOR_TYPE_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


class PngFormatError(ValueError):
    """Payload is not a PNG this decoder supports."""


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (spec §9.4): nearest of left/up/up-left to a+b-c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# ------------------------------------------------------------------ decode


def _iter_chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngFormatError("truncated chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) == 4 and struct.unpack(">I", crc)[0] != zlib.crc32(ctype + body):
            raise PngFormatError(f"bad CRC in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return


def _defilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Filtered scanlines -> (height, width*channels) uint8 recon rows."""
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise PngFormatError("decompressed length mismatch")
    bpp = channels  # bit depth 8: bytes per complete pixel
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int32
        )
        if ftype == 0:  # None
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: cumulative per byte-position mod bpp
            recon = line.copy()
            for x in range(bpp, stride):
                recon[x] = (recon[x] + recon[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            recon = line.copy()
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                upleft = int(prev[x - bpp]) if x >= bpp else 0
                recon[x] = (recon[x] + _paeth(left, int(prev[x]), upleft)) & 0xFF
        else:
            raise PngFormatError(f"unknown filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (height, width, channels).

    Palette images (color type 3) are expanded through their PLTE to RGB.
    Raises :class:`PngFormatError` for non-PNG bytes or unsupported
    variants (16-bit depth, Adam7 interlace).
    """
    if data[:8] != PNG_SIGNATURE:
        raise PngFormatError("bad signature")
    width = height = None
    color_type = channels = None
    palette = None
    idat = bytearray()
    for ctype, body in _iter_chunks(data):
        if ctype == b"IHDR":
            if len(body) != 13:
                raise PngFormatError("bad IHDR length")
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngFormatError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise PngFormatError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise PngFormatError("unsupported compression/filter method")
            if interlace != 0:
                raise PngFormatError("Adam7 interlace not supported")
            channels = _CHANNELS[color_type]
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise PngFormatError("bad PLTE length")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngFormatError("missing IHDR")
    if not idat:
        raise PngFormatError("missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngFormatError(f"corrupt IDAT stream: {e}") from e
    rows = _defilter(raw, width, height, channels)
    img = rows.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise PngFormatError("palette image without PLTE")
        if int(img.max()) >= len(palette):
            raise PngFormatError("palette index out of range")
        img = palette[img[:, :, 0]]
    return img


# ------------------------------------------------------------------ encode


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _filter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> bytes:
    """Apply filter ``ftype`` to a recon row (inverse of _defilter)."""
    r = row.astype(np.int32)
    p = prev.astype(np.int32)
    n = len(r)
    if ftype == 0:
        out = r
    elif ftype == 1:
        left = np.concatenate([np.zeros(bpp, np.int32), r[:-bpp]]) if n > bpp else np.zeros(n, np.int32)
        out = (r - left) & 0xFF
    elif ftype == 2:
        out = (r - p) & 0xFF
    elif ftype == 3:
        left = np.concatenate([np.zeros(bpp, np.int32), r[:-bpp]]) if n > bpp else np.zeros(n, np.int32)
        out = (r - ((left + p) >> 1)) & 0xFF
    elif ftype == 4:
        out = np.empty(n, np.int32)
        for x in range(n):
            a = int(r[x - bpp]) if x >= bpp else 0
            c = int(p[x - bpp]) if x >= bpp else 0
            out[x] = (int(r[x]) - _paeth(a, int(p[x]), c)) & 0xFF
    else:
        raise ValueError(f"unknown filter type {ftype}")
    return bytes([ftype]) + out.astype(np.uint8).tobytes()


def encode_png(img: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 (H, W) or (H, W, C) array -> PNG bytes (C in 1/2/3/4 ->
    grayscale / gray+alpha / RGB / RGBA). ``filter_type`` picks the
    scanline filter used on every row — any value roundtrips through
    :func:`decode_png`, which lets the fixtures exercise all five
    defilter paths with real bytes."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE_FOR_CHANNELS:
        raise ValueError("expected (H, W[, C<=4]) uint8 array")
    height, width, channels = arr.shape
    color_type = _COLOR_TYPE_FOR_CHANNELS[channels]
    flat = arr.reshape(height, width * channels)
    prev = np.zeros(width * channels, dtype=np.uint8)
    parts = []
    for y in range(height):
        parts.append(_filter_row(filter_type, flat[y], prev, channels))
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(parts), level))
        + _chunk(b"IEND", b"")
    )
