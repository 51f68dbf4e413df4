"""Pure-stdlib GIF codec (GIF87a/GIF89a, LZW) for the multimodal pipeline.

Fourth real image codec next to ``png.py`` / ``jpeg.py`` / ``webp.py``:
the container is tiny (logical screen descriptor + color tables + LZW-
compressed index stream, per the public GIF89a specification), and —
like the JPEG codec — every byte of it is verifiable against Java
ImageIO, which both reads AND writes GIF, so the differential fuzz runs
in both directions with EXACT equality (palette lookup has no rounding,
unlike the JPEG IDCT tolerance band).

Scope: the first image frame of a GIF87a/GIF89a stream — global and
local color tables, interlacing, the GCE transparency flag (decoded to
an alpha plane), LZW code widths 2..8 with full-table and deferred-clear
handling. Animation beyond frame 0 is out of scope (the reference never
decodes media server-side at all — `ScreenshotTransformer.ts` stores
opaque bytes + metadata; this codec exists for the rebuild's
training-data media features, same rationale as png.py).

Everything here is per-row kernel code: it runs inside Arrow-batched
``mapInPandas`` stages, bytes never cross a shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

GIF87A = b"GIF87a"
GIF89A = b"GIF89a"

_MAX_CODES = 4096  # 12-bit LZW ceiling (GIF89a spec appendix F)


class GifFormatError(ValueError):
    """Payload is not a GIF this decoder supports."""


# ------------------------------------------------------------------ LZW


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF-flavor LZW: variable 3..12-bit codes, LSB-first bit packing,
    clear/EOI codes, width growth when the next free slot reaches the
    current code range, no growth past 12 bits (deferred clear)."""
    if not 2 <= min_code_size <= 11:
        raise GifFormatError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    next_slot = eoi + 1
    # table[i] = decoded byte string for code i; roots are single indices
    roots = [bytes([i]) for i in range(clear)]
    table: list[bytes] = roots + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= n:
                raise GifFormatError("LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = roots + [b"", b""]
            next_slot = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= next_slot:
                raise GifFormatError("first LZW code out of range")
            entry = table[code]
        elif code < next_slot:
            entry = table[code]
        elif code == next_slot:
            entry = prev + prev[:1]
        else:
            raise GifFormatError("LZW code out of range")
        out += entry
        if prev is not None and next_slot < _MAX_CODES:
            table.append(prev + entry[:1])
            next_slot += 1
            if next_slot == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= expected:
            # well-formed streams follow with EOI; tolerate its absence the
            # way every renderer does once the raster is complete
            break
    if len(out) < expected:
        raise GifFormatError(
            f"LZW underrun: {len(out)} of {expected} pixels"
        )
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """giflib-shaped encoder: emit clear, dict of (prefix_code, symbol) ->
    code, width bump AFTER emitting when the next free slot has reached
    the current range, proactive clear at the 12-bit ceiling."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    next_slot = eoi + 1
    table: dict[tuple[int, int], int] = {}
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    it = iter(indices.tolist())
    try:
        cur = next(it)
    except StopIteration:
        emit(eoi)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)
    for sym in it:
        key = (cur, sym)
        nxt = table.get(key)
        if nxt is not None:
            cur = nxt
            continue
        emit(cur)
        # width grows for the NEXT emitted code once the slot about to be
        # assigned no longer fits the current width (mirrors giflib's
        # post-output RunningCode >= MaxCode1 check)
        if next_slot >= (1 << width) and width < 12:
            width += 1
        table[key] = next_slot
        next_slot += 1
        if next_slot >= _MAX_CODES:
            emit(clear)
            table.clear()
            next_slot = eoi + 1
            width = min_code_size + 1
        cur = sym
    emit(cur)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------ container


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise GifFormatError("truncated sub-block")
        chunks.append(data[pos : pos + size])
        pos += size


def _write_subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for off in range(0, len(payload), 255):
        chunk = payload[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Sequentially-stored interlaced rows -> display row order."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start::step] = rows[src : src + n]
        src += n
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return rows[np.array(order)]


def _read_color_table(data: bytes, pos: int, packed: int) -> tuple[np.ndarray, int]:
    n = 2 << (packed & 0x07)
    end = pos + 3 * n
    if end > len(data):
        raise GifFormatError("truncated color table")
    table = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3)
    return table, end


def decode_gif_indexed(
    data: bytes,
) -> tuple[np.ndarray, np.ndarray, int | None]:
    """First frame of a GIF87a/89a stream -> (indices (h, w) uint8,
    palette (n, 3) uint8, transparent index or None) — the lossless view
    the resize path needs (nearest-neighbor sampling of the INDEX grid
    keeps the palette and transparency byte-exact; round-tripping through
    RGB would lose the index<->color mapping when two palette entries
    share a color). The frame raster is returned at its own descriptor
    size; left/top offsets are compositing state for later frames and are
    ignored for frame 0."""
    data = bytes(data)
    if len(data) < 13 or data[:6] not in (GIF87A, GIF89A):
        raise GifFormatError("bad GIF signature")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, packed)
    transparent: int | None = None
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("unterminated GIF (no trailer)")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise GifFormatError("no image data before trailer")
        if block == 0x21:  # extension
            if pos >= n:
                raise GifFormatError("truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:
                if body[0] & 0x01:
                    transparent = body[3]
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise GifFormatError("truncated image descriptor")
        _left, _top, w, h = struct.unpack_from("<4H", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        if w == 0 or h == 0:
            raise GifFormatError("zero-size frame")
        lct = None
        if ipacked & 0x80:
            lct, pos = _read_color_table(data, pos, ipacked)
        if pos >= n:
            raise GifFormatError("missing LZW min code size")
        mcs = data[pos]
        pos += 1
        raw, pos = _read_subblocks(data, pos)
        palette = lct if lct is not None else gct
        if palette is None:
            raise GifFormatError("frame has no color table")
        idx = _lzw_decode(raw, mcs, w * h).reshape(h, w)
        if int(idx.max()) >= palette.shape[0]:
            raise GifFormatError("palette index out of range")
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if transparent is not None and transparent >= palette.shape[0]:
            transparent = None
        return idx, palette, transparent


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a stream -> (h, w, 3) uint8 RGB, or
    (h, w, 4) RGBA when the frame's GCE declares a transparent index
    (alpha 0 there, 255 elsewhere — matching ImageIO's getRGB view of
    the IndexColorModel)."""
    idx, palette, transparent = decode_gif_indexed(data)
    rgb = palette[idx]
    if transparent is not None:
        alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
        return np.dstack([rgb, alpha])
    return rgb


def decode_gif_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """Every frame of a GIF87a/89a stream, composited onto the logical
    screen per the GIF89a disposal model -> list of (delay_ms, (H, W, 4)
    uint8 RGBA canvas). The canvas starts fully transparent; each frame
    draws its raster (skipping the transparent index) at its descriptor
    offset, the displayed state is snapshotted, then disposal runs:
    0/1 leave, 2 clear the frame rect back to transparent (the
    browser-consensus reading of "restore to background"), 3 restore the
    canvas to its pre-draw state. Delays come from each frame's GCE in
    centiseconds (x10 -> ms; 0 kept as 0 — renderer clamping is display
    policy, not stream content)."""
    data = bytes(data)
    if len(data) < 13 or data[:6] not in (GIF87A, GIF89A):
        raise GifFormatError("bad GIF signature")
    screen_w, screen_h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, packed)
    canvas = np.zeros((screen_h, screen_w, 4), dtype=np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    # pending GCE state — applies to the NEXT image block only (spec 23)
    transparent: int | None = None
    delay_cs = 0
    disposal = 0
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("unterminated GIF (no trailer)")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            if not frames:
                raise GifFormatError("no image data before trailer")
            return frames
        if block == 0x21:  # extension
            if pos >= n:
                raise GifFormatError("truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:
                disposal = (body[0] >> 2) & 0x07
                delay_cs = int.from_bytes(body[1:3], "little")
                transparent = body[3] if body[0] & 0x01 else None
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise GifFormatError("truncated image descriptor")
        left, top, w, h = struct.unpack_from("<4H", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        if w == 0 or h == 0:
            raise GifFormatError("zero-size frame")
        if left + w > screen_w or top + h > screen_h:
            raise GifFormatError("frame exceeds logical screen")
        lct = None
        if ipacked & 0x80:
            lct, pos = _read_color_table(data, pos, ipacked)
        if pos >= n:
            raise GifFormatError("missing LZW min code size")
        mcs = data[pos]
        pos += 1
        raw, pos = _read_subblocks(data, pos)
        palette = lct if lct is not None else gct
        if palette is None:
            raise GifFormatError("frame has no color table")
        idx = _lzw_decode(raw, mcs, w * h).reshape(h, w)
        if int(idx.max()) >= palette.shape[0]:
            raise GifFormatError("palette index out of range")
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        tr = transparent if transparent is not None and transparent < palette.shape[0] else None
        before = canvas[top : top + h, left : left + w].copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        mask = np.ones((h, w), dtype=bool) if tr is None else idx != tr
        rgba = np.dstack([palette[idx], np.full((h, w), 255, dtype=np.uint8)])
        region[mask] = rgba[mask]
        frames.append((delay_cs * 10, canvas.copy()))
        if disposal == 2:
            canvas[top : top + h, left : left + w] = 0
        elif disposal == 3:
            canvas[top : top + h, left : left + w] = before
        transparent, delay_cs, disposal = None, 0, 0


def encode_gif_animation(
    frames: list[dict],
    palette: np.ndarray,
    *,
    screen_size: tuple[int, int] | None = None,
    transparent_index: int | None = None,
    loop: int | None = 0,
) -> bytes:
    """Animated GIF89a encoder for fixtures and the frame-sampling tests.

    ``frames`` is a list of dicts with ``indices`` ((h, w) uint8 into the
    shared global ``palette``) and optional ``left``/``top`` (sub-rect
    placement), ``delay_ms`` (GCE delay, rounded to centiseconds),
    ``disposal`` (0..3) and ``interlace``. ``screen_size`` is (w, h) of
    the logical screen (default: bounding box of all frames). ``loop``
    emits the NETSCAPE2.0 application extension (0 = forever, None =
    omit)."""
    if not frames:
        raise ValueError("need at least one frame")
    palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    n_colors = palette.shape[0]
    if transparent_index is not None and not 0 <= transparent_index < n_colors:
        raise ValueError("transparent_index outside palette")
    norm = []
    for f in frames:
        idx = np.asarray(f["indices"], dtype=np.uint8)
        if idx.ndim != 2:
            raise ValueError("frame indices must be (h, w)")
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("index out of palette range")
        norm.append({
            "idx": idx,
            "left": int(f.get("left", 0)),
            "top": int(f.get("top", 0)),
            "delay_cs": max(0, round(int(f.get("delay_ms", 100)) / 10)),
            "disposal": int(f.get("disposal", 1)),
            "interlace": bool(f.get("interlace", False)),
        })
    if screen_size is None:
        screen_w = max(f["left"] + f["idx"].shape[1] for f in norm)
        screen_h = max(f["top"] + f["idx"].shape[0] for f in norm)
    else:
        screen_w, screen_h = screen_size
    for f in norm:
        if f["left"] + f["idx"].shape[1] > screen_w or f["top"] + f["idx"].shape[0] > screen_h:
            raise ValueError("frame exceeds logical screen")
    if max(screen_w, screen_h) > 0xFFFF:
        raise GifFormatError("dimension exceeds GIF u16 field")
    size_field = 0
    while (2 << size_field) < max(n_colors, 2):
        size_field += 1
    table_n = 2 << size_field
    table = np.zeros((table_n, 3), dtype=np.uint8)
    table[:n_colors] = palette
    mcs = max(2, size_field + 1)

    out = bytearray()
    out += GIF89A
    out += struct.pack("<HH", screen_w, screen_h)
    out.append(0x80 | size_field)
    out += b"\x00\x00"
    out += table.tobytes()
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0"
        out += b"\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for f in norm:
        h, w = f["idx"].shape
        out += b"\x21\xf9\x04"
        out.append(
            (f["disposal"] & 0x07) << 2
            | (0x01 if transparent_index is not None else 0x00)
        )
        out += struct.pack("<H", f["delay_cs"])
        out.append(transparent_index if transparent_index is not None else 0)
        out.append(0x00)
        out += b"\x2c"
        out += struct.pack("<HHHH", f["left"], f["top"], w, h)
        out.append(0x40 if f["interlace"] else 0x00)
        rows = _interlace(f["idx"]) if f["interlace"] else f["idx"]
        out.append(mcs)
        out += _write_subblocks(_lzw_encode(rows.reshape(-1), mcs))
    out += b"\x3b"
    return bytes(out)


def _palette_from_rgb(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if palette.shape[0] > 256:
        raise GifFormatError(
            f"{palette.shape[0]} distinct colors; GIF palettes cap at 256"
        )
    return palette, inverse.astype(np.uint8).reshape(img.shape[:2])


def encode_gif(
    img: np.ndarray | None = None,
    *,
    indices: np.ndarray | None = None,
    palette: np.ndarray | None = None,
    interlace: bool = False,
    transparent_index: int | None = None,
    local_color_table: bool = False,
    version: bytes = GIF89A,
) -> bytes:
    """Single-frame GIF encoder for fixtures and the resize path.

    Input is either an (h, w, 3) uint8 RGB image with <= 256 distinct
    colors (palette derived) or an explicit (h, w) uint8 ``indices`` +
    (n, 3) ``palette`` pair. ``transparent_index`` forces a GIF89a GCE
    block; ``local_color_table`` moves the palette from the screen
    descriptor to the image descriptor (both placements are spec-legal
    and both must round-trip)."""
    if indices is None:
        if img is None:
            raise ValueError("need img or indices+palette")
        img = np.asarray(img, dtype=np.uint8)
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError("img must be (h, w, 3) RGB")
        palette, indices = _palette_from_rgb(img)
    else:
        indices = np.asarray(indices, dtype=np.uint8)
        if palette is None:
            raise ValueError("indices requires palette")
        palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
        if indices.ndim != 2:
            raise ValueError("indices must be (h, w)")
        if int(indices.max(initial=0)) >= palette.shape[0]:
            raise ValueError("index out of palette range")
    h, w = indices.shape
    if max(h, w) > 0xFFFF:
        raise GifFormatError("dimension exceeds GIF u16 field")
    n_colors = palette.shape[0]
    if transparent_index is not None:
        if not 0 <= transparent_index < n_colors:
            raise ValueError("transparent_index outside palette")
        version = GIF89A
    # color table sizes are powers of two >= 2; pad with black
    size_field = 0
    while (2 << size_field) < max(n_colors, 2):
        size_field += 1
    table_n = 2 << size_field
    table = np.zeros((table_n, 3), dtype=np.uint8)
    table[:n_colors] = palette
    mcs = max(2, size_field + 1)

    out = bytearray()
    out += version
    out += struct.pack("<HH", w, h)
    if local_color_table:
        out.append(0x00)  # no GCT
        out += b"\x00\x00"
    else:
        out.append(0x80 | size_field)  # GCT flag + size
        out += b"\x00\x00"  # bg index, aspect
        out += table.tobytes()
    if transparent_index is not None:
        out += b"\x21\xf9\x04"  # GCE, block size 4
        out.append(0x01)  # transparency flag, disposal 0
        out += b"\x00\x00"  # delay
        out.append(transparent_index)
        out.append(0x00)  # terminator
    out += b"\x2c"  # image descriptor
    out += struct.pack("<HHHH", 0, 0, w, h)
    if local_color_table:
        out.append(0x80 | (0x40 if interlace else 0) | size_field)
        out += table.tobytes()
    else:
        out.append(0x40 if interlace else 0x00)
    rows = _interlace(indices) if interlace else indices
    out.append(mcs)
    out += _write_subblocks(_lzw_encode(rows.reshape(-1), mcs))
    out += b"\x3b"
    return bytes(out)
