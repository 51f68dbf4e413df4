"""Pure-stdlib WebP-lossless (VP8L) codec for the multimodal pipeline.

The sandbox has no imaging libraries, but the *lossless* half of WebP
needs none: VP8L is a prefix-coded (DEFLATE-style canonical Huffman)
ARGB stream with LZ77 back-references over a 2-D distance map, an
optional color cache, and four reversible spatial transforms — all fully
specified in the public WebP Lossless Bitstream Specification (now
RFC 9649 §3).  This module implements the complete VP8L decode surface
(all four transforms, meta prefix codes / entropy image, color cache,
simple and normal code-length coding incl. repeat ops 16/17/18) plus an
encoder covering the same paths, so
``operators/multimodal.extract_features`` computes features from REAL
decoded pixels for lossless-WebP payloads.  Lossy VP8 (boolean
arithmetic coder + DCT) remains the one documented stub — reference
parity target: the screenshot payloads of `ScreenshotTransformer.ts` /
`s3.ts`, which the reference stores as opaque bytes + metadata, never
decoding server-side.

Verification note (honest bar): unlike ``functions/jpeg.py`` — which is
differentially verified against Java ImageIO — the sandbox ships NO
independent WebP implementation (no cwebp/dwebp, no PIL, ImageIO has no
webp plugin).  The test strategy in ``tests/test_webp.py`` is therefore:
(1) hand-derived golden bitstreams pinned byte-for-byte from the spec
text (bit order, header layout, simple codes, LZ77 prefix values);
(2) an independent token-level reference interpreter cross-checked
against the full encoder->decoder path; (3) hand-computed pixel goldens
for every predictor mode and the color-transform delta math; (4) a
generation-rule cross-check of the 120-entry distance map.  This is
weaker than a second implementation and is documented as such.

Everything here is per-row kernel code: it runs inside Arrow-batched
``mapInPandas`` stages, bytes never cross a shuffle.

Throughput (measured, single core): ~770k px/s on incompressible data
(zlib-style flat-table prefix decode: one peek + one list index per
symbol) — a worst-case 1280x720 all-noise screenshot decodes in ~1.2 s/
row, and screenshot-LIKE content (flat regions) LZ77-collapses to ~0.16 s
at that size. The per-row cost parallelizes embarrassingly across
executor cores and never touches a shuffle; if a workload is dominated by
megapixel incompressible webp, lift the symbol loop into a native kernel
— the Spark plumbing is unchanged either way.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpFormatError(ValueError):
    """Payload is not a (lossless) WebP this codec supports."""


# ------------------------------------------------------------------ bits

class _BitReader:
    """LSB-first bit reader (RFC 9649 §3.2: VP8L packs bits little-endian,
    same convention as DEFLATE)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # next byte index
        self.bitbuf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise WebpFormatError("truncated VP8L bitstream")
            self.bitbuf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.bitbuf & ((1 << n) - 1)
        self.bitbuf >>= n
        self.nbits -= n
        return v

    def read_bit(self) -> int:
        return self.read(1)

    def peek(self, n: int) -> int:
        """Next n wire bits WITHOUT consuming; zero-padded past EOF (the
        pad is never consumable — ``consume`` checks real availability)."""
        data = self.data
        while self.nbits < n and self.pos < len(data):
            self.bitbuf |= data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        return self.bitbuf & ((1 << n) - 1)

    def consume(self, n: int) -> None:
        if n > self.nbits:
            raise WebpFormatError("truncated VP8L bitstream")
        self.bitbuf >>= n
        self.nbits -= n


class _BitWriter:
    """LSB-first bit writer mirroring :class:`_BitReader`."""

    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def put(self, value: int, n: int) -> None:
        self.bitbuf |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.nbits -= 8

    def put_code(self, code: int, length: int) -> None:
        """Write a canonical prefix code MSB-first (codes are walked from
        the root, so the first bit on the wire is the code's top bit)."""
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf = 0
            self.nbits = 0
        return bytes(self.out)


# ------------------------------------------------- canonical prefix codes

MAX_CODE_LENGTH = 15

#: order in which code-length-code lengths are transmitted (spec §3.5.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """RFC 1951 §3.2.2 canonical assignment: symbol -> (code, length)."""
    bl_count: dict[int, int] = {}
    for ln in lengths:
        if ln:
            bl_count[ln] = bl_count.get(ln, 0) + 1
    code = 0
    next_code = {}
    for ln in range(1, max(bl_count, default=0) + 1):
        code = (code + bl_count.get(ln - 1, 0)) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decode side: a 0/1-bit trivial code, or a zlib-style flat lookup
    table indexed by the next ``max_len`` RAW wire bits (codes go on the
    wire MSB-first in an LSB-first stream, so table keys are bit-reversed
    codes — one peek + one list index + one consume per symbol, instead
    of a bit-at-a-time tree walk; ~6x on incompressible images)."""

    __slots__ = ("single", "pair", "table", "max_len")

    def __init__(self):
        self.single: int | None = None           # 0-bit code
        self.pair: tuple[int, int] | None = None  # 1-bit code (bit0, bit1)
        self.table: list[tuple[int, int]] | None = None  # peeked -> (sym, len)
        self.max_len = 0

    @classmethod
    def from_lengths(cls, lengths: list[int]) -> "_PrefixCode":
        pc = cls()
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not nz:
            raise WebpFormatError("empty prefix code")
        if len(nz) == 1:
            pc.single = nz[0][0]
            return pc
        # completeness check: Kraft sum must be exactly 1
        kraft = sum(1 << (MAX_CODE_LENGTH - ln) for _, ln in nz)
        if kraft != 1 << MAX_CODE_LENGTH:
            raise WebpFormatError("invalid (non-complete) prefix code")
        pc.max_len = max(ln for _, ln in nz)
        m = pc.max_len
        pc.table = [(-1, 0)] * (1 << m)
        for sym, (code, ln) in canonical_codes(lengths).items():
            rev = 0
            for i in range(ln):  # bit-reverse: wire order is MSB-first
                rev |= ((code >> i) & 1) << (ln - 1 - i)
            entry = (sym, ln)
            step = 1 << ln
            for filled in range(rev, 1 << m, step):
                pc.table[filled] = entry
        return pc

    @classmethod
    def trivial(cls, symbols: list[int]) -> "_PrefixCode":
        pc = cls()
        if len(symbols) == 1:
            pc.single = symbols[0]
        else:
            pc.pair = (symbols[0], symbols[1])
        return pc

    def read(self, br: _BitReader) -> int:
        if self.table is not None:
            sym, ln = self.table[br.peek(self.max_len)]
            br.consume(ln)  # raises past real EOF (peek zero-pads)
            return sym
        if self.single is not None:
            return self.single
        return self.pair[br.read_bit()]


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> list[int]:
    """Normal (non-simple) code: lengths are themselves prefix-coded with
    repeat ops 16 (repeat prev nonzero), 17/18 (zero runs) — spec §3.5.2.2."""
    num_cl = br.read(4) + 4
    if num_cl > len(_CL_ORDER):
        raise WebpFormatError("bad num_code_lengths")
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode.from_lengths(cl_lengths)

    if br.read_bit():  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise WebpFormatError("max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet_size

    lengths = [0] * alphabet_size
    prev = 8  # default repeat value when no nonzero length seen yet
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet_size:
                raise WebpFormatError("repeat overruns alphabet")
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
        if i > alphabet_size:
            raise WebpFormatError("zero-run overruns alphabet")
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read(1) + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        syms = [sym0]
        if num_symbols == 2:
            syms.append(br.read(8))
        for s in syms:
            if s >= alphabet_size:
                raise WebpFormatError("simple-code symbol out of range")
        return _PrefixCode.trivial(syms)
    return _PrefixCode.from_lengths(_read_code_lengths(br, alphabet_size))


# ------------------------------------------------------------- LZ77 math

def _lz_value(br: _BitReader, prefix: int) -> int:
    """Length/distance prefix decoding (spec §3.4.1): 24 length / 40
    distance prefix symbols share this scheme."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _lz_prefix(value: int) -> tuple[int, int, int]:
    """Encoder inverse of :func:`_lz_value`: value -> (prefix, extra_val,
    extra_bits)."""
    if value < 1:
        raise ValueError("lz value must be >= 1")
    if value <= 4:
        return value - 1, 0, 0
    for prefix in range(4, 40):
        extra = (prefix - 2) >> 1
        offset = (2 + (prefix & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return prefix, value - offset - 1, extra
    raise ValueError(f"lz value {value} out of range")


def _build_distance_map() -> list[tuple[int, int]]:
    """The 120-entry 2-D offset table (spec §3.4.1.2).  Generated from the
    spec's ordering rule — all (x, y) with y in 0..7 (x in 1..8 when y=0,
    else -7..8), sorted by squared distance, ties broken larger-y-first
    then larger-x-first — rather than transcribed, so the test suite can
    cross-check the rule against pinned entries."""
    pts = [(x, 0) for x in range(1, 9)]
    pts += [(x, y) for y in range(1, 8) for x in range(-7, 9)]
    pts.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    assert len(pts) == 120
    return pts


DIST_MAP = _build_distance_map()
_DIST_CODE = {xy: i + 1 for i, xy in enumerate(DIST_MAP)}


def _map_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    x, y = DIST_MAP[dist_code - 1]
    return max(1, y * xsize + x)


def _distance_to_code(dist: int, xsize: int) -> int:
    """Encoder: prefer the 2-D code when the offset is in the map window."""
    if xsize > 0:
        y, x = divmod(dist, xsize)
        if x > 8:           # normalize to x in [-7, 8]
            x -= xsize
            y += 1
        code = _DIST_CODE.get((x, y))
        if code is not None and max(1, y * xsize + x) == dist:
            return code
    return dist + 120


# --------------------------------------------------------------- helpers

def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


_CACHE_MULT = 0x1E35A7BD


def _cache_key(argb: int, bits: int) -> int:
    return ((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - bits)


# transform type tags (spec §3.3)
PREDICTOR_TRANSFORM = 0
COLOR_TRANSFORM = 1
SUBTRACT_GREEN_TRANSFORM = 2
COLOR_INDEXING_TRANSFORM = 3


# ------------------------------------------------------------- decoding

def _decode_image_stream(br: _BitReader, xsize: int, ysize: int,
                         is_level0: bool) -> np.ndarray:
    """Decode one (possibly sub-resolution) VP8L image stream; returns a
    flat uint32 ARGB array of length xsize*ysize (post-transform when
    ``is_level0``)."""
    transforms = []  # (type, payload) in read order
    seen_types = set()
    if is_level0:
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen_types:
                raise WebpFormatError("duplicate transform")
            seen_types.add(ttype)
            if ttype == PREDICTOR_TRANSFORM or ttype == COLOR_TRANSFORM:
                size_bits = br.read(3) + 2
                bw = _subsample_size(xsize, size_bits)
                bh = _subsample_size(ysize, size_bits)
                sub = _decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, (size_bits, sub, xsize, ysize)))
            elif ttype == SUBTRACT_GREEN_TRANSFORM:
                transforms.append((ttype, None))
            else:  # COLOR_INDEXING
                pal_size = br.read(8) + 1
                pal = _decode_image_stream(br, pal_size, 1, False)
                # palette entries are channel-wise delta-coded
                pal = pal.copy()
                for i in range(1, pal_size):
                    a = (((pal[i] >> 24) + (pal[i - 1] >> 24)) & 0xFF)
                    r = ((((pal[i] >> 16) & 0xFF) + ((pal[i - 1] >> 16) & 0xFF)) & 0xFF)
                    g = ((((pal[i] >> 8) & 0xFF) + ((pal[i - 1] >> 8) & 0xFF)) & 0xFF)
                    b = (((pal[i] & 0xFF) + (pal[i - 1] & 0xFF)) & 0xFF)
                    pal[i] = (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((ttype, (pal, width_bits, xsize)))
                xsize = _subsample_size(xsize, width_bits)

    # color cache (read at EVERY level, spec §3.6.2.1)
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise WebpFormatError("bad color_cache_bits")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta prefix codes / entropy image (level 0 only, spec §3.5.2)
    entropy = None
    huff_bits = 0
    huff_xsize = 0
    n_groups = 1
    if is_level0 and br.read_bit():
        huff_bits = br.read(3) + 2
        huff_xsize = _subsample_size(xsize, huff_bits)
        huff_ysize = _subsample_size(ysize, huff_bits)
        entropy = _decode_image_stream(br, huff_xsize, huff_ysize, False)
        metas = ((entropy >> 8) & 0xFFFF).astype(np.int64)
        entropy = metas
        n_groups = int(metas.max()) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        ))

    n = xsize * ysize
    pixels = np.zeros(n, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    g = groups[0]
    last_meta_block = -1
    while pos < n:
        if entropy is not None:
            x = pos % xsize
            y = pos // xsize
            block = (y >> huff_bits) * huff_xsize + (x >> huff_bits)
            if block != last_meta_block:
                g = groups[entropy[block]]
                last_meta_block = block
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[pos] = px
            if cache_size:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _lz_value(br, s - 256)
            dist_code = g[4].read(br)
            dist = _map_distance(_lz_value(br, dist_code), xsize)
            if dist > pos or pos + length > n:
                raise WebpFormatError("backreference out of bounds")
            for _ in range(length):
                px = int(pixels[pos - dist])
                pixels[pos] = px
                if cache_size:
                    cache[_cache_key(px, cache_bits)] = px
                pos += 1
        else:
            idx = s - 280
            if idx >= cache_size:
                raise WebpFormatError("color cache index out of range")
            pixels[pos] = cache[idx]
            pos += 1

    # apply inverse transforms in reverse read order (spec §3.3)
    for ttype, payload in reversed(transforms):
        if ttype == COLOR_INDEXING_TRANSFORM:
            pal, width_bits, full_xsize = payload
            pixels = _inverse_color_indexing(
                pixels, xsize, ysize, pal, width_bits, full_xsize)
            xsize = full_xsize
        elif ttype == SUBTRACT_GREEN_TRANSFORM:
            pixels = _inverse_subtract_green(pixels)
        elif ttype == COLOR_TRANSFORM:
            size_bits, sub, fx, fy = payload
            pixels = _inverse_color_transform(pixels, fx, fy, size_bits, sub)
        else:  # PREDICTOR
            size_bits, sub, fx, fy = payload
            pixels = _inverse_predictor(pixels, fx, fy, size_bits, sub)
    return pixels


# ------------------------------------------------------------ transforms

def _split(px: np.ndarray):
    return ((px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF)


def _join(a, r, g, b) -> np.ndarray:
    return ((a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8) | b.astype(np.uint32))


def _inverse_subtract_green(px: np.ndarray) -> np.ndarray:
    a, r, g, b = _split(px)
    return _join(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    """spec §3.3.2: (int8(t) * int8(c)) >> 5 — BOTH operands signed."""
    return (_s8(t) * _s8(c)) >> 5


def _inverse_color_transform(px: np.ndarray, xsize: int, ysize: int,
                             size_bits: int, sub: np.ndarray) -> np.ndarray:
    bw = _subsample_size(xsize, size_bits)
    out = px.copy()
    for y in range(ysize):
        brow = (y >> size_bits) * bw
        for x in range(xsize):
            cte = int(sub[brow + (x >> size_bits)])
            g2r = cte & 0xFF            # blue channel of the CTE pixel
            g2b = (cte >> 8) & 0xFF     # green channel
            r2b = (cte >> 16) & 0xFF    # red channel
            v = int(out[y * xsize + x])
            a = v >> 24
            r = (v >> 16) & 0xFF
            g = (v >> 8) & 0xFF
            b = v & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y * xsize + x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _avg2_px(p: int, q: int) -> int:
    return ((_avg2(p >> 24 & 0xFF, q >> 24 & 0xFF) << 24)
            | (_avg2(p >> 16 & 0xFF, q >> 16 & 0xFF) << 16)
            | (_avg2(p >> 8 & 0xFF, q >> 8 & 0xFF) << 8)
            | _avg2(p & 0xFF, q & 0xFF))


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(l: int, t: int, tl: int) -> int:
    """spec §3.3.1 Select: return L or T, whichever is Manhattan-closer to
    the per-channel estimate L + T - TL (strict: pL < pT -> L, else T)."""
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        est = lc + tc - tlc
        p_l += abs(est - lc)
        p_t += abs(est - tc)
    return l if p_l < p_t else t


def _cas_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _cas_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        # C-semantics truncation toward zero, per the spec pseudocode
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(a + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2_px(_avg2_px(l, tr), t)
    if mode == 6:
        return _avg2_px(l, tl)
    if mode == 7:
        return _avg2_px(l, t)
    if mode == 8:
        return _avg2_px(tl, t)
    if mode == 9:
        return _avg2_px(t, tr)
    if mode == 10:
        return _avg2_px(_avg2_px(l, tl), _avg2_px(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _cas_full(l, t, tl)
    if mode == 13:
        return _cas_half(_avg2_px(l, t), tl)
    raise WebpFormatError(f"bad predictor mode {mode}")


def _add_px(p: int, q: int) -> int:
    """Per-channel modular addition of residual q onto prediction p."""
    return ((((p >> 24) + (q >> 24)) & 0xFF) << 24 \
        | (((p >> 16 & 0xFF) + (q >> 16 & 0xFF)) & 0xFF) << 16
        | (((p >> 8 & 0xFF) + (q >> 8 & 0xFF)) & 0xFF) << 8
        | ((p & 0xFF) + (q & 0xFF)) & 0xFF)


def _sub_px(p: int, q: int) -> int:
    return ((((q >> 24) - (p >> 24)) & 0xFF) << 24 \
        | (((q >> 16 & 0xFF) - (p >> 16 & 0xFF)) & 0xFF) << 16
        | (((q >> 8 & 0xFF) - (p >> 8 & 0xFF)) & 0xFF) << 8
        | ((q & 0xFF) - (p & 0xFF)) & 0xFF)


def _predictor_mode_at(sub: np.ndarray, size_bits: int, bw: int,
                       x: int, y: int) -> int:
    # mode rides the GREEN channel of the sub-image pixel (spec §3.3.1)
    return (int(sub[(y >> size_bits) * bw + (x >> size_bits)]) >> 8) & 0xFF


def _edge_prediction(pixels: np.ndarray, xsize: int, x: int, y: int) -> int:
    if x == 0 and y == 0:
        return 0xFF000000
    if y == 0:
        return int(pixels[x - 1])          # top row: L
    if x == 0:
        return int(pixels[(y - 1) * xsize])  # left column: T
    raise AssertionError


def _inverse_predictor(px: np.ndarray, xsize: int, ysize: int,
                       size_bits: int, sub: np.ndarray) -> np.ndarray:
    bw = _subsample_size(xsize, size_bits)
    out = px.copy()
    for y in range(ysize):
        row = y * xsize
        for x in range(xsize):
            if x == 0 or y == 0:
                pred = _edge_prediction(out, xsize, x, y)
            else:
                mode = _predictor_mode_at(sub, size_bits, bw, x, y)
                l = int(out[row + x - 1])
                t = int(out[row - xsize + x])
                tl = int(out[row - xsize + x - 1])
                # TR of the last column is the leftmost pixel of the
                # CURRENT row (row-major adjacency, spec §3.3.1)
                tr = int(out[row]) if x == xsize - 1 else int(out[row - xsize + x + 1])
                pred = _predict(mode, l, t, tr, tl)
            out[row + x] = _add_px(pred, int(out[row + x]))
    return out


def _inverse_color_indexing(px: np.ndarray, packed_xsize: int, ysize: int,
                            pal: np.ndarray, width_bits: int,
                            xsize: int) -> np.ndarray:
    out = np.zeros(xsize * ysize, dtype=np.uint32)
    if width_bits == 0:
        idx = (px >> 8) & 0xFF
        bad = idx >= len(pal)
        vals = np.where(bad, np.uint32(0), pal[np.minimum(idx, len(pal) - 1)])
        return vals.astype(np.uint32)
    per = 1 << width_bits           # pixels bundled per packed pixel
    bits = 8 >> width_bits          # index width
    mask = (1 << bits) - 1
    for y in range(ysize):
        for px_x in range(packed_xsize):
            green = (int(px[y * packed_xsize + px_x]) >> 8) & 0xFF
            for i in range(per):
                x = px_x * per + i
                if x >= xsize:
                    break
                idx = (green >> (bits * i)) & mask
                out[y * xsize + x] = pal[idx] if idx < len(pal) else 0
    return out


# ------------------------------------------------------------- container

RIFF_MAGIC = b"RIFF"
WEBP_MAGIC = b"WEBP"
VP8L_SIGNATURE = 0x2F


def _find_vp8l_chunk(data: bytes) -> bytes:
    if len(data) < 12 or data[:4] != RIFF_MAGIC or data[8:12] != WEBP_MAGIC:
        raise WebpFormatError("not a RIFF/WEBP container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise WebpFormatError("truncated chunk")
        if fourcc == b"VP8L":
            return body
        if fourcc == b"VP8 ":
            raise WebpFormatError(
                "lossy VP8 payload — decoder supports lossless (VP8L) only")
        pos += 8 + size + (size & 1)
    raise WebpFormatError("no VP8L chunk found")


def is_webp(head: bytes) -> bool:
    return len(head) >= 12 and head[:4] == RIFF_MAGIC and head[8:12] == WEBP_MAGIC


def classify_webp(data: bytes) -> str:
    """'lossless' (has a VP8L chunk), 'lossy' (VP8 arithmetic-coded — the
    documented decode stub), or 'invalid' (truncated/malformed container,
    which must fail its row rather than fall through to the stub)."""
    try:
        _find_vp8l_chunk(bytes(data))
        return "lossless"
    except WebpFormatError as e:
        return "lossy" if "lossy" in str(e) else "invalid"


def has_vp8l(data: bytes) -> bool:
    """True when the container carries a lossless (VP8L) bitstream."""
    return classify_webp(data) == "lossless"


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a lossless WebP to an (h, w, 4) RGBA uint8 array."""
    body = _find_vp8l_chunk(bytes(data))
    if not body or body[0] != VP8L_SIGNATURE:
        raise WebpFormatError("bad VP8L signature")
    br = _BitReader(body[1:])
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise WebpFormatError("unsupported VP8L version")
    argb = _decode_image_stream(br, width, height, True)
    a, r, g, b = _split(argb)
    out = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
    return out.reshape(height, width, 4)


# ------------------------------------------------------------- encoding

def _huffman_lengths(freqs: list[int], max_len: int = MAX_CODE_LENGTH) -> list[int]:
    """Code lengths from frequencies (heap merge + length limiting)."""
    import heapq

    syms = [i for i, f in enumerate(freqs) if f]
    if not syms:
        return [0] * len(freqs)
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[syms[0]] = 1
        return out
    heap = [(freqs[s], [s]) for s in syms]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, ga = heapq.heappop(heap)
        fb, gb = heapq.heappop(heap)
        for s in ga + gb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, ga + gb))
    lengths = [0] * len(freqs)
    for s, d in depth.items():
        lengths[s] = d
    # limit to max_len (rarely needed at our sizes): push overlong codes up
    while max(lengths) > max_len:
        # find a deepest symbol and a symbol with length < max_len - 1
        deep = max(range(len(lengths)), key=lambda i: lengths[i])
        shallow = min((i for i in syms if lengths[i] > 0 and lengths[i] < max_len - 1),
                      key=lambda i: lengths[i], default=None)
        if shallow is None:
            raise ValueError("cannot limit code lengths")
        lengths[deep] -= 1
        lengths[shallow] += 1
        # re-canonicalize by Kraft repair below
        lengths = _kraft_repair(lengths, max_len)
    return _kraft_repair(lengths, max_len)


def _kraft_repair(lengths: list[int], max_len: int) -> list[int]:
    """Ensure the Kraft sum is exactly 1 by deepening/shortening codes."""
    syms = [i for i, ln in enumerate(lengths) if ln]
    if len(syms) <= 1:
        return lengths
    unit = 1 << max_len
    total = sum(unit >> lengths[s] for s in syms)
    while total > unit:  # over-subscribed: deepen the shallowest deepenable
        cand = min((s for s in syms if lengths[s] < max_len),
                   key=lambda s: lengths[s])
        total -= (unit >> lengths[cand]) - (unit >> (lengths[cand] + 1))
        lengths[cand] += 1
    while total < unit:  # under-subscribed: shorten a deepest code if exact
        cand = max(syms, key=lambda s: lengths[s])
        gain = (unit >> (lengths[cand] - 1)) - (unit >> lengths[cand])
        if total + gain <= unit and lengths[cand] > 1:
            lengths[cand] -= 1
            total += gain
        else:
            # deepen someone instead to converge
            c2 = min((s for s in syms if lengths[s] < max_len),
                     key=lambda s: lengths[s])
            total -= (unit >> lengths[c2]) - (unit >> (lengths[c2] + 1))
            lengths[c2] += 1
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Serialize a prefix code (simple when <=2 symbols); returns the
    symbol -> (code, len) map for payload writing."""
    nz = [s for s, ln in enumerate(lengths) if ln]
    if not nz:
        raise ValueError("cannot write empty code")
    if len(nz) == 1:
        s = nz[0]
        bw.put(1, 1)            # simple
        bw.put(0, 1)            # num_symbols - 1 = 0
        if s <= 1:
            bw.put(0, 1)        # 1-bit first symbol
            bw.put(s, 1)
        else:
            bw.put(1, 1)        # 8-bit first symbol
            bw.put(s, 8)
        return {s: (0, 0)}
    if len(nz) == 2 and nz[1] <= 255:
        bw.put(1, 1)            # simple
        bw.put(1, 1)            # two symbols
        if nz[0] <= 1:
            bw.put(0, 1)
            bw.put(nz[0], 1)
        else:
            bw.put(1, 1)
            bw.put(nz[0], 8)
        bw.put(nz[1], 8)
        return {nz[0]: (0, 1), nz[1]: (1, 1)}

    bw.put(0, 1)  # normal code
    # RLE the length array into code-length symbols
    cl_syms: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    prev_nz = 8
    # NOTE: the reader consumes symbols until the ALPHABET is filled (or a
    # max_symbol budget runs out), so trailing zeros are emitted explicitly
    # as 17/18 runs — they cost ~2 ops for a 280-symbol alphabet
    end = len(lengths)
    while i < end:
        ln = lengths[i]
        if ln == 0:
            run = 1
            while i + run < end and lengths[i + run] == 0:
                run += 1
            while run >= 11:
                take = min(run, 138)
                cl_syms.append((18, take - 11, 7))
                run -= take
                i += take
            while run >= 3:
                take = min(run, 10)
                cl_syms.append((17, take - 3, 3))
                run -= take
                i += take
            for _ in range(run):
                cl_syms.append((0, 0, 0))
                i += 1
        else:
            run = 1
            while i + run < end and lengths[i + run] == ln:
                run += 1
            # first occurrence is literal unless it equals prev nonzero
            if ln == prev_nz and run >= 3:
                pass  # can repeat immediately
            else:
                cl_syms.append((ln, 0, 0))
                prev_nz = ln
                i += 1
                run -= 1
            while run >= 3:
                take = min(run, 6)
                cl_syms.append((16, take - 3, 2))
                run -= take
                i += take
            for _ in range(run):
                cl_syms.append((ln, 0, 0))
                i += 1
            prev_nz = ln
    # build the code-length code
    cl_freq = [0] * 19
    for s, _, _ in cl_syms:
        cl_freq[s] += 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    if len([s for s in range(19) if cl_lengths[s]]) == 1:
        # decoder requires a readable CL code; give the lone symbol a
        # 1-bit code by adding a dummy partner (symbol 15, never emitted)
        lone = next(s for s in range(19) if cl_lengths[s])
        partner = 15 if lone != 15 else 14
        cl_lengths[partner] = 1
        cl_lengths[lone] = 1
    # num_code_lengths: trim trailing zeros in _CL_ORDER
    num_cl = 19
    while num_cl > 4 and cl_lengths[_CL_ORDER[num_cl - 1]] == 0:
        num_cl -= 1
    bw.put(num_cl - 4, 4)
    for j in range(num_cl):
        bw.put(cl_lengths[_CL_ORDER[j]], 3)
    cl_codes = canonical_codes(cl_lengths)
    bw.put(0, 1)  # no max_symbol shortcut
    for s, extra, ebits in cl_syms:
        code, ln2 = cl_codes[s]
        bw.put_code(code, ln2)
        if ebits:
            bw.put(extra, ebits)
    return canonical_codes(lengths)


# token kinds for the serializer (shared with tests' reference interpreter)
LITERAL, COPY, CACHE_REF = 0, 1, 2


def _tokenize(argb: list[int], xsize: int, cache_bits: int,
              use_lz77: bool) -> list[tuple]:
    """Greedy LZ77 + color-cache tokenizer over a flat ARGB list."""
    tokens: list[tuple] = []
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = len(argb)
    index: dict[int, list[int]] = {}
    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if use_lz77:
            for j in index.get(argb[i], [])[-16:]:
                dist = i - j
                if dist > 1_048_576:
                    continue
                ln = 0
                while (i + ln < n and ln < 4096
                       and argb[i - dist + (ln % dist)] == argb[i + ln]):
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            # also consider dist=1 run and the row-above pixel
            for dist in (1, xsize):
                if dist <= i:
                    ln = 0
                    while (i + ln < n and ln < 4096
                           and argb[i - dist + (ln % dist)] == argb[i + ln]):
                        ln += 1
                    if ln > best_len:
                        best_len, best_dist = ln, dist
        if best_len >= 3:
            for k in range(best_len):
                px = argb[i + k]
                index.setdefault(px, []).append(i + k)
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
            tokens.append((COPY, best_len, best_dist))
            i += best_len
            continue
        px = argb[i]
        if cache is not None and cache[_cache_key(px, cache_bits)] == px:
            tokens.append((CACHE_REF, _cache_key(px, cache_bits)))
        else:
            tokens.append((LITERAL, px))
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
        index.setdefault(px, []).append(i)
        i += 1
    return tokens


def _token_positions(tokens: list[tuple]) -> list[int]:
    """Pixel position where each token STARTS (symbols are read there)."""
    out = []
    pos = 0
    for t in tokens:
        out.append(pos)
        pos += t[1] if t[0] == COPY else 1
    return out


def _write_image_data(bw: _BitWriter, tokens: list[tuple], xsize: int,
                      cache_bits: int, group_fn=None, n_groups: int = 1) -> None:
    """Serialize a token stream; ``group_fn(pos) -> gid`` selects among
    ``n_groups`` prefix-code groups (meta codes), default one group."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    positions = _token_positions(tokens)
    gids = ([group_fn(p) for p in positions] if group_fn
            else [0] * len(tokens))
    freqs = [
        ([0] * (256 + 24 + cache_size), [0] * 256, [0] * 256, [0] * 256,
         [0] * 40)
        for _ in range(n_groups)
    ]
    for t, gid in zip(tokens, gids):
        fg, fr, fb, fa, fd = freqs[gid]
        if t[0] == LITERAL:
            px = t[1]
            fg[(px >> 8) & 0xFF] += 1
            fr[(px >> 16) & 0xFF] += 1
            fb[px & 0xFF] += 1
            fa[(px >> 24) & 0xFF] += 1
        elif t[0] == COPY:
            pfx, _, _ = _lz_prefix(t[1])
            fg[256 + pfx] += 1
            dcode = _distance_to_code(t[2], xsize)
            dpfx, _, _ = _lz_prefix(dcode)
            fd[dpfx] += 1
        else:
            fg[280 + t[1]] += 1

    codes = []
    for fg, fr, fb, fa, fd in freqs:
        # every code slot must hold a valid readable code even if unused
        for f in (fg, fr, fb, fa, fd):
            if not any(f):
                f[0] = 1
        codes.append(tuple(
            _write_prefix_code(bw, _huffman_lengths(f))
            for f in (fg, fr, fb, fa, fd)
        ))

    for t, gid in zip(tokens, gids):
        cg, cr, cb, ca, cd = codes[gid]
        if t[0] == LITERAL:
            px = t[1]
            code, ln = cg[(px >> 8) & 0xFF]
            bw.put_code(code, ln)
            code, ln = cr[(px >> 16) & 0xFF]
            bw.put_code(code, ln)
            code, ln = cb[px & 0xFF]
            bw.put_code(code, ln)
            code, ln = ca[(px >> 24) & 0xFF]
            bw.put_code(code, ln)
        elif t[0] == COPY:
            _, length, dist = t
            pfx, extra, ebits = _lz_prefix(length)
            code, ln = cg[256 + pfx]
            bw.put_code(code, ln)
            if ebits:
                bw.put(extra, ebits)
            dcode = _distance_to_code(dist, xsize)
            dpfx, dextra, debits = _lz_prefix(dcode)
            code, ln = cd[dpfx]
            bw.put_code(code, ln)
            if debits:
                bw.put(dextra, debits)
        else:
            code, ln = cg[280 + t[1]]
            bw.put_code(code, ln)


def _forward_predictor(argb: list[int], xsize: int, ysize: int,
                       mode: int) -> list[int]:
    """Encoder-side forward predictor with a UNIFORM mode (residuals)."""
    out = [0] * len(argb)
    for y in range(ysize):
        row = y * xsize
        for x in range(xsize):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = argb[x - 1]
            elif x == 0:
                pred = argb[row - xsize]
            else:
                l = argb[row + x - 1]
                t = argb[row - xsize + x]
                tl = argb[row - xsize + x - 1]
                tr = argb[row] if x == xsize - 1 else argb[row - xsize + x + 1]
                pred = _predict(mode, l, t, tr, tl)
            out[row + x] = _sub_px(pred, argb[row + x])
    return out


def _forward_color_transform(argb: list[int], cte: int) -> list[int]:
    """Encoder-side forward cross-color transform with a UNIFORM element
    (g2r in the CTE's blue channel, g2b green, r2b red — spec §3.3.2)."""
    g2r = cte & 0xFF
    g2b = (cte >> 8) & 0xFF
    r2b = (cte >> 16) & 0xFF
    out = []
    for px in argb:
        a = px >> 24
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        new_r = (r - _ct_delta(g2r, g)) & 0xFF
        # r2b applies to the RESTORED red (the decoder restores red first)
        new_b = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
        out.append((a << 24) | (new_r << 16) | (g << 8) | new_b)
    return out


def _forward_subtract_green(argb: list[int]) -> list[int]:
    out = []
    for px in argb:
        a = px >> 24
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        out.append((a << 24) | (((r - g) & 0xFF) << 16) | (g << 8)
                   | ((b - g) & 0xFF))
    return out


def encode_webp(img: np.ndarray, *, use_subtract_green: bool = False,
                predictor_mode: int | None = None, cache_bits: int = 0,
                use_lz77: bool = True, use_palette: bool = False,
                color_transform: tuple[int, int, int] | None = None,
                use_meta: bool = False) -> bytes:
    """Encode an (h, w, {1,3,4}) uint8 array as lossless WebP.

    The knobs exist for decoder test coverage (each maps 1:1 to a decode
    path); defaults produce a plain literal/LZ77 stream."""
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    if not (1 <= h <= 16384 and 1 <= w <= 16384):
        raise ValueError("dimensions out of VP8L range")
    if ch == 1:
        rgba = np.repeat(img, 3, axis=-1)
        rgba = np.concatenate([rgba, np.full((h, w, 1), 255, np.uint8)], -1)
    elif ch == 3:
        rgba = np.concatenate([img, np.full((h, w, 1), 255, np.uint8)], -1)
    elif ch == 4:
        rgba = img
    else:
        raise ValueError("channels must be 1, 3 or 4")
    r = rgba[..., 0].astype(np.uint32)
    g = rgba[..., 1].astype(np.uint32)
    b = rgba[..., 2].astype(np.uint32)
    a = rgba[..., 3].astype(np.uint32)
    argb = ((a << 24) | (r << 16) | (g << 8) | b).ravel().tolist()
    has_alpha = bool((rgba[..., 3] != 255).any())

    bw = _BitWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(1 if has_alpha else 0, 1)
    bw.put(0, 3)  # version

    xsize = w
    if use_palette:
        pal = sorted(set(argb))
        if len(pal) > 256:
            raise ValueError("use_palette requires <=256 distinct colors")
        pal_idx = {px: i for i, px in enumerate(pal)}
        bw.put(1, 1)
        bw.put(COLOR_INDEXING_TRANSFORM, 2)
        bw.put(len(pal) - 1, 8)
        # palette rides a 1-row image, channel-delta-coded
        deltas = []
        prev = 0
        for px in pal:
            da = ((px >> 24) - (prev >> 24)) & 0xFF
            dr = ((px >> 16 & 0xFF) - (prev >> 16 & 0xFF)) & 0xFF
            dg = ((px >> 8 & 0xFF) - (prev >> 8 & 0xFF)) & 0xFF
            db = ((px & 0xFF) - (prev & 0xFF)) & 0xFF
            deltas.append((da << 24) | (dr << 16) | (dg << 8) | db)
            prev = px
        bw.put(0, 1)  # palette sub-image: no color cache
        _write_image_data(bw, [(LITERAL, d) for d in deltas], len(pal), 0)
        # bundle indices into the packed image
        size = len(pal)
        width_bits = 3 if size <= 2 else 2 if size <= 4 else 1 if size <= 16 else 0
        per = 1 << width_bits
        bits = 8 >> width_bits
        packed_w = _subsample_size(w, width_bits)
        packed = []
        for y in range(h):
            for bx in range(packed_w):
                green = 0
                for i in range(per):
                    x = bx * per + i
                    if x < w:
                        green |= pal_idx[argb[y * w + x]] << (bits * i)
                packed.append(0xFF000000 | (green << 8))
        argb = packed
        xsize = packed_w
    else:
        if use_subtract_green:
            bw.put(1, 1)
            bw.put(SUBTRACT_GREEN_TRANSFORM, 2)
            argb = _forward_subtract_green(argb)
        if color_transform is not None:
            g2r, g2b, r2b = color_transform
            cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
            bw.put(1, 1)
            bw.put(COLOR_TRANSFORM, 2)
            size_bits = 4
            bw.put(size_bits - 2, 3)
            bwid = _subsample_size(w, size_bits)
            bhei = _subsample_size(h, size_bits)
            bw.put(0, 1)  # sub-image: no color cache
            _write_image_data(bw, [(LITERAL, cte)] * (bwid * bhei), bwid, 0)
            argb = _forward_color_transform(argb, cte)
        if predictor_mode is not None:
            bw.put(1, 1)
            bw.put(PREDICTOR_TRANSFORM, 2)
            size_bits = 4  # 16x16 blocks
            bw.put(size_bits - 2, 3)
            bwid = _subsample_size(w, size_bits)
            bhei = _subsample_size(h, size_bits)
            sub_px = 0xFF000000 | (predictor_mode << 8)
            bw.put(0, 1)  # sub-image: no color cache
            _write_image_data(
                bw, [(LITERAL, sub_px)] * (bwid * bhei), bwid, 0)
            argb = _forward_predictor(argb, w, h, predictor_mode)
    bw.put(0, 1)  # end of transforms

    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)

    tokens = _tokenize(argb, xsize, cache_bits, use_lz77)
    if use_meta:
        # two prefix-code groups over 4x4 blocks, checkerboard-assigned
        huff_bits = 2
        hx = _subsample_size(xsize, huff_bits)
        hy = _subsample_size(h, huff_bits)  # transforms never change ysize
        groups = [((bx + by) & 1) for by in range(hy) for bx in range(hx)]
        bw.put(1, 1)  # meta prefix codes present
        bw.put(huff_bits - 2, 3)
        entropy_px = [0xFF000000 | (g << 8) for g in groups]
        bw.put(0, 1)  # entropy sub-image: no color cache
        _write_image_data(bw, [(LITERAL, p) for p in entropy_px], hx, 0)

        def group_fn(pos: int) -> int:
            x = pos % xsize
            y = pos // xsize
            return groups[(y >> huff_bits) * hx + (x >> huff_bits)]

        _write_image_data(bw, tokens, xsize, cache_bits, group_fn, 2)
    else:
        bw.put(0, 1)  # no meta prefix codes
        _write_image_data(bw, tokens, xsize, cache_bits)

    payload = bytes([VP8L_SIGNATURE]) + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = RIFF_MAGIC + struct.pack("<I", 4 + len(chunk)) + WEBP_MAGIC + chunk
    return riff
