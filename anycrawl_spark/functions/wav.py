"""Pure-stdlib RIFF/WAVE (WAV) codec: struct + numpy, no audio libraries.

Completes the media-decode matrix for the AUDIO modality the same way
``functions/png.py`` / ``jpeg.py`` / ``webp.py`` / ``gif.py`` did for
images: ``operators/multimodal.py`` computes audio features from REAL
decoded samples instead of a byte-hash fake. The reference stores media
opaquely (it never decodes server-side — ScreenshotTransformer.ts:1-140
moves bytes to S3 untouched), so this is beyond-reference polish for the
LLM-training-data pipeline, built from the public RIFF/WAVE spec
(Microsoft/IBM 1991 "Multimedia Programming Interface and Data
Specifications 1.0"; WAVE_FORMAT_EXTENSIBLE per the Microsoft mmreg.h
layout).

Supported on decode: PCM 8-bit unsigned, 16/24/32-bit signed
little-endian, IEEE float32/float64, each optionally wrapped in
WAVE_FORMAT_EXTENSIBLE (format tag 0xFFFE + 16-byte SubFormat GUID);
any channel count; chunk walk with word-alignment padding and unknown
chunks skipped. Everything else (ADPCM, mu-law/A-law, MP3-in-WAV, RF64)
raises ``WavFormatError`` — callers fail the ROW, never the Spark task.

Samples are exchanged as float64 in [-1, 1), shape (frames, channels):
u8 maps via (x-128)/128, signed ints via x / 2^(bits-1), floats pass
through. Integer round-trips are exact (encode inverts the same scale).
Differential-verified against Python's stdlib ``wave`` module in
tests/test_wav.py.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"

#: format tags (public mmreg.h values)
WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_EXTENSIBLE = 0xFFFE

#: SubFormat GUIDs ({tag:04x}-0000-0010-8000-00AA00389B71): little-endian
#: format tag + the fixed 14-byte ksmedia.h suffix
_GUID_SUFFIX = bytes.fromhex("000000001000800000aa00389b71")
SUBFORMAT_PCM = struct.pack("<H", WAVE_FORMAT_PCM) + _GUID_SUFFIX
SUBFORMAT_IEEE_FLOAT = struct.pack("<H", WAVE_FORMAT_IEEE_FLOAT) + _GUID_SUFFIX


class WavFormatError(ValueError):
    """Malformed or unsupported WAV payload (fails its row, not the task)."""


def is_wav(head: bytes) -> bool:
    """True when the first 12 bytes carry the RIFF/WAVE container magic.

    Note WebP is ALSO a RIFF container (RIFF....WEBP) — the byte-8 fourcc
    is what separates the two, so sniffers must check all 12 bytes."""
    return len(head) >= 12 and head[:4] == RIFF_MAGIC and head[8:12] == WAVE_MAGIC


def _iter_chunks(data: bytes):
    """Yield (fourcc, payload_offset, payload_size) for every top-level
    chunk, honoring the RIFF rule that odd-sized chunks are padded to a
    word boundary. A chunk whose declared size runs past the buffer is a
    hard error (truncated payload), matching row-wise failure policy."""
    pos = 12
    end = len(data)
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise WavFormatError(
                f"chunk {fourcc!r} declares {size} bytes but only "
                f"{end - body} remain"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)  # pad byte after odd-sized chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples, sample_rate).

    ``samples`` is float64, shape (frames, channels), values in [-1, 1)
    (exactly representable for every supported integer width). Raises
    :class:`WavFormatError` on anything malformed or unsupported.
    """
    data = bytes(data)
    if not is_wav(data[:12]):
        raise WavFormatError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise WavFormatError(
            f"RIFF declares {riff_size + 8} bytes, buffer has {len(data)}"
        )

    fmt = None
    pcm = None
    for fourcc, off, size in _iter_chunks(data):
        if fourcc == b"fmt " and fmt is None:
            if size < 16:
                raise WavFormatError(f"fmt chunk too short ({size} bytes)")
            tag, channels, rate, _byte_rate, block_align, bits = struct.unpack_from(
                "<HHIIHH", data, off
            )
            if tag == WAVE_FORMAT_EXTENSIBLE:
                # cbSize(2) + validBits(2) + channelMask(4) + SubFormat(16)
                if size < 40:
                    raise WavFormatError("EXTENSIBLE fmt chunk shorter than 40 bytes")
                sub = data[off + 24 : off + 40]
                if sub == SUBFORMAT_PCM:
                    tag = WAVE_FORMAT_PCM
                elif sub == SUBFORMAT_IEEE_FLOAT:
                    tag = WAVE_FORMAT_IEEE_FLOAT
                else:
                    raise WavFormatError(f"unsupported SubFormat GUID {sub.hex()}")
            fmt = (tag, channels, rate, block_align, bits)
        elif fourcc == b"data" and pcm is None:
            if fmt is None:
                # the spec requires fmt before data; real encoders comply
                raise WavFormatError("data chunk before fmt chunk")
            pcm = data[off : off + size]
    if fmt is None:
        raise WavFormatError("missing fmt chunk")
    if pcm is None:
        raise WavFormatError("missing data chunk")

    tag, channels, rate, block_align, bits = fmt
    if channels < 1:
        raise WavFormatError("zero channels")
    if rate < 1:
        raise WavFormatError("zero sample rate")
    if tag == WAVE_FORMAT_PCM:
        if bits not in (8, 16, 24, 32):
            raise WavFormatError(f"unsupported PCM bit depth {bits}")
    elif tag == WAVE_FORMAT_IEEE_FLOAT:
        if bits not in (32, 64):
            raise WavFormatError(f"unsupported float bit depth {bits}")
    else:
        raise WavFormatError(f"unsupported format tag 0x{tag:04x}")
    bytes_per = bits // 8
    if block_align != channels * bytes_per:
        raise WavFormatError(
            f"block_align {block_align} != channels*sample_bytes "
            f"{channels * bytes_per}"
        )

    frames = len(pcm) // block_align  # tolerate a trailing partial frame
    pcm = pcm[: frames * block_align]
    if tag == WAVE_FORMAT_IEEE_FLOAT:
        dt = np.dtype("<f4") if bits == 32 else np.dtype("<f8")
        # hostile float payloads can carry signaling NaN bit patterns, whose
        # f4->f8 cast raises an FPE-invalid RuntimeWarning; suppress the
        # warning and sanitize every non-finite sample to 0 so downstream
        # feature math stays finite no matter the input bytes
        with np.errstate(invalid="ignore"):
            flat = np.frombuffer(pcm, dtype=dt).astype(np.float64)
        flat = np.nan_to_num(flat, nan=0.0, posinf=0.0, neginf=0.0)
    elif bits == 8:
        flat = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 24:
        raw = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3)
        val = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        val -= (val & 0x800000) << 1  # sign-extend bit 23
        flat = val.astype(np.float64) / float(1 << 23)
    else:  # 16/32-bit signed LE
        dt = np.dtype("<i2") if bits == 16 else np.dtype("<i4")
        flat = np.frombuffer(pcm, dtype=dt).astype(np.float64) / float(
            1 << (bits - 1)
        )
    return flat.reshape(frames, channels), rate


def encode_wav(
    samples: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    float_fmt: bool = False,
    extensible: bool = False,
) -> bytes:
    """(frames, channels) float64 in [-1, 1] -> canonical WAV bytes.

    Integer targets quantize with round-half-away-from-zero and clip to
    the representable range so that decode(encode(x)) round-trips exactly
    for x already on the quantization grid. ``extensible`` wraps the same
    stream in a WAVE_FORMAT_EXTENSIBLE fmt chunk (what multi-channel
    encoders emit in the wild)."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise WavFormatError(f"samples must be 1-D or 2-D, got {samples.ndim}-D")
    frames, channels = samples.shape
    if channels < 1:
        raise WavFormatError("zero channels")
    if float_fmt:
        if bits not in (32, 64):
            raise WavFormatError(f"float WAV must be 32/64-bit, got {bits}")
        flat = samples.astype("<f4" if bits == 32 else "<f8").ravel()
        pcm = flat.tobytes()
        tag = WAVE_FORMAT_IEEE_FLOAT
    else:
        if bits not in (8, 16, 24, 32):
            raise WavFormatError(f"PCM WAV must be 8/16/24/32-bit, got {bits}")
        full = float(1 << (bits - 1))
        q = np.clip(
            np.floor(samples * full + 0.5), -full, full - 1
        ).astype(np.int64).ravel()
        if bits == 8:
            pcm = (q + 128).astype(np.uint8).tobytes()
        elif bits == 24:
            u = (q & 0xFFFFFF).astype(np.uint32)
            b = np.empty((u.size, 3), dtype=np.uint8)
            b[:, 0] = u & 0xFF
            b[:, 1] = (u >> 8) & 0xFF
            b[:, 2] = (u >> 16) & 0xFF
            pcm = b.tobytes()
        else:
            pcm = q.astype("<i2" if bits == 16 else "<i4").tobytes()
        tag = WAVE_FORMAT_PCM

    bytes_per = bits // 8
    block_align = channels * bytes_per
    byte_rate = sample_rate * block_align
    if extensible:
        sub = SUBFORMAT_PCM if tag == WAVE_FORMAT_PCM else SUBFORMAT_IEEE_FLOAT
        fmt_body = struct.pack(
            "<HHIIHHHHI",
            WAVE_FORMAT_EXTENSIBLE, channels, sample_rate, byte_rate,
            block_align, bits,
            22,      # cbSize
            bits,    # wValidBitsPerSample
            0,       # dwChannelMask: unspecified speaker mapping
        ) + sub
    else:
        fmt_body = struct.pack(
            "<HHIIHH", tag, channels, sample_rate, byte_rate, block_align, bits
        )

    chunks = b"".join(
        fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
        for fourcc, body in ((b"fmt ", fmt_body), (b"data", pcm))
    )
    return RIFF_MAGIC + struct.pack("<I", 4 + len(chunks)) + WAVE_MAGIC + chunks


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resample of (frames, channels) float64 samples.

    Deterministic pure-numpy index math — the audio analog of the
    nearest-neighbor image resize kernels. Output frame count is
    round(frames * dst/src); each output frame samples the source at the
    exact rational position via np.interp per channel."""
    if src_rate == dst_rate:
        return samples.copy()
    frames = samples.shape[0]
    out_frames = max(1, int(round(frames * dst_rate / src_rate)))
    # positions of the output grid on the source-sample axis
    pos = np.arange(out_frames, dtype=np.float64) * (src_rate / dst_rate)
    pos = np.minimum(pos, frames - 1)
    src_idx = np.arange(frames, dtype=np.float64)
    return np.stack(
        [np.interp(pos, src_idx, samples[:, c]) for c in range(samples.shape[1])],
        axis=1,
    )
