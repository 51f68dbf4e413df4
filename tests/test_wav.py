"""Pure-stdlib RIFF/WAVE codec (functions/wav.py) + the audio modality of
the multimodal pipeline (operators/multimodal.py).

Verification layers:

1. DIFFERENTIAL vs Python's stdlib ``wave`` module: container params and
   raw PCM frames must agree exactly for every depth ``wave`` can read
   (8/16/32-bit PCM) across a randomized fixture population; our decoder
   additionally handles 24-bit, IEEE float and EXTENSIBLE, which are
   round-trip- and spec-tested.
2. Round-trip exactness: decode(encode(x)) is exact on the quantization
   grid for every depth; encode(decode(encode(x))) is byte-identical.
3. Spec-level container tests: odd-chunk padding, unknown chunks skipped,
   EXTENSIBLE GUID dispatch, trailing partial frame tolerated, every
   malformed/unsupported shape fails TYPED (WavFormatError), never with a
   raw struct/numpy error.
4. Kernel semantics: linear resample preserves a sine's dominant
   frequency and duration; clip windows land on exact sample boundaries.
"""

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest

from anycrawl_spark.functions.wav import (
    SUBFORMAT_PCM,
    WavFormatError,
    decode_wav,
    encode_wav,
    is_wav,
    resample_linear,
)

DEPTHS = [(8, False), (16, False), (24, False), (32, False), (32, True), (64, True)]


def _signal(frames: int, channels: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(frames, dtype=np.float64)
    return np.stack(
        [
            0.7 * np.sin(2 * np.pi * rng.uniform(0.001, 0.4) * t + rng.uniform(0, 6))
            + rng.uniform(-0.05, 0.05, frames)
            for _ in range(channels)
        ],
        axis=1,
    )


# ---------------------------------------------------------------- layer 1


@pytest.mark.parametrize("bits", [8, 16, 32])
@pytest.mark.parametrize("channels", [1, 2, 3])
def test_differential_vs_stdlib_wave(bits, channels):
    """Params and normalized samples agree exactly with the stdlib reader
    for every depth it supports."""
    x = _signal(977, channels, seed=bits * 10 + channels)
    payload = encode_wav(x, 22050, bits=bits)
    w = stdlib_wave.open(io.BytesIO(payload))
    assert (
        w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
    ) == (channels, bits // 8, 22050, 977)
    raw = w.readframes(977)
    if bits == 8:
        ref = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        dt = "<i2" if bits == 16 else "<i4"
        ref = np.frombuffer(raw, dt).astype(np.float64) / float(1 << (bits - 1))
    got, rate = decode_wav(payload)
    assert rate == 22050
    assert np.array_equal(got, ref.reshape(-1, channels))


# ---------------------------------------------------------------- layer 2


@pytest.mark.parametrize("bits,float_fmt", DEPTHS)
@pytest.mark.parametrize("extensible", [False, True])
def test_round_trip_every_depth(bits, float_fmt, extensible):
    x = _signal(500, 2, seed=bits + extensible)
    payload = encode_wav(x, 16000, bits=bits, float_fmt=float_fmt,
                         extensible=extensible)
    y, rate = decode_wav(payload)
    assert rate == 16000 and y.shape == x.shape
    if float_fmt and bits == 64:
        assert np.array_equal(y, x)
    else:
        tol = 1e-7 if float_fmt else 1.0 / (1 << (bits - 1))
        assert np.abs(y - x).max() <= tol
    # grid idempotence: re-encoding the decoded grid is byte-identical
    assert encode_wav(y, 16000, bits=bits, float_fmt=float_fmt,
                      extensible=extensible) == payload


def test_mono_1d_input_and_shape():
    x = np.sin(np.arange(300) * 0.1)
    y, _ = decode_wav(encode_wav(x, 8000, bits=16))
    assert y.shape == (300, 1)


def test_quantization_clips_full_scale():
    x = np.array([[1.0], [-1.0], [0.99997]])
    y, _ = decode_wav(encode_wav(x, 8000, bits=16))
    assert y[0, 0] == (32767 / 32768)  # +1.0 clips to max code
    assert y[1, 0] == -1.0


# ---------------------------------------------------------------- layer 3


def _wav_with_chunks(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"".join(
        four + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
        for four, payload in chunks
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _fmt(tag=1, channels=1, rate=8000, bits=16, block_align=None) -> bytes:
    block_align = block_align if block_align is not None else channels * bits // 8
    return struct.pack("<HHIIHH", tag, channels, rate, rate * block_align,
                       block_align, bits)


def test_unknown_and_odd_chunks_are_skipped():
    """LIST/cue chunks before data, one with an odd size (pad byte), must
    not derail the chunk walk."""
    pcm = struct.pack("<4h", 100, -100, 2000, -32768)
    payload = _wav_with_chunks([
        (b"LIST", b"INFOISFT" + b"x" * 7),   # odd size -> pad byte
        (b"fmt ", _fmt()),
        (b"cue ", b"\x00" * 12),
        (b"data", pcm),
    ])
    y, rate = decode_wav(payload)
    assert rate == 8000
    assert np.array_equal((y[:, 0] * 32768).astype(int), [100, -100, 2000, -32768])


def test_trailing_partial_frame_tolerated():
    pcm = struct.pack("<3h", 1, 2, 3) + b"\x07"  # 3 full stereo... no: mono 16-bit
    payload = _wav_with_chunks([(b"fmt ", _fmt()), (b"data", pcm)])
    y, _ = decode_wav(payload)
    assert y.shape == (3, 1)


def test_extensible_guid_dispatch():
    ext = _fmt(tag=0xFFFE) + struct.pack("<HHI", 22, 16, 0) + SUBFORMAT_PCM
    pcm = struct.pack("<2h", 5, -5)
    y, _ = decode_wav(_wav_with_chunks([(b"fmt ", ext), (b"data", pcm)]))
    assert y.shape == (2, 1)


@pytest.mark.parametrize(
    "case,payload",
    [
        ("not riff", b"JUNK" + b"\x00" * 40),
        ("riff not wave", b"RIFF" + struct.pack("<I", 36) + b"AVI " + b"\x00" * 32),
        ("riff size overruns", b"RIFF" + struct.pack("<I", 9999) + b"WAVE"),
        ("chunk overruns", _wav_with_chunks([(b"fmt ", _fmt())])[:-10]
         + b"data" + struct.pack("<I", 999)),
        ("missing fmt", _wav_with_chunks([(b"data", b"\x00\x00")])),
        ("missing data", _wav_with_chunks([(b"fmt ", _fmt())])),
        ("fmt too short", _wav_with_chunks([(b"fmt ", b"\x01\x00\x01\x00"),
                                            (b"data", b"")])),
        ("zero channels", _wav_with_chunks([(b"fmt ", _fmt(channels=0, block_align=2)),
                                            (b"data", b"\x00\x00")])),
        ("zero rate", _wav_with_chunks([(b"fmt ", _fmt(rate=0)),
                                        (b"data", b"\x00\x00")])),
        ("mp3 in wav", _wav_with_chunks([(b"fmt ", _fmt(tag=0x55)),
                                         (b"data", b"\x00\x00")])),
        ("adpcm", _wav_with_chunks([(b"fmt ", _fmt(tag=2)),
                                    (b"data", b"\x00\x00")])),
        ("pcm 12-bit", _wav_with_chunks([(b"fmt ", _fmt(bits=12, block_align=2)),
                                         (b"data", b"\x00\x00")])),
        ("float 16-bit", _wav_with_chunks([(b"fmt ", _fmt(tag=3, bits=16)),
                                           (b"data", b"\x00\x00")])),
        ("block align mismatch", _wav_with_chunks([(b"fmt ", _fmt(block_align=3)),
                                                   (b"data", b"\x00\x00")])),
        ("extensible short", _wav_with_chunks([(b"fmt ", _fmt(tag=0xFFFE)),
                                               (b"data", b"\x00\x00")])),
        ("extensible alien guid", _wav_with_chunks([
            (b"fmt ", _fmt(tag=0xFFFE) + struct.pack("<HHI", 22, 16, 0)
             + bytes(16)),
            (b"data", b"\x00\x00")])),
        ("data before fmt", _wav_with_chunks([(b"data", b"\x00\x00"),
                                              (b"fmt ", _fmt())])),
    ],
)
def test_malformed_fails_typed(case, payload):
    with pytest.raises(WavFormatError):
        decode_wav(payload)


@pytest.mark.parametrize("seed", range(12))
def test_mutation_fuzz_errors_stay_typed(seed):
    """Hostile-payload property: arbitrary byte flips / truncations /
    splices of a valid WAV either decode or raise WavFormatError — never a
    raw struct/numpy/Index error that would kill a Spark task. (Crawl-scale
    media is adversarial; row-wise failure is the whole-pipeline policy.)"""
    rng = np.random.default_rng(seed)
    bits, float_fmt = DEPTHS[seed % len(DEPTHS)]
    base = encode_wav(_signal(200 + seed * 37, 1 + seed % 2, seed), 8000,
                      bits=bits, float_fmt=float_fmt, extensible=bool(seed & 1))
    for _ in range(400):
        buf = bytearray(base)
        op = rng.integers(0, 3)
        if op == 0:  # flip 1-8 bytes anywhere (incl. headers)
            for _ in range(int(rng.integers(1, 9))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        elif op == 1:  # truncate
            del buf[int(rng.integers(0, len(buf))):]
        else:  # splice random garbage into a random offset
            at = int(rng.integers(0, len(buf)))
            buf[at:at] = bytes(rng.integers(0, 256, int(rng.integers(1, 64)),
                                            dtype=np.uint8))
        try:
            decode_wav(bytes(buf))
        except WavFormatError:
            pass  # typed failure is the contract


def test_is_wav_vs_webp_riff_collision():
    assert not is_wav(b"RIFF\x10\x00\x00\x00WEBPVP8L")
    assert is_wav(b"RIFF\x10\x00\x00\x00WAVEfmt ")


# ---------------------------------------------------------------- layer 4


def test_resample_preserves_tone_and_duration():
    t = np.arange(44100) / 44100.0
    x = np.sin(2 * np.pi * 440.0 * t)[:, None]
    y = resample_linear(x, 44100, 16000)
    assert y.shape == (16000, 1)  # 1.0 s stays 1.0 s
    spec = np.abs(np.fft.rfft(y[:, 0]))
    assert abs(np.argmax(spec) * 16000 / len(y) - 440.0) < 2.0


def test_resample_identity_and_upsample():
    x = _signal(1000, 2, seed=3)
    assert np.array_equal(resample_linear(x, 8000, 8000), x)
    up = resample_linear(x, 8000, 32000)
    assert up.shape == (4000, 2)
    # original samples sit on the upsampled grid exactly
    assert np.allclose(up[::4], x)


def test_clip_windows_on_exact_sample_boundaries():
    from anycrawl_spark.operators.multimodal import clips_for_payload

    x = _signal(8000, 1, seed=9)  # 1 s @ 8 kHz
    payload = encode_wav(x, 8000, bits=16)
    clips = clips_for_payload(payload, every_ms=250, clip_ms=100)
    assert [(i, ts) for i, ts, _ in clips] == [(0, 0), (1, 250), (2, 500), (3, 750)]
    got, rate = decode_wav(clips[2][2])
    assert rate == 8000
    ref, _ = decode_wav(encode_wav(x[4000:4800], 8000, bits=16))
    assert np.array_equal(got, ref)


def test_clips_reject_non_audio_and_corrupt_rowwise():
    from anycrawl_spark.operators.multimodal import clips_for_payload, synth_media

    png, _ = synth_media("http://media.synth/img/3")  # some image payload
    assert clips_for_payload(png, 100, 50) == []
    wav, _ = synth_media("http://media.synth/aud/3")
    assert clips_for_payload(wav[:40], 100, 50) == []  # truncated container


# ------------------------------------------------- pipeline (spark stages)


def test_audio_pipeline_end_to_end(spark):
    """materialize -> features/resample/clips over mixed image+audio refs:
    audio rows come from REAL decoded samples, image refs fail the audio
    ops row-wise, and payload bytes never cross a shuffle."""
    from anycrawl_spark.operators.multimodal import (
        audio_feature,
        extract_features,
        materialize_media,
        resample_audio,
        sample_clips,
        synth_media,
    )

    refs = spark.createDataFrame(
        [(f"http://media.synth/aud/{i}",) for i in range(8)]
        + [("http://media.synth/img/1",)],
        ["media_ref"],
    )
    media = materialize_media(refs).cache()

    feats = {r["media_ref"]: r for r in extract_features(media, dim=8).collect()}
    assert all(feats[f"http://media.synth/aud/{i}"]["ok"] for i in range(8))
    payload, _ = synth_media("http://media.synth/aud/5")
    expect = audio_feature(decode_wav(payload)[0], 8)
    assert np.allclose(feats["http://media.synth/aud/5"]["feature"], expect)

    res = {r["media_ref"]: r for r in resample_audio(media, 16000).collect()}
    assert all(res[f"http://media.synth/aud/{i}"]["ok"] for i in range(8))
    assert res["http://media.synth/img/1"]["ok"] is False  # row-wise, not task
    y, rate = decode_wav(bytes(res["http://media.synth/aud/5"]["payload"]))
    assert rate == 16000 and y.shape[0] == res["http://media.synth/aud/5"]["frames"]

    clips = sample_clips(media, every_ms=100, clip_ms=50)
    plan = clips._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("MapInPandas")[0], (
        "clip bytes must not cross a shuffle"
    )
    rows = clips.collect()
    assert rows and all(r["media_ref"].startswith("http://media.synth/aud/")
                        for r in rows)
