"""Pure-stdlib PNG codec (functions/png.py).

The decode golden builds a PNG BY HAND (struct + zlib in the test, not via
encode_png) with one scanline per filter type and pixel values recomputed
on paper from the PNG spec's recon equations — so the decoder is checked
against the spec, not against the encoder.
"""

import struct
import zlib

import numpy as np
import pytest

from anycrawl_spark.functions.png import (
    PNG_SIGNATURE,
    PngFormatError,
    decode_png,
    encode_png,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _manual_png(width, height, color_type, raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_decode_all_filters_hand_computed():
    # 3x5 grayscale, one row per filter type; recon values derived on paper:
    #   r0 Sub   [100,50,200] -> [100,150,94]   (94 = (200+150) mod 256)
    #   r1 Avg   [10,20,30]   -> [60,125,139]   (floor((left+up)/2) added)
    #   r2 Paeth [10,20,30]   -> [70,145,175]   (predictor picks up,up,left)
    #   r3 Up    [5,5,5]      -> [75,150,180]
    #   r4 None  [1,2,3]      -> [1,2,3]
    raw = (
        b"\x01" + bytes([100, 50, 200])
        + b"\x03" + bytes([10, 20, 30])
        + b"\x04" + bytes([10, 20, 30])
        + b"\x02" + bytes([5, 5, 5])
        + b"\x00" + bytes([1, 2, 3])
    )
    img = decode_png(_manual_png(3, 5, 0, raw))
    assert img.shape == (5, 3, 1)
    assert img[:, :, 0].tolist() == [
        [100, 150, 94],
        [60, 125, 139],
        [70, 145, 175],
        [75, 150, 180],
        [1, 2, 3],
    ]


def test_decode_palette_expansion():
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    raw = b"\x00" + bytes([0, 1])
    img = decode_png(_manual_png(2, 1, 3, raw, extra=plte))
    assert img.tolist() == [[[255, 0, 0], [0, 255, 0]]]


def test_decode_rgb_sub_filter_uses_pixel_stride():
    # Sub on RGB: recon[x] += recon[x-3] (per-channel left, not per-byte)
    raw = b"\x01" + bytes([10, 20, 30, 1, 2, 3])
    img = decode_png(_manual_png(2, 1, 2, raw))
    assert img.tolist() == [[[10, 20, 30], [11, 22, 33]]]


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_every_colortype_and_filter(channels, filter_type):
    rng = np.random.RandomState(channels * 10 + filter_type)
    img = rng.randint(0, 256, size=(7, 5, channels), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert np.array_equal(out, img)


def test_roundtrip_2d_grayscale():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_png(encode_png(img))
    assert out.shape == (3, 4, 1) and np.array_equal(out[:, :, 0], img)


def test_rejects_unsupported_variants():
    with pytest.raises(PngFormatError):
        decode_png(b"not a png at all")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    bad = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    with pytest.raises(PngFormatError):
        decode_png(bad)
    # Adam7 interlace
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    bad = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    with pytest.raises(PngFormatError):
        decode_png(bad)
    # corrupted CRC
    good = encode_png(np.zeros((2, 2), dtype=np.uint8))
    corrupt = bytearray(good)
    corrupt[-5] ^= 0xFF  # inside IEND's CRC
    with pytest.raises(PngFormatError):
        decode_png(bytes(corrupt))
    # truncated IDAT body
    with pytest.raises(PngFormatError):
        decode_png(good[:-20] if len(good) > 20 else good[:10])


def test_malformed_png_signature_fails_rowwise(spark):
    """A payload that LOOKS like a PNG (signature) but is garbage must yield
    ok=False rows, never kill the Spark stage — one poisoned payload in a
    100 TB media column cannot be allowed to fail the job."""
    import pandas as pd

    from anycrawl_spark.operators.multimodal import (
        MEDIA, extract_features, resize_images, synth_media,
    )

    good, _ = synth_media("http://media.synth/img/0")  # jpeg/webp or png
    bad_cases = [
        PNG_SIGNATURE + b"garbage after signature",
        PNG_SIGNATURE,  # signature only
        encode_png(np.zeros((3, 3), dtype=np.uint8))[:-18],  # truncated
        b"\xff\xd8garbage after jpeg soi",  # jpeg signature, junk body
    ]
    rows = [("ok0", good, None)] + [
        (f"bad{i}", b, None) for i, b in enumerate(bad_cases)
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_ref", "payload", "meta"]),
        schema=MEDIA,
    )
    feats = {r.media_ref: r for r in extract_features(media, dim=8).collect()}
    assert feats["ok0"].ok
    for i in range(len(bad_cases)):
        assert not feats[f"bad{i}"].ok and feats[f"bad{i}"].feature is None
    rs = {r.media_ref: r for r in resize_images(media, 16, 16).collect()}
    assert rs["ok0"].ok
    for i in range(len(bad_cases)):
        assert not rs[f"bad{i}"].ok


def test_png_feature_from_real_pixels():
    from anycrawl_spark.operators.multimodal import feature_for_payload, png_feature

    img = np.full((4, 4, 3), 255, dtype=np.uint8)  # all-white
    vec = png_feature(img, dim=8)
    assert vec.shape == (8,) and np.allclose(vec, 1.0)
    img0 = np.zeros((4, 4, 3), dtype=np.uint8)     # all-black
    assert np.allclose(png_feature(img0, dim=8), -1.0)
    # the shared kernel routes PNG bytes through the real decoder
    payload = encode_png(img)
    assert np.allclose(feature_for_payload(payload, 8), 1.0)


def test_synth_media_png_population_covers_filters_and_colortypes():
    from anycrawl_spark.operators.multimodal import synth_media

    filters, channels = set(), set()
    for i in range(200):
        payload, meta = synth_media(f"http://media.synth/img/{i}")
        if meta["format"] != "png":
            continue
        img = decode_png(payload)
        assert (img.shape[0], img.shape[1]) == (meta["height"], meta["width"])
        channels.add(img.shape[2])
        # filter byte of the first scanline, readable from the zlib stream
        off = payload.index(b"IDAT")
        (length,) = struct.unpack(">I", payload[off - 4 : off])
        raw = zlib.decompress(payload[off + 4 : off + 4 + length])
        filters.add(raw[0])
    assert channels == {1, 3, 4}
    assert filters == {0, 1, 2, 3, 4}
