"""Pure-stdlib PNG codec (operators/png_codec): decode/encode
round-trips across color types and ALL five scanline filters, the
nearest-neighbor resample, the integer-exact pixel features, and the
real-pixel paths wired through multimodal.extract_media_features /
resize_images."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from geoparser_spark.operators.png_codec import (
    PNG_SIG,
    decode_png,
    encode_png,
    pixel_features,
    resize_nearest,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def test_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(7)
    for shape in [(5, 7), (8, 3, 3), (4, 4, 4), (1, 1), (2, 1, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = decode_png(encode_png(img))
        ref = img[:, :, None] if img.ndim == 2 else img
        assert np.array_equal(back, ref), shape


def test_all_filter_types_decode():
    """Hand-filter a stream cycling filters 0..4 (None/Sub/Up/Average/
    Paeth per RFC 2083 §6) and check the unfilter recovers the image."""
    rng = np.random.default_rng(11)
    w, h, c = 6, 5, 3
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    rows = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        f = y % 5
        enc = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[x] = (line[x] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = line
    idat = zlib.compress(b"".join(rows))
    png = (PNG_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), img)


def test_palette_expands_to_rgb():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    w, h = 3, 2
    rows = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 1, 0])
    png = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", pal)
           + _chunk(b"IDAT", zlib.compress(rows))
           + _chunk(b"IEND", b""))
    img = decode_png(png)
    assert img.shape == (2, 3, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[1, 0].tolist() == [0, 0, 255]


def test_palette_index_out_of_range_is_valueerror():
    """ADVICE r4: indices past the PLTE length must raise the
    documented ValueError, not a numpy IndexError (gif_codec already
    bounds-checks; mirror it)."""
    pal = bytes([255, 0, 0, 0, 255, 0])  # only 2 entries
    rows = b"\x00" + bytes([0, 1, 5])    # index 5 out of range
    png = (PNG_SIG
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", pal)
           + _chunk(b"IDAT", zlib.compress(rows))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(png)


def test_16bit_rejected_and_bad_signature():
    ihdr_16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png = PNG_SIG + _chunk(b"IHDR", ihdr_16) + _chunk(
        b"IDAT", zlib.compress(b"\x00" * 10)) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(png)
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_adam7_decodes_same_pixels_as_sequential_twin():
    """VERDICT r5 #6: an interlaced fixture must decode to the SAME
    pixels as its non-interlaced twin — same image, two encodings.
    Shapes straddle the 8x8 Adam7 tile (sub-tile, exact, ragged) and
    every channel count; sub-tile shapes exercise skipped passes."""
    rng = np.random.default_rng(42)
    for shape in [(3, 5), (8, 8, 3), (9, 13, 4), (1, 1), (2, 2),
                  (16, 7, 2), (5, 17, 3), (1, 9), (11, 1)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        seq = decode_png(encode_png(img, interlace=False))
        ada = decode_png(encode_png(img, interlace=True))
        assert np.array_equal(seq, ada), shape
        ref = img[:, :, None] if img.ndim == 2 else img
        assert np.array_equal(ada, ref), shape


def test_adam7_truncated_idat_is_valueerror():
    full = encode_png(np.arange(120, dtype=np.uint8).reshape(10, 12),
                      interlace=True)
    # rebuild with an IDAT missing its final pass bytes: underflow must
    # be a loud ValueError, not silently-zero pixels
    short = zlib.compress(zlib.decompress(
        _idat_payload(full))[:-5])
    png = (PNG_SIG + _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", 12, 10, 8, 0, 0, 0, 1))
        + _chunk(b"IDAT", short) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IDAT underflow"):
        decode_png(png)


def _idat_payload(png: bytes) -> bytes:
    i = len(PNG_SIG)
    while i + 8 <= len(png):
        (length,), ctype = struct.unpack(">I", png[i:i + 4]), png[i + 4:i + 8]
        if ctype == b"IDAT":
            return png[i + 8:i + 8 + length]
        i += 12 + length
    raise AssertionError("no IDAT")


def test_resize_nearest_exact_indices():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
    out = resize_nearest(img, 3, 2)
    # output (y, x) samples (y*4//2, x*6//3) = (2y, 2x)
    assert out[:, :, 0].tolist() == [[0, 2, 4], [12, 14, 16]]


def test_pixel_features_integer_exact():
    img = np.full((2, 3), 100, dtype=np.uint8)
    f = pixel_features(img, 16)
    assert f[0] == 3 / 4096.0 and f[1] == 2 / 4096.0
    assert f[2] == pytest.approx(100 / 255.0)
    assert f[3] == 0.0  # constant image: zero variance
    hist = f[8:]
    assert sum(hist) == pytest.approx(1.0)
    assert hist[(100 * 8) // 256] == 1.0


def test_media_features_real_png_path(spark):
    from geoparser_spark.operators.multimodal import extract_media_features

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    rows = [
        Row(media_ref="png", media_bytes=bytearray(encode_png(img))),
        Row(media_ref="txt", media_bytes=b"just text"),
    ]
    got = {r.media_ref: r for r in extract_media_features(
        spark.createDataFrame(rows), dim=16).collect()}
    assert got["png"].decode_ok is True
    assert got["txt"].decode_ok is False
    expect = pixel_features(img[:, :, None], 16)
    assert got["png"].feature == pytest.approx(
        [np.float32(x) for x in expect])


def test_resize_images_real_png_roundtrip(spark):
    from geoparser_spark.operators.multimodal import resize_images

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    rows = [Row(media_ref="p", media_bytes=bytearray(encode_png(img)),
                media_meta={"width": 8, "height": 8})]
    got = resize_images(spark.createDataFrame(rows), max_w=4,
                        max_h=4).collect()[0]
    assert (got.width, got.height, got.resized) == (4, 4, True)
    back = decode_png(bytes(got.media_bytes))
    assert np.array_equal(back, resize_nearest(img[:, :, None], 4, 4))


def test_grey_alpha_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(4, 5, 2), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_bomb_dimensions_rejected():
    ihdr = struct.pack(">IIBBBBB", 2**31 - 1, 2**31 - 1, 8, 6, 0, 0, 0)
    png = (PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bomb"):
        decode_png(png)


def test_zero_width_png_features_no_crash():
    ihdr = struct.pack(">IIBBBBB", 0, 3, 8, 0, 0, 0, 0)
    png = (PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + _chunk(b"IEND", b""))
    img = decode_png(png)
    assert img.shape == (3, 0, 1)
    f = pixel_features(img, 16)
    assert len(f) == 16 and f[1] == 3 / 4096.0


def test_damaged_png_degrades_to_stub(spark):
    """Corrupt IDAT (zlib.error) and oversize palette index
    (IndexError) must fall back to the stub path with
    decode_ok=False, never kill the Arrow task."""
    from geoparser_spark.operators.multimodal import (
        extract_media_features,
        resize_images,
    )

    good = encode_png(np.arange(12, dtype=np.uint8).reshape(3, 4))
    corrupt = good[:40] + b"\xff\x00\xde\xad" + good[44:]
    pal_bad = (PNG_SIG
               + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3,
                                             0, 0, 0))
               + _chunk(b"PLTE", bytes([255, 0, 0]))
               + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x09"))
               + _chunk(b"IEND", b""))
    rows = [Row(media_ref="c", media_bytes=bytearray(corrupt)),
            Row(media_ref="p", media_bytes=bytearray(pal_bad))]
    got = {r.media_ref: r for r in extract_media_features(
        spark.createDataFrame(rows), dim=16).collect()}
    assert got["c"].decode_ok is False
    assert got["p"].decode_ok is False
    rows2 = [Row(media_ref="c", media_bytes=bytearray(corrupt),
                 media_meta={"width": 4, "height": 3})]
    r2 = resize_images(spark.createDataFrame(rows2), max_w=2,
                       max_h=2).collect()[0]
    assert bytes(r2.media_bytes).startswith(b"RSZ:")  # stub fallback


@given(st.integers(1, 20), st.integers(1, 20), st.integers(1, 4),
       st.booleans(), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_roundtrip_property_including_adam7(h, w, c, interlace, seed):
    """Hypothesis round-trip over both encodings (VERDICT r5 #6):
    arbitrary shape/channels/seed, sequential and Adam7."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    assert np.array_equal(
        decode_png(encode_png(img, interlace=interlace)), img)


def test_resize_images_grey_alpha_real(spark):
    from geoparser_spark.operators.multimodal import resize_images

    img = np.arange(32, dtype=np.uint8).reshape(4, 4, 2)
    rows = [Row(media_ref="ga", media_bytes=bytearray(encode_png(img)),
                media_meta={"width": 4, "height": 4})]
    got = resize_images(spark.createDataFrame(rows), max_w=2,
                        max_h=2).collect()[0]
    back = decode_png(bytes(got.media_bytes))
    assert np.array_equal(back, resize_nearest(img, 2, 2))
