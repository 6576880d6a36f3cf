"""GIF LZW codec (operators/gif_codec): encode/decode round-trips
across palette sizes and code-width growth/clear cycles, interlace
de-ordering, damage totality, and the real-pixel feature path."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from geoparser_spark.operators.gif_codec import (
    _deinterlace,
    decode_gif,
    encode_gif,
)


def test_roundtrip_palette_sizes():
    rng = np.random.default_rng(5)
    for (h, w, npal) in [(3, 4, 4), (8, 8, 16), (40, 50, 256), (1, 1, 2)]:
        pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        idx = rng.integers(0, npal, size=(h, w), dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def test_roundtrip_12bit_growth_and_clear():
    """A 160k-pixel random 256-palette image forces the LZW code width
    through every size up to 12 bits and at least one mid-stream CLEAR
    — the encoder/decoder width bookkeeping must stay in lockstep."""
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 256, size=(400, 400), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def test_repetitive_and_constant_images():
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    tiled = np.tile(np.arange(16, dtype=np.uint8), (100, 25))
    assert np.array_equal(decode_gif(encode_gif(tiled, pal)), pal[tiled])
    flat = np.zeros((123, 77), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(flat, pal)), pal[flat])


def test_deinterlace_order():
    rows = np.arange(10)[:, None]
    out = _deinterlace(rows)
    # pass order: 0,8 / 4 / 2,6 / 1,3,5,7,9 — inverse mapping
    order = [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert [int(out[r, 0]) for r in order] == list(range(10))


def test_damage_rejected():
    for bad in (b"", b"GIF89a", b"NOTAGIF", b"GIF89a" + b"\x00" * 20):
        with pytest.raises(ValueError):
            decode_gif(bad)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=512))
def test_totality_on_garbage(raw):
    try:
        decode_gif(b"GIF89a" + raw)
    except ValueError:
        pass  # ValueError is the contract; anything else fails the test


def test_media_features_real_gif_path(spark):
    from geoparser_spark.operators.multimodal import extract_media_features
    from geoparser_spark.operators.png_codec import pixel_features

    pal = np.stack([(np.arange(16) * 37) % 256,
                    (np.arange(16) * 59) % 256,
                    (np.arange(16) * 83) % 256], axis=1).astype(np.uint8)
    idx = (np.arange(12, dtype=np.uint8) % 16).reshape(3, 4)
    rows = [Row(media_ref="gif", media_bytes=bytearray(encode_gif(idx, pal)))]
    got = extract_media_features(
        spark.createDataFrame(rows), dim=16).collect()[0]
    assert got.decode_ok is True
    expect = pixel_features(pal[idx], 16)
    assert got.feature == pytest.approx([np.float32(x) for x in expect])


def test_encode_rejects_bad_palette_sizes():
    idx = np.zeros((2, 2), dtype=np.uint8)
    for n in (0, 257, 300):
        pal = np.zeros((n, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="palette"):
            encode_gif(idx, pal)
