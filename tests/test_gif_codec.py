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


def _frame_blocks(indices: np.ndarray, left: int, top: int,
                  min_code: int = 2) -> bytes:
    """Image descriptor + LZW sub-blocks for one frame (no LCT)."""
    import struct

    from geoparser_spark.operators.gif_codec import _lzw_encode

    h, w = indices.shape
    out = bytearray(b"\x2C" + struct.pack("<HHHH", left, top, w, h)
                    + b"\x00" + bytes([min_code]))
    data = _lzw_encode(min_code, indices.astype(np.uint8))
    for j in range(0, len(data), 255):
        chunk = data[j:j + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"
    return bytes(out)


def test_animated_gif_first_frame_composited_on_background():
    """VERDICT r5 #7: the first-frame contract, explicit.  A two-frame
    GIF89a whose frame 1 is OFFSET inside a larger logical screen must
    decode to frame 1 composited at (left, top) on the background
    color — and frame 2's pixels must never appear (decode returns at
    frame 1, so trailing descriptors cannot mis-parse)."""
    import struct

    gct = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90],
                    [200, 100, 50]], dtype=np.uint8)
    sw, sh, bg = 6, 5, 3
    raw = bytearray(b"GIF89a")
    raw += struct.pack("<HHBBB", sw, sh, 0x80 | (2 - 1), bg, 0)
    raw += gct.tobytes()
    # graphic control extension between header and frame 1 (delay etc.)
    raw += b"\x21\xF9\x04\x00\x0A\x00\x00\x00"
    f1 = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw += _frame_blocks(f1, left=1, top=1)
    # frame 2: full-screen, constant palette index 2 — must NOT appear
    raw += b"\x21\xF9\x04\x00\x0A\x00\x00\x00"
    raw += _frame_blocks(np.full((sh, sw), 2, dtype=np.uint8),
                         left=0, top=0)
    raw += b"\x3B"

    img = decode_gif(bytes(raw))
    assert img.shape == (sh, sw, 3)
    expect = np.zeros((sh, sw, 3), dtype=np.uint8)
    expect[:, :] = gct[bg]
    expect[1:3, 1:4] = gct[f1]
    assert np.array_equal(img, expect)
    # frame 2 is constant gct[2]; if it leaked, some pixel outside the
    # frame-1 rect would be gct[2] instead of the background
    assert not np.array_equal(img[0, 0], gct[2])


def test_gif_frame_exceeding_screen_enlarges_canvas():
    """Wild encoders under-declare the screen; browsers enlarge the
    canvas to fit the frame — mirror that tolerance (review finding:
    rejecting these regressed valid-in-practice files to the stub)."""
    import struct

    gct = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    raw = bytearray(b"GIF89a")
    raw += struct.pack("<HHBBB", 4, 4, 0x80 | 0, 0, 0)
    raw += gct.tobytes()
    f1 = np.zeros((3, 3), dtype=np.uint8)
    raw += _frame_blocks(f1, left=2, top=2)
    raw += b"\x3B"
    img = decode_gif(bytes(raw))
    assert img.shape == (5, 5, 3)  # canvas grew from 4x4 to fit 2+3
    expect = np.zeros((5, 5, 3), dtype=np.uint8)
    expect[:, :] = gct[0]          # bg index 0
    expect[2:5, 2:5] = gct[f1]
    assert np.array_equal(img, expect)


def test_gif_zero_screen_decodes_frame():
    import struct

    gct = np.array([[9, 8, 7], [1, 1, 1]], dtype=np.uint8)
    raw = bytearray(b"GIF89a")
    raw += struct.pack("<HHBBB", 0, 0, 0x80 | 0, 0, 0)
    raw += gct.tobytes()
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    raw += _frame_blocks(idx, left=0, top=0)
    raw += b"\x3B"
    assert np.array_equal(decode_gif(bytes(raw)), gct[idx])


# ---------------------------------------------------- animation frames

def _pal16():
    return np.stack([(np.arange(16) * 37) % 256,
                     (np.arange(16) * 59) % 256,
                     (np.arange(16) * 83) % 256], axis=1).astype(np.uint8)


def test_frames_full_screen_sequence_roundtrip():
    from geoparser_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_anim,
    )

    pal = _pal16()
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 16, size=(5, 9)).astype(np.uint8)
              for _ in range(4)]
    blob = encode_gif_anim(frames, pal, delays_cs=[10, 20, 30, 40])
    got = decode_gif_frames(blob)
    assert [d for d, _ in got] == [10, 20, 30, 40]
    for f, (_, canvas) in zip(frames, got):
        assert np.array_equal(canvas, pal[f])


def test_frames_disposal_none_accumulates_and_bg_restores():
    """Disposal 1 (leave): a small second frame overlays the first;
    disposal 2 (background): the region resets before the NEXT frame."""
    from geoparser_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_anim,
    )

    pal = _pal16()
    base = np.full((4, 6), 5, dtype=np.uint8)
    patch = np.full((2, 2), 9, dtype=np.uint8)
    tail = np.full((1, 1), 3, dtype=np.uint8)
    blob = encode_gif_anim(
        [base, patch, tail], pal,
        offsets=[(0, 0), (2, 1), (5, 3)],
        disposals=[1, 2, 0], screen=(6, 4), bg=0)
    got = decode_gif_frames(blob)
    assert len(got) == 3
    want1 = pal[base]
    assert np.array_equal(got[0][1], want1)
    want2 = want1.copy()
    want2[1:3, 2:4] = pal[9]                  # patch at (left=2, top=1)
    assert np.array_equal(got[1][1], want2)
    want3 = want1.copy()
    want3[1:3, 2:4] = pal[0]                  # disposal 2: bg restore
    want3[3, 5] = pal[3]
    assert np.array_equal(got[2][1], want3)


def test_frames_disposal_previous_and_transparency():
    """Disposal 3 restores the pre-frame canvas; transparent pixels
    leave the underlying canvas visible."""
    from geoparser_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_anim,
    )

    pal = _pal16()
    base = np.full((3, 3), 4, dtype=np.uint8)
    # frame 2: checkerboard of color 8 and transparent index 15
    over = np.array([[8, 15, 8], [15, 8, 15], [8, 15, 8]], dtype=np.uint8)
    last = np.full((3, 3), 2, dtype=np.uint8)
    blob = encode_gif_anim(
        [base, over, last], pal,
        disposals=[1, 3, 0], transparents=[None, 15, None])
    got = decode_gif_frames(blob)
    want2 = pal[base].copy()
    mask = over != 15
    want2[mask] = pal[over][mask]
    assert np.array_equal(got[1][1], want2)
    # disposal 3 restored base before painting the last frame
    assert np.array_equal(got[2][1], pal[last])


def test_frames_max_frames_stops_early_and_guard_raises():
    from geoparser_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_anim,
    )

    pal = _pal16()
    frames = [np.full((2, 2), k % 16, dtype=np.uint8) for k in range(6)]
    blob = encode_gif_anim(frames, pal)
    assert len(decode_gif_frames(blob, max_frames=3)) == 3
    assert len(decode_gif_frames(blob)) == 6


def test_frames_first_matches_decode_gif_contract():
    """Frame 1 of the walker equals decode_gif's composited output for
    an offset first frame (the pinned first-frame contract)."""
    from geoparser_spark.operators.gif_codec import (
        decode_gif,
        decode_gif_frames,
        encode_gif_anim,
    )

    pal = _pal16()
    small = np.full((2, 3), 7, dtype=np.uint8)
    blob = encode_gif_anim([small], pal, offsets=[(2, 1)],
                           screen=(6, 4), bg=1)
    assert np.array_equal(decode_gif_frames(blob)[0][1], decode_gif(blob))


def test_sample_media_frames_operator(spark):
    """Operator: GIF payloads emit one row per sampled frame with the
    exact pixel stats of the composited canvases; non-GIF degrades to
    a single stub row."""
    import pandas as pd

    from geoparser_spark.operators.gif_codec import encode_gif_anim
    from geoparser_spark.operators.multimodal import sample_media_frames
    from geoparser_spark.operators.png_codec import pixel_features

    pal = _pal16()
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 16, size=(3, 5)).astype(np.uint8)
              for _ in range(5)]
    blob = encode_gif_anim(frames, pal, delays_cs=[5, 6, 7, 8, 9])
    df = spark.createDataFrame(pd.DataFrame(
        {"media_ref": ["anim", "junk"],
         "media_bytes": [blob, b"\x00not-media"]}))
    out = sample_media_frames(df, stride=2, max_frames=8).collect()
    rows = {(r.media_ref, r.frame_idx): r for r in out}
    assert set(rows) == {("anim", 0), ("anim", 2), ("anim", 4),
                         ("junk", 0)}
    for fi in (0, 2, 4):
        r = rows[("anim", fi)]
        assert r.decode_ok and r.delay_cs == 5 + fi
        want = pixel_features(pal[frames[fi]], 16)
        got = [float(x) for x in r.feature]
        assert got == pytest.approx([np.float32(v) for v in want])
    assert rows[("junk", 0)].decode_ok is False


def test_frames_bomb_guards_count_and_pixel_budget():
    """Untrusted-input discipline: >4096 frames raises, and a stream
    whose snapshot TOTAL would exceed the single-image pixel budget
    raises before allocating it (a tiny payload cannot multiply a big
    canvas into an unbounded allocation)."""
    from geoparser_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_anim,
    )

    pal = _pal16()
    many = [np.zeros((1, 1), dtype=np.uint8)] * 4097
    blob = encode_gif_anim(many, pal, screen=(1, 1))
    with pytest.raises(ValueError, match="frame count"):
        decode_gif_frames(blob)
    # 70 one-pixel frames on a 1000x1000 screen: 70M snapshot pixels
    # against the 64M budget
    few = [np.zeros((1, 1), dtype=np.uint8)] * 70
    blob2 = encode_gif_anim(few, pal, screen=(1000, 1000))
    with pytest.raises(ValueError, match="pixel budget"):
        decode_gif_frames(blob2)
    # max_frames caps the walk BEFORE the budget trips
    assert len(decode_gif_frames(blob2, max_frames=8)) == 8


def test_decode_gif_honors_frame1_transparency():
    """decode_gif (= frame 1 of the walker) leaves the background
    visible through GCE-transparent pixels, as viewers do."""
    from geoparser_spark.operators.gif_codec import (
        decode_gif,
        encode_gif_anim,
    )

    pal = _pal16()
    over = np.array([[8, 15], [15, 8]], dtype=np.uint8)
    blob = encode_gif_anim([over], pal, transparents=[15], bg=2)
    out = decode_gif(blob)
    assert np.array_equal(out[0, 0], pal[8])
    assert np.array_equal(out[0, 1], pal[2])   # bg shows through
