"""FLAC frame codec: round-trips, stereo decorrelation, Rice
partitions, wasted bits, CRC/degrade contract, and the Arrow operator
path through extract_audio_features."""

import numpy as np
import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from geoparser_spark.operators.flac_codec import (
    _crc8,
    _crc16,
    decode_flac,
    make_flac,
)


def _expected_16bit(s, bps):
    if bps < 16:
        return s << (16 - bps)
    if bps > 16:
        return s >> (bps - 16)
    return s


def test_flac_roundtrip_matrix():
    rng = np.random.RandomState(3)
    for bps in (8, 16, 24):
        lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
        for ch in (1, 2):
            for mode in ("verbatim", "fixed", "lpc"):
                s = rng.randint(lo, hi + 1, size=(300, ch)).astype(np.int64)
                sr, got = decode_flac(make_flac(s, 8000, bps=bps, mode=mode))
                assert sr == 8000
                assert got.shape == (300, ch)
                assert (got == _expected_16bit(s, bps)).all(), (bps, ch, mode)


def test_flac_stereo_decorrelation_lossless():
    rng = np.random.RandomState(5)
    s = rng.randint(-32768, 32768, size=(777, 2)).astype(np.int64)
    for sm in ("left_side", "right_side", "mid_side"):
        for mode in ("verbatim", "fixed", "lpc"):
            _, got = decode_flac(
                make_flac(s, 44100, mode=mode, stereo_mode=sm))
            assert (got == s).all(), (sm, mode)


def test_flac_rice_partitions_and_multiframe():
    # 512 samples at block_size 256 -> two frames; partition orders
    # 1-3 split each block's residual
    s = (1000 * np.sin(np.arange(512) / 9)).astype(np.int64)[:, None]
    for po in (0, 1, 2, 3):
        blob = make_flac(s, 8000, mode="fixed", block_size=256,
                         partition_order=po)
        _, got = decode_flac(blob)
        assert (got[:, 0] == s[:, 0]).all(), po


def test_flac_wasted_bits_roundtrip():
    rng = np.random.RandomState(7)
    # every sample a multiple of 16 -> 4 wasted bits detected + coded
    s = (rng.randint(-2048, 2048, size=(300, 1)) * 16).astype(np.int64)
    blob = make_flac(s, 8000, mode="fixed")
    _, got = decode_flac(blob)
    assert (got[:, 0] == s[:, 0]).all()


def test_flac_constant_and_tiny_streams():
    for v in (0, -5, 1234):
        s = np.full((100, 1), v, dtype=np.int64)
        _, got = decode_flac(make_flac(s, 8000))
        assert (got[:, 0] == v).all()
    rng = np.random.RandomState(9)
    for n in (1, 2, 5):
        s = rng.randint(-32768, 32768, size=(n, 1)).astype(np.int64)
        _, got = decode_flac(make_flac(s, 8000, mode="fixed"))
        assert got.shape == (n, 1)
        assert (got[:, 0] == s[:, 0]).all()


def test_flac_actually_compresses_smooth_signal():
    # the point of the fixed predictor + Rice path: a linear ramp
    # codes to far fewer bytes than verbatim
    s = np.arange(-500, 500, dtype=np.int64)[:, None]
    fixed = make_flac(s, 8000, mode="fixed")
    verb = make_flac(s, 8000, mode="verbatim")
    assert len(fixed) < len(verb) / 4
    for blob in (fixed, verb):
        _, got = decode_flac(blob)
        assert (got[:, 0] == s[:, 0]).all()


def test_flac_crc_pins():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 published check values
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_flac_bitflip_never_silently_corrupts():
    rng = np.random.RandomState(11)
    s = rng.randint(-32768, 32768, size=(400, 2)).astype(np.int64)
    blob = bytearray(make_flac(s, 8000, mode="fixed",
                               stereo_mode="mid_side"))
    undetected = 0
    for _ in range(150):
        pos = rng.randint(0, len(blob))
        b2 = bytearray(blob)
        b2[pos] ^= 1 << rng.randint(0, 8)
        try:
            _, got = decode_flac(bytes(b2))
            # a surviving decode must be identical (flip landed in
            # ignored metadata: md5 / min-max framesize)
            if got.shape != (400, 2) or not (got == s).all():
                undetected += 1
        except ValueError:
            pass
    assert undetected == 0


def test_flac_truncation_and_garbage_degrade():
    rng = np.random.RandomState(13)
    s = rng.randint(-32768, 32768, size=(300, 1)).astype(np.int64)
    blob = make_flac(s, 8000)
    for cut in range(1, len(blob), 53):
        with pytest.raises(ValueError):
            decode_flac(blob[:cut])
    with pytest.raises(ValueError):
        decode_flac(b"RIFF not flac")
    for _ in range(60):
        raw = bytes(rng.randint(0, 256, size=rng.randint(0, 200),
                                dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_flac(b"fLaC" + raw)


def test_flac_frame_bps_mismatch_guard():
    # a frame claiming a different sample size than STREAMINFO would
    # decode its bits but mis-scale the 16-bit-equivalent mapping —
    # the decoder refuses instead
    from geoparser_spark.operators.flac_codec import _crc8

    s = np.arange(-40, 40, dtype=np.int64)[:, None]
    blob = bytearray(make_flac(s, 8000, bps=8))
    fh = 42                               # fLaC(4) + hdr(4) + STREAMINFO(34)
    assert blob[fh] == 0xFF
    b3 = blob[fh + 3]
    assert (b3 >> 1) & 7 == 1             # ss_code for bps 8
    blob[fh + 3] = (b3 & ~0x0E) | (4 << 1)   # claim bps 16
    blob[fh + 9] = _crc8(bytes(blob[fh:fh + 9]))  # keep CRC-8 valid
    with pytest.raises(ValueError, match="differs from STREAMINFO"):
        decode_flac(bytes(blob))


def test_flac_fixture_validation():
    s = np.zeros((10, 1), dtype=np.int64)
    with pytest.raises(ValueError, match="bits per sample"):
        make_flac(s, 8000, bps=13)
    with pytest.raises(ValueError, match="out of range"):
        make_flac(np.full((10, 1), 200, dtype=np.int64), 8000, bps=8)
    with pytest.raises(ValueError, match="sample rate"):
        make_flac(s, 0)
    with pytest.raises(ValueError, match="stereo_mode"):
        make_flac(s, 8000, stereo_mode="mid_side")
    with pytest.raises(ValueError, match="at least one frame"):
        make_flac(np.zeros((0, 1), dtype=np.int64), 8000)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 400),
    ch=st.integers(1, 2),
    mode=st.sampled_from(["verbatim", "fixed", "lpc"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_hypothesis(n, ch, mode, seed):
    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int64)
    sr, got = decode_flac(make_flac(s, 22050, mode=mode, block_size=64))
    assert sr == 22050
    assert got.shape == (n, ch)
    assert (got == s).all()


def test_flac_through_audio_features_operator(spark):
    from pyspark.sql import functions as F

    from geoparser_spark.operators.audio_meta import pcm_features
    from geoparser_spark.operators.multimodal import extract_audio_features

    rng = np.random.RandomState(17)
    s = rng.randint(-32768, 32768, size=(250, 1)).astype(np.int64)
    blob = make_flac(s, 16000, mode="fixed")
    media = spark.createDataFrame(
        [("flac://1", bytearray(blob)),
         ("bad://1", bytearray(b"fLaC" + b"\x00" * 10))],
        "media_ref string, media_bytes binary")
    rows = {r["media_ref"]: r for r in
            extract_audio_features(media, dim=8).collect()}
    assert rows["flac://1"]["decode_ok"] is True
    exp = pcm_features(16000, s.reshape(250, 1), 8)
    got = [float(v) for v in rows["flac://1"]["feature"]]
    assert got == pytest.approx([float(np.float32(v)) for v in exp])
    assert rows["bad://1"]["decode_ok"] is False
