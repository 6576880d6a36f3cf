"""Multimodal column plumbing: opaque binary media + typed metadata.

The sandbox has no image/audio codecs, so the decode kernels are
deterministic STUBS (clearly marked) — but every Spark-side piece is
real and tested: schemas, Arrow batch shapes, partitioning, the
mapInPandas signatures a production decoder would drop into.

Pattern: media rows carry (media_ref, media_bytes: binary, media_meta:
struct).  Kernels run in ``mapInPandas`` so a real decoder (PIL/ffmpeg)
processes whole Arrow batches, never row-at-a-time Python.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("delay_cs", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)



#: decode failures that DEGRADE to the stub path — a codec kernel must
#: never kill the Arrow task; every decode site catches exactly this
_DEGRADE_ERRORS = (ValueError, NotImplementedError, OSError, zlib.error,
                   struct.error, IndexError, MemoryError)

def _stub_feature(payload: bytes, dim: int = 16) -> list[float]:
    """DETERMINISTIC FAKE featurizer: sha256 bytes → unit-norm floats.
    A real model replaces this one function; batch plumbing unchanged."""
    h = hashlib.sha256(payload or b"").digest()
    v = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = v.astype(np.float64)
    nrm = np.linalg.norm(v) or 1.0
    return [float(x) for x in v / nrm]


def decode_image(payload: bytes) -> "object":
    """Image decode: PNG, GIF, JPEG and TIFF are REAL (pure
    stdlib+numpy — operators/png_codec zlib inflate + scanline
    unfilter; operators/gif_codec LZW + palette + de-interlace;
    operators/jpeg_codec Huffman entropy decode + FIXED-POINT integer
    IDCT, bit-deterministic per ISO 10918-1; operators/tiff_codec
    strip assembly + PackBits/TIFF-LZW/Deflate + predictor — each
    returns an (H, W[, C]) uint8 numpy array; PNG covers every
    spec-legal depth and Adam7; JPEG covers baseline AND progressive
    DCT; TIFF covers chunky strips at every depth plus 8-bit tiled
    and planar-configuration-2 layouts, the three CCITT fax
    compressions (MH/G3-1D/G4, operators/ccitt_codec, FillOrder 2
    honored) AND new-style JPEG-in-TIFF (compression 7, JPEGTables
    merge); operators/bmp_codec
    covers palette/truecolor/RLE and masked 16/32-bit BITFIELDS BMP).
    Arithmetic-coded/12-bit/hierarchical JPEG, sub-byte/16-bit
    tiled-or-planar TIFF, 2-D-extended Group 3 and old-style
    JPEG-in-TIFF (compression 6) raise
    NotImplementedError (degrade contract); other formats
    (WEBP pixels/...) stay the documented decoder seam — WebP DIMS
    parse header-only in operators/image_meta."""
    from geoparser_spark.operators import (bmp_codec, gif_codec,
                                           jpeg_codec, png_codec,
                                           tiff_codec)

    if isinstance(payload, (bytes, bytearray)):
        raw = bytes(payload)
        if raw.startswith(png_codec.PNG_SIG):
            return png_codec.decode_png(raw)
        if raw[:6] in gif_codec.GIF_SIGS:
            return gif_codec.decode_gif(raw)
        if raw.startswith(jpeg_codec.JPEG_SIG):
            return jpeg_codec.decode_jpeg(raw)
        if raw[:4] in tiff_codec.TIFF_SIGS:
            return tiff_codec.decode_tiff(raw)
        if raw.startswith(bmp_codec.BMP_SIG):
            return bmp_codec.decode_bmp(raw)
    raise NotImplementedError(
        "only PNG/GIF/JPEG (baseline + progressive DCT)/TIFF (strips "
        "+ 8-bit tiles/planar)/"
        "BMP pixels decode in-sandbox; other formats are the documented "
        "decoder seam (see module docstring)")


def extract_media_features(media: DataFrame, dim: int = 16,
                           bytes_col: str = "media_bytes",
                           ref_col: str = "media_ref") -> DataFrame:
    """media(media_ref, media_bytes, ...) → (media_ref, feature[dim],
    decode_ok).  Arrow-batched.  PNG, GIF, JPEG (baseline +
    progressive DCT) and TIFF (chunky strips at every depth,
    8-bit tiled/planar, CCITT fax) payloads
    decode to REAL pixels and emit real integer-exact pixel statistics
    (png_codec.pixel_features — dims, per-channel mean/variance,
    intensity histogram, each an integer aggregate + one IEEE division
    so a pure-Python oracle reproduces them bit-for-bit; JPEG pixels
    themselves are bit-deterministic via the fixed-point integer IDCT);
    everything else goes through the clearly-marked deterministic
    _stub_feature with decode_ok=False (the embedding-model seam)."""
    from geoparser_spark.operators import (bmp_codec, gif_codec,
                                           jpeg_codec, png_codec,
                                           tiff_codec)

    def one(b, dim=dim):

        payload = bytes(b) if isinstance(b, (bytes, bytearray)) else b""
        is_png = payload.startswith(png_codec.PNG_SIG)
        is_jpeg = payload.startswith(jpeg_codec.JPEG_SIG)
        is_tiff = payload[:4] in tiff_codec.TIFF_SIGS
        is_bmp = payload.startswith(bmp_codec.BMP_SIG)
        if (is_png or is_jpeg or is_tiff or is_bmp
                or payload[:6] in gif_codec.GIF_SIGS):
            # decode AND featurize inside the guard: a corrupt IDAT
            # raises zlib.error, an out-of-range palette index
            # IndexError, a truncated LZW stream ValueError, an
            # arithmetic-coded JPEG or JPEG-in-TIFF NotImplementedError
            # — damaged or unsupported input must degrade to the stub
            # path (decode_ok=False), never kill the Arrow task
            try:
                img = (png_codec.decode_png(payload) if is_png
                       else jpeg_codec.decode_jpeg(payload) if is_jpeg
                       else tiff_codec.decode_tiff(payload) if is_tiff
                       else bmp_codec.decode_bmp(payload) if is_bmp
                       else gif_codec.decode_gif(payload))
                return png_codec.pixel_features(img, dim), True
            except _DEGRADE_ERRORS:
                return _stub_feature(payload, dim), False
        return _stub_feature(payload, dim), False

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [one(b) for b in pdf[bytes_col]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "feature": [f for f, _ in pairs],
                    "decode_ok": [ok for _, ok in pairs],
                }
            )

    return media.select(ref_col, bytes_col).mapInPandas(kernel, schema=FEATURE_SCHEMA)


META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_texts", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def sample_media_frames(media: DataFrame, stride: int = 2,
                        max_frames: int = 8, dim: int = 16,
                        bytes_col: str = "media_bytes",
                        ref_col: str = "media_ref") -> DataFrame:
    """media(media_ref, media_bytes) → one row per SAMPLED frame
    (media_ref, frame_idx, delay_cs, feature[dim], decode_ok) — the
    frame-sampling stage a video training pipeline needs, REAL for
    animated GIF: gif_codec.decode_gif_frames composites every frame
    (disposal methods, transparency, local palettes, offsets) and
    every ``stride``-th canvas snapshot is featurized with the same
    integer-exact pixel statistics as extract_media_features, so a
    pattern replica can value-check the whole path.  Non-GIF payloads
    (real video containers need a codec stack this sandbox lacks) and
    damaged streams degrade to ONE stub row with decode_ok=False —
    never a killed Arrow task.

    Compositing is stateful, so the walker must decode every frame up
    to the last sampled one: the decode cost is bounded by
    (max_frames-1)*stride + 1 frames per payload, and the Arrow batch
    shape (a generator per batch) is exactly what a real video
    frame-extractor would use at 100 TB."""
    from geoparser_spark.operators import gif_codec, png_codec

    walk_limit = (max_frames - 1) * stride + 1

    def one(ref, b):

        payload = bytes(b) if isinstance(b, (bytes, bytearray)) else b""
        if payload[:6] in gif_codec.GIF_SIGS:
            try:
                frames = gif_codec.decode_gif_frames(
                    payload, max_frames=walk_limit)
                return [
                    (ref, fi, int(frames[fi][0]),
                     png_codec.pixel_features(frames[fi][1], dim), True)
                    for fi in range(0, len(frames), stride)
                ][:max_frames]
            except _DEGRADE_ERRORS:
                pass
        return [(ref, 0, 0, _stub_feature(payload, dim), False)]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, b in zip(pdf[ref_col], pdf[bytes_col]):
                rows.extend(one(ref, b))
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "delay_cs",
                               "feature", "decode_ok"])

    return media.select(ref_col, bytes_col).mapInPandas(
        kernel, schema=FRAME_SCHEMA)


def extract_audio_features(media: DataFrame, dim: int = 8,
                           bytes_col: str = "media_bytes",
                           ref_col: str = "media_ref") -> DataFrame:
    """media(media_ref, media_bytes) → (media_ref, feature[dim],
    decode_ok) — the AUDIO twin of extract_media_features, REAL for
    integer PCM, IEEE-float PCM, WAVE_FORMAT_EXTENSIBLE, IMA ADPCM,
    MS-ADPCM and G.711 µ-law/A-law WAV, and for FLAC (full baseline
    frame decode, flac_codec.decode_flac):
    the sample stream decodes to a
    16-bit-equivalent integer domain and pcm_features computes
    integer-exact signal statistics (duration, channels, rate, mean,
    energy, zero-cross ratio, peak, nonzero ratio), so a pure-Python
    pattern replica value-checks the whole path.  Remaining formats
    (MP3, lossy codecs — the ASR/codec seam) and damaged streams
    degrade to the stub with decode_ok=False."""
    from geoparser_spark.operators import audio_meta, flac_codec

    def one(b, dim=dim):

        payload = bytes(b) if isinstance(b, (bytes, bytearray)) else b""
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            try:
                sr, frames = audio_meta.decode_wav_pcm(payload)
                return audio_meta.pcm_features(sr, frames, dim), True
            except _DEGRADE_ERRORS:
                return _stub_feature(payload, dim), False
        if payload[:4] == b"fLaC":
            try:
                sr, frames = flac_codec.decode_flac(payload)
                return audio_meta.pcm_features(sr, frames, dim), True
            except _DEGRADE_ERRORS:
                return _stub_feature(payload, dim), False
        return _stub_feature(payload, dim), False

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [one(b) for b in pdf[bytes_col]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "feature": [f for f, _ in pairs],
                    "decode_ok": [ok for _, ok in pairs],
                }
            )

    return media.select(ref_col, bytes_col).mapInPandas(
        kernel, schema=FEATURE_SCHEMA)


PLAN_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("sample_idx", T.IntegerType()),
        T.StructField("dts_ms", T.LongType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("byte_size", T.IntegerType()),
        T.StructField("is_sync", T.BooleanType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def plan_video_samples(media: DataFrame, sync_only: bool = False,
                       bytes_col: str = "media_bytes",
                       ref_col: str = "media_ref") -> DataFrame:
    """media(media_ref, media_bytes) → one row per video sample
    (media_ref, sample_idx, dts_ms, byte_offset, byte_size, is_sync,
    decode_ok) — the frame-FETCH plan a distributed video pipeline
    computes before any codec: video_meta.parse_sample_table decodes
    the MP4 stbl boxes (stsz/stts/stsc/stco/co64/stss) into byte
    ranges + timestamps + sync flags, so a downstream stage can
    ranged-read exactly the keyframes it wants (``sync_only=True``)
    from object storage without touching the rest of a multi-GB file.
    The sample DECODE stays the documented codec seam; non-MP4 or
    damaged payloads degrade to one stub row with decode_ok=False,
    and a VALID table that yields zero rows (no samples, or no
    keyframes under ``sync_only``) emits one sample_idx=-1 row with
    decode_ok=True so row accounting against the input never loses a
    media_ref."""
    from geoparser_spark.operators import video_meta

    def one(ref, b):
        payload = bytes(b) if isinstance(b, (bytes, bytearray)) else b""
        # same MP4 sniff as parse_mp4: ftyp found by the box walk, not
        # required to be the literal first box
        if (len(payload) >= 8
                and video_meta._find(payload, 0, len(payload),
                                     b"ftyp") is not None):
            try:
                plan = video_meta.parse_sample_table(payload)
                rows = [(ref, k, dts, off, sz, sync, True)
                        for k, dts, off, sz, sync in plan
                        if sync or not sync_only]
                return rows or [(ref, -1, 0, 0, 0, False, True)]
            except _DEGRADE_ERRORS:
                pass
        return [(ref, 0, 0, 0, 0, False, False)]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, b in zip(pdf[ref_col], pdf[bytes_col]):
                rows.extend(one(ref, b))
            yield pd.DataFrame(
                rows, columns=["media_ref", "sample_idx", "dts_ms",
                               "byte_offset", "byte_size", "is_sync",
                               "decode_ok"])

    return media.select(ref_col, bytes_col).mapInPandas(
        kernel, schema=PLAN_SCHEMA)


def extract_media_meta(media: DataFrame,
                       bytes_col: str = "media_bytes",
                       ref_col: str = "media_ref") -> DataFrame:
    """media(media_ref, media_bytes) → (media_ref, mime, width, height,
    n_texts, decode_ok).

    Unlike the featurizer (whose pixel decode is a sandbox stub), this
    path is REAL end-to-end: PNG/JPEG/GIF container headers carry
    dimensions and embedded text without any codec
    (operators/image_meta parses them from the public specs).  This is
    the Tika image-metadata surface of the reference
    (geoparser_app/views.py:125) as an Arrow-batched stage."""
    from geoparser_spark.operators.image_meta import parse_image_meta

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, ws, hs, nt, ok = [], [], [], [], []
            for b in pdf[bytes_col]:
                meta = (parse_image_meta(bytes(b))
                        if isinstance(b, (bytes, bytearray)) else None)
                if meta is None:
                    mimes.append(None); ws.append(None); hs.append(None)
                    nt.append(None); ok.append(False)
                else:
                    fmt, w, h, texts = meta
                    mimes.append(f"image/{fmt}"); ws.append(w); hs.append(h)
                    nt.append(len(texts)); ok.append(True)
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "mime": mimes,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_texts": pd.array(nt, dtype="Int32"),
                    "decode_ok": ok,
                }
            )

    return media.select(ref_col, bytes_col).mapInPandas(kernel, schema=META_SCHEMA)


GPS_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("has_gps", T.BooleanType()),
    ]
)


def extract_image_gps(media: DataFrame,
                      bytes_col: str = "media_bytes",
                      ref_col: str = "media_ref") -> DataFrame:
    """media(media_ref, media_bytes) → (media_ref, latitude, longitude,
    has_gps) from JPEG EXIF GPS IFDs — REAL end-to-end, no codec.

    This is the most GeoParser-shaped media path there is: the
    reference geotags whatever text/metadata Tika surfaces
    (geoparser_app/views.py:125); a GPS-bearing photo carries its
    ground-truth point directly, and the output here feeds the same
    (latitude, longitude) tiles/serving operators as text geotags."""
    from geoparser_spark.operators.image_meta import parse_exif_gps

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lats, lons, ok = [], [], []
            for b in pdf[bytes_col]:
                got = (parse_exif_gps(bytes(b))
                       if isinstance(b, (bytes, bytearray)) else None)
                if got is None:
                    lats.append(None); lons.append(None); ok.append(False)
                else:
                    lats.append(got[0]); lons.append(got[1]); ok.append(True)
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "latitude": pd.array(lats, dtype="Float64"),
                    "longitude": pd.array(lons, dtype="Float64"),
                    "has_gps": ok,
                }
            )

    return media.select(ref_col, bytes_col).mapInPandas(kernel, schema=GPS_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BooleanType()),
    ]
)


def _stub_resize(payload: bytes, w: int, h: int) -> bytes:
    """DETERMINISTIC FAKE resize: tags the payload with the target box
    and truncates proportionally.  A real implementation swaps in
    PIL/turbojpeg here; the batch plumbing (schema, Arrow batches,
    partitioning) is what this repo ships and tests."""
    header = f"RSZ:{w}x{h}:".encode()
    keep = max(1, min(len(payload), (len(payload) * w * h) // (w * h + 1) or 1))
    return header + (payload or b"")[:keep]


def resize_images(media: DataFrame, max_w: int = 256, max_h: int = 256,
                  bytes_col: str = "media_bytes",
                  ref_col: str = "media_ref") -> DataFrame:
    """media(media_ref, media_bytes, media_meta) → resized rows with
    box-fitted dimensions (aspect preserved, never upscaled).  PNG
    payloads are REALLY resampled (nearest-neighbor over decoded
    pixels, re-encoded as PNG — operators/png_codec, round-trip
    pinned in tests); other formats go through the clearly-marked
    _stub_resize seam.  Dimension math and Arrow batch plumbing are
    shared by both paths."""
    from geoparser_spark.operators import png_codec

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, outs, flags = [], [], [], []
            for b, meta in zip(pdf[bytes_col], pdf["media_meta"]):

                payload = bytes(b) if isinstance(b, (bytes, bytearray)) else b""
                out_bytes = None
                w0 = h0 = None
                if payload.startswith(png_codec.PNG_SIG):
                    # the whole real path is guarded: decode can raise
                    # zlib.error on a corrupt IDAT, and any decode/
                    # resample/encode surprise must fall back to the
                    # stub, never kill the Arrow task
                    try:
                        img = png_codec.decode_png(payload)
                        h0, w0 = img.shape[:2]
                        scale = min(max_w / max(w0, 1),
                                    max_h / max(h0, 1), 1.0)
                        w1 = max(int(w0 * scale), 1)
                        h1 = max(int(h0 * scale), 1)
                        out_bytes = png_codec.encode_png(
                            png_codec.resize_nearest(img, w1, h1))
                    except _DEGRADE_ERRORS:
                        out_bytes = None
                if out_bytes is None:
                    w0 = (meta or {}).get("width") or max_w
                    h0 = (meta or {}).get("height") or max_h
                    scale = min(max_w / max(w0, 1), max_h / max(h0, 1),
                                1.0)
                    w1 = max(int(w0 * scale), 1)
                    h1 = max(int(h0 * scale), 1)
                    out_bytes = _stub_resize(payload, w1, h1)
                outs.append(out_bytes)
                ws.append(w1)
                hs.append(h1)
                flags.append(scale < 1.0)
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "media_bytes": outs,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "resized": flags,
                }
            )

    return media.select(ref_col, bytes_col, "media_meta").mapInPandas(
        kernel, schema=RESIZE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    (media_ref, frame_idx, ts_ms) from duration metadata — pure SQL.
    The decode of each frame is the stubbed kernel above."""
    from pyspark.sql import functions as F

    n_frames = F.greatest(
        (F.col("media_meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.select(
        "media_ref",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_idx", "ts_ms"),
    )


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_texts", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def extract_audio_meta(media: DataFrame,
                       bytes_col: str = "media_bytes",
                       ref_col: str = "media_ref") -> DataFrame:
    """media(media_ref, media_bytes) → (media_ref, mime, sample_rate,
    channels, bits, duration_ms, n_texts, decode_ok).

    Like :func:`extract_media_meta` this path is REAL end-to-end: WAV
    (RIFF) and FLAC container metadata carries stream parameters and
    embedded tags without any codec (operators/audio_meta parses them
    from the public specs).  This is the Tika audio-metadata surface of
    the reference (geoparser_app/views.py:125) as an Arrow-batched
    stage."""
    from geoparser_spark.operators.audio_meta import parse_audio_meta

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, srs, chs, bts, durs, nt, ok = [], [], [], [], [], [], []
            for b in pdf[bytes_col]:
                meta = (parse_audio_meta(bytes(b))
                        if isinstance(b, (bytes, bytearray)) else None)
                if meta is None:
                    mimes.append(None); srs.append(None); chs.append(None)
                    bts.append(None); durs.append(None); nt.append(None)
                    ok.append(False)
                else:
                    fmt, sr, ch, bits, ms, texts = meta
                    mimes.append({"wav": "audio/x-wav",
                                  "flac": "audio/flac",
                                  "mp3": "audio/mpeg"}[fmt])
                    srs.append(sr); chs.append(ch); bts.append(bits)
                    durs.append(ms); nt.append(len(texts)); ok.append(True)
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "mime": mimes,
                    "sample_rate": pd.array(srs, dtype="Int32"),
                    "channels": pd.array(chs, dtype="Int32"),
                    "bits": pd.array(bts, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                    "n_texts": pd.array(nt, dtype="Int32"),
                    "decode_ok": ok,
                }
            )

    return media.select(ref_col, bytes_col).mapInPandas(
        kernel, schema=AUDIO_META_SCHEMA)


def clip_sample_plan(media: DataFrame, clip_ms: int = 5000) -> DataFrame:
    """Audio clip-sampling *plan*: one output row per planned clip
    (media_ref, clip_idx, start_ms, end_ms) from duration metadata —
    pure SQL, the audio analogue of :func:`frame_sample_plan`.  The
    last clip is truncated to the stream end; zero-length streams get
    one empty probe clip (an ASR stage still wants one batch entry per
    stream to record its verdict)."""
    from pyspark.sql import functions as F

    dur = F.col("media_meta.duration_ms").cast("long")
    n_clips = F.greatest(
        F.ceil(dur / F.lit(clip_ms)).cast("int"), F.lit(1)
    )
    return media.select(
        "media_ref",
        dur.alias("_dur"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_clips - 1),
                lambda i: (i * clip_ms).cast("long"),
            )
        ).alias("clip_idx", "start_ms"),
    ).select(
        "media_ref",
        "clip_idx",
        "start_ms",
        F.least(F.col("start_ms") + clip_ms, F.col("_dur")).alias("end_ms"),
    )


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_texts", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def extract_video_meta(media: DataFrame,
                       bytes_col: str = "media_bytes",
                       ref_col: str = "media_ref") -> DataFrame:
    """media(media_ref, media_bytes) → (media_ref, mime, brand, width,
    height, duration_ms, n_texts, decode_ok).

    The video sibling of :func:`extract_audio_meta`, REAL end-to-end:
    MP4/ISO-BMFF container metadata (operators/video_meta parses ftyp,
    mvhd, the video track's tkhd and ilst tags from the public spec) —
    no codec anywhere; frame decode stays the documented stub."""
    from geoparser_spark.operators.video_meta import parse_mp4

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            brands, ws, hs, durs, nt, ok = [], [], [], [], [], []
            for b in pdf[bytes_col]:
                meta = (parse_mp4(bytes(b))
                        if isinstance(b, (bytes, bytearray)) else None)
                if meta is None:
                    brands.append(None); ws.append(None); hs.append(None)
                    durs.append(None); nt.append(None); ok.append(False)
                else:
                    brand, w, h, ms, texts = meta
                    brands.append(brand); ws.append(w); hs.append(h)
                    durs.append(ms); nt.append(len(texts)); ok.append(True)
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "mime": ["video/mp4" if o else None for o in ok],
                    "brand": brands,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                    "n_texts": pd.array(nt, dtype="Int32"),
                    "decode_ok": ok,
                }
            )

    return media.select(ref_col, bytes_col).mapInPandas(
        kernel, schema=VIDEO_META_SCHEMA)
