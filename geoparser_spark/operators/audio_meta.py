"""Audio byte-stream parsing: container metadata + embedded text, no codec.

Reference parity: GeoParser feeds any uploaded file through Tika
auto-detect (/root/reference/geoparser_app/views.py:125); for audio
containers Tika surfaces stream metadata (sample rate, channels,
duration) and embedded tags, which flow into the index like any other
document field.  This module reproduces that surface from the public
container specs — WAV (RIFF/WAVE, the Microsoft/IBM multimedia spec:
``fmt `` / ``data`` / ``LIST INFO`` chunks) and FLAC (xiph.org format
spec: STREAMINFO + VORBIS_COMMENT metadata blocks) — with pure stdlib
parsing.  The PCM/FLAC frame codec itself is NOT needed for any of it.

Span contract for an ``audio_bytes`` input span (base64 payload):
  * one media span ("audio", None, "aud://{fmt}/{rate}Hz/{ch}ch/{ms}ms")
    carrying the parsed stream parameters in the media_ref, then
  * one text span per embedded tag value, in byte order: WAV LIST-INFO
    values (INAM/IART/ICMT/...), FLAC Vorbis-comment values.  This is
    the channel a production transcription stage (the audio analogue of
    OCR) would also write into — see :func:`transcribe_audio`.
Degrade contract: unrecognized or truncated payloads yield [] — never
an exception out of the extract stage.
"""

from __future__ import annotations

import base64
import binascii
import struct

# LIST-INFO sub-chunks whose payload is human text (RIFF spec §INFO).
_INFO_TEXT_IDS = frozenset(
    {b"INAM", b"IART", b"ICMT", b"ICOP", b"ISBJ", b"IGNR", b"IKEY"}
)


def _norm(s: str) -> str:
    return " ".join(s.split())


def _iter_riff_chunks(raw: bytes):
    """Yield (chunk_id, body, declared_size, truncated) over a RIFF
    stream from byte 12 on — the ONE chunk walk shared by the tolerant
    metadata parser (parse_wav, which reports the DECLARED data size so
    a truncated payload still yields the stream's nominal duration) and
    the strict sample decoder (decode_wav_pcm, which rejects truncated
    fmt/data chunks): body is clipped to the stream when the declared
    size overruns it.  Chunk sizes are word-aligned per the RIFF spec
    (odd sizes are followed by a pad byte)."""
    i, n = 12, len(raw)
    while i + 8 <= n:
        cid = raw[i:i + 4]
        (size,) = struct.unpack("<I", raw[i + 4:i + 8])
        yield cid, raw[i + 8:i + 8 + size], size, i + 8 + size > n
        i += 8 + size + (size & 1)


def parse_wav(raw: bytes) -> tuple[int, int, int, int, list[str]] | None:
    """RIFF/WAVE chunk walk → (sample_rate, channels, bits, duration_ms,
    texts) or None.

    Duration comes from the declared ``data`` size over the ``fmt ``
    byte rate (what ffprobe/Tika report), so a truncated payload still
    yields the stream's nominal duration.  Chunk sizes are word-aligned
    per the RIFF spec (odd sizes are followed by a pad byte).
    """
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    sample_rate = channels = bits = byte_rate = None
    data_size = 0
    texts: list[str] = []
    for cid, body, size, _truncated in _iter_riff_chunks(raw):
        if cid == b"fmt " and len(body) >= 16:
            (_fmt_tag, channels, sample_rate, byte_rate,
             _block_align, bits) = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_size = size
        elif cid == b"LIST" and body[:4] == b"INFO":
            j = 4
            while j + 8 <= len(body):
                scid = body[j:j + 4]
                (ssz,) = struct.unpack("<I", body[j + 4:j + 8])
                val = body[j + 8:j + 8 + ssz].split(b"\x00")[0]
                if scid in _INFO_TEXT_IDS:
                    t = val.decode("utf-8", "replace")
                    if t:
                        texts.append(t)
                j += 8 + ssz + (ssz & 1)
    if not sample_rate or not byte_rate:
        return None
    duration_ms = data_size * 1000 // byte_rate
    return int(sample_rate), int(channels), int(bits), int(duration_ms), texts


def parse_flac(raw: bytes) -> tuple[int, int, int, int, list[str]] | None:
    """FLAC metadata-block walk → (sample_rate, channels, bits,
    duration_ms, texts) or None.

    STREAMINFO packs sample-rate(20) channels-1(3) bits-1(5)
    total-samples(36) big-endian in bytes 10..17; VORBIS_COMMENT is the
    little-endian Vorbis tag list ("KEY=value" UTF-8 entries).
    """
    if len(raw) < 8 or raw[:4] != b"fLaC":
        return None
    sr = ch = bits = None
    total_samples = 0
    texts: list[str] = []
    i = 4
    n = len(raw)
    while i + 4 <= n:
        hdr = raw[i]
        last = hdr & 0x80
        btype = hdr & 0x7F
        blen = int.from_bytes(raw[i + 1:i + 4], "big")
        body = raw[i + 4:i + 4 + blen]
        if len(body) < blen:
            break  # truncated block: keep what we have
        if btype == 0 and blen >= 18:  # STREAMINFO
            packed = int.from_bytes(body[10:18], "big")
            sr = packed >> 44
            ch = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total_samples = packed & ((1 << 36) - 1)
        elif btype == 4 and blen >= 8:  # VORBIS_COMMENT
            (vlen,) = struct.unpack("<I", body[0:4])
            j = 4 + vlen
            if j + 4 <= blen:
                (cnt,) = struct.unpack("<I", body[j:j + 4])
                j += 4
                for _ in range(cnt):
                    if j + 4 > blen:
                        break
                    (clen,) = struct.unpack("<I", body[j:j + 4])
                    j += 4
                    entry = body[j:j + clen]
                    j += clen
                    _k, _, v = entry.partition(b"=")
                    t = v.decode("utf-8", "replace")
                    if t:
                        texts.append(t)
        i += 4 + blen
        if last:
            break
    if not sr:
        return None
    duration_ms = total_samples * 1000 // sr
    return int(sr), int(ch), int(bits), int(duration_ms), texts


def parse_audio_meta(
    raw: bytes,
) -> tuple[str, int, int, int, int, list[str]] | None:
    """(format, sample_rate, channels, bits, duration_ms, texts) or
    None if the stream is not a recognized audio container."""
    for fmt, parser in (("wav", parse_wav), ("flac", parse_flac)):
        try:
            got = parser(raw)
        except (struct.error, IndexError):
            got = None
        if got is not None:
            return (fmt, *got)
    return None


def extract_audio_spans(raw: bytes) -> list[tuple[str, str | None, str | None]]:
    """Audio bytes → extract-stage span triples (kind, text, media_ref)."""
    meta = parse_audio_meta(raw)
    if meta is None:
        return []
    fmt, sr, ch, _bits, ms, texts = meta
    out: list[tuple[str, str | None, str | None]] = [
        ("audio", None, f"aud://{fmt}/{sr}Hz/{ch}ch/{ms}ms")
    ]
    for t in texts:
        t = _norm(t)
        if t:
            out.append(("text", t, None))
    return out


def extract_audio_b64_spans(b64: str) -> list[tuple[str, str | None, str | None]]:
    """Base64-wrapped variant — ``audio_bytes`` span payloads carry the
    byte stream base64-encoded in ``text`` (FIXTURES.md §1)."""
    try:
        raw = base64.b64decode(b64, validate=False)
    except (binascii.Error, ValueError):
        return []
    return extract_audio_spans(raw)


def transcribe_audio(raw: bytes) -> str:
    """Real speech-to-text — NOT AVAILABLE in this container (no ASR
    engine).

    Raises NotImplementedError by design; a deployment wires an ASR
    model here and appends the result as a text span next to the
    embedded-tag spans above.  The batch plumbing that would carry its
    output is exactly the embedded-text path, which IS tested."""
    raise NotImplementedError("ASR engine not present in sandbox; see docstring")


# ---------------------------------------------------------------- fixtures


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def make_mini_wav(sample_rate: int = 8000, channels: int = 1,
                  bits: int = 8, n_frames: int = 0,
                  comments: list[str] = (), title: str | None = None) -> bytes:
    """Deterministic PCM WAV: fmt + optional LIST/INFO + silence data."""
    block_align = channels * (bits // 8)
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    chunks = _riff_chunk(b"fmt ", fmt)
    info = b""
    if title is not None:
        info += _riff_chunk(b"INAM", title.encode("utf-8") + b"\x00")
    for c in comments:
        info += _riff_chunk(b"ICMT", c.encode("utf-8") + b"\x00")
    if info:
        chunks += _riff_chunk(b"LIST", b"INFO" + info)
    chunks += _riff_chunk(b"data", b"\x00" * (n_frames * block_align))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _flac_block(btype: int, body: bytes, last: bool) -> bytes:
    return bytes([btype | (0x80 if last else 0)]) + len(body).to_bytes(3, "big") + body


def make_mini_flac(sample_rate: int = 8000, channels: int = 1,
                   bits: int = 16, n_samples: int = 0,
                   comments: list[str] = ()) -> bytes:
    """Deterministic FLAC metadata stream: STREAMINFO (+ VORBIS_COMMENT).

    Metadata-only (no audio frames): every field the parser reads lives
    in the metadata blocks, mirroring how tag readers treat FLAC."""
    packed = ((sample_rate << 44) | ((channels - 1) << 41)
              | ((bits - 1) << 36) | (n_samples & ((1 << 36) - 1)))
    streaminfo = (struct.pack(">HH", 16, 16) + b"\x00" * 6
                  + packed.to_bytes(8, "big") + b"\x00" * 16)
    blocks = []
    if comments:
        vendor = b"geoparser_spark"
        body = struct.pack("<I", len(vendor)) + vendor
        body += struct.pack("<I", len(comments))
        for c in comments:
            entry = ("COMMENT=" + c).encode("utf-8")
            body += struct.pack("<I", len(entry)) + entry
        blocks.append((4, body))
    out = b"fLaC" + _flac_block(0, streaminfo, last=not blocks)
    for k, (btype, body) in enumerate(blocks):
        out += _flac_block(btype, body, last=(k == len(blocks) - 1))
    return out


# ----------------------------------------------------------- PCM decode
# The metadata walk above needs no codec; PCM WAV *samples* decode with
# pure numpy — the REAL audio-sample path (the lossy-codec/ASR stack
# stays the documented seam, transcribe_audio above).

_MAX_SAMPLES = 256_000_000     # bomb guard: total samples per stream


def decode_wav_pcm(raw: bytes) -> tuple[int, "object"]:
    """PCM WAV bytes -> (sample_rate, (n_frames, channels) int32 array
    of 16-BIT-EQUIVALENT samples): 8-bit unsigned recenters and scales
    by 256 exactly, 16-bit passes through, 24/32-bit keep their top 16
    bits — one integer domain so a pure-Python replica reproduces every
    downstream statistic bit-for-bit.  Non-PCM format tags (IEEE float,
    ADPCM, extensible) raise NotImplementedError (degrade contract);
    malformed/truncated streams raise ValueError."""
    import numpy as np

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt_tag = channels = bits = block_align = None
    sample_rate = 0
    data = None
    for cid, body, _size, truncated in _iter_riff_chunks(raw):
        if cid == b"fmt ":
            # the PCM contract needs fmt/data INTACT; trailing metadata
            # chunks (LIST/INFO etc.) may be truncated without losing a
            # single sample, so only these two are strict
            if truncated or len(body) < 16:
                raise ValueError("fmt chunk truncated")
            (fmt_tag, channels, sample_rate, _br,
             block_align, bits) = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if truncated:
                raise ValueError("data chunk overruns stream")
            data = body
    if fmt_tag is None or data is None:
        raise ValueError("missing fmt / data chunk")
    if fmt_tag != 1:
        raise NotImplementedError(
            f"WAV format tag {fmt_tag} (PCM only; float/ADPCM are the "
            "documented codec seam)")
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"illegal PCM bit depth {bits}")
    if channels == 0 or sample_rate == 0:
        raise ValueError("zero channels or sample rate")
    bytes_per = bits // 8
    if block_align != channels * bytes_per:
        raise ValueError("block align inconsistent with fmt")
    n_frames = len(data) // block_align
    if n_frames * channels > _MAX_SAMPLES:
        raise ValueError("sample count out of range")
    data = data[:n_frames * block_align]
    if bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
        s = (s - 128) * 256
    elif bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 32:
        s = np.frombuffer(data, dtype="<i4").astype(np.int32) >> 16
    else:                                  # 24-bit little-endian signed
        b3 = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        s = (b3[:, 0].astype(np.int32)
             | (b3[:, 1].astype(np.int32) << 8)
             | (b3[:, 2].astype(np.int32) << 16))
        s = (s << 8) >> 16                 # sign-extend, keep top 16 bits
    return int(sample_rate), s.reshape(n_frames, channels)


def make_wav_pcm(samples: "object", sample_rate: int = 8000,
                 bits: int = 16) -> bytes:
    """(n_frames, channels) int array of 16-bit-equivalent samples ->
    PCM WAV bytes at the requested depth (the exact inverse of
    decode_wav_pcm's normalization, so round-trips are bit-exact for
    samples representable at that depth)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    if s.size and (s.min() < -32768 or s.max() > 32767):
        raise ValueError("samples out of the 16-bit-equivalent range")
    if bits == 8 and s.size and (s % 256).any():
        raise ValueError("8-bit fixtures need samples quantized to the "
                         "256-step grid (decode maps s//256 + 128 back)")
    if bits == 8:
        body = ((s // 256) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        body = s.astype("<i2").tobytes()
    elif bits == 32:
        body = (s.astype(np.int64) << 16).astype("<i4").tobytes()
    elif bits == 24:
        full = (s.astype(np.int64) << 8).astype(np.int32)
        b = np.empty((full.size, 3), dtype=np.uint8)
        flat = full.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        body = b.tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block_align = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    chunks = _riff_chunk(b"fmt ", fmt) + _riff_chunk(b"data", body)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def pcm_features(sample_rate: int, frames: "object",
                 dim: int = 8) -> list[float]:
    """(sample_rate, (n, c) int32 16-bit-equivalent samples) -> dim
    floats, each an INTEGER aggregate + one IEEE division (the audio
    twin of png_codec.pixel_features, same oracle discipline):
    [n_frames/2^20, channels/16, rate/192000, mean0, mean-square0,
    zero-cross ratio0, |peak|0, nonzero ratio0] over channel 0."""
    import numpy as np

    n, c = frames.shape
    ch = frames[:, 0].astype(np.int64)
    feats = [n / 1048576.0, c / 16.0, sample_rate / 192000.0]
    if n:
        feats.append(int(ch.sum()) / (n * 32768.0))
        feats.append(int((ch * ch).sum()) / (n * 32768.0 * 32768.0))
        sgn = ch >= 0
        feats.append(int((sgn[1:] != sgn[:-1]).sum()) / n if n > 1 else 0.0)
        feats.append(int(np.abs(ch).max()) / 32768.0)
        feats.append(int((ch != 0).sum()) / n)
    else:
        feats.extend([0.0] * 5)
    feats = feats[:dim]
    feats.extend(0.0 for _ in range(dim - len(feats)))
    return feats
