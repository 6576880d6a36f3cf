"""Video byte-stream parsing: MP4 container metadata + embedded text,
no codec.

Reference parity: GeoParser routes any upload through Tika auto-detect
(/root/reference/geoparser_app/views.py:125); for MP4 Tika surfaces
container metadata (duration, frame size, brand) and iTunes-style tags,
which index like any document field.  This module reproduces that
surface from the public ISO/IEC 14496-12 (ISO BMFF) box structure with
pure stdlib parsing — the video codec itself is never touched (frame
decode stays the documented sandbox stub in operators/multimodal.py).

Parsed subset:
  * ``ftyp``              — major brand (e.g. isom, mp42)
  * ``moov/mvhd``         — timescale + duration (v0 and v1 layouts)
  * ``moov/trak/tkhd``    — first video track's width x height
    (16.16 fixed point), vetted against the track's ``hdlr`` handler
  * ``moov/udta/meta/ilst`` — ©nam/©cmt/desc UTF-8 ``data`` atoms,
    the text channel a production captioning stage would extend

Span contract for a ``video_bytes`` input span (base64 payload):
  * one media span ("video", None, "vid://{brand}/{w}x{h}/{ms}ms"), then
  * one text span per embedded tag value, in byte order.
Degrade contract: unrecognized/truncated payloads yield [] — never an
exception out of the extract stage.
"""

from __future__ import annotations

import base64
import binascii
import struct

_TAG_IDS = (b"\xa9nam", b"\xa9cmt", b"desc")


def _norm(s: str) -> str:
    return " ".join(s.split())


def _boxes(raw: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end).
    Bounds-checked; malformed sizes end the walk instead of raising."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", raw[i:i + 4])
        btype = raw[i + 4:i + 8]
        header = 8
        if size == 1:
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", raw[i + 8:i + 16])
            header = 16
        elif size == 0:
            size = end - i
        if size < header or i + size > end:
            return
        yield btype, i + header, i + size
        i += size


def _find(raw: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _boxes(raw, start, end):
        if t == btype:
            return s, e
    return None


def _mvhd(raw: bytes, s: int, e: int) -> int | None:
    """Movie duration in ms (timescale-scaled, floor)."""
    if e - s < 4:
        return None
    version = raw[s]
    if version == 0 and e - s >= 20:
        timescale, duration = struct.unpack(">II", raw[s + 12:s + 20])
    elif version == 1 and e - s >= 32:
        # v1 body: version/flags(4) created(8) modified(8) timescale(4)
        # duration(8) — anything shorter is TRUNCATED, not duration-0
        (timescale,) = struct.unpack(">I", raw[s + 20:s + 24])
        (duration,) = struct.unpack(">Q", raw[s + 24:s + 32])
    else:
        return None
    if not timescale:
        return None
    return duration * 1000 // timescale


def _tkhd_dims(raw: bytes, s: int, e: int) -> tuple[int, int] | None:
    """(width, height) from the 16.16 fixed-point fields at the end of
    tkhd.  Spec layout after version/flags(4): v0 has
    created(4) modified(4) track_id(4) reserved(4) duration(4)
    reserved(8) layer(2) alternate(2) volume(2) reserved(2) matrix(36)
    = 72 bytes (v1 widens the three time fields to 8 → 84), so width
    sits at body offset 76 (v0) / 88 (v1)."""
    version = raw[s] if e > s else None
    if version not in (0, 1):
        return None
    w_off = s + (76 if version == 0 else 88)
    if e - w_off < 8:
        return None
    w, h = struct.unpack(">II", raw[w_off:w_off + 8])
    return w >> 16, h >> 16


def _track_is_video(raw: bytes, s: int, e: int) -> bool:
    mdia = _find(raw, s, e, b"mdia")
    if not mdia:
        return False
    hdlr = _find(raw, mdia[0], mdia[1], b"hdlr")
    if not hdlr or hdlr[1] - hdlr[0] < 12:
        return False
    return raw[hdlr[0] + 8:hdlr[0] + 12] == b"vide"


def _ilst_texts(raw: bytes, s: int, e: int) -> list[str]:
    """©nam/©cmt/desc UTF-8 'data' atom values, byte order."""
    texts: list[str] = []
    for t, bs, be in _boxes(raw, s, e):
        if t not in _TAG_IDS:
            continue
        data = _find(raw, bs, be, b"data")
        if not data or data[1] - data[0] < 8:
            continue
        (flags,) = struct.unpack(">I", raw[data[0]:data[0] + 4])
        if flags & 0xFFFFFF != 1:  # type 1 = UTF-8
            continue
        txt = _norm(raw[data[0] + 8:data[1]].decode("utf-8", "replace"))
        if txt:
            texts.append(txt)
    return texts


def parse_mp4(raw: bytes) -> tuple[str, int, int, int, list[str]] | None:
    """(brand, width, height, duration_ms, texts) or None.  Width and
    height are 0 when no video track declares dimensions (audio-only
    MP4s are valid)."""
    ftyp = _find(raw, 0, len(raw), b"ftyp")
    if not ftyp or ftyp[1] - ftyp[0] < 4:
        return None
    brand = raw[ftyp[0]:ftyp[0] + 4].decode("ascii", "replace").strip()
    moov = _find(raw, 0, len(raw), b"moov")
    if not moov:
        return None
    mvhd = _find(raw, moov[0], moov[1], b"mvhd")
    ms = _mvhd(raw, *mvhd) if mvhd else None
    if ms is None:
        return None
    w = h = 0
    for t, s, e in _boxes(raw, moov[0], moov[1]):
        if t == b"trak" and _track_is_video(raw, s, e):
            tkhd = _find(raw, s, e, b"tkhd")
            dims = _tkhd_dims(raw, *tkhd) if tkhd else None
            if dims:
                w, h = dims
                break
    texts: list[str] = []
    udta = _find(raw, moov[0], moov[1], b"udta")
    if udta:
        meta = _find(raw, udta[0], udta[1], b"meta")
        if meta:
            # meta is a FULL box: 4 bytes version/flags before children
            ilst = _find(raw, meta[0] + 4, meta[1], b"ilst")
            if ilst:
                texts = _ilst_texts(raw, *ilst)
    return brand, w, h, ms, texts


def extract_video_spans(raw: bytes) -> list[tuple[str, str | None, str | None]]:
    parsed = parse_mp4(raw)
    if parsed is None:
        return []
    brand, w, h, ms, texts = parsed
    out = [("video", None, f"vid://{brand}/{w}x{h}/{ms}ms")]
    out += [("text", t, None) for t in texts]
    return out


def extract_video_b64_spans(b64: str) -> list[tuple[str, str | None, str | None]]:
    """Base64-wrapped variant — ``video_bytes`` span payloads carry the
    byte stream base64-encoded in ``text`` (FIXTURES.md §1)."""
    try:
        raw = base64.b64decode(b64, validate=False)
    except (binascii.Error, ValueError):
        return []
    return extract_video_spans(raw)


# ---------------------------------------------------------------- fixtures


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def make_mini_mp4(width: int = 0, height: int = 0,
                  duration_ms: int = 0, timescale: int = 1000,
                  brand: str = "isom", titles: list[str] = ()) -> bytes:
    """Deterministic minimal MP4: ftyp + moov(mvhd [+ video trak]
    [+ udta/meta/ilst tags]).  No mdat — metadata-only, which is all
    the parser (and Tika's metadata surface) reads."""
    ftyp = _box(b"ftyp", brand.encode("ascii") + b"\x00\x00\x02\x00"
                + brand.encode("ascii"))
    duration = duration_ms * timescale // 1000
    mvhd = _box(b"mvhd", b"\x00\x00\x00\x00"           # version/flags
                + struct.pack(">II", 0, 0)              # created/modified
                + struct.pack(">II", timescale, duration)
                + b"\x00" * 80)                         # rate..next_track
    children = mvhd
    if width or height:
        # v0 body: version/flags(4) + 72 bytes of fields+matrix, then
        # width/height as 16.16 fixed point (spec offsets, see parser)
        tkhd = _box(b"tkhd", b"\x00\x00\x00\x07"
                    + b"\x00" * 72
                    + struct.pack(">II", width << 16, height << 16))
        hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
        mdia = _box(b"mdia", hdlr)
        children += _box(b"trak", tkhd + mdia)
    if titles:
        items = b"".join(
            _box(b"\xa9nam", _box(b"data", b"\x00\x00\x00\x01"
                                  + b"\x00" * 4 + t.encode("utf-8")))
            for t in titles
        )
        meta = _box(b"meta", b"\x00\x00\x00\x00" + _box(b"ilst", items))
        children += _box(b"udta", meta)
    return ftyp + _box(b"moov", children)
