"""Pure-stdlib GIF pixel codec: LZW decode (+ a real LZW encoder for
fixtures), palette application, Adam-style 4-pass de-interlace.

Second REAL pixel path in the sandbox (PNG is png_codec):
`decode_gif` returns an (H, W, 3) uint8 RGB array for GIF87a/GIF89a
images with a global or local color table.  JPEG remains the
documented codec seam (baseline DCT entropy decoding is a deployment
dependency, not a spec walk).

Spec: GIF89a specification (W3C/CompuServe) — logical screen
descriptor, color tables, image descriptor, LZW-compressed index
stream in 255-byte sub-blocks, variable code width 3..12 bits,
clear/end codes, optional 4-pass interlace row order.

Same untrusted-input discipline as png_codec: declared dimensions are
capped before allocation, and the LZW expander stops at exactly
width*height indices (a crafted stream cannot expand past the pixel
budget).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")
_MAX_PIXELS = 64_000_000


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-LZW → index array of exactly n_pixels entries (extra output
    is discarded, underflow raises)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # bit reader: GIF packs codes LSB-first
    acc = 0
    acc_bits = 0
    pos = 0
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        while acc_bits < code_size:
            if pos >= len(data):
                if n_out == n_pixels:
                    return out  # missing END code: tolerated when full
                raise ValueError("LZW underflow")
            acc |= data[pos] << acc_bits
            acc_bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        acc_bits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            if n_out != n_pixels:
                raise ValueError(
                    f"LZW ended at {n_out}/{n_pixels} pixels")
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("first LZW code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if n_out >= n_pixels:
            # drain politely until END or exhaustion; content complete
            return out
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    raise ValueError("unreachable")


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order: list[int] = (list(range(0, h, 8)) + list(range(4, h, 8))
                        + list(range(2, h, 4)) + list(range(1, h, 2)))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _parse_screen(raw: bytes):
    """Signature + logical screen descriptor + optional global color
    table -> (sw, sh, bg_index, gct | None, next_pos)."""
    if raw[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (bad signature)")
    if len(raw) < 13:
        raise ValueError("truncated screen descriptor")
    sw, sh = struct.unpack_from("<HH", raw, 6)
    packed, bg = raw[10], raw[11]
    gct: np.ndarray | None = None
    i = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if i + 3 * n > len(raw):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(raw[i:i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n
    return sw, sh, bg, gct, i


def _read_frame(raw: bytes, i: int, gct: np.ndarray | None):
    """Image-descriptor block at raw[i] == 0x2C -> (left, top,
    (h, w) uint8 index rows DE-INTERLACED, (n, 3) color table,
    next_pos).  One shared parse for decode_gif and the frame walker:
    descriptor, optional local color table, LZW sub-blocks, palette
    range check, interlace."""
    if i + 10 > len(raw):
        raise ValueError("truncated image descriptor")
    left, top, w, h = struct.unpack_from("<HHHH", raw, i + 1)
    ipacked = raw[i + 9]
    i += 10
    table = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        if i + 3 * n > len(raw):
            raise ValueError("truncated local color table")
        table = np.frombuffer(raw[i:i + 3 * n],
                              dtype=np.uint8).reshape(n, 3)
        i += 3 * n
    if table is None:
        raise ValueError("no color table")
    if w * h > _MAX_PIXELS or w == 0 or h == 0:
        raise ValueError(f"implausible GIF dimensions {w}x{h}")
    if i >= len(raw):
        raise ValueError("missing LZW data")
    min_code = raw[i]
    if not 2 <= min_code <= 11:
        raise ValueError(f"bad LZW min code size {min_code}")
    i += 1
    chunks = []
    while i < len(raw) and raw[i] != 0:
        ln = raw[i]
        chunks.append(raw[i + 1:i + 1 + ln])
        i += 1 + ln
    i += 1
    idx = _lzw_decode(min_code, b"".join(chunks), w * h)
    if int(idx.max(initial=0)) >= len(table):
        raise ValueError("palette index out of range")
    rows = idx.reshape(h, w)
    if ipacked & 0x40:
        rows = _deinterlace(rows)
    return left, top, rows, table, i


def decode_gif(raw: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 3) uint8 RGB of the FIRST image frame,
    composited on the logical screen: a frame whose descriptor is
    offset or smaller than the screen lands at (left, top) on a canvas
    filled with the header's background color (GCT[bg]; black when no
    GCT covers bg); a frame that OVERFLOWS an under-declared screen
    enlarges the canvas to fit, as browsers do; a Graphic Control
    transparency index leaves the background visible through the
    frame's transparent pixels (viewers honor it even on frame 1).
    Animated GIFs therefore have an EXPLICIT first-frame contract —
    the walk returns IMMEDIATELY after frame 1, so trailing bytes
    (further image descriptors, even garbage) are never parsed and a
    multi-frame stream cannot mis-parse (tests/test_gif_codec.py pins
    both).  Raises ValueError on malformed/bomb input."""
    return decode_gif_frames(raw, max_frames=1)[0][1]


_MAX_FRAMES = 4096   # bomb guard: frames per stream the walker will touch


def decode_gif_frames(raw: bytes, max_frames: int | None = None,
                      ) -> list[tuple[int, np.ndarray]]:
    """GIF bytes -> [(delay_cs, (H, W, 3) uint8 RGB canvas), ...], one
    COMPOSITED snapshot per frame — the real animation semantics:

    * Graphic Control Extension (0xF9) delay (centiseconds),
      transparency index (transparent pixels leave the canvas
      untouched) and disposal method: 0/1 leave the frame in place,
      2 restores the frame's REGION to the background color,
      3 restores the canvas to its state before the frame.
    * Local color tables override the global one per frame; interlaced
      frames de-interlace; frames may be offset/smaller than the
      logical screen (composited at (left, top)); a frame overflowing
      an under-declared screen enlarges the canvas like decode_gif.

    ``max_frames`` returns IMMEDIATELY after that many frames (bytes
    past the last wanted frame are never parsed — decode_gif's
    tolerance contract is this path with max_frames=1).  Untrusted-
    input discipline: at most 4096 frames per stream, and the TOTAL
    pixels across all returned snapshots are capped at the same
    _MAX_PIXELS budget as a single image — a tiny crafted stream
    cannot multiply a large canvas into an unbounded allocation
    (both overruns raise ValueError)."""
    sw, sh, bg, gct, i = _parse_screen(raw)
    bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
              else np.zeros(3, dtype=np.uint8))

    canvas: np.ndarray | None = None     # lazily sized (frames may grow it)
    frames: list[tuple[int, np.ndarray]] = []
    snap_budget = _MAX_PIXELS            # total pixels across snapshots
    delay = 0
    transparent: int | None = None
    disposal = 0

    def ensure_canvas(ch: int, cw: int) -> None:
        nonlocal canvas
        need_h = max(sh, ch)
        need_w = max(sw, cw)
        if canvas is None:
            if need_h * need_w > _MAX_PIXELS:
                raise ValueError("implausible GIF canvas dimensions")
            canvas = np.empty((need_h, need_w, 3), dtype=np.uint8)
            canvas[:, :] = bg_rgb
        elif need_h > canvas.shape[0] or need_w > canvas.shape[1]:
            if need_h * need_w > _MAX_PIXELS:
                raise ValueError("implausible GIF canvas dimensions")
            grown = np.empty((need_h, need_w, 3), dtype=np.uint8)
            grown[:, :] = bg_rgb
            grown[:canvas.shape[0], :canvas.shape[1]] = canvas
            canvas = grown

    while i < len(raw):
        b = raw[i]
        if b == 0x21:                     # extension
            if i + 2 > len(raw):
                raise ValueError("truncated extension")
            label = raw[i + 1]
            i += 2
            blocks = []
            while i < len(raw) and raw[i] != 0:
                ln = raw[i]
                blocks.append(raw[i + 1:i + 1 + ln])
                i += 1 + ln
            i += 1
            if label == 0xF9 and blocks and len(blocks[0]) >= 4:
                gce = blocks[0]
                disposal = (gce[0] >> 2) & 0x07
                delay = struct.unpack_from("<H", gce, 1)[0]
                transparent = gce[3] if gce[0] & 0x01 else None
        elif b == 0x2C:                   # image descriptor
            if len(frames) >= _MAX_FRAMES:
                raise ValueError("GIF frame count past bomb guard")
            left, top, rows, table, i = _read_frame(raw, i, gct)
            h, w = rows.shape
            ensure_canvas(top + h, left + w)
            snap_budget -= canvas.shape[0] * canvas.shape[1]
            if snap_budget < 0:
                raise ValueError("GIF animation pixel budget exceeded")
            before = (canvas[top:top + h, left:left + w].copy()
                      if disposal == 3 else None)
            region = canvas[top:top + h, left:left + w]
            if transparent is None:
                region[:, :] = table[rows]
            else:
                opaque = rows != transparent
                region[opaque] = table[rows][opaque]
            frames.append((delay, canvas.copy()))
            if max_frames is not None and len(frames) >= max_frames:
                return frames             # trailing bytes never parsed
            if disposal == 2:             # restore region to background
                canvas[top:top + h, left:left + w] = bg_rgb
            elif disposal == 3 and before is not None:
                canvas[top:top + h, left:left + w] = before
            delay, transparent, disposal = 0, None, 0
        elif b == 0x3B:                   # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("no image frame")
    return frames


# -------------------------------------------------------------- encoder

def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Real GIF-LZW: dictionary-building encoder with clear-on-full,
    LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += size
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    # width bookkeeping mirrors the decoder exactly: the decoder
    # appends one table entry per received code EXCEPT the first after
    # a clear, so its table length is next_code - 1 here; it widens
    # when that length REACHES 1 << code_size — i.e. when next_code
    # hits (1 << code_size) + 1 — and a CLEAR resets both sides when
    # the 12-bit space fills (next_code 4097, before the fresh 4096
    # entry could ever be looked up and emitted as a 13-bit code)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    prev = b""
    for v in indices.tobytes():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        elif next_code == 4097:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prev = bytes([v])
    if prev:
        emit(table[prev], code_size)
    emit(end, code_size)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _pal_prep(palette: np.ndarray):
    """Validate + pad the palette -> (padded_table, bits, min_code);
    shared by the single-frame and animated fixture encoders."""
    n = len(palette)
    if not 1 <= n <= 256:
        # bits-1 above 7 would overflow the 3-bit GCT size field in the
        # packed byte and emit a structurally corrupt header; an empty
        # palette would silently compute bits from (-1).bit_length()
        raise ValueError(f"GIF palette must have 1..256 entries, got {n}")
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    return pal, bits, max(2, bits)


def _emit_image(out: bytearray, indices: np.ndarray, left: int, top: int,
                min_code: int) -> None:
    """Image descriptor + LZW data in 255-byte sub-blocks."""
    h, w = indices.shape
    out += b"\x2C" + struct.pack("<HHHH", left, top, w, h) + b"\x00"
    out.append(min_code)
    data = _lzw_encode(min_code, indices.astype(np.uint8))
    for j in range(0, len(data), 255):
        chunk = data[j:j + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(H, W) uint8 index array + (N, 3) palette -> GIF89a bytes
    (global color table padded to a power of two, one image frame)."""
    h, w = indices.shape
    pal, bits, min_code = _pal_prep(palette)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    _emit_image(out, indices, 0, 0, min_code)
    out += b"\x3B"
    return bytes(out)


def encode_gif_anim(frames: list[np.ndarray], palette: np.ndarray,
                    delays_cs: list[int] | None = None,
                    disposals: list[int] | None = None,
                    offsets: list[tuple[int, int]] | None = None,
                    transparents: list[int | None] | None = None,
                    screen: tuple[int, int] | None = None,
                    bg: int = 0) -> bytes:
    """Animated-GIF fixture encoder: per-frame index arrays (possibly
    offset/smaller than the screen), delays, disposal methods and
    transparency indices — everything decode_gif_frames composites."""
    if not frames:
        raise ValueError("at least one frame")
    pal, bits, min_code = _pal_prep(palette)
    offsets = offsets or [(0, 0)] * len(frames)
    delays_cs = delays_cs or [0] * len(frames)
    disposals = disposals or [0] * len(frames)
    transparents = transparents or [None] * len(frames)
    if screen is None:
        sh = max(o[1] + f.shape[0] for o, f in zip(offsets, frames))
        sw = max(o[0] + f.shape[1] for o, f in zip(offsets, frames))
    else:
        sw, sh = screen
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), bg, 0)
    out += pal.tobytes()
    for f, (left, top), dly, disp, tr in zip(
            frames, offsets, delays_cs, disposals, transparents):
        gce_flags = (disp & 0x07) << 2
        tr_idx = 0
        if tr is not None:
            gce_flags |= 0x01
            tr_idx = tr
        out += (b"\x21\xF9\x04" + bytes([gce_flags])
                + struct.pack("<H", dly) + bytes([tr_idx]) + b"\x00")
        _emit_image(out, f, left, top, min_code)
    out += b"\x3B"
    return bytes(out)
