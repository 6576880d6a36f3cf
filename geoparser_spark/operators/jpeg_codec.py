"""Pure-stdlib+numpy baseline JPEG codec (ISO/IEC 10918-1, public spec).

The third REAL pixel path next to png_codec/gif_codec — JPEG is the
dominant web image format, and the reference hands any image to Tika
for pixel work (/root/reference/geoparser_app/views.py:125, Tika built
at Docker/Dockerfile:33-36); this module in-sources the baseline
sequential decode so ``multimodal.decode_image`` returns real pixels
for it in-sandbox.

Determinism is the design center (VERDICT r4 #3): the spec permits any
conforming IDCT, and a float IDCT's accumulation order makes pixel
values build-dependent — so the inverse DCT here is FIXED-POINT
INTEGER arithmetic end to end: the 8x8 DCT basis is scaled to int64 at
2^13, the 2-D transform is two exact int64 matrix products, and one
arithmetic shift with round-half-up produces the sample.  The
YCbCr→RGB step is likewise fixed-point (2^16-scaled JFIF constants).
Every decoded pixel is therefore a pure function of the coefficient
stream — bit-identical across runs, machines and numpy versions — so a
pure-Python oracle can replay it without sharing a line of this code.

Supported: baseline DCT (SOF0) AND progressive DCT (SOF2 — spectral
selection and successive approximation per Annex G: interleaved or
single-component DC scans, DC/AC refinement passes, EOB runs;
coefficients accumulate across scans and the SAME fixed-point IDCT
runs once at EOI, so progressive pixels are exactly as deterministic
as baseline), grayscale or 3-component YCbCr with sampling factors up
to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals, multiple DQT/DHT
segments, 0xFF00 byte unstuffing.  Arithmetic coding, 12-bit
precision and hierarchical modes raise NotImplementedError — callers
degrade to the stub featurizer exactly like the sub-byte-PNG guard.
Damaged streams raise ValueError.

The encoder exists for fixtures and round-trip tests: it accepts
either pixels (float FDCT + quantize — lossy, as real JPEG is) or
QUANTIZED COEFFICIENT blocks directly (lossless entropy layer), which
is how the value-oracle fixtures pin the decoder: the pattern lives in
coefficient space, so decoded pixels are exactly IDCT(pattern *
qtable) and the oracle replays that with pure-Python integer loops.
"""

from __future__ import annotations

import math
import struct

import numpy as np

SOI = 0xD8
EOI = 0xD9
SOS = 0xDA
DQT = 0xDB
DHT = 0xC4
DRI = 0xDD
COM = 0xFE
SOF0 = 0xC0  # baseline sequential
SOF1 = 0xC1  # extended sequential (8-bit decodes identically)
SOF2 = 0xC2  # progressive (spectral selection + successive approximation)
_SOF_UNSUPPORTED = {
    0xC3: "lossless", 0xC5: "differential sequential",
    0xC6: "differential progressive", 0xC7: "differential lossless",
    0xC9: "arithmetic sequential", 0xCA: "arithmetic progressive",
    0xCB: "arithmetic lossless", 0xCD: "differential arithmetic seq",
    0xCE: "differential arithmetic prog", 0xCF: "differential arithmetic lossless",
}

#: SOI + next marker's 0xFF — every JFIF/EXIF/bare JPEG starts this way
JPEG_SIG = b"\xff\xd8\xff"

#: zig-zag order: index k of the scan -> (row*8 + col) raster position
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_IDCT_SHIFT = 13
_IDCT_SCALE = 1 << _IDCT_SHIFT


def _basis_int() -> np.ndarray:
    """A[u, x] = round(2^13 * c(u)/2 * cos((2x+1) u pi / 16)) as int64.
    The ONLY place transcendental math appears; everything downstream
    is exact integer arithmetic.  The pure-Python oracle recomputes
    this table with math.cos and must land the same 64 integers."""
    a = np.empty((8, 8), dtype=np.int64)
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = round(_IDCT_SCALE * cu / 2.0
                            * math.cos((2 * x + 1) * u * math.pi / 16.0))
    return a


_A = _basis_int()  # (8, 8) int64, scale 2^13


def idct2d_int(blocks: np.ndarray) -> np.ndarray:
    """Fixed-point 2-D inverse DCT over (n, 8, 8) int64 DEQUANTIZED
    coefficient blocks -> (n, 8, 8) uint8 samples (level-shifted +128,
    clamped).  s = A^T F A at scale 2^26, one round-half-up shift.

    Headroom: |F| <= 255*8*255 < 2^19 after dequant, |A| <= 2^12, so
    the double product stays < 2^19 * 2^12 * 8 * 2^12 * 8 = 2^49 —
    comfortably inside int64, no intermediate rounding anywhere."""
    f = blocks.astype(np.int64)
    t = np.einsum("ux,nuv->nxv", _A, f)          # A^T @ F
    s = np.einsum("nxv,vy->nxy", t, _A)          # ... @ A
    s = (s + (1 << (2 * _IDCT_SHIFT - 1))) >> (2 * _IDCT_SHIFT)
    return np.clip(s + 128, 0, 255).astype(np.uint8)


# JFIF YCbCr <-> RGB, fixed point at 2^16 (constants are round(c*65536))
_FIX_140200 = 91881    # 1.402
_FIX_034414 = 22554    # 0.344136
_FIX_071414 = 46802    # 0.714136
_FIX_177200 = 116130   # 1.772


def ycbcr_to_rgb_int(y: np.ndarray, cb: np.ndarray,
                     cr: np.ndarray) -> np.ndarray:
    """Integer JFIF color convert: r = y + (91881*(cr-128) + 2^15 >> 16)
    etc., clamped — deterministic (the float form would be, too, but
    the integer form is trivially replayable in pure Python)."""
    yy = y.astype(np.int64)
    cb_ = cb.astype(np.int64) - 128
    cr_ = cr.astype(np.int64) - 128
    half = 1 << 15
    r = yy + ((_FIX_140200 * cr_ + half) >> 16)
    g = yy - ((_FIX_034414 * cb_ + _FIX_071414 * cr_ + half) >> 16)
    b = yy + ((_FIX_177200 * cb_ + half) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- Huffman

def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman per Annex C: {(length, code) -> value}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("DHT: BITS exceeds HUFFVAL length")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """{value -> (code, length)} for the encoder, same canonical walk."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    RSTn markers are consumed by ``restart()``."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bit = 0
        self.cur = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("entropy stream truncated")
        byte = d[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("entropy stream truncated at 0xFF")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == EOI:
                # marker reached mid-read: pad with 1-bits per F.2.2.5
                self.cur = (self.cur << 8) | 0xFF
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.cur = (self.cur << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            got = table.get((length, code))
            if got is not None:
                return got
        raise ValueError("invalid Huffman code in scan")

    def restart(self) -> None:
        """Align to byte, consume one RSTn marker."""
        self.nbits = 0
        self.cur = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0x00:
            p += 2  # stuffed byte left unread before the marker
        if p + 1 >= len(d) or d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos = p + 2


def _extend(v: int, t: int) -> int:
    """EXTEND (F.2.2.1): map t-bit magnitude to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# -------------------------------------------------------------- decoder

def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes -> (H, W) uint8 grayscale or (H, W, 3) uint8 RGB.

    Baseline sequential (SOF0/1) and progressive (SOF2) both decode;
    arithmetic/12-bit/hierarchical raise NotImplementedError (degrade
    contract), malformed streams raise ValueError.  Chroma subsampling
    upsamples by pixel replication (nearest) — deterministic and
    documented, the same choice fast integer decoders default to."""
    d = payload
    if len(d) < 4 or d[0] != 0xFF or d[1] != SOI:
        raise ValueError("not a JPEG stream")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    prog_grids = None   # progressive: raw coefficient state across scans
    while pos + 2 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = d[pos + 1]
        if marker == 0xFF:      # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == EOI:
            if prog_grids is not None:
                return _assemble_planes(frame, [
                    g * _qtable_for(qtables, c)
                    for g, c in zip(prog_grids, frame["comps"])])
            raise ValueError("EOI before SOS")
        if pos + 4 > len(d):
            raise ValueError("marker segment truncated")
        seglen = struct.unpack(">H", d[pos + 2:pos + 4])[0]
        if seglen < 2 or pos + 2 + seglen > len(d):
            raise ValueError("segment overruns stream")
        body = d[pos + 4:pos + 2 + seglen]
        if marker == DQT:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                if i + n > len(body):
                    raise ValueError("DQT truncated")
                if pq:
                    raise NotImplementedError("16-bit quant tables (12-bit)")
                q = np.frombuffer(body[i:i + 64], dtype=np.uint8).astype(np.int64)
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = q
                qtables[tq] = raster.reshape(8, 8)
                i += n
        elif marker == DHT:
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("DHT truncated")
                htables[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker in (SOF0, SOF1, SOF2):
            if frame is not None:    # one frame per non-hierarchical image
                raise ValueError("multiple SOF markers in stream")
            if len(body) < 6:
                raise ValueError("SOF truncated")
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            if len(body) < 6 + 3 * nc:
                raise ValueError("SOF component list truncated")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "prog": marker == SOF2}
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"{_SOF_UNSUPPORTED[marker]} JPEG not supported (baseline "
                "and progressive DCT only — the documented degrade path)")
        elif marker == DRI:
            if len(body) < 2:
                raise ValueError("DRI truncated")
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == SOS:
            if frame is None:
                raise ValueError("SOS before SOF")
            if not body:
                raise ValueError("SOS truncated")
            ns = body[0]
            if not 1 <= ns <= 4:     # B.2.3: 1 <= Ns <= 4
                raise ValueError("SOS component count out of range")
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("SOS parameters truncated")
            scan = []
            for s in range(ns):
                cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if not frame["prog"]:
                return _decode_scan(d, pos + 2 + seglen, frame, scan,
                                    qtables, htables, restart_interval)
            if prog_grids is None:
                prog_grids = _alloc_grids(frame)
            pos = _decode_prog_scan(
                d, pos + 2 + seglen, frame, prog_grids, scan,
                ss, se, ah, al, htables, restart_interval)
            continue
        pos += 2 + seglen
    raise ValueError("no SOS marker found" if prog_grids is None
                     else "progressive stream missing EOI")


def _mcu_geometry(frame) -> tuple[int, int, int, int]:
    """Validate dims/sampling, return (hmax, vmax, mcus_x, mcus_y)."""
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    if h_img == 0 or w_img == 0:
        raise ValueError("zero image dimension")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise NotImplementedError("sampling factors beyond 2x2")
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2x2")
    # pixel bomb guard, same budget idea as png/gif
    if h_img * w_img > 64_000_000:
        raise ValueError("image dimensions exceed decode budget")
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _alloc_grids(frame) -> list[np.ndarray]:
    """One MCU-padded raw-coefficient grid per component."""
    _, _, mcus_x, mcus_y = _mcu_geometry(frame)
    return [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 8, 8),
                     dtype=np.int64) for c in frame["comps"]]


def _qtable_for(qtables, comp) -> np.ndarray:
    q = qtables.get(comp["tq"])
    if q is None:
        raise ValueError("missing quant table for component")
    return q


def _assemble_planes(frame, grids_dq) -> np.ndarray:
    """DEQUANTIZED per-component grids -> pixels: batched fixed-point
    IDCT, replication upsample, crop, fixed-point color convert —
    shared by the baseline and progressive paths."""
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    hmax, vmax, _, _ = _mcu_geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        by, bx = grids_dq[ci].shape[:2]
        px = idct2d_int(grids_dq[ci].reshape(-1, 8, 8))
        plane = (px.reshape(by, bx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
        # upsample by replication to full MCU-grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h_img, :w_img])
    if len(planes) == 1:
        return planes[0]
    return ycbcr_to_rgb_int(*planes)


def _decode_scan(d, start, frame, scan, qtables, htables,
                 restart_interval) -> np.ndarray:
    comps = frame["comps"]
    if len(scan) != len(comps):
        raise NotImplementedError("non-interleaved multi-scan JPEG")
    hmax, vmax, mcus_x, mcus_y = _mcu_geometry(frame)
    by_id = {s["id"]: s for s in scan}
    reader = _BitReader(d, start)
    pred = {c["id"]: 0 for c in comps}
    # per component: coefficient block grid (blocks_y, blocks_x, 8, 8)
    grids = []
    for c in comps:
        bx = mcus_x * c["h"]
        by = mcus_y * c["v"]
        grids.append(np.zeros((by, bx, 8, 8), dtype=np.int64))
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart()
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            sel = by_id.get(c["id"])
            if sel is None:
                raise ValueError("scan component not in frame")
            dc_tbl = htables.get((0, sel["dc"]))
            ac_tbl = htables.get((1, sel["ac"]))
            if dc_tbl is None or ac_tbl is None:
                raise ValueError("missing Huffman table for scan")
            q = _qtable_for(qtables, c)
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = reader.decode(dc_tbl)
                    if t > 11:   # F.1.2.1.1: 8-bit DC category <= 11
                        raise ValueError("DC magnitude category out of range")
                    diff = _extend(reader.receive(t), t)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.decode(ac_tbl)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16      # ZRL
                                continue
                            break            # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.receive(s), s)
                        k += 1
                    raster = np.zeros(64, dtype=np.int64)
                    raster[ZIGZAG] = zz
                    grids[ci][my * c["v"] + v, mx * c["h"] + hh] = (
                        raster.reshape(8, 8) * q)
    return _assemble_planes(frame, grids)


def _noninterleaved_blocks(frame, comp) -> tuple[int, int]:
    """Block dims of a NON-INTERLEAVED scan over ``comp`` (A.2.2):
    ceil-by-8 of the component's scaled sample dims — smaller than the
    MCU-padded grid whenever another component has a larger factor."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    cw = -(-frame["w"] * comp["h"] // hmax)
    chh = -(-frame["h"] * comp["v"] // vmax)
    return -(-chh // 8), -(-cw // 8)


def _next_marker(d: bytes, p: int) -> int:
    """Position of the next segment marker at/after ``p`` (skipping
    stuffed 0xFF00 and RSTn inside leftover entropy bytes)."""
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00 \
                and not (0xD0 <= d[p + 1] <= 0xD7):
            return p
        p += 1
    raise ValueError("unterminated scan (no following marker)")


def _decode_prog_scan(d, start, frame, grids, scan, ss, se, ah, al,
                      htables, restart_interval) -> int:
    """Decode ONE progressive scan (Annex G) into the raw-coefficient
    ``grids``; returns the stream position of the next marker.

    DC scans (Ss=Se=0) may be interleaved (MCU order) or single-
    component; AC scans are single-component over the non-interleaved
    block raster.  First passes (Ah=0) decode magnitudes at point
    transform Al; refinement passes (Ah>0) append one bit per
    coefficient, with AC refinement interleaving correction bits for
    already-nonzero coefficients exactly as G.1.2.3 specifies (the
    libjpeg-interoperable reading)."""
    comps = frame["comps"]
    if ss > 63 or se > 63 or ss > se or al > 13 or ah > 14:
        raise ValueError("bad progressive scan parameters")
    if ss == 0 and se != 0:
        raise ValueError("DC scan must have Se=0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("AC scans must be single-component")
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    for s in scan:
        if s["id"] not in by_id:
            raise ValueError("scan component not in frame")
    reader = _BitReader(d, start)
    hmax, vmax, mcus_x, mcus_y = _mcu_geometry(frame)
    p1 = 1 << al

    if ss == 0:                                    # ---- DC scan
        tbls = {}
        for s in scan:
            if ah == 0:
                t = htables.get((0, s["dc"]))
                if t is None:
                    raise ValueError("missing DC Huffman table for scan")
                tbls[s["id"]] = t
        pred = {s["id"]: 0 for s in scan}

        def dc_unit(cid, blk):
            if ah == 0:
                t = reader.decode(tbls[cid])
                if t > 11:   # F.1.2.1.1: 8-bit DC category <= 11
                    raise ValueError("DC magnitude category out of range")
                pred[cid] += _extend(reader.receive(t), t)
                blk[0, 0] = pred[cid] * p1
            else:
                if reader.read_bit():
                    blk[0, 0] |= p1

        if len(scan) > 1:                          # interleaved MCUs
            n_mcu = mcus_x * mcus_y
            for m in range(n_mcu):
                if restart_interval and m and m % restart_interval == 0:
                    reader.restart()
                    pred = {s["id"]: 0 for s in scan}
                my, mx = divmod(m, mcus_x)
                for s in scan:
                    ci = by_id[s["id"]]
                    c = comps[ci]
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            dc_unit(c["id"], grids[ci][my * c["v"] + v,
                                                       mx * c["h"] + hh])
        else:                                      # single component
            ci = by_id[scan[0]["id"]]
            bh, bw = _noninterleaved_blocks(frame, comps[ci])
            n = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and n and n % restart_interval == 0:
                        reader.restart()
                        pred = {s["id"]: 0 for s in scan}
                    dc_unit(scan[0]["id"], grids[ci][by, bx])
                    n += 1
        return _next_marker(d, reader.pos)

    # ---- AC scan (single component)
    sel = scan[0]
    ac_tbl = htables.get((1, sel["ac"]))
    if ac_tbl is None:
        raise ValueError("missing AC Huffman table for scan")
    ci = by_id[sel["id"]]
    bh, bw = _noninterleaved_blocks(frame, comps[ci])
    zz = ZIGZAG  # scan index k -> raster position
    eobrun = 0
    n = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and n and n % restart_interval == 0:
                reader.restart()
                eobrun = 0
            n += 1
            blk = grids[ci][by, bx].reshape(-1)   # raster-flat view
            if ah == 0:                           # -- first AC pass
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode(ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16               # ZRL
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past band end")
                    blk[zz[k]] = _extend(reader.receive(s), s) * p1
                    k += 1
            else:                                 # -- AC refinement
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode(ac_tbl)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r   # includes this block
                                if r:
                                    eobrun += reader.receive(r)
                                break
                            val = 0               # ZRL: 16 zero-history
                        elif s == 1:
                            val = p1 if reader.read_bit() else -p1
                        else:
                            raise ValueError(
                                "AC refinement magnitude must be 1")
                        while k <= se:
                            pos_r = zz[k]
                            if blk[pos_r] != 0:
                                if reader.read_bit() \
                                        and not (blk[pos_r] & p1):
                                    blk[pos_r] += (p1 if blk[pos_r] > 0
                                                   else -p1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            blk[zz[k]] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:                # correction bits only
                        pos_r = zz[k]
                        if blk[pos_r] != 0:
                            if reader.read_bit() \
                                    and not (blk[pos_r] & p1):
                                blk[pos_r] += (p1 if blk[pos_r] > 0
                                               else -p1)
                        k += 1
                    eobrun -= 1
    return _next_marker(d, reader.pos)


# -------------------------------------------------------------- encoder

# Annex K.3 typical Huffman tables (spec data, not code)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: flat quant table — the fixture default: dequant is then the identity
#: and decoded pixels equal IDCT(coefficient pattern) exactly
FLAT_Q = np.ones((8, 8), dtype=np.int64)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _csize(v: int) -> int:
    """Coefficient magnitude category (bit length of |v|)."""
    return abs(v).bit_length()


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_seg(tid: int, q: np.ndarray) -> bytes:
    zz = q.reshape(-1)[ZIGZAG]
    return _seg(DQT, bytes([tid]) + bytes(int(x) for x in zz))


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(DHT, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def encode_jpeg_coeffs(coeff_grids: list[np.ndarray],
                       h_img: int, w_img: int,
                       qtables: list[np.ndarray] | None = None,
                       samplings: list[tuple[int, int]] | None = None,
                       restart_interval: int = 0) -> bytes:
    """QUANTIZED coefficient grids -> baseline JPEG bytes (the entropy
    layer is lossless, so ``decode_jpeg`` recovers exactly these
    coefficients — the oracle-fixture path).

    ``coeff_grids[ci]`` is (blocks_y, blocks_x, 8, 8) int for component
    ci (1 grid = grayscale, 3 = YCbCr).  Grid shapes must match the MCU
    geometry implied by ``samplings`` (default all 1x1).

    Quant tables follow the usual lum/chroma split: component 0 uses
    ``qtables[0]``, components 1 AND 2 share ``qtables[1]`` — a third
    DISTINCT table is rejected rather than silently collapsed onto the
    Cb table (review finding: decode would dequantize Cr with the
    wrong table and produce wrong pixels with no error)."""
    nc = len(coeff_grids)
    if nc not in (1, 3):
        raise ValueError("1 or 3 components")
    samplings = samplings or [(1, 1)] * nc
    qtables = qtables if qtables is not None else [FLAT_Q] * nc
    if len(qtables) >= 3 and not np.array_equal(qtables[2], qtables[1]):
        raise ValueError(
            "baseline encoder emits 2 quant tables (lum/chroma); "
            "qtables[2] must equal qtables[1]")
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    for ci, g in enumerate(coeff_grids):
        want = (mcus_y * samplings[ci][1], mcus_x * samplings[ci][0])
        if g.shape[:2] != want:
            raise ValueError(
                f"component {ci} grid {g.shape[:2]} != {want} for "
                f"{w_img}x{h_img} at sampling {samplings[ci]}")
    out = bytearray(b"\xff" + bytes([SOI]))
    # quant tables: component ci uses table min(ci, 1) (lum/chroma)
    emitted = set()
    for ci in range(nc):
        tid = min(ci, 1)
        if tid not in emitted:
            out += _dqt_seg(tid, qtables[min(tid, len(qtables) - 1)])
            emitted.add(tid)
    sof = struct.pack(">BHHB", 8, h_img, w_img, nc)
    for ci in range(nc):
        hh, vv = samplings[ci]
        sof += bytes([ci + 1, (hh << 4) | vv, min(ci, 1)])
    out += _seg(SOF0, sof)
    out += _dht_seg(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht_seg(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if nc == 3:
        out += _dht_seg(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += _dht_seg(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    if restart_interval:
        out += _seg(DRI, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(SOS, sos)

    dc_enc = [_build_encode_table(_DC_LUM_BITS, _DC_LUM_VALS),
              _build_encode_table(_DC_CHR_BITS, _DC_CHR_VALS)]
    ac_enc = [_build_encode_table(_AC_LUM_BITS, _AC_LUM_VALS),
              _build_encode_table(_AC_CHR_BITS, _AC_CHR_VALS)]
    w = _BitWriter()
    pred = [0] * nc
    rst = 0
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            w.flush()
            out += w.out
            w = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * nc
        my, mx = divmod(m, mcus_x)
        for ci in range(nc):
            hh, vv = samplings[ci]
            ti = min(ci, 1)
            for v in range(vv):
                for hx in range(hh):
                    blk = coeff_grids[ci][my * vv + v, mx * hh + hx]
                    zz = blk.reshape(-1)[ZIGZAG]
                    dc = int(zz[0])
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    t = _csize(diff)
                    if t > 11:
                        raise ValueError("DC diff out of baseline range")
                    code, length = dc_enc[ti][t]
                    w.write(code, length)
                    if t:
                        w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                    run = 0
                    for k in range(1, 64):
                        c = int(zz[k])
                        if c == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, length = ac_enc[ti][0xF0]  # ZRL
                            w.write(code, length)
                            run -= 16
                        s = _csize(c)
                        if s > 10:
                            raise ValueError("AC coeff out of baseline range")
                        code, length = ac_enc[ti][(run << 4) | s]
                        w.write(code, length)
                        w.write(c if c > 0 else c + (1 << s) - 1, s)
                        run = 0
                    if run:
                        code, length = ac_enc[ti][0x00]  # EOB
                        w.write(code, length)
    w.flush()
    out += w.out
    out += bytes([0xFF, EOI])
    return bytes(out)


# Progressive AC table: the K.3 baseline tables lack the EOBn symbols
# (r<<4 with r>0, s=0) progressive EOB runs need, so fixtures use one
# flat canonical table holding EVERY (r, s<=10) symbol at 9 bits —
# inefficient but spec-legal (176 codes < 2^9, longest code not all-1s)
_PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
_PROG_AC_BITS = [0] * 8 + [len(_PROG_AC_VALS)] + [0] * 7


def _sig(v: int, al: int) -> int:
    """AC point transform (G.1.2.2): sign-preserving MAGNITUDE shift
    (DC uses a plain arithmetic shift instead — the spec's asymmetry)."""
    m = abs(v) >> al
    return m if v >= 0 else -m


def encode_jpeg_coeffs_progressive(
        coeff_grids: list[np.ndarray], h_img: int, w_img: int,
        qtables: list[np.ndarray] | None = None,
        samplings: list[tuple[int, int]] | None = None,
        scans: list[tuple[list[int], int, int, int, int]] | None = None,
) -> bytes:
    """QUANTIZED coefficient grids -> PROGRESSIVE (SOF2) JPEG bytes.
    The multi-scan entropy layer is collectively lossless, so
    ``decode_jpeg`` recovers exactly these coefficients — pixels are
    bit-identical to the baseline encoding of the same grids, which is
    how the tests pin the progressive decode path without a second
    oracle.

    ``scans`` is a list of (component_indices, Ss, Se, Ah, Al); the
    default script exercises spectral selection AND successive
    approximation on both DC (interleaved) and AC (per component,
    first pass + refinement): DC(Al=1), DC refine, per-component
    AC 1..5 and 6..63 at Al=2, then two AC refinement sweeps."""
    nc = len(coeff_grids)
    if nc not in (1, 3):
        raise ValueError("1 or 3 components")
    samplings = samplings or [(1, 1)] * nc
    qtables = qtables if qtables is not None else [FLAT_Q] * nc
    if len(qtables) >= 3 and not np.array_equal(qtables[2], qtables[1]):
        raise ValueError(
            "progressive encoder emits 2 quant tables (lum/chroma); "
            "qtables[2] must equal qtables[1]")
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    for ci, g in enumerate(coeff_grids):
        want = (mcus_y * samplings[ci][1], mcus_x * samplings[ci][0])
        if g.shape[:2] != want:
            raise ValueError(
                f"component {ci} grid {g.shape[:2]} != {want} for "
                f"{w_img}x{h_img} at sampling {samplings[ci]}")
    if scans is None:
        scans = [(list(range(nc)), 0, 0, 0, 1),
                 (list(range(nc)), 0, 0, 1, 0)]
        for ci in range(nc):
            scans += [([ci], 1, 5, 0, 2), ([ci], 6, 63, 0, 2)]
        for ci in range(nc):
            scans += [([ci], 1, 63, 2, 1), ([ci], 1, 63, 1, 0)]
    for comp_idx, ss, se, ah, al in scans:   # fail at encode, not decode
        if not comp_idx or any(ci < 0 or ci >= nc for ci in comp_idx):
            raise ValueError(f"scan components {comp_idx} out of range")
        if len(set(comp_idx)) != len(comp_idx):   # B.2.3: distinct Csj
            raise ValueError(f"duplicate scan components {comp_idx}")
        if not (0 <= ss <= se <= 63) or (ss == 0) != (se == 0):
            raise ValueError(f"bad spectral band Ss={ss}..Se={se}")
        if ss > 0 and len(comp_idx) != 1:
            raise ValueError("AC scans must be single-component")
        if not 0 <= al <= 13:                     # decoder's own Al cap
            raise ValueError(f"point transform Al={al} out of range")
        if ah != 0 and ah != al + 1:
            raise ValueError(f"refinement needs Ah=Al+1, got Ah={ah} Al={al}")

    out = bytearray(b"\xff" + bytes([SOI]))
    emitted = set()
    for ci in range(nc):
        tid = min(ci, 1)
        if tid not in emitted:
            out += _dqt_seg(tid, qtables[min(tid, len(qtables) - 1)])
            emitted.add(tid)
    sof = struct.pack(">BHHB", 8, h_img, w_img, nc)
    for ci in range(nc):
        hh, vv = samplings[ci]
        sof += bytes([ci + 1, (hh << 4) | vv, min(ci, 1)])
    out += _seg(SOF2, sof)
    out += _dht_seg(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    if nc == 3:
        out += _dht_seg(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
    out += _dht_seg(1, 0, _PROG_AC_BITS, _PROG_AC_VALS)
    dc_enc = [_build_encode_table(_DC_LUM_BITS, _DC_LUM_VALS),
              _build_encode_table(_DC_CHR_BITS, _DC_CHR_VALS)]
    ac_enc = _build_encode_table(_PROG_AC_BITS, _PROG_AC_VALS)

    def zz_of(ci, by, bx):
        return coeff_grids[ci][by, bx].reshape(-1)[ZIGZAG]

    def blocks_of(ci):
        """Non-interleaved raster block list (A.2.2 dims)."""
        hh, vv = samplings[ci]
        cw = -(-w_img * hh // hmax)
        chh = -(-h_img * vv // vmax)
        return [(by, bx) for by in range(-(-chh // 8))
                for bx in range(-(-cw // 8))]

    def dc_units(comp_idx):
        """(ci, by, bx) walk for a DC scan — interleaved MCU order when
        multi-component, A.2.2 raster otherwise.  Shared by the first
        pass and refinement so both walk blocks identically."""
        if len(comp_idx) > 1:
            units = []
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                for ci in comp_idx:
                    hh, vv = samplings[ci]
                    units += [(ci, my * vv + v, mx * hh + hx)
                              for v in range(vv) for hx in range(hh)]
            return units
        ci = comp_idx[0]
        return [(ci, by, bx) for by, bx in blocks_of(ci)]

    for comp_idx, ss, se, ah, al in scans:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([ci + 1, (min(ci, 1) << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(SOS, sos)
        w = _BitWriter()
        if ss == 0 and ah == 0:          # DC first pass
            pred = {ci: 0 for ci in comp_idx}
            for ci, by, bx in dc_units(comp_idx):
                dc = int(zz_of(ci, by, bx)[0]) >> al    # arithmetic
                diff = dc - pred[ci]
                pred[ci] = dc
                t = _csize(diff)
                code, length = dc_enc[min(ci, 1)][t]
                w.write(code, length)
                if t:
                    w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        elif ss == 0:                    # DC refinement: 1 bit/unit
            for ci, by, bx in dc_units(comp_idx):
                w.write((int(zz_of(ci, by, bx)[0]) >> al) & 1, 1)
        elif ah == 0:                    # AC first pass
            ci = comp_idx[0]
            eobrun = 0

            def flush_eob():
                # one EOBn symbol covers any run 1..32767: r = floor
                # (log2(n)), r extension bits hold n - 2^r
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    code, length = ac_enc[r << 4]
                    w.write(code, length)
                    if r:
                        w.write(eobrun - (1 << r), r)
                    eobrun = 0

            for by, bx in blocks_of(ci):
                zz = zz_of(ci, by, bx)
                run = 0
                for k in range(ss, se + 1):
                    t = _sig(int(zz[k]), al)
                    if t == 0:
                        run += 1
                        continue
                    flush_eob()
                    while run > 15:
                        code, length = ac_enc[0xF0]
                        w.write(code, length)
                        run -= 16
                    s = _csize(t)
                    if s > 10:
                        raise ValueError("AC coeff out of range")
                    code, length = ac_enc[(run << 4) | s]
                    w.write(code, length)
                    w.write(t if t > 0 else t + (1 << s) - 1, s)
                    run = 0
                if run:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()
        else:                            # AC refinement (G.1.2.3)
            ci = comp_idx[0]
            eobrun = 0
            bits: list[int] = []    # correction bits riding the EOBRUN

            def flush_eob_refine():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    code, length = ac_enc[r << 4]
                    w.write(code, length)
                    if r:
                        w.write(eobrun - (1 << r), r)
                    eobrun = 0
                for b in bits:
                    w.write(b, 1)
                bits.clear()

            for by, bx in blocks_of(ci):
                zz = zz_of(ci, by, bx)
                ab = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                # last newly-significant index: ZRLs beyond it fold
                # into the EOB run instead (libjpeg's EOB bound)
                eob_idx = max((j for j, t in enumerate(ab) if t == 1),
                              default=-1)
                run = 0
                block_bits: list[int] = []
                for j, t in enumerate(ab):
                    if t == 0:
                        run += 1
                        continue
                    # ZRLs are emitted at ANY nonzero coefficient once
                    # 16+ zero-history positions are pending, so the
                    # decoder's ZRL walk sees this block's correction
                    # bits in position order
                    while run > 15 and j <= eob_idx:
                        flush_eob_refine()
                        code, length = ac_enc[0xF0]
                        w.write(code, length)
                        run -= 16
                        for b in block_bits:
                            w.write(b, 1)
                        block_bits = []
                    if t > 1:            # already significant
                        block_bits.append(t & 1)
                        continue
                    flush_eob_refine()   # newly significant
                    code, length = ac_enc[(run << 4) | 1]
                    w.write(code, length)
                    w.write(1 if int(zz[ss + j]) > 0 else 0, 1)
                    for b in block_bits:
                        w.write(b, 1)
                    block_bits = []
                    run = 0
                if run or block_bits:
                    eobrun += 1
                    bits.extend(block_bits)
                    if eobrun == 0x7FFF:
                        flush_eob_refine()
            flush_eob_refine()
        w.flush()
        out += w.out
    out += bytes([0xFF, EOI])
    return bytes(out)


def _fdct_quantize(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Float FDCT + quantize for the pixel-input encoder path (lossy,
    test/round-trip use only — fixtures use the exact coefficient
    path).  plane is (H, W) uint8 with H, W multiples of 8."""
    h, w = plane.shape
    a = _A.astype(np.float64) / _IDCT_SCALE  # orthonormal-ish basis
    blocks = (plane.reshape(h // 8, 8, w // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8)
              .astype(np.float64) - 128.0)
    # A is the orthonormal DCT basis (JPEG Annex A's c(u)c(v)/4 pair IS
    # the orthonormal scaling), so F = A S A^T with no extra factor
    f = np.einsum("ux,nxy,vy->nuv", a, blocks, a)
    qd = np.round(f / q.astype(np.float64))
    return qd.astype(np.int64).reshape(h // 8, w // 8, 8, 8)


def encode_jpeg_gray(plane: np.ndarray,
                     q: np.ndarray | None = None) -> bytes:
    """(H, W) uint8 -> baseline grayscale JPEG (edge-padded to 8x8
    multiples by edge replication, standard practice)."""
    if plane.ndim != 2:
        raise ValueError("grayscale encoder wants (H, W)")
    h, w = plane.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = FLAT_Q if q is None else q
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    grid = _fdct_quantize(padded, q)
    return encode_jpeg_coeffs([grid], h, w, qtables=[q])
