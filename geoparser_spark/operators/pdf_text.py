"""PDF/layout byte-stream parse into ordered text blocks.

Replaces the reference's Tika PDF extraction hop (reference:
geoparser_app/views.py:125; Tika server built at Docker/Dockerfile:33-36)
for the subset of PDF this sandbox can exercise: content streams with
``BT ... ET`` text objects and ``Tj`` / ``TJ`` / ``'`` / ``"``
show-text operators over literal ``(...)`` AND hex ``<...>`` strings.
Compressed streams inflate via stdlib zlib when the stream dict says
``/FlateDecode``.  Documented degrades (never a crash):
  * unsupported filters (DCTDecode, LZW, ...) → stream contributes
    nothing;
  * CMap-encoded multi-byte text (Identity-H etc.) → hex codes decode
    as raw single bytes (garbled but bounded) — mapping needs the
    font's CMap object, out of scope here;
  * block order is content-stream order, not page-tree order — PDFs
    whose page objects are serialized out of reading order (legal per
    the xref table) come back in file order.

Output contract: one text block per page content stream (BT..ET lines
of the stream joined with a single space), in stream order — matching
the ordered-text-blocks contract of SURVEY.md §2.2 E1(b).
"""

from __future__ import annotations

import base64
import binascii
import re
import zlib

_STREAM_HDR_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_ENDSTREAM_RE = re.compile(rb"\r?\nendstream")
_BT_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
# show-text operators over literal AND hex strings:
#   (string) Tj | (string) ' | aw ac (string) " | [(a) -120 <68>] TJ
#   <hexdigits> Tj / ' / "
_TJ_RE = re.compile(
    rb"(?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)\s*(?:Tj|'|\")"
    rb"|\[(?:[^\]\\]|\\.)*\]\s*TJ",
    re.DOTALL,
)
_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out += c
        i += 1
    return bytes(out)


def extract_pdf_text_blocks(pdf_bytes: bytes) -> list[str]:
    """Extract ordered text blocks (one per content stream) from a PDF
    byte string.  Unknown/undecodable streams contribute nothing."""
    blocks: list[str] = []
    for m in _STREAM_HDR_RE.finditer(pdf_bytes):
        sdict = m.group(1)
        start = m.end()
        lm = _LENGTH_RE.search(sdict)
        if lm:
            # exact slice per /Length — binary (Flate) bodies may contain
            # any byte sequence, so scanning for 'endstream' is unsafe.
            body = pdf_bytes[start : start + int(lm.group(1))]
        else:
            em = _ENDSTREAM_RE.search(pdf_bytes, start)
            body = pdf_bytes[start : em.start()] if em else pdf_bytes[start:]
        if b"FlateDecode" in sdict:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        lines: list[str] = []
        for bt in _BT_RE.finditer(body):
            parts: list[str] = []
            for op in _TJ_RE.finditer(bt.group(0)):
                for s in _STR_RE.finditer(op.group(0)):
                    if s.group(1) is not None:
                        parts.append(_unescape(s.group(1)).decode("latin-1"))
                    else:
                        # hex string <...>: whitespace allowed between
                        # digit pairs; an odd final digit is padded with
                        # 0 (PDF 32000-1 §7.3.4.3).  Decoded as single-
                        # byte codes; multi-byte CMap-encoded text (e.g.
                        # Identity-H) needs the font's CMap and degrades
                        # to the raw byte interpretation here.
                        hx = re.sub(rb"\s+", b"", s.group(2))
                        if len(hx) % 2:
                            hx += b"0"
                        try:
                            parts.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
                        except ValueError:
                            continue
            line = "".join(parts).strip()
            if line:
                lines.append(line)
        text = " ".join(" ".join(lines).split())
        if text:
            blocks.append(text)
    return blocks


def extract_pdf_b64_text_blocks(b64: str) -> list[str]:
    """Base64-wrapped variant — the ``pdf_bytes`` span payload per
    FIXTURES.md §1 carries the byte stream base64-encoded in ``text``."""
    try:
        raw = base64.b64decode(b64, validate=False)
    except (binascii.Error, ValueError):
        return []
    return extract_pdf_text_blocks(raw)


def make_mini_pdf(pages: list[list[str]], compress: bool = False) -> bytes:
    """Build a minimal valid-enough PDF byte stream for fixtures: one
    content stream per page, one BT..ET text object per line.  Used by
    the deterministic corpus generator (testing/corpus.py) — the parser
    above is NOT derived from this writer; both follow the public PDF
    content-stream grammar."""
    out = bytearray(b"%PDF-1.4\n")
    for pi, lines in enumerate(pages):
        body = b"".join(
            b"BT /F1 12 Tf 72 %d Td (%s) Tj ET\n"
            % (720 - 14 * li, line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1", "replace"))
            for li, line in enumerate(lines)
        )
        filt = b""
        if compress:
            body = zlib.compress(body)
            filt = b" /Filter /FlateDecode"
        out += b"%d 0 obj\n<< /Length %d%s >>\nstream\n" % (pi + 1, len(body), filt)
        out += body
        out += b"\nendstream\nendobj\n"
    out += b"%%EOF\n"
    return bytes(out)
