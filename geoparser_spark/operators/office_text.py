"""Office-format byte streams → ordered text blocks (Tika breadth).

The reference routes EVERY uploaded byte stream through a Tika server
(reference: geoparser_app/views.py:125, Docker/Dockerfile:33-36), which
gives it DOCX/RTF/etc. for free.  This module covers the two most
common office formats with stdlib-only parsers, same contract as
pdf_text: ordered text blocks, graceful empty degrade on damage.

* DOCX — a zip containing ``word/document.xml``; text lives in
  ``<w:t>`` runs grouped into ``<w:p>`` paragraphs (ECMA-376 / ISO
  29500, public spec).  One block per paragraph.
* RTF — control-word stream ({\\rtf1 ...}; public Microsoft spec).
  Group-aware scrub: destination groups (fonttbl, colortbl, info,
  pict, \\*-prefixed) are skipped entirely; \\par//\\line break
  paragraphs; \\'hh hex escapes and \\u<n> unicode escapes decode.

Both parsers are NOT derived from the fixture writers below; parser
and writer each follow the public spec independently (same discipline
as pdf_text.make_mini_pdf).
"""

from __future__ import annotations

import base64
import binascii
import io
import re
import zipfile
from xml.sax.saxutils import escape as _xml_escape

# ------------------------------------------------------------------- DOCX

_WP_SPLIT = re.compile(rb"<w:p[ >]")
_WT_RE = re.compile(rb"<w:t(?:\s[^>]*)?>(.*?)</w:t>", re.DOTALL)
_TAB_BR = re.compile(rb"<w:(?:tab|br)\s*/?>")
_ENTITIES = {b"amp": b"&", b"lt": b"<", b"gt": b">",
             b"quot": b'"', b"apos": b"'"}
# single-pass (like html.unescape): sequential .replace() passes
# double-unescape — b'a &amp;lt; b' must decode to 'a &lt; b', not 'a < b'
_ENT_REF = re.compile(rb"&(amp|lt|gt|quot|apos);|&#x([0-9a-fA-F]+);|&#([0-9]+);")


def _decode_ref(m: re.Match) -> bytes:
    if m.group(1):
        return _ENTITIES[m.group(1)]
    cp = int(m.group(2), 16) if m.group(2) else int(m.group(3))
    # invalid numeric refs (beyond Unicode, or surrogates) must not
    # raise — a single bad span would kill the whole extract task,
    # violating the degrade contract; substitute U+FFFD instead
    if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        return "�".encode("utf-8")
    return chr(cp).encode("utf-8")


def _xml_unescape(raw: bytes) -> bytes:
    return _ENT_REF.sub(_decode_ref, raw)


def extract_docx_text_blocks(docx_bytes: bytes) -> list[str]:
    """One text block per non-empty paragraph of word/document.xml.
    Damaged zips / missing parts degrade to [] — never an exception."""
    try:
        with zipfile.ZipFile(io.BytesIO(docx_bytes)) as z:
            xml = z.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError, OSError, ValueError):
        return []
    blocks: list[str] = []
    for para in _WP_SPLIT.split(xml)[1:]:
        # tabs/breaks sit BETWEEN <w:t> runs; rewrite them as synthetic
        # whitespace runs so they survive the run join
        para = _TAB_BR.sub(b"<w:t> </w:t>", para)
        runs = [_xml_unescape(m.group(1)) for m in _WT_RE.finditer(para)]
        text = " ".join(b"".join(runs).decode("utf-8", "replace").split())
        if text:
            blocks.append(text)
    return blocks


def extract_docx_b64_text_blocks(b64: str) -> list[str]:
    try:
        raw = base64.b64decode(b64, validate=False)
    except (binascii.Error, ValueError):
        return []
    return extract_docx_text_blocks(raw)


def make_mini_docx(paragraphs: list[str]) -> bytes:
    """Minimal valid-enough DOCX for fixtures: zip with content types +
    a document.xml holding one <w:p><w:r><w:t> per paragraph."""
    body = "".join(
        f"<w:p><w:r><w:t>{_xml_escape(p)}</w:t></w:r></w:p>" for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        # fixed zip timestamps: zipfile stamps entries with NOW by
        # default, which would make two generations of the same fixture
        # byte-different (the corpus generator promises bit-identical
        # re-generation)
        for name, payload in (
            (
                "[Content_Types].xml",
                '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
                '<Default Extension="xml" ContentType="application/xml"/></Types>',
            ),
            ("word/document.xml", doc),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, payload)
    return buf.getvalue()


# -------------------------------------------------------------------- RTF

_DESTINATIONS = frozenset(
    "fonttbl colortbl stylesheet info pict object header footer "
    "footnote generator operator themedata colorschememapping "
    "latentstyles datastore".split()
)
_CW_RE = re.compile(r"\\([a-zA-Z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\([^a-zA-Z])")


def extract_rtf_text_blocks(rtf: str) -> list[str]:
    """Group-aware RTF → paragraphs.  Non-RTF input degrades to []."""
    if not rtf.startswith("{\\rtf"):
        return []
    out: list[str] = []
    para: list[str] = []
    skip_depth = 0      # >0 while inside a destination group
    depth = 0
    uc_skip = 1         # chars to skip after \u<n> (default 1)
    pending_skip = 0
    i, n = 0, len(rtf)

    def end_para() -> None:
        text = " ".join("".join(para).split())
        if text:
            out.append(text)
        para.clear()

    while i < n:
        c = rtf[i]
        if pending_skip and skip_depth == 0 and c not in "{}\\":
            pending_skip -= 1
            i += 1
            continue
        if c == "{":
            depth += 1
            if skip_depth:
                skip_depth += 1
            i += 1
            # \* marks an unknown destination: skip the whole group
            if rtf.startswith("\\*", i) and not skip_depth:
                skip_depth = 1
            continue
        if c == "}":
            depth -= 1
            if skip_depth:
                skip_depth -= 1
            i += 1
            continue
        if c == "\\":
            m = _CW_RE.match(rtf, i)
            if not m:
                i += 1
                continue
            i = m.end()
            word, arg, hexc, sym = m.group(1), m.group(2), m.group(3), m.group(4)
            if skip_depth:
                continue
            if hexc is not None:
                para.append(chr(int(hexc, 16)))
            elif sym is not None:
                if sym in "\\{}":
                    para.append(sym)
                elif sym == "~":
                    para.append(" ")
            elif word in ("par", "line"):
                end_para()
            elif word == "tab":
                para.append(" ")
            elif word == "uc" and arg is not None:
                uc_skip = int(arg)
            elif word == "u" and arg is not None:
                cp = int(arg)
                para.append(chr(cp + 65536 if cp < 0 else cp))
                pending_skip = uc_skip
            elif word in _DESTINATIONS:
                skip_depth = 1
            continue
        if not skip_depth and c not in "\r\n":
            para.append(c)
        i += 1
    end_para()
    return out
