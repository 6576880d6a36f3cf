"""DOCX / RTF extraction (Tika format breadth, E1)."""

from __future__ import annotations

import base64

from geoparser_spark.operators.office_text import (
    extract_docx_b64_text_blocks,
    extract_docx_text_blocks,
    extract_rtf_text_blocks,
    make_mini_docx,
)


def test_docx_paragraph_blocks():
    docx = make_mini_docx(["First paragraph.", "Second one here."])
    assert extract_docx_text_blocks(docx) == [
        "First paragraph.", "Second one here.",
    ]


def test_docx_entities_and_empty_paragraphs():
    docx = make_mini_docx(["a < b & c > d", "", "tail"])
    assert extract_docx_text_blocks(docx) == ["a < b & c > d", "tail"]


def test_docx_multiple_runs_per_paragraph():
    # hand-built xml: two <w:t> runs in one paragraph concatenate
    import io
    import zipfile

    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="x"><w:body>'
        "<w:p><w:r><w:t>Hel</w:t></w:r><w:r><w:t>lo world</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>Tab</w:t></w:r><w:tab/><w:r><w:t>sep</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    assert extract_docx_text_blocks(buf.getvalue()) == ["Hello world", "Tab sep"]


def test_docx_damage_degrades_empty():
    assert extract_docx_text_blocks(b"not a zip at all") == []
    assert extract_docx_b64_text_blocks("!!!") == []
    # zip without word/document.xml
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("other.xml", "<x/>")
    assert extract_docx_text_blocks(buf.getvalue()) == []


def test_docx_b64_roundtrip():
    b64 = base64.b64encode(make_mini_docx(["payload text"])).decode()
    assert extract_docx_b64_text_blocks(b64) == ["payload text"]


def test_rtf_basic_paragraphs():
    rtf = r"{\rtf1\ansi Hello world.\par Second paragraph here.\par}"
    assert extract_rtf_text_blocks(rtf) == [
        "Hello world.", "Second paragraph here.",
    ]


def test_rtf_destinations_skipped():
    rtf = (
        r"{\rtf1{\fonttbl{\f0 Times New Roman;}}"
        r"{\colortbl;\red0\green0\blue0;}"
        r"{\info{\title secret title}}"
        r"Visible text only.\par}"
    )
    assert extract_rtf_text_blocks(rtf) == ["Visible text only."]


def test_rtf_escapes_and_unicode():
    rtf = r"{\rtf1 caf\'e9 and \u8364 ?euro\par}"
    out = extract_rtf_text_blocks(rtf)
    assert out == ["café and €euro"]


def test_rtf_starred_group_skipped():
    rtf = r"{\rtf1{\*\generator Riched20;}kept\par}"
    assert extract_rtf_text_blocks(rtf) == ["kept"]


def test_rtf_non_rtf_degrades_empty():
    assert extract_rtf_text_blocks("plain text, no rtf header") == []


def test_office_kinds_through_spark_extract(spark):
    """docx_bytes / rtf spans flow through the Arrow extract path like
    html/pdf_bytes."""
    from geoparser_spark.operators.extract import extract
    from geoparser_spark.schemas import DOCS

    docx_b64 = base64.b64encode(
        make_mini_docx(["Docx body paragraph."])
    ).decode()
    rtf = r"{\rtf1 Rtf body text.\par}"
    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    ("docx_bytes", docx_b64, None, 0),
                    ("rtf", rtf, None, 1),
                    ("text", "plain tail", None, 2),
                ],
            )
        ],
        DOCS,
    )
    out = extract(docs).collect()[0]
    seq = [(s["kind"], s["text"], s["order"]) for s in out["spans"]]
    assert seq == [
        ("text", "Docx body paragraph.", 0),
        ("text", "Rtf body text.", 1),
        ("text", "plain tail", 2),
    ]


def test_xml_unescape_single_pass_no_double_decode():
    # sequential replace() would turn '&amp;lt;' into '<'; the correct
    # single-pass decode yields the literal string '&lt;'
    from geoparser_spark.operators.office_text import _xml_unescape

    assert _xml_unescape(b"a &amp;lt; b") == b"a &lt; b"
    assert _xml_unescape(b"x &amp;amp; y") == b"x &amp; y"
    assert _xml_unescape(b"a &lt; b &gt; c &amp; d") == b"a < b > c & d"


def test_xml_unescape_pathological_numeric_refs_degrade():
    # codepoints beyond Unicode and surrogates must not raise (a bad
    # span would kill the whole Spark extract task) — U+FFFD instead
    from geoparser_spark.operators.office_text import _xml_unescape

    fffd = "�".encode("utf-8")
    assert _xml_unescape(b"&#4294967296;") == fffd
    assert _xml_unescape(b"&#xD800;") == fffd
    assert _xml_unescape(b"&#xDFFF;") == fffd
    assert _xml_unescape(b"&#x110000;") == fffd
    assert _xml_unescape(b"&#x10FFFF;") == "\U0010ffff".encode("utf-8")
    assert _xml_unescape(b"ok &#65; fine") == b"ok A fine"
