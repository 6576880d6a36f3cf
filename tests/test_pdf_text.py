"""Tests for the PDF-subset text extraction (E1b)."""

import base64

from geoparser_spark.operators.pdf_text import (
    extract_pdf_b64_text_blocks,
    extract_pdf_text_blocks,
    make_mini_pdf,
)


def test_plain_streams():
    pdf = make_mini_pdf([["Line one.", "Line two."], ["Page two line."]])
    assert extract_pdf_text_blocks(pdf) == ["Line one. Line two.", "Page two line."]


def test_flate_streams():
    pdf = make_mini_pdf([["Compressed text page."]], compress=True)
    assert extract_pdf_text_blocks(pdf) == ["Compressed text page."]


def test_escapes_in_strings():
    pdf = make_mini_pdf([["Paren (inside) and back\\slash."]])
    assert extract_pdf_text_blocks(pdf) == ["Paren (inside) and back\\slash."]


def test_length_respected_even_when_body_ends_with_cr():
    # binary body ending in \r must not be eaten by the endstream scan
    body = b"BT (x) Tj ET\r"
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(body)).encode()
        + b" >>\nstream\n"
        + body
        + b"endstream\nendobj\n"
    )
    assert extract_pdf_text_blocks(raw) == ["x"]


def test_tj_array_operator():
    body = b"BT [(Hel) -20 (lo)] TJ ET"
    raw = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body)
    assert extract_pdf_text_blocks(raw) == ["Hello"]


def test_garbage_is_empty_not_crash():
    assert extract_pdf_text_blocks(b"\x00\x01 not a pdf") == []
    assert extract_pdf_b64_text_blocks("!!!not-base64!!!") == []


def test_b64_roundtrip():
    pdf = make_mini_pdf([["abc"]])
    b64 = base64.b64encode(pdf).decode()
    assert extract_pdf_b64_text_blocks(b64) == ["abc"]
