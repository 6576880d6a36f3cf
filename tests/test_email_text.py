"""EML extraction (Tika message/rfc822 breadth, E1)."""

from __future__ import annotations

from geoparser_spark.operators.email_text import (
    extract_eml_text_blocks,
    make_mini_eml,
)


def test_plain_eml_subject_and_paragraphs():
    eml = make_mini_eml("Quarterly survey report", ["Para one here.", "Para two."])
    assert extract_eml_text_blocks(eml) == [
        "Quarterly survey report", "Para one here.", "Para two.",
    ]


def test_multipart_alternative_prefers_plain():
    eml = make_mini_eml("Subj", ["plain body"], html_body="<html><body><p>html body</p></body></html>")
    assert extract_eml_text_blocks(eml) == ["Subj", "plain body"]


def test_html_only_part_routes_through_html_extractor():
    eml = (
        "Subject: S\nMIME-Version: 1.0\n"
        "Content-Type: text/html; charset=utf-8\n\n"
        "<html><body><nav><a href='/'>Home</a></nav>"
        "<p>Main content paragraph.</p></body></html>\n"
    )
    # boilerplate nav dropped by the html main-content extractor
    assert extract_eml_text_blocks(eml) == ["S", "Main content paragraph."]


def test_base64_and_quoted_printable_decode():
    import base64 as b64

    body = b64.b64encode("café body".encode("utf-8")).decode()
    eml = (
        "Subject: Enc\nMIME-Version: 1.0\n"
        "Content-Type: text/plain; charset=utf-8\n"
        f"Content-Transfer-Encoding: base64\n\n{body}\n"
    )
    assert extract_eml_text_blocks(eml) == ["Enc", "café body"]
    qp = (
        "Subject: QP\nMIME-Version: 1.0\n"
        "Content-Type: text/plain; charset=utf-8\n"
        "Content-Transfer-Encoding: quoted-printable\n\ncaf=C3=A9 qp\n"
    )
    assert extract_eml_text_blocks(qp) == ["QP", "café qp"]


def test_mixed_with_attachment_skips_binary():
    b = "----=_b1"
    eml = (
        "Subject: Att\nMIME-Version: 1.0\n"
        f'Content-Type: multipart/mixed; boundary="{b}"\n\n'
        f"--{b}\nContent-Type: text/plain\n\nbody text\n"
        f"--{b}\nContent-Type: application/octet-stream\n"
        "Content-Transfer-Encoding: base64\n"
        'Content-Disposition: attachment; filename="x.bin"\n\nAAAA\n'
        f"--{b}--\n"
    )
    assert extract_eml_text_blocks(eml) == ["Att", "body text"]


def test_damage_degrades_empty_or_passthrough():
    assert extract_eml_text_blocks(b"\xff\xfe\x00 garbage") in ([], ["��\x00 garbage"], ["�� garbage"])
    assert extract_eml_text_blocks("") == []
