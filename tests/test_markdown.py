"""Markdown extraction (operators/markdown_text.py): block contract,
inline rules, media spans, and totality under corruption."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from geoparser_spark.operators.markdown_text import (
    extract_markdown_spans,
    make_mini_md,
)


def _texts(md):
    return [t for k, t, m in extract_markdown_spans(md) if k == "text"]


def test_headings_and_paragraphs():
    md = "# Title\n\nFirst para\nsame block\n\nSecond para\n"
    assert _texts(md) == ["Title", "First para same block", "Second para"]


def test_list_quote_and_break_markers_stripped():
    md = "> quoted line\n\n- item one\n2. item two\n\n---\n\nafter break\n"
    assert _texts(md) == ["quoted line", "item one item two", "after break"]


def test_setext_heading_underline_dropped():
    md = "Heading\n=======\n\nbody\n"
    assert _texts(md) == ["Heading", "body"]


def test_fenced_code_is_one_block():
    md = "intro\n\n```\ncode line1\n\ncode line2\n```\n\noutro\n"
    assert _texts(md) == ["intro", "code line1 code line2", "outro"]


def test_unclosed_fence_degrades_to_code():
    md = "para\n\n```\nrest of doc\nnever closed\n"
    assert _texts(md) == ["para", "rest of doc never closed"]


def test_inline_links_images_emphasis():
    md = "See [the docs](http://d) and **bold** plus `code` and snake_case\n"
    assert _texts(md) == ["See the docs and bold plus code and snake_case"]


def test_image_becomes_media_span_after_block():
    md = "text with ![an alt](img://x) inside\n\n![](img://y)\n"
    spans = extract_markdown_spans(md)
    assert spans == [
        ("text", "text with an alt inside", None),
        ("image", None, "img://x"),
        ("image", None, "img://y"),
    ]


def test_make_mini_md_round_trips():
    md = make_mini_md("note 7", ["alpha beta", "gamma"],
                      image_urls=["img://md/7"])
    assert extract_markdown_spans(md) == [
        ("text", "note 7", None),
        ("text", "alpha beta", None),
        ("text", "gamma", None),
        ("image", None, "img://md/7"),
    ]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_never_raises_on_arbitrary_text(s):
    spans = extract_markdown_spans(s)
    for k, t, m in spans:
        assert k in ("text", "image")
        if k == "text":
            assert t == " ".join(t.split()) and t != ""


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(
    ["# h", "```", "> q", "- li", "***", "![a](u)", "[t](u)", "", "para",
     "Heading", "===", "~~~"]), max_size=30))
def test_never_raises_on_marker_soup(lines):
    extract_markdown_spans("\n".join(lines))
