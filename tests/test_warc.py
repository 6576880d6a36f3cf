"""WARC source (sources/warc.py): record parsing, gzip members,
HTTP payload split, malformed degrade, and the docs-schema bridge
feeding the production extract operator end-to-end."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from geoparser_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    warc_to_docs,
)


def _record(warc_type: str, url: str, payload: bytes,
            date: str = "2024-01-01T00:00:00Z") -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html", status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


HTML = b"<html><body><article><p>Paris is lovely in spring.</p></article></body></html>"


def _mini_warc() -> bytes:
    return (
        _record("warcinfo", "", b"software: test\r\n")
        + _record("request", "http://a.example/", b"GET / HTTP/1.1\r\n\r\n")
        + _record("response", "http://a.example/", _http(HTML))
        + _record("response", "http://b.example/x.bin",
                  _http(b"\x00\x01\x02", ctype="application/octet-stream"))
    )


def test_parse_plain_records():
    recs = parse_warc_records(_mini_warc(), "f.warc")
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response"]
    resp = recs[2]
    assert resp["url"] == "http://a.example/"
    assert resp["http_status"] == 200
    assert resp["content_type"].startswith("text/html")
    assert resp["body"] == HTML          # HTTP envelope stripped


def test_parse_gzip_members():
    gz = b"".join(gzip.compress(_record(
        "response", f"http://{i}.example/", _http(HTML))) for i in range(3))
    recs = parse_warc_records(gz, "f.warc.gz")
    assert len(recs) == 3
    assert all(r["body"] == HTML for r in recs)


def test_malformed_record_skipped_not_fatal():
    raw = (_record("response", "http://ok.example/", _http(HTML))
           + b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\ngarbage"
           + _record("response", "http://ok2.example/", _http(HTML)))
    recs = parse_warc_records(raw)
    assert [r["url"] for r in recs if r["warc_type"] == "response"] == [
        "http://ok.example/", "http://ok2.example/"]
    assert parse_warc_records(b"\x1f\x8bnot really gzip") == []


def test_negative_content_length_terminates():
    """A negative Content-Length must be skipped, never loop forever
    (the cursor would otherwise move backward onto the same record)."""
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://bad/\r\nContent-Length: -54\r\n\r\n")
    raw = bad + _record("response", "http://ok.example/", _http(HTML))
    recs = parse_warc_records(raw)
    assert [r["url"] for r in recs] == ["http://ok.example/"]


def test_header_block_without_terminator_skips_not_abandons():
    """A record whose headers never terminate must not discard the
    rest of the file."""
    broken = b"WARC/1.0\r\nWARC-Type: response\r\nno terminator here"
    raw = broken + _record("response", "http://after.example/", _http(HTML))
    recs = parse_warc_records(raw)
    assert [r["url"] for r in recs] == ["http://after.example/"]


def test_corrupt_gzip_member_keeps_earlier_records():
    good = gzip.compress(_record("response", "http://g1.example/", _http(HTML)))
    good2 = gzip.compress(_record("response", "http://g2.example/", _http(HTML)))
    corrupt = b"\x1f\x8b\x08\x00garbage-not-a-member"
    recs = parse_warc_records(good + good2 + corrupt)
    assert [r["url"] for r in recs] == ["http://g1.example/", "http://g2.example/"]


def test_read_warc_and_extract_end_to_end(spark, tmp_path):
    p = tmp_path / "crawl"
    p.mkdir()
    (p / "a.warc").write_bytes(_mini_warc())
    (p / "b.warc.gz").write_bytes(
        gzip.compress(_record("response", "http://c.example/", _http(HTML))))
    warc = read_warc(spark, str(p))
    rows = warc.collect()
    assert len(rows) == 3  # response_only drops warcinfo/request
    docs = warc_to_docs(warc)
    from geoparser_spark.operators.extract import extract

    out = {r.doc_id: r.spans for r in extract(docs).collect()}
    html_docs = [s for k, s in out.items() if k.startswith("http://a.example/")]
    assert len(html_docs) == 1
    texts = [sp["text"] for sp in html_docs[0] if sp["kind"] == "text"]
    assert any("Paris is lovely" in t for t in texts)
    # the binary response rides as an opaque media span
    bin_docs = [s for k, s in out.items() if k.startswith("http://b.example/")]
    assert bin_docs and bin_docs[0][0]["media_ref"] == "warc://http://b.example/x.bin"


# ------------------------------------------------------ property tests

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=2000)
@given(st.binary(max_size=4096))
def test_parser_never_crashes_or_hangs_on_arbitrary_bytes(raw):
    recs = parse_warc_records(raw)
    assert isinstance(recs, list)


@settings(max_examples=60, deadline=3000)
@given(
    st.lists(
        st.tuples(st.sampled_from(["response", "request", "metadata"]),
                  st.binary(max_size=200)),
        max_size=6,
    ),
    st.binary(max_size=64),
)
def test_well_formed_records_survive_trailing_garbage(recs, garbage):
    raw = b"".join(
        _record(t, f"http://h/{i}", body) for i, (t, body) in enumerate(recs)
    )
    # garbage that cannot contain a record magic must not add records
    garbage = garbage.replace(b"WARC/", b"XXXX/")
    parsed = parse_warc_records(raw + garbage)
    assert len(parsed) == len(recs)
    assert [r["url"] for r in parsed] == [f"http://h/{i}" for i in range(len(recs))]
