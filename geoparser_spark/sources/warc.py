"""WARC (Web ARChive, ISO 28500) source — the container every public
web crawl ships as (Common Crawl, Internet Archive).  A web-scale
extract pipeline that cannot read WARC makes users re-containerize
petabytes; this reader maps WARC response records straight onto the
interleaved-docs schema the extract operators consume.

Parsing model (from the public spec, no external libs):

* a WARC file is a sequence of records: a ``WARC/1.x`` version line,
  CRLF-terminated named headers, CRLF CRLF, ``Content-Length`` payload
  bytes, CRLF CRLF;
* ``.warc.gz`` files are CONCATENATED GZIP MEMBERS (one per record, by
  convention, so readers can split on member boundaries); Python's
  zlib with window 31 decodes member streams back-to-back;
* a ``response`` record's payload is an HTTP/1.x response: status
  line + headers + CRLF CRLF + body.  The body is what extraction
  wants; Content-Type decides the span kind.

Scale shape: WARC files are written at ~1 GB by convention and are NOT
splittable mid-record (gzip members would allow it, but offsets need an
index).  The unit of parallelism is therefore the FILE — a crawl has
millions of them, dwarfing any executor count — via ``binaryFile`` +
an Arrow-batched parse kernel.  One file = one task = bounded memory;
malformed records degrade to skipped, never to a dead task.

Reference parity: GeoParser's crawled-index path pulls page text out
of a Sparkler/CDR store over HTTP (/root/reference/geoparser_app/
views.py query_crawled_index); WARC is the open-web equivalent of that
ingestion seam.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "src_file string, record_offset long, warc_type string, url string,"
    " warc_date string, http_status int, content_type string, body binary"
)

_MAX_HEADER_BYTES = 64 * 1024


def _gunzip_members(raw: bytes) -> bytes:
    """Decode concatenated gzip members (the .warc.gz convention)."""
    out = []
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(31)
        try:
            out.append(d.decompress(raw[pos:]))
            out.append(d.flush())
        except zlib.error:
            # corrupt/truncated member: keep everything the valid
            # earlier members yielded (parity with the uncompressed
            # path, which parses up to the garbage)
            break
        consumed = len(raw) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def parse_warc_records(raw: bytes, src_file: str = "") -> list[dict]:
    """All well-formed records of one WARC byte stream; malformed
    trailing garbage ends the scan, a malformed single record skips to
    the next ``WARC/`` magic — the degrade contract extraction kernels
    follow everywhere (one bad page never kills a 1 GB task)."""
    if raw[:2] == b"\x1f\x8b":
        try:
            raw = _gunzip_members(raw)
        except zlib.error:
            return []
    recs: list[dict] = []
    pos = 0
    n = len(raw)
    while pos < n:
        start = raw.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = raw.find(b"\r\n\r\n", start, start + _MAX_HEADER_BYTES)
        if head_end < 0:
            # malformed header block: skip to the next record magic
            # instead of abandoning the rest of the file
            pos = start + 5
            continue
        headers: dict[str, str] = {}
        for line in raw[start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1"))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = start + 5
            continue
        if length < 0:
            # a negative length would move the cursor BACKWARD and
            # re-find this same record forever — skip it
            pos = start + 5
            continue
        body_start = head_end + 4
        payload = raw[body_start:body_start + length]
        pos = body_start + length
        rec = {
            "src_file": src_file,
            "record_offset": start,
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "http_status": None,
            "content_type": headers.get("content-type", ""),
            "body": payload,
        }
        if rec["warc_type"] == "response" and payload[:5] in (b"HTTP/",):
            http_end = payload.find(b"\r\n\r\n")
            if http_end >= 0:
                http_lines = payload[:http_end].split(b"\r\n")
                parts = http_lines[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                for line in http_lines[1:]:
                    k, _, v = line.partition(b":")
                    if _ and k.strip().lower() == b"content-type":
                        rec["content_type"] = v.strip().decode("latin-1")
                rec["body"] = payload[http_end + 4:]
        recs.append(rec)
    return recs


def read_warc(spark: SparkSession, path: str,
              response_only: bool = True) -> DataFrame:
    """WARC dir/glob -> one row per record (WARC_SCHEMA).  File-grained
    parallelism via binaryFile + mapInPandas (Arrow-batched); the kernel
    holds one file at a time."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["src_file", "record_offset", "warc_type", "url",
                "warc_date", "http_status", "content_type", "body"]
        for pdf in batches:
            rows = []
            for src, raw in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_records(bytes(raw), src_file=src))
            out = pd.DataFrame(rows, columns=cols)
            if rows and response_only:
                out = out[out["warc_type"] == "response"]
            yield out

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(kernel, schema=WARC_SCHEMA)


def warc_to_docs(warc: DataFrame) -> DataFrame:
    """WARC response rows -> the interleaved docs schema the extract
    operators consume: doc_id = url@offset, one span whose kind follows
    the Content-Type (html/pdf pass as parseable kinds; everything else
    rides as an opaque media span)."""
    from pyspark.sql import functions as F

    kind = (
        F.when(F.col("content_type").startswith("text/html"), F.lit("html"))
        .when(F.col("content_type").startswith("application/pdf"), F.lit("pdf_b64"))
        .when(F.col("content_type").startswith("text/plain"), F.lit("text"))
        .otherwise(F.lit("media"))
    )
    text = (
        F.when(kind == "html", F.col("body").cast("string"))
        .when(kind == "text", F.col("body").cast("string"))
        .when(kind == "pdf_b64", F.base64(F.col("body")))
        .otherwise(F.lit(None).cast("string"))
    )
    media_ref = F.when(
        kind == "media",
        F.concat(F.lit("warc://"), F.col("url")),
    ).otherwise(F.lit(None).cast("string"))
    return warc.select(
        F.concat_ws("@", F.col("url"),
                    F.col("record_offset").cast("string")).alias("doc_id"),
        F.array(F.struct(
            kind.alias("kind"), text.alias("text"),
            media_ref.alias("media_ref"),
            F.lit(0).alias("offset"),
        )).alias("spans"),
    )
