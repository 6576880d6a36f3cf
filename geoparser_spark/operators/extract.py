"""Extract stage: interleaved (html|text|pdf_bytes|media) spans →
ordered main-content text + media spans.

Reference dataflow replaced: per-doc HTTP round-trip to a Tika server
(geoparser_app/views.py:125,357-402 — ~0.6 docs/sec sequential) becomes
one Arrow-batched ``mapInPandas`` stage: JVM ships columnar batches to
the Python worker, the worker parses a whole batch, ships columnar
results back.  No per-row UDF, no driver loop, no network hop.

Scale notes (100 TB design point):
  * The stage is map-only — zero shuffle.  Upstream, runtime.salted_
    repartition spreads mega-documents (BASELINE skew fixture: 0.1% of
    docs own 100-1000x median span count) across partitions.
  * ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds Python-worker
    memory per batch regardless of doc size distribution.
  * Catalyst prunes unused columns before the Arrow hop because we
    select exactly (doc_id, spans).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from geoparser_spark.operators.html_main import extract_html_blocks
from geoparser_spark.operators.pdf_text import extract_pdf_b64_text_blocks
from geoparser_spark.schemas import EXTRACTED

MEDIA_KINDS = frozenset({"image", "video", "audio", "table"})


def _norm_text(s: str) -> str:
    return " ".join(s.split())


def extract_doc_spans(spans: list[dict]) -> list[dict]:
    """Pure-Python core: input span dicts → ordered output span dicts.

    Deterministic; processes spans in ``offset`` order (offset is data,
    never implicit row order — SURVEY.md §4.2 ordering discipline).
    """
    out: list[dict] = []
    if spans is None:  # Arrow hands array cells over as numpy arrays —
        spans = []     # never test their truthiness
    for span in sorted(spans, key=lambda s: s.get("offset") if s.get("offset") is not None else 0):
        kind = span.get("kind") or ""
        text = span.get("text")
        media_ref = span.get("media_ref")
        if kind == "html" and text:
            for k, t, m in extract_html_blocks(text):
                out.append({"kind": k, "text": t, "media_ref": m})
        elif kind == "pdf_bytes" and text:
            for block in extract_pdf_b64_text_blocks(text):
                out.append({"kind": "text", "text": block, "media_ref": None})
        elif kind == "text" and text:
            t = _norm_text(text)
            if t:
                out.append({"kind": "text", "text": t, "media_ref": None})
        elif media_ref is not None and (kind in MEDIA_KINDS or not text):
            out.append({"kind": kind, "text": None, "media_ref": media_ref})
        elif text:
            # unknown text-bearing kind: conservative passthrough
            t = _norm_text(text)
            if t:
                out.append({"kind": "text", "text": t, "media_ref": None})
    for i, s in enumerate(out):
        s["order"] = i
    return out


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "spans": [
                    [
                        (s["kind"], s["text"], s["media_ref"], s["order"])
                        for s in extract_doc_spans(spans)
                    ]
                    for spans in pdf["spans"]
                ],
            }
        )


def extract(docs: DataFrame) -> DataFrame:
    """docs(doc_id, spans[SPAN_IN]) → extracted(doc_id, spans[SPAN_OUT])."""
    return docs.select("doc_id", "spans").mapInPandas(_extract_batches, schema=EXTRACTED)
