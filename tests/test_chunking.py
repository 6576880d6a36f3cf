"""Token chunking + sequence packing (operators/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoparser_spark.operators.chunking import chunk_documents, pack_sequences


def _doc(n_tokens: int) -> str:
    return " ".join(f"w{i}" for i in range(n_tokens))


def test_chunk_windows_and_overlap(spark):
    d = spark.createDataFrame([(1, _doc(25))], "doc_id: long, text: string")
    got = sorted(
        (r.chunk_idx, r.n_tokens, r.chunk_text.split()[0], r.chunk_text.split()[-1])
        for r in chunk_documents(d, max_tokens=10, overlap=3).collect()
    )
    # starts at 0, 7, 14, 21 (step 7); last window truncated
    assert got == [
        (0, 10, "w0", "w9"),
        (1, 10, "w7", "w16"),
        (2, 10, "w14", "w23"),
        (3, 4, "w21", "w24"),
    ]


def test_chunk_short_and_empty_docs(spark):
    d = spark.createDataFrame(
        [(1, _doc(5)), (2, ""), (3, None), (4, "...")],
        "doc_id: long, text: string")
    got = {r.doc_id: (r.chunk_idx, r.n_tokens)
           for r in chunk_documents(d, max_tokens=10, overlap=3).collect()}
    assert got == {1: (0, 5)}  # empty/punct-only docs chunk to nothing


def test_no_redundant_trailing_chunk(spark):
    """A doc with step < n <= last_start + overlap must NOT emit a
    tail window fully contained in the previous one — e.g. 49 tokens
    at max=64/overlap=16 is exactly one chunk."""
    d = spark.createDataFrame(
        [(1, _doc(49)), (2, _doc(64)), (3, _doc(65))],
        "doc_id: long, text: string")
    got = {}
    for r in chunk_documents(d, max_tokens=64, overlap=16).collect():
        got.setdefault(r.doc_id, []).append(r.n_tokens)
    assert got[1] == [49]          # one window, no duplicate tail
    assert got[2] == [64]
    assert sorted(got[3]) == [17, 64]  # 65 tokens genuinely needs two


def test_pack_bucket_validation(spark):
    d = spark.createDataFrame([(1, 0, "x", 1)],
                              "doc_id: long, chunk_idx: int, chunk_text: string, n_tokens: int")
    with pytest.raises(ValueError):
        pack_sequences(d, max_tokens=10, n_buckets=0)


def test_chunk_validation(spark):
    d = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with pytest.raises(ValueError):
        chunk_documents(d, max_tokens=10, overlap=10)


def test_chunk_tokens_cover_doc_exactly_with_overlap(spark):
    d = spark.createDataFrame([(1, _doc(100))], "doc_id: long, text: string")
    rows = chunk_documents(d, max_tokens=16, overlap=4).collect()
    # with step 12: unique tokens covered = all 100, each boundary
    # token appearing in exactly two consecutive chunks
    toks = [t for r in rows for t in r.chunk_text.split()]
    assert len(set(toks)) == 100


def test_pack_respects_budget_modulo_last_chunk(spark):
    d = spark.createDataFrame([(1, _doc(300))], "doc_id: long, text: string")
    chunks = chunk_documents(d, max_tokens=50, overlap=0)
    packed = pack_sequences(chunks, max_tokens=120, n_buckets=4)
    per_seq = (
        packed.groupBy("bucket", "seq_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    )
    # streaming packing: total <= max + one chunk's tokens
    assert all(r.tot <= 120 + 50 for r in per_seq)
    assert len(per_seq) >= 2


def test_pack_deterministic_across_partitioning(spark):
    docs = spark.createDataFrame(
        [(i, _doc(20 + i % 37)) for i in range(60)], "doc_id: long, text: string")
    chunks = chunk_documents(docs, max_tokens=16, overlap=0)
    a = sorted(map(tuple, pack_sequences(chunks, 64, n_buckets=8).collect()))
    b = sorted(map(tuple, pack_sequences(
        chunks.repartition(13), 64, n_buckets=8).collect()))
    assert a == b


def test_pack_validation(spark):
    d = spark.createDataFrame([(1, 0, "x", 1)],
                              "doc_id: long, chunk_idx: int, chunk_text: string, n_tokens: int")
    with pytest.raises(ValueError):
        pack_sequences(d, max_tokens=0)
