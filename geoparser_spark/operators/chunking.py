"""Training-sequence preparation: token-window chunking and sequence
packing — the last mile between a curated corpus and a training run.

Both are single-pass column-expression operators:

* :func:`chunk_documents` — split each doc into fixed-token windows
  with overlap (the standard context-window prep).  Map-only: one
  generator expression per doc, no shuffle; the token array is bound
  once as a lambda variable (projection-collapse discipline).
* :func:`pack_sequences` — assign chunks to training sequences of at
  most ``max_tokens`` by deterministic streaming packing: order chunks
  by (xxhash64(id), id) inside each hash bucket, take a running token
  sum, and cut sequence ids at floor(exclusive-cumsum / max_tokens).
  This is the STREAMING approximation every large pipeline uses — a
  sequence may overflow by at most one chunk (the chunk that crosses
  the boundary starts the next sequence's budget); exact bin packing
  is NP-hard and inherently sequential.  One shuffle at bucket grain;
  buckets are independent, so packing parallelizes without any global
  order.

Reference parity: none in GeoParser; training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from geoparser_spark.operators.geotag import normalize_text

__all__ = ["chunk_documents", "pack_sequences"]


def _bound(tokens: Column, body) -> Column:
    return F.transform(F.array(tokens), body)[0]


def chunk_documents(docs: DataFrame, max_tokens: int = 512,
                    overlap: int = 64, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): fixed-token windows with
    ``overlap`` tokens of context carried between consecutive chunks.
    Docs with zero tokens produce zero chunks; a doc shorter than
    ``max_tokens`` produces exactly one."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}")
    step = max_tokens - overlap
    toks = F.split(normalize_text(F.col(text_col)), " ")
    chunks = _bound(toks, lambda tk: F.when(
        (F.size(tk) > 0) & (F.array_join(tk, "") != ""),
        F.transform(
            # start offsets 0, step, 2*step, ..., stopping at the FIRST
            # window that reaches the doc end: last start =
            # max(0, ceil((n - max_tokens)/step)) * step.  The naive
            # "while start < n" bound emits a fully-redundant trailing
            # window whenever the previous one already covered the tail
            # (docs with n in (step, last_start + overlap]).
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.lit(0),
                    F.ceil((F.size(tk) - max_tokens) / F.lit(step)).cast("int"),
                ) * F.lit(step),
                F.lit(step)),
            lambda s: F.struct(
                F.array_join(F.slice(tk, s + 1, max_tokens), " ").alias("chunk_text"),
                F.least(F.size(tk) - s, F.lit(max_tokens)).alias("n_tokens"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_text:string,n_tokens:int>>")))
    return docs.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "c"),
    ).select(
        id_col, "chunk_idx", "c.chunk_text",
        F.col("c.n_tokens").cast("int").alias("n_tokens"),
    )


def pack_sequences(chunks: DataFrame, max_tokens: int = 2048,
                   n_buckets: int = 1024,
                   id_col: str = "doc_id", idx_col: str = "chunk_idx",
                   tokens_col: str = "n_tokens") -> DataFrame:
    """Append (bucket, seq_id): the training sequence each chunk packs
    into.  seq_id = floor(exclusive running token sum / max_tokens)
    within the chunk's hash bucket, rows ordered deterministically by
    (xxhash64(id, idx), id, idx) — stable under re-partitioning,
    retries, and cluster size like the whole sampling family.

    A sequence's token total may overflow max_tokens by at most its
    last chunk (streaming packing); callers that need a hard cap chunk
    at <= max_tokens first, which bounds the overflow to one window.
    ``n_buckets`` bounds per-task state: each bucket packs
    independently (~corpus_tokens / n_buckets tokens each)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if n_buckets <= 0:
        # pmod(h, 0) is NULL — every chunk would silently collapse
        # into one null bucket, un-bounding the per-task state
        raise ValueError("n_buckets must be positive")
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    # idx cast to LONG before hashing: xxhash64's int32 path hashes
    # differently than its int64 path, so the order would otherwise
    # depend on the chunk_idx column's width
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.xxhash64(F.col(id_col),
                            F.col(idx_col).cast("long")).asc(),
                 F.col(id_col).asc(), F.col(idx_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = chunks.withColumn("bucket", bucket.cast("int"))
    cum = F.sum(tokens_col).over(w) - F.col(tokens_col)  # exclusive
    return out.withColumn(
        "seq_id", F.floor(cum / F.lit(max_tokens)).cast("int"))
