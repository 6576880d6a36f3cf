"""Corpus curation against reference sets: benchmark decontamination,
corpus-frequency scoring, and source blocklists.

Shared 100 TB shape for the first two: a corpus-scale pass NEVER joins
fact-to-fact.  The small side (eval-set n-grams, the vocabulary map)
reduces to a bounded table that broadcasts; the doc side explodes
map-side, probes the broadcast, and re-aggregates per doc — so the only
shuffle is partial (doc_id, counters) aggregates with map-side combine,
rows ≈ documents, never tokens.

No per-row Python anywhere; every stage is built-in column expressions
(generators + broadcast hash joins), mirrored in the DuckDB oracles.

Reference parity: GeoParser has no curation stage; this family belongs
to the LLM-training-pipeline mandate (decontamination per Brown et al.
2020 appendix C / GPT-3's 13-gram filtering; familiarity is the
integer-exact core of a unigram-LM score — the log/perplexity transform
is display-side because libm ``ln`` is not bit-identical across
engines, and a cross-engine value gate must stay in integer space).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geoparser_spark.operators.geotag import normalize_text

__all__ = ["ngram_overlap", "token_familiarity", "source_filter"]


def _tokens(text_col: str) -> Column:
    return F.split(normalize_text(F.col(text_col)), " ")


def _grams(tokens: Column, n: int) -> Column:
    """array<string> of space-joined n-grams (empty array when the doc
    has fewer than n tokens) — one generator expression, no shuffle."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_overlap(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many of its
    n-grams appear anywhere in the eval set.

    Output: (id_col, n_gram_hits, contaminated).  Docs shorter than n
    tokens have zero grams and are clean by definition.

    Scale shape: the eval side is the SMALL side (benchmarks are
    thousands of docs, not billions) — its distinct gram set broadcasts.
    The corpus side explodes grams map-side and LEFT-SEMI-probes the
    broadcast per gram, then re-aggregates per doc; distinct-per-doc
    dedup happens inside the generator (array_distinct) so the explode
    emits each candidate gram once per doc.  At petabyte corpora the
    gram strings would be xxhash64'd to 8-byte keys before the probe —
    kept as strings here so the DuckDB oracle can mirror the join
    byte-for-byte (hashing changes keys, not results, modulo 2^-64
    collisions)."""
    eval_grams = (
        eval_docs.select(
            F.explode(_grams(_tokens(eval_text_col), n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_grams(_tokens(text_col), n))).alias("gram"),
    )
    hits = doc_grams.join(
        F.broadcast(eval_grams), "gram", "left_semi"
    ).groupBy(id_col).agg(F.count("*").alias("n_gram_hits"))
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_gram_hits", F.lit(0)).alias("n_gram_hits"),
            (F.coalesce("n_gram_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def token_familiarity(docs: DataFrame, min_count: int = 5,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Corpus-frequency familiarity score: per doc, the integer sum of
    each token's corpus-wide occurrence count, counting tokens below
    ``min_count`` as out-of-vocabulary (freq contribution 0).

    Output: (id_col, n_tokens, n_oov, familiarity).

    This is the integer-exact core of a unigram-LM perplexity filter:
    rank-order is identical to mean-log-frequency for filtering
    purposes, but stays in LONG arithmetic so the result is
    bit-identical across engines AND across partial-aggregation merge
    orders (a sum of ``ln`` doubles is neither).  Two passes over the
    corpus: (1) token counts — one shuffle whose key space is the
    VOCABULARY (map-side combine collapses each partition to its
    distinct tokens ≈ a few million rows regardless of corpus size);
    the thresholded vocab map broadcasts; (2) explode + broadcast probe
    + per-doc rollup — one shuffle of per-doc counters."""
    toks = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("t"))
    vocab = (
        toks.groupBy("t").agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_count)
    )
    scored = (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("freq").isNull(), 1).otherwise(0))
             .alias("n_oov"),
            F.sum(F.coalesce("freq", F.lit(0))).alias("familiarity"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.coalesce("familiarity", F.lit(0)).alias("familiarity"),
        )
    )


def source_filter(docs: DataFrame, blocked: DataFrame,
                  source_col: str = "source",
                  blocked_col: str = "source") -> DataFrame:
    """Drop docs whose source/domain is on a blocklist: broadcast
    LEFT-ANTI join (blocklists are thousands of entries).  The standard
    domain-blocklist curation step, expressed so the filter rides
    map-side next to the scan."""
    b = blocked.select(F.col(blocked_col).alias(source_col)).distinct()
    return docs.join(F.broadcast(b), source_col, "left_anti")
