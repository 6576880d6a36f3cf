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

__all__ = ["ngram_overlap", "token_familiarity",
           "bigram_familiarity", "source_filter"]


def _tokens(text_col: str) -> Column:
    return F.split(normalize_text(F.col(text_col)), " ")


def _bound(tokens: Column, body) -> Column:
    """Evaluate ``tokens`` ONCE and hand it to ``body`` as a bound
    lambda variable.  Referencing a derived array column directly
    inside a higher-order lambda lets Catalyst projection collapse
    re-inline the whole split(normalize(text)) at EVERY element access
    — measured 28 s instead of ~1 s at sf0.1 for the hashed gram
    probe.  The transform(array(x), tk -> ...)[0] binding is the same
    discipline split_mega_docs documents."""
    return F.transform(F.array(tokens), body)[0]


def _grams(tokens: Column, n: int) -> Column:
    """array<string> of space-joined n-grams (empty array when the doc
    has fewer than n tokens) — one generator expression, no shuffle."""
    return _bound(tokens, lambda tk: F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - n),
            lambda i: F.array_join(F.slice(tk, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>")))


def _gram_hashes(tokens: Column, n: int) -> Column:
    """array<long> of xxhash64 n-gram fingerprints, hashed DIRECTLY
    from the n token columns — no intermediate gram string is ever
    built, and the broadcast holds 8-byte longs instead of ~50-byte
    strings.  Multi-arg xxhash64 folds each token's hash into the next
    seed, so it is NOT equivalent to hashing the joined string — both
    sides of the join must use this same expression."""
    return _bound(tokens, lambda tk: F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - n),
            lambda i: F.xxhash64(
                *[F.element_at(tk, i + k + 1) for k in range(n)]),
        ),
    ).otherwise(F.array().cast("array<bigint>")))


def ngram_overlap(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str = "text",
                  hashed: bool = True) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many of its
    n-grams appear anywhere in the eval set.

    Output: (id_col, n_gram_hits, contaminated).  Docs shorter than n
    tokens have zero grams and are clean by definition.

    Scale shape: the eval side is the SMALL side (benchmarks are
    thousands of docs, not billions) — its distinct gram set broadcasts.
    The corpus side explodes grams map-side and LEFT-SEMI-probes the
    broadcast per gram, then re-aggregates per doc; distinct-per-doc
    dedup happens inside the generator (array_distinct) so the explode
    emits each candidate gram once per doc.

    ``hashed=True`` (default) probes on 8-byte xxhash64 fingerprints
    computed straight off the token array — no gram string is ever
    materialized (4× faster, and the broadcast holds longs instead of
    ~50-byte strings).  Results are identical to the string join
    modulo 2^-64 hash collisions; ``hashed=False`` keeps the
    byte-exact string join (it is what the DuckDB oracle mirrors, and
    the equivalence is pinned by a test)."""
    gramf = (lambda t: _gram_hashes(t, n)) if hashed else (lambda t: _grams(t, n))
    eval_grams = (
        eval_docs.select(
            F.explode(gramf(_tokens(eval_text_col))).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(gramf(_tokens(text_col)))).alias("gram"),
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


def _familiarity_over(docs: DataFrame, units: Column, min_count: int,
                      id_col: str, names: tuple[str, str, str]) -> DataFrame:
    """Shared core of token_familiarity / bigram_familiarity: explode
    ``units``, count the unit vocabulary (one shuffle at VOCABULARY
    grain — map-side combine collapses each partition to its distinct
    units), threshold + broadcast, per-doc rollup, and a left join back
    so docs producing zero units score 0.  ``names`` =
    (n_units, n_oov, familiarity) output column names."""
    n_name, oov_name, fam_name = names
    u = docs.select(F.col(id_col), F.explode(units).alias("u"))
    vocab = (
        u.groupBy("u").agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_count)
    )
    scored = (
        u.join(F.broadcast(vocab), "u", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias(n_name),
            F.sum(F.when(F.col("freq").isNull(), 1).otherwise(0))
             .alias(oov_name),
            F.sum(F.coalesce("freq", F.lit(0))).alias(fam_name),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            *[F.coalesce(c, F.lit(0)).alias(c)
              for c in (n_name, oov_name, fam_name)],
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
    return _familiarity_over(
        docs, _tokens(text_col), min_count, id_col,
        names=("n_tokens", "n_oov", "familiarity"))


def source_filter(docs: DataFrame, blocked: DataFrame,
                  source_col: str = "source",
                  blocked_col: str = "source") -> DataFrame:
    """Drop docs whose source/domain is on a blocklist: broadcast
    LEFT-ANTI join (blocklists are thousands of entries).  The standard
    domain-blocklist curation step, expressed so the filter rides
    map-side next to the scan."""
    b = blocked.select(F.col(blocked_col).alias(source_col)).distinct()
    return docs.join(F.broadcast(b), source_col, "left_anti")


def bigram_familiarity(docs: DataFrame, min_count: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Order-2 sibling of token_familiarity: per doc, the integer sum
    of corpus-wide BIGRAM frequencies — together the two scores are
    the integer-exact core of an interpolated unigram/bigram LM
    perplexity filter (CCNet-style), kept in LONG arithmetic so the
    result is bit-identical across engines and merge orders.

    Same two-pass shape as the unigram score: (1) bigram counts —
    one shuffle keyed on the bigram VOCABULARY (map-side combine
    collapses each partition to its distinct bigrams), thresholded
    and broadcast; (2) explode + broadcast probe + per-doc rollup.

    Output: (id_col, n_bigrams, n_oov_bigrams, bigram_familiarity);
    docs with < 2 tokens emit zero bigrams and score 0.
    """
    return _familiarity_over(
        docs, _grams(_tokens(text_col), 2), min_count, id_col,
        names=("n_bigrams", "n_oov_bigrams", "bigram_familiarity"))
