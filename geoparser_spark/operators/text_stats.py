"""Corpus-relative term statistics: TF-IDF-style term ranking.

The reference's only term-level analytics is countMatch keyword
frequency (reference `experiments/evaluation/scripts/countMatch.py:9-29`)
— a fixed keyword list against a Solr index.  The corpus-relative
version a curation pipeline actually needs is per-document salient-term
extraction: rank each document's terms by tf x idf where idf comes from
the WHOLE corpus document frequency.

Exactness discipline: the classic ln(N/df) idf is float and libm-
dependent; the driver's value hash would be hostage to the engine's ln.
We use an integer-exact monotone equivalent: score = tf * (N*SCALE div
df).  For fixed N, (N*SCALE div df) is strictly decreasing in df until
quantization, so ranking matches idf ranking at SCALE=1e6 for any
corpus below ~1e6 docs per quantization step; ties break on the term
string.  Every value in the output is a BIGINT — bit-stable across
engines.

Shape at scale: explode to token grain -> two hash aggregations
(doc-term tf, then term df with map-side combine at VOCABULARY grain)
-> broadcast the 1-row corpus count -> per-doc top-k via row_number
window partitioned by doc_id (doc-grain partitions, no global sort).
The df table is vocabulary-sized; if it outgrows broadcast, the
tf<->df join is an equi-join on term — AQE picks the strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geoparser_spark.operators.geotag import normalize_text

SCALE = 1_000_000


def tfidf_topk(docs: DataFrame, k: int = 3, doc_id_col: str = "doc_id",
               text_col: str = "text", persist_tf: bool = True) -> DataFrame:
    """Top-k salient terms per document by integer-exact tf-idf.

    Returns (doc_id, term, tf, df, score) with score = tf *
    (N * SCALE div df); deterministic rank ties broken by term asc.

    persist_tf: the doc-term aggregate feeds BOTH the scored join and
    the document-frequency rollup; the two consumers column-prune the
    subtree differently so ReuseExchange cannot unify them, and without
    persistence the corpus is scanned + exploded TWICE (verified in
    PLANS.md).  Persisting tf trades one materialization (far smaller
    than the token stream after the per-doc count) for the second
    corpus scan — at 100 TB that's the whole game.  A window
    `count over (partition by term)` would also avoid the rescan but
    buffers every ("the", doc) row in one partition — the heavy-hitter
    OOM shape line_dedup was dinged for; the vocabulary-grain groupBy
    + join stays map-side-combined and skew-free.

    Release is ENFORCED via plans.caching: the cache registers in the
    caller's ``with released():`` scope (or the global scope drained
    by ``release_all()``) — see plans/caching.py.
    """
    from geoparser_spark.plans.caching import track
    toks = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    if persist_tf:
        tf = track(tf)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.expr(f"tf * ((n_docs * {SCALE}L) div df)").cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "score")
    )
