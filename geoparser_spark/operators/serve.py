"""Serving-side relational operators (SURVEY.md §2.3 Q1-Q6, Q12).

Each function re-expresses a Solr HTTP query pattern from the reference
as a native DataFrame op — Catalyst pushes filters/projections into the
parquet/Iceberg scan, so what was a paginated HTTP loop becomes a
pruned columnar scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_SEARCH_RESULT = 20000  # reference cap: geoparser_app/views.py:49


def point_lookup(df: DataFrame, doc_id: str) -> DataFrame:
    """Q1 — fq=id:"..." point lookup (geoparser_app/solr.py:174,209,263)."""
    return df.where(F.col("doc_id") == F.lit(doc_id))


def non_empty_locations(geotagged: DataFrame, col: str = "locations") -> DataFrame:
    """Q2 — q=-points:"[]" filter (geoparser_app/solr.py:323,392)."""
    return geotagged.where(F.size(F.col(col)) > 0)


def keyword_search(texts: DataFrame, keyword: str,
                   limit: int = MAX_SEARCH_RESULT) -> DataFrame:
    """Q3 — wildcard q=*kw* keyword search capped at MAX_SEARCH_RESULT
    (geoparser_app/views.py:417-451).  Case-insensitive substring, like
    the reference's *kw* wildcard."""
    return (
        texts.where(F.lower(F.col("text")).contains(keyword.lower()))
        .select("doc_id")
        .limit(limit)
    )


def points_for_docs(points: DataFrame, matched_ids: DataFrame) -> DataFrame:
    """Q4 — the reference's N-HTTP-lookups loop
    (geoparser_app/solr.py:384-422) as ONE broadcast left-semi join.
    matched_ids <= 20k rows, so the broadcast is explicit."""
    return points.join(F.broadcast(matched_ids), "doc_id", "left_semi")


def search_points(texts: DataFrame, points: DataFrame, keyword: str,
                  limit: int = MAX_SEARCH_RESULT) -> DataFrame:
    """Q3+Q4 composed — search_crawled_index end-to-end
    (geoparser_app/views.py:417-461) as one lazy plan."""
    return points_for_docs(points, keyword_search(texts, keyword, limit))


def keyword_match_counts(docs: DataFrame, keywords: list[str],
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Evaluation op — the reference's countMatch.py keyword-hit count
    (experiments/evaluation/scripts/countMatch.py:9-30): tokenize on
    runs of non-ASCII-letters (digits separate, exactly like the
    reference's ord-range filter), then count tokens that appear in the
    keyword list, CASE-SENSITIVELY (the reference compares raw split
    words against the comma-split search terms).

    The reference fetches every matching doc over HTTP and loops in
    Python; this is one codegen'd expression per row — per-doc hit
    counts come back as rows, a total is one further sum."""
    kws = F.array(*[F.lit(k) for k in keywords])
    toks = F.split(F.col(text_col), r"[^A-Za-z]+")
    n = F.size(F.filter(toks, lambda t: F.array_contains(kws, t)))
    return docs.select(F.col(id_col), n.alias("n_hits"))


def keyword_match_total(docs: DataFrame, keywords: list[str],
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """countMatch.py's final printed number: the corpus-wide hit count
    for the keyword set (reference prints {search: total})."""
    return keyword_match_counts(docs, keywords, text_col, id_col).agg(
        F.sum("n_hits").alias("total_hits"),
        F.count(F.when(F.col("n_hits") > 0, 1)).alias("docs_with_hits"),
    )


def radius_search(points: DataFrame, lat: float, lon: float,
                  radius_km: float,
                  lat_col: str = "latitude",
                  lon_col: str = "longitude") -> DataFrame:
    """Q13 — all points within ``radius_km`` of (lat, lon): the map
    UI's "near me" query, the great-circle sibling of the rectangular
    viewport filter (Q11).  Haversine as one codegen'd expression —
    a map-only filter that pushes past the scan like any predicate; at
    serving scale the cheap bounding-box pre-filter (|Δlat| ≤ r/111.0,
    a strict OVER-approximation of the sphere's 111.195 km/degree so it
    can never exclude a true hit) short-circuits the trig for the
    overwhelming majority of rows.

    Adds ``dist_km`` (rounded to 6 decimals).  Both engines evaluate
    the same IEEE-double formula; the oracle comparison is stable
    because the test data is fixed (a point landing within 1e-6 km of
    the boundary would be a one-time data property, not run noise)."""
    from geoparser_spark.operators.geojoin import haversine_km

    dist = haversine_km(F.lit(lat), F.lit(lon),
                        F.col(lat_col), F.col(lon_col))
    box = (F.abs(F.col(lat_col) - F.lit(lat)) <= F.lit(radius_km / 111.0))
    return (
        points.where(box)
        .withColumn("dist_km", F.round(dist, 6))
        .where(F.col("dist_km") <= radius_km)
    )


# ----------------------------------------------------------- ranked search

def _bm25_doc_stats(text_col: str, terms: list[str]):
    """One bound expression per doc: struct(dl, tf0, tf1, ...).

    The token array is evaluated ONCE via the transform(array(x))[0]
    binding (the projection-collapse discipline documented in
    operators/curation.py:_bound) — otherwise every per-term tf filter
    re-inlines split(normalize(text))."""
    from geoparser_spark.operators.geotag import normalize_text

    toks = F.split(normalize_text(F.col(text_col)), " ")

    def eq(w):
        # NOT a default-arg capture: pyspark derives higher-order-
        # function arity from the lambda signature, so `lambda t, w=x:`
        # would be read as the (element, index) two-arg form
        return lambda t: t == F.lit(w)

    def body(tk):
        fields = [F.size(tk).alias("dl")]
        for j, term in enumerate(terms):
            fields.append(F.size(F.filter(tk, eq(term))).alias(f"tf{j}"))
        return F.struct(*fields)

    return F.transform(F.array(toks), body)[0]


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Q15 — BM25-ranked keyword search, the scoring the reference
    actually serves: its Solr/Lucene index ranks every query with BM25
    (Solr 5 bundled in the reference's Docker stack; the search path is
    geoparser_app/views.py:417-451 → Solr `select?q=`).  The rebuild's
    plain keyword_search (Q3) reproduces the *filter*; this reproduces
    the *ranking*.

    Two passes, both scans pruned to (id, text):
      1. corpus statistics — N, Σdl, per-term df — one hash aggregate
         collapsed to a single driver row (Lucene reads the same three
         numbers from segment metadata; at 100 TB this aggregate is a
         tiny side table maintained on ingest, not recomputed per
         query — recomputing here keeps the operator self-contained);
      2. scoring — per-doc tf/dl against literal idf/avgdl constants,
         one codegen'd expression, then TakeOrderedAndProject for the
         global top-k (per-partition heaps, no global sort).

    idf uses Lucene's BM25 form ln(1 + (N - df + .5)/(df + .5)),
    computed DRIVER-side in Python so no libm call runs on the JVM —
    the scoring expression multiplies Spark doubles by literal doubles,
    keeping engine and pure-Python oracle bit-identical (every +,*,/ is
    the same IEEE-754 op in the same order on both sides).
    """
    import math

    if not terms:  # empty query: the empty result shape, no stats pass
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0.0).alias("score")).where(F.lit(False))
    stats = _bm25_doc_stats(text_col, terms)
    per = docs.select(F.col(id_col).alias("doc_id"), stats.alias("s"))
    row = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s.dl").alias("sum_dl"),
        *[F.count(F.when(F.col(f"s.tf{j}") > 0, 1)).alias(f"df{j}")
          for j in range(len(terms))],
    ).collect()[0]
    n = row["n"]
    if n == 0:
        return per.select(
            "doc_id", F.lit(0.0).alias("score")).where(F.lit(False))
    avgdl = row["sum_dl"] / n
    idf = [math.log(1.0 + (n - row[f"df{j}"] + 0.5) / (row[f"df{j}"] + 0.5))
           for j in range(len(terms))]
    k1p1, one_m_b = k1 + 1.0, 1.0 - b

    def term_score(j):
        tf = F.col(f"s.tf{j}").cast("double")
        dl = F.col("s.dl").cast("double")
        return (F.lit(idf[j]) * (tf * F.lit(k1p1))
                / (tf + F.lit(k1) * (F.lit(one_m_b)
                                     + F.lit(b) * (dl / F.lit(avgdl)))))

    score = term_score(0)
    hit = F.col("s.tf0") > 0
    for j in range(1, len(terms)):
        score = score + term_score(j)
        hit = hit | (F.col(f"s.tf{j}") > 0)
    return (
        per.where(hit)
        .select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
