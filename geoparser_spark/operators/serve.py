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
