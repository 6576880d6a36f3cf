"""Native text column functions (E2-E4 equivalents).

The reference scrubs punctuation/newlines with a Python str.replace
loop (geoparser_app/views.py:114-116) and collapses whitespace with
encode/decode hacks (views.py:361-376).  These are single codegen'd
expressions instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from geoparser_spark.operators.geotag import normalize_text  # noqa: F401


def punct_scrub(col: Column | str) -> Column:
    """E3 — replace punctuation + newlines with spaces
    (reference: views.py:114-116)."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col,
                            r"[\p{Punct}\n]", " ")


def whitespace_collapse(col: Column | str) -> Column:
    """E4 — collapse whitespace runs (reference: views.py:361-376)."""
    return F.trim(
        F.regexp_replace(F.col(col) if isinstance(col, str) else col, r"\s+", " ")
    )
