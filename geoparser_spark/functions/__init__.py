"""Reusable native column functions."""

from geoparser_spark.functions.text import (  # noqa: F401
    normalize_text,
    punct_scrub,
    whitespace_collapse,
)
