"""S9 — JSON export/import as first-class operators.

The reference moves corpora between Solr cores through JSON files:
``exportFromSolrToJson.py`` pages every doc of a core into one JSON
dump (reference: experiments/evaluation/scripts/exportFromSolrToJson.py:10-26)
and ``jsonToSolr.py`` posts it back (jsonToSolr.py:1-40) — driver-side
HTTP loops over stringified fields.

Rebuild: distributed JSON lines read/write with the REAL nested
schemas from :mod:`geoparser_spark.schemas`.  JSON is schema-lossy on
read (numbers widen, structs become maps without guidance), so import
always applies the explicit schema — the round trip preserves span
sequences exactly (pinned by test_json_round_trip_* tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from geoparser_spark.schemas import EXTRACTED, GEOTAGGED


def export_json(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = None) -> None:
    """Write any pipeline table as JSON-lines (one object per row,
    distributed — not the reference's single driver-side dump file)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def import_json(spark: SparkSession, path: str,
                schema: T.StructType) -> DataFrame:
    """Read a JSON-lines export back with its authoritative schema —
    never schema inference, which would widen ints and lose struct
    field order."""
    return spark.read.schema(schema).json(path)


def export_extracted(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    export_json(df, path, mode)


def import_extracted(spark: SparkSession, path: str) -> DataFrame:
    return import_json(spark, path, EXTRACTED)


def export_geotagged(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    export_json(df, path, mode)


def import_geotagged(spark: SparkSession, path: str) -> DataFrame:
    return import_json(spark, path, GEOTAGGED)
