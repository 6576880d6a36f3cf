"""Columnar table formats beyond Parquet: ORC read/write.

Iceberg tables (the 10^12-doc deployment target, SURVEY §1.3) accept
Parquet OR ORC data files; a rebuild claiming the catalog seam should
prove the engine round-trips its tables through both.  Spark's ORC
support is built in (native reader/writer, predicate pushdown, column
pruning — the same scan properties the parquet plans are pinned on).

JSON is schema-lossy (sources/json_io.py applies explicit schemas on
import); ORC is NOT — it stores the full nested schema, so the round
trip needs no schema argument and must preserve arrays-of-structs
exactly (pinned by pytest and the driver's orc_roundtrip oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def export_orc(df: DataFrame, path: str, mode: str = "overwrite",
               compression: str = "zlib") -> None:
    """Write any pipeline table as ORC (distributed, columnar,
    footer-indexed — a drop-in alternative data-file format for the
    snapshot/Iceberg layer)."""
    df.write.mode(mode).option("compression", compression).orc(path)


def import_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC table back — self-describing schema, no inference
    step, nested types intact."""
    return spark.read.orc(path)
