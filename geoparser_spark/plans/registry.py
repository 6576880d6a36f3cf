"""Index/run registry (SURVEY.md §2.3 Q13).

The reference keeps per-domain crawl-index registrations as PARALLEL
ARRAYS inside a single Solr "admin" document — `indexes`, `core_names`,
`point_len_list`, `idx_size_list`, `idx_field_list` mutated in lockstep
(reference: geoparser_app/solr_admin.py:22-38 create, 77-93 update,
115-161 details, 210-253 delete).  Losing lockstep corrupts every
registration for the domain.

Rebuild: one NORMAL ROW per (domain, index_path) in a registry table —
the semantic upgrade is the schema, the operations are plain DataFrame
ops.  Parquet overwrite here; at production scale the same functions
target an Iceberg table where `register`/`delete` become row-level
MERGE/DELETE on a snapshot.  Credentials (keyczar-encrypted in the
reference, solr_admin.py usernames/passwords) are out of scope: the
rebuild reads tables, not remote authenticated indexes.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("index_path", T.StringType(), False),
        T.StructField("core_name", T.StringType(), True),
        T.StructField("idx_fields", T.ArrayType(T.StringType()), True),
        T.StructField("n_points", T.LongType(), True),
        T.StructField("idx_size", T.LongType(), True),
        T.StructField("updated_seq", T.LongType(), True),
        # op_id breaks updated_seq ties deterministically: _next_seq is
        # read-then-append, so two concurrent writers can mint the same
        # seq — without a total order the latest-wins resolution would
        # flip nondeterministically between reads.  (On the Iceberg
        # backend register/delete become MERGE/DELETE and the snapshot
        # log provides the total order instead.)
        T.StructField("op_id", T.StringType(), True),
    ]
)


def read_registry(spark: SparkSession, path: str) -> DataFrame:
    """Current registry state: latest row per (domain, index_path)."""
    try:
        # pinned schema, not inference: files appended before op_id
        # existed lack the column, and which footer wins inference
        # depends on file order — with the explicit schema those rows
        # surface op_id as NULL instead of failing the read
        raw = spark.read.schema(REGISTRY_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], REGISTRY_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("domain", "index_path").orderBy(
        F.col("updated_seq").desc(), F.col("op_id").desc_nulls_last()
    )
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .drop("_rn")
        .where(F.col("core_name").isNotNull())  # tombstones excluded
    )


def _next_seq(spark: SparkSession, path: str) -> int:
    try:
        m = spark.read.parquet(path).agg(F.max("updated_seq")).collect()[0][0]
        return int(m or 0) + 1
    except Exception:
        return 1


def register_index(
    spark: SparkSession,
    path: str,
    domain: str,
    index_path: str,
    core_name: str,
    idx_fields: list[str] | None = None,
    n_points: int = 0,
    idx_size: int = 0,
) -> None:
    """Upsert a registration (reference: get_index_core / create flow,
    solr_admin.py:50-101).  Append-only with a monotone sequence; the
    read side resolves latest-wins."""
    seq = _next_seq(spark, path)
    row = [(domain, index_path, core_name, idx_fields or [], n_points, idx_size,
            seq, str(uuid.uuid4()))]
    spark.createDataFrame(row, REGISTRY_SCHEMA).write.mode("append").parquet(path)


def get_index(spark: SparkSession, path: str, domain: str, index_path: str) -> DataFrame:
    """Point lookup of one registration (solr_admin.py:115-161)."""
    return read_registry(spark, path).where(
        (F.col("domain") == domain) & (F.col("index_path") == index_path)
    )


def list_domain(spark: SparkSession, path: str, domain: str) -> DataFrame:
    """All registrations of one domain (the per-domain parallel arrays,
    as rows)."""
    return read_registry(spark, path).where(F.col("domain") == domain)


def delete_index(spark: SparkSession, path: str, domain: str, index_path: str) -> None:
    """Remove a registration (solr_admin.py:210-253) by appending a
    tombstone (core_name NULL).  Concurrent appends never lose rows;
    same-seq collisions (the _next_seq read-then-append window) resolve
    deterministically via the op_id tie-break."""
    seq = _next_seq(spark, path)
    row = [(domain, index_path, None, None, None, None, seq, str(uuid.uuid4()))]
    spark.createDataFrame(row, REGISTRY_SCHEMA).write.mode("append").parquet(path)
