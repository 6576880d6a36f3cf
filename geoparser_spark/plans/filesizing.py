"""Output file sizing and compaction — the small-files problem.

A 10^12-doc pipeline that writes one file per task produces hundreds of
millions of tiny parquet files: NameNode/manifest pressure, scan
planning that takes longer than the scan, and object-store request
amplification.  Two levers, both shuffle-conscious:

* :func:`write_sized` — cap rows per file with the writer's
  ``maxRecordsPerFile`` (a streaming cap inside each task, NO shuffle)
  and optionally range-cluster on a key first (ONE shuffle that buys
  both file sizing and data clustering — min/max pruning on the key for
  every later reader).
* :func:`compact_parquet` — rewrite an existing small-file table into
  ~target-sized files.  File count is computed from the table's REAL
  on-disk bytes via the Hadoop FileSystem API (works on HDFS/S3A/local
  the same way), not from a row-size guess.

On an Iceberg catalog the native equivalents are the write options
(``write.target-file-size-bytes``) and the ``rewrite_data_files``
maintenance procedure — these helpers are the plain-parquet seam, same
pattern as sources/catalog.py.

Reference parity: GeoParser's Solr POST path has no file layout concern
(one HTTP doc at a time, /root/reference/geoparser_app/views.py); this
belongs to the 100 TB mandate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 256 * 1024 * 1024


def table_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory, via the
    Hadoop FileSystem of the path's scheme (local/HDFS/S3A alike).
    Hidden/commit files (_SUCCESS, ._*, _committed*) are excluded."""
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    root = fs.getFileStatus(hpath).getPath().toString().rstrip("/")
    it = fs.listFiles(hpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        # exclude hidden/commit artifacts by EVERY path component under
        # the root, not the leaf alone: an in-flight writer's
        # .spark-staging-*/part-*.parquet or _temporary/... subtree
        # must not count as table data
        rel = st.getPath().toString()[len(root):].lstrip("/")
        if any(p.startswith(("_", ".")) for p in rel.split("/")):
            continue
        n += 1
        total += st.getLen()
    return n, total


def write_sized(df: DataFrame, path: str, max_records_per_file: int,
                range_key: str | None = None, num_files: int | None = None,
                mode: str = "overwrite") -> None:
    """Write parquet with bounded file sizes.

    Without ``range_key``: zero extra shuffle — each task streams its
    rows into files capped at ``max_records_per_file`` (file count =
    tasks x ceil(rows_per_task / cap)).  With ``range_key``: one
    repartitionByRange shuffle clusters the data on the key AND fixes
    the file count, so every later point/range read on the key prunes
    row groups by min/max stats."""
    if max_records_per_file <= 0:
        raise ValueError("max_records_per_file must be positive")
    if (range_key is None) != (num_files is None):
        raise ValueError("range_key and num_files must be given together")
    out = df
    if range_key is not None:
        out = df.repartitionByRange(num_files, range_key)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_file_bytes: int = DEFAULT_TARGET_BYTES,
                    range_key: str | None = None) -> dict:
    """Rewrite ``src`` (a small-file parquet dir) into ``dst`` with
    ~``target_file_bytes`` files; returns before/after stats.

    dst must differ from src: rewriting a path while scanning it is a
    correctness hazard on every filesystem (the caller swaps
    directories/table pointers after validating — on Iceberg this whole
    function is `rewrite_data_files` and the swap is a snapshot
    commit).  One shuffle when range_key is given (clustered
    compaction).  Without it: coalesce (no shuffle) when MERGING down
    to fewer partitions suffices; a round-robin repartition when the
    scan yields fewer partitions than the target (coalesce can only
    reduce — a few giant single-row-group files would otherwise come
    out as one oversized file per task)."""
    if src.rstrip("/") == dst.rstrip("/"):
        raise ValueError("compact_parquet requires dst != src")
    n_before, total = table_file_stats(spark, src)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    if range_key is not None:
        df.repartitionByRange(n_files, range_key).write.mode(
            "overwrite").parquet(dst)
    else:
        scan_parts = df.rdd.getNumPartitions()
        out = df.coalesce(n_files) if n_files <= scan_parts \
            else df.repartition(n_files)
        out.write.mode("overwrite").parquet(dst)
    n_after, total_after = table_file_stats(spark, dst)
    return {
        "files_before": n_before, "files_after": n_after,
        "bytes_before": total, "bytes_after": total_after,
        "target_files": n_files,
    }
