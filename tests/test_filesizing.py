"""File sizing / compaction (plans/filesizing.py): real file counts on
disk, data equality through the rewrite, and the no-shuffle claims."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from geoparser_spark.plans.filesizing import (
    compact_parquet,
    table_file_stats,
    write_sized,
)


def _data_files(path):
    out = []
    for root, _, files in os.walk(path):
        out += [f for f in files
                if f.endswith(".parquet") and not f.startswith((".", "_"))]
    return out


@pytest.fixture()
def df(spark):
    return spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    )


def test_write_sized_caps_records_per_file(spark, df, tmp_path):
    p = str(tmp_path / "sized")
    write_sized(df.repartition(4), p, max_records_per_file=1000)
    files = _data_files(p)
    # 4 tasks x 2500 rows at cap 1000 -> 3 files each
    assert len(files) == 12
    assert spark.read.parquet(p).count() == 10_000


def test_write_sized_range_clustered(spark, df, tmp_path):
    p = str(tmp_path / "clustered")
    write_sized(df, p, max_records_per_file=100_000,
                range_key="doc_id", num_files=5)
    assert len(_data_files(p)) == 5
    # range clustering: each file's doc_id span is disjoint, so a point
    # read prunes to one file via min/max stats
    got = (
        spark.read.parquet(p)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in got)
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_write_sized_validation(spark, df, tmp_path):
    with pytest.raises(ValueError):
        write_sized(df, str(tmp_path / "x"), 0)
    with pytest.raises(ValueError):
        write_sized(df, str(tmp_path / "x"), 10, range_key="doc_id")
    with pytest.raises(ValueError):
        # num_files without range_key would be silently ignored
        write_sized(df, str(tmp_path / "x"), 10, num_files=64)


def test_compact_splits_oversized_inputs(spark, df, tmp_path):
    """coalesce can only merge; when the scan yields fewer partitions
    than the byte-derived target, compaction must repartition to SPLIT
    (the few-giant-files layout is exactly what compaction targets)."""
    src, dst = str(tmp_path / "giant"), str(tmp_path / "split")
    df.coalesce(1).write.parquet(src)
    assert len(_data_files(src)) == 1
    _, total = table_file_stats(spark, src)
    stats = compact_parquet(spark, src, dst, target_file_bytes=total // 4)
    assert stats["files_after"] >= 4
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b


def test_stats_ignore_hidden_subtrees(spark, df, tmp_path):
    import shutil
    p = str(tmp_path / "withstaging")
    df.coalesce(2).write.parquet(p)
    n0, t0 = table_file_stats(spark, p)
    # simulate an in-flight writer's staging subtree
    staged = tmp_path / "withstaging" / ".spark-staging-xyz"
    staged.mkdir()
    shutil.copy(next(iter((tmp_path / "withstaging").glob("part-*.parquet"))),
                staged / "part-stray.parquet")
    n1, t1 = table_file_stats(spark, p)
    assert (n1, t1) == (n0, t0)


def test_compact_parquet_merges_small_files(spark, df, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "big")
    df.repartition(64).write.parquet(src)
    assert len(_data_files(src)) == 64
    stats = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1
    # data survives byte-for-byte (orderless)
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b


def test_compact_refuses_in_place(spark, tmp_path):
    p = str(tmp_path / "t")
    with pytest.raises(ValueError):
        compact_parquet(spark, p, p + "/")


def test_table_file_stats_excludes_markers(spark, df, tmp_path):
    p = str(tmp_path / "stats")
    df.coalesce(2).write.parquet(p)
    n, total = table_file_stats(spark, p)
    assert n == 2 and total > 0
