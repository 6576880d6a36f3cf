"""Structured Streaming incremental extract: AvailableNow catch-up,
restart-safe checkpoint, output equality with the batch path.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from geoparser_spark.operators.extract import extract
from geoparser_spark.streaming.incremental import run_incremental_extract
from geoparser_spark.testing.corpus import build_docs


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="gp_stream_")
    yield {k: os.path.join(d, k) for k in ("docs", "out", "ckpt")}
    shutil.rmtree(d, ignore_errors=True)


def _write_batch(spark, n, seed, docs_dir):
    build_docs(spark, n, seed=seed).write.mode("append").parquet(docs_dir)


def test_incremental_catchup_then_resume(spark, dirs):
    _write_batch(spark, 30, 42, dirs["docs"])
    q = run_incremental_extract(spark, dirs["docs"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    out1 = spark.read.parquet(dirs["out"])
    assert out1.count() == 30

    # streaming output == batch output, span for span
    batch = extract(spark.read.parquet(dirs["docs"]))
    j = out1.alias("s").join(batch.alias("b"), "doc_id", "full")
    assert j.where(~(F.col("s.spans") == F.col("b.spans"))).count() == 0

    # second wave of NEW docs; restart from the same checkpoint —
    # only the new files are processed, nothing is double-appended
    build_docs(spark, 70, seed=42).where(F.col("doc_id") > "doc-00000029") \
        .write.mode("append").parquet(dirs["docs"])
    q2 = run_incremental_extract(spark, dirs["docs"], dirs["out"], dirs["ckpt"])
    q2.awaitTermination(120)
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() == 70
    assert out2.select("doc_id").distinct().count() == 70
