"""Salted skew-join (plans/skewjoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geoparser_spark.plans.skewjoin import salted_join


def _sides(spark, n_hot=200):
    # one pathologically hot key plus a cold tail
    large = spark.createDataFrame(
        [Row(k=1, rid=i, v=1) for i in range(n_hot)]
        + [Row(k=i, rid=1000 + i, v=1) for i in range(2, 12)]
    )
    med = spark.createDataFrame(
        [Row(k=i, label=f"u{i}") for i in range(1, 12)]
    )
    return large, med


def test_salted_join_matches_plain_join(spark):
    large, med = _sides(spark)
    got = salted_join(large, med, "k", row_id_col="rid", salt=8)
    want = large.join(med, "k")
    assert sorted((r.k, r.rid, r.v, r.label) for r in got.collect()) == \
        sorted((r.k, r.rid, r.v, r.label) for r in want.collect())
    assert set(got.columns) == set(want.columns)


def test_salted_join_scatters_hot_key(spark):
    large, _ = _sides(spark)
    salted = large.withColumn(
        "s", F.pmod(F.xxhash64(F.col("rid")), F.lit(8)))
    buckets = salted.where(F.col("k") == 1).select("s").distinct().count()
    assert buckets >= 6  # the hot key really spreads across sub-keys


def test_salted_join_left_outer(spark):
    large, med = _sides(spark)
    # key 999 has no dim row: left join must keep it with NULL label
    extra = large.unionByName(
        spark.createDataFrame([Row(k=999, rid=5000, v=1)]))
    got = salted_join(extra, med, "k", row_id_col="rid", how="left")
    row = [r for r in got.collect() if r.k == 999]
    assert len(row) == 1 and row[0].label is None


def test_salted_join_keys_include_salt(spark):
    large, med = _sides(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = salted_join(large, med, "k", row_id_col="rid", salt=8) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_salted_join_guards(spark):
    large, med = _sides(spark)
    with pytest.raises(ValueError):
        salted_join(large, med, "k", row_id_col="rid", salt=0)
    with pytest.raises(ValueError):
        salted_join(large.withColumn("__salt", F.lit(1)), med, "k",
                    row_id_col="rid")
