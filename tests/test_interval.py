"""Interval join (operators/interval.py) vs brute force, plus the
equi-join plan guarantee (no nested-loop/cartesian)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from geoparser_spark.operators.interval import interval_join


def _brute(events, windows):
    return sorted(
        (e + w for e in events for w in windows if w[1] <= e[1] < w[2]),
    )


def _check(spark, events, windows, bin_width, keys=None):
    l = spark.createDataFrame(events, "event_id: long, t: long")
    r = spark.createDataFrame(windows, "win_id: long, s: long, e: long")
    got = sorted(
        tuple(x) for x in interval_join(
            l, r, "t", "s", "e", bin_width, keys=keys).select(
            "event_id", "t", "win_id", "s", "e").collect()
    )
    assert got == [tuple(x) for x in _brute(events, windows)]


def test_half_open_boundaries(spark):
    events = [(1, 10), (2, 20), (3, 19), (4, 9)]
    windows = [(100, 10, 20)]
    # t=10 in (start inclusive), t=20 out (end exclusive)
    _check(spark, events, windows, bin_width=7)


def test_intervals_spanning_many_bins(spark):
    events = [(i, i * 3) for i in range(50)]
    windows = [(100, 0, 149), (200, 30, 31), (300, 148, 149)]
    _check(spark, events, windows, bin_width=5)


def test_empty_and_negative_intervals_match_nothing(spark):
    events = [(1, 10)]
    windows = [(100, 10, 10), (200, 30, 20)]
    _check(spark, events, windows, bin_width=4)


def test_random_matches_brute_force(spark):
    rng = random.Random(5)
    events = [(i, rng.randrange(1000)) for i in range(200)]
    windows = [
        (1000 + i, s, s + rng.randrange(0, 120))
        for i, s in enumerate(rng.randrange(1000) for _ in range(40))
    ]
    _check(spark, events, windows, bin_width=50)
    _check(spark, events, windows, bin_width=7)


def test_plan_is_equi_join_not_nested_loop(spark):
    l = spark.createDataFrame([(1, 10)], "event_id: long, t: long")
    r = spark.createDataFrame([(9, 0, 20)], "win_id: long, s: long, e: long")
    plan = interval_join(l, r, "t", "s", "e", 10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_validation(spark):
    l = spark.createDataFrame([(1, 10)], "event_id: long, t: long")
    r = spark.createDataFrame([(9, 0, 20)], "event_id: long, s: long, e: long")
    with pytest.raises(ValueError):
        interval_join(l, r, "t", "s", "e", 10)     # overlapping names
    r2 = spark.createDataFrame([(9, 0, 20)], "win_id: long, s: long, e: long")
    with pytest.raises(ValueError):
        interval_join(l, r2, "t", "s", "e", 0)     # bad bin width


def test_timestamps_and_keys(spark):
    l = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:30:00"), (2, "u2", "2024-01-01 10:30:00")],
        "event_id: long, user_id: string, ts: string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    r = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
        "user_id: string, s: string, e: string",
    ).select("user_id", F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"))
    got = interval_join(l, r, "ts", "s", "e",
                        bin_width=3_600_000_000, keys=["user_id"]).collect()
    assert [x.event_id for x in got] == [1]  # u2's event has no window
