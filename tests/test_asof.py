"""As-of join (operators/asof.py) vs hand-computed expectations and a
brute-force python reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from geoparser_spark.operators.asof import asof_join


def _brute(left, right):
    out = []
    for k, t, ev in left:
        prior = [r for r in right if r[0] == k and r[1] <= t]
        v = max(prior, key=lambda r: r[1])[2] if prior else None
        out.append((k, t, ev, v))
    return sorted(out)


def test_basic_backward_inclusive(spark):
    left = [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")]
    right = [(1, 10, 100), (1, 15, 150), (2, 99, 990)]
    l = spark.createDataFrame(left, "k: long, t: long, ev: string")
    r = spark.createDataFrame(right, "k: long, t: long, v: long")
    got = sorted(map(tuple, asof_join(l, r, ["k"], "t").collect()))
    # effective-at-t applies to events at t (backward inclusive);
    # no prior state -> NULL; keys never seen on the right -> NULL
    assert got == _brute(left, right)
    assert got == [(1, 5, "c", None), (1, 10, "a", 100),
                   (1, 20, "b", 150), (2, 10, "d", None)]


def test_random_matches_brute_force(spark):
    rng = random.Random(3)
    left = [(rng.randrange(5), rng.randrange(100), f"e{i}") for i in range(300)]
    # unique (k, t) grain on the right, as the contract requires
    seen = set()
    right = []
    for i in range(80):
        k, t = rng.randrange(5), rng.randrange(100)
        if (k, t) not in seen:
            seen.add((k, t))
            right.append((k, t, 1000 + i))
    l = spark.createDataFrame(left, "k: long, t: long, ev: string")
    r = spark.createDataFrame(right, "k: long, t: long, v: long")
    got = sorted(map(tuple, asof_join(l, r, ["k"], "t").collect()))
    assert got == _brute(left, right)


def test_null_payload_not_resurrected(spark):
    """A matched right row whose payload IS NULL must win — per-column
    ignorenulls sweeps would resurrect the older non-null state and
    stitch fields from different rows; DuckDB ASOF returns the matched
    row's values wholesale."""
    l = spark.createDataFrame([(1, 30, "e")], "k: long, t: long, ev: string")
    r = spark.createDataFrame(
        [(1, 10, 5, 50), (1, 20, None, 70)], "k: long, t: long, a: long, b: long")
    [row] = asof_join(l, r, ["k"], "t").collect()
    assert (row.a, row.b) == (None, 70)   # the t=20 row, intact


def test_reserved_names_rejected(spark):
    l = spark.createDataFrame([(1, 1, 0)], "k: long, t: long, _side: long")
    r = spark.createDataFrame([(1, 1, 9)], "k: long, t: long, v: long")
    with pytest.raises(ValueError):
        asof_join(l, r, ["k"], "t")


def test_payload_collision_rejected(spark):
    l = spark.createDataFrame([(1, 1, "x")], "k: long, t: long, v: string")
    r = spark.createDataFrame([(1, 1, 9)], "k: long, t: long, v: long")
    with pytest.raises(ValueError):
        asof_join(l, r, ["k"], "t")


def test_single_shuffle_plan(spark):
    """The union-and-sweep must cost ONE key-grain exchange — never a
    range-join row explosion."""
    l = spark.createDataFrame([(1, 1, "x")], "k: long, t: long, ev: string")
    r = spark.createDataFrame([(1, 1, 9)], "k: long, t: long, v: long")
    plan = asof_join(l, r, ["k"], "t")._jdf.queryExecution().executedPlan().toString()
    ex = [ln for ln in plan.splitlines()
          if "Exchange" in ln and "Broadcast" not in ln and "Reused" not in ln]
    assert len(ex) == 1, ex
    assert "Join" not in plan
