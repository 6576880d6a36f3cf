"""Exact nearest-place join (operators/geojoin.py) vs a brute-force
cross-join reference on the same data — including poles, antimeridian
wrap, and sparse neighborhoods that force the refine fallback."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from geoparser_spark.operators.geojoin import (
    EARTH_RADIUS_KM,
    haversine_km,
    nearest_place,
)


def _hav(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = rl2 - rl1
    dlon = math.radians(lon2) - math.radians(lon1)
    h = math.sin(dlat / 2) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(min(1.0, math.sqrt(h)))


def _brute(points, places):
    out = {}
    for pid, lat, lon in points:
        best = min(
            ((_hav(lat, lon, plat, plon), gid, name)
             for gid, name, plat, plon in places)
        )
        out[pid] = (best[1], best[2], round(best[0], 3))
    return out


def _check(spark, points, places, cell_deg=5.0):
    pts = spark.createDataFrame(
        points, "event_id: long, latitude: double, longitude: double")
    pls = spark.createDataFrame(
        places, "geonameid: long, name: string, latitude: double, longitude: double")
    got = {
        r.event_id: (r.geonameid, r.name, r.dist_km)
        for r in nearest_place(pts, pls, cell_deg=cell_deg).collect()
    }
    assert got == _brute(points, places)


PLACES = [
    (1, "alpha", 10.0, 20.0),
    (2, "beta", 10.5, 20.5),
    (3, "gamma", -33.0, 151.0),
    (4, "delta", 51.5, -0.1),
    (5, "eps", 0.1, 179.9),
    (6, "zeta", -0.1, -179.9),
]


def test_dense_neighborhood_uses_grid(spark):
    points = [(1, 10.1, 20.1), (2, 10.6, 20.4), (3, 10.3, 20.3)]
    _check(spark, points, PLACES)


def test_sparse_forces_fallback_still_exact(spark):
    # nowhere near any place: neighborhood empty -> brute-force path
    points = [(1, 80.0, 100.0), (2, -75.0, -120.0), (3, 45.0, 100.0)]
    _check(spark, points, PLACES)


def test_antimeridian_wrap(spark):
    # nearest to (0, 179.95) is eps at lon 179.9 OR zeta across the
    # wrap at -179.9 — the wrapped cell probe must see both
    points = [(1, 0.0, 179.95), (2, 0.0, -179.95)]
    _check(spark, points, PLACES)


def test_poles(spark):
    points = [(1, 89.9, 0.0), (2, -89.9, 13.0), (3, 90.0, 0.0)]
    _check(spark, points, PLACES)


def test_random_points_match_brute_force(spark):
    rng = random.Random(11)
    points = [
        (i, rng.uniform(-90, 90), rng.uniform(-180, 180)) for i in range(200)
    ]
    _check(spark, points, PLACES)
    _check(spark, points, PLACES, cell_deg=10.0)


def test_equidistant_tie_breaks_on_geonameid(spark):
    places = [(7, "west", 0.0, -1.0), (8, "east", 0.0, 1.0)]
    points = [(1, 0.0, 0.0)]
    pts = spark.createDataFrame(points, "event_id: long, latitude: double, longitude: double")
    pls = spark.createDataFrame(places, "geonameid: long, name: string, latitude: double, longitude: double")
    [r] = nearest_place(pts, pls).collect()
    assert r.geonameid == 7  # exact double tie -> smaller id


def test_haversine_known_distance(spark):
    df = spark.range(1).select(
        haversine_km(F.lit(51.5007), F.lit(-0.1246),
                     F.lit(40.6892), F.lit(-74.0445)).alias("d"))
    [r] = df.collect()
    # spherical-earth figure (R=6371.0088); the WGS84 ellipsoid gives
    # ~5570 km — the 5 km gap is the sphere approximation, not a bug
    assert abs(r.d - 5574.85) < 1.0


def test_zorder_cell_interleaves_and_bounds(spark):
    from pyspark.sql import Row

    from geoparser_spark.operators.geojoin import zorder_cell

    pts = [
        (-90.0, -180.0, 0),                 # min corner -> cell 0
        (89.999, 179.999, (1 << 8) - 1),    # max corner -> all bits set (p=4)
    ]
    df = spark.createDataFrame(
        [Row(lat=a, lon=b) for a, b, _ in pts])
    got = [r.c for r in df.select(
        zorder_cell(F.col("lat"), F.col("lon"), 4).alias("c")).collect()]
    assert got == [p[2] for p in pts]
    # neighbours in space are near in cell id: one quantum apart in lon
    df2 = spark.createDataFrame([Row(lat=0.0, lon=0.0), Row(lat=0.0, lon=22.5)])
    a, b = [r.c for r in df2.select(
        zorder_cell(F.col("lat"), F.col("lon"), 4).alias("c")).collect()]
    assert a != b


def test_zorder_cell_rejects_bad_precision(spark):
    import pytest as _pytest

    from geoparser_spark.operators.geojoin import zorder_cell

    with _pytest.raises(ValueError):
        zorder_cell(F.lit(0.0), F.lit(0.0), 0)
    with _pytest.raises(ValueError):
        zorder_cell(F.lit(0.0), F.lit(0.0), 27)
