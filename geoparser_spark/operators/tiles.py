"""K-means tile pyramid — the khooshe map-rendering layer rebuilt.

The reference (vendored khooshe, geoparser_app/khooshe.py) pulls ALL
points into driver numpy arrays (solr.py:354-376), runs scipy kmeans
k=15 per level (khooshe.py:101 — nondeterministic), recurses until a
cluster has < 10 points (khooshe.py:135), and writes a CSV tree +
dict.csv extent manifest (khooshe.py:83-121).

Rebuild:
  * deterministic k-means (fixed evenly-spaced init over sorted points,
    fixed Lloyd iteration count — no RNG at all), because tile output
    feeds golden tests.
  * level 0 fits centroids on a deterministic bounded sample and
    assigns ALL points with a native whole-stage-codegen expression —
    the full dataset never leaves the executors (unlike khooshe's
    driver arrays).
  * deeper levels run per-cluster ``applyInPandas`` — by then clusters
    are small and numerous, exactly the grouped-map sweet spot.
  * extents (dict.csv replacement) are a plain groupBy min/max.

SURVEY.md §2.3 Q7 (dedup), Q8 (facet counts), Q9 (recursive k-means),
Q10 (extent aggregation), S8 (tile sink).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_CENTROIDS = 15      # reference: khooshe.py:175 CENTROIDS_NUMBER
LEAF_MAX = 10         # reference: khooshe.py:135 (cluster < 10 → leaf)
_LLOYD_ITERS = 12
_SAMPLE_PER_K = 200   # sample size for the level-0 fit


def dedup_points(points: DataFrame) -> DataFrame:
    """Q7 — unique (lat, lon) before clustering; replaces the numpy
    view trick at khooshe.py:71-77."""
    return points.dropDuplicates(["latitude", "longitude"])


def kmeans_fit(pts: np.ndarray, k: int, iters: int = _LLOYD_ITERS) -> np.ndarray:
    """Deterministic Lloyd k-means: init = k evenly spaced points of the
    lexicographically sorted input; fixed iteration count; ties in
    assignment break to the lowest centroid index (argmin)."""
    pts = np.asarray(pts, dtype=np.float64)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    spts = pts[order]
    k = min(k, len(spts))
    idx = np.linspace(0, len(spts) - 1, k).astype(int)
    centroids = spts[idx].copy()
    for _ in range(iters):
        d = ((pts[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = pts[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def assign_native(df: DataFrame, centroids: np.ndarray,
                  out_col: str = "cluster") -> DataFrame:
    """Assign every row to its nearest centroid with a pure SQL
    expression (array of literals + transform + array_position) — the
    big side stays inside whole-stage codegen, no Python, no shuffle."""
    cents = F.array(
        *[
            F.struct(F.lit(float(c[0])).alias("la"), F.lit(float(c[1])).alias("lo"))
            for c in centroids
        ]
    )
    dists = F.transform(
        cents,
        lambda c: (F.col("latitude") - c["la"]) * (F.col("latitude") - c["la"])
        + (F.col("longitude") - c["lo"]) * (F.col("longitude") - c["lo"]),
    )
    return df.withColumn(
        out_col,
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
    )


def _split_group(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """Grouped-map kernel: fit k-means inside one cluster and extend
    cluster_path with the local assignment.

    Rows are canonicalized to (latitude, longitude) order first: the
    shuffle delivers group rows in nondeterministic fetch order, and
    numpy's pairwise summation inside the Lloyd means is order-
    sensitive at the last-bit level — sorting makes the fit (and thus
    the whole pyramid) bit-reproducible across runs."""
    pdf = pdf.sort_values(["latitude", "longitude"], kind="mergesort")
    pts = pdf[["latitude", "longitude"]].to_numpy(dtype=np.float64)
    cents = kmeans_fit(pts, k)
    d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    out = pdf.copy()
    out["cluster_path"] = [
        f"{p}/{a}" for p, a in zip(pdf["cluster_path"], assign)
    ]
    return out


def build_tile_pyramid(
    points: DataFrame,
    k: int = K_CENTROIDS,
    leaf_max: int = LEAF_MAX,
    max_levels: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """points(latitude, longitude, info) → (tiles, extents).

    tiles: (level, cluster_path, latitude, longitude, label, info,
    is_leaf) — centroid rows per cluster per level; leaf clusters emit
    their raw points (khooshe leaf-tile behavior, khooshe.py:126-169).
    extents: (level, cluster_path, min/max lat/lon) — dict.csv
    replacement (khooshe.py:88-94)."""
    spark = points.sparkSession
    state = dedup_points(points).select(
        F.lit("0").alias("cluster_path"),
        "latitude", "longitude",
        F.coalesce(F.col("info"), F.lit("")).alias("info"),
    )
    tiles_parts: list[DataFrame] = []
    extent_parts: list[DataFrame] = []

    for level in range(max_levels):
        state = state.persist()
        sizes = state.groupBy("cluster_path").agg(F.count("*").alias("n_pts"))
        # ---- leaves: emit raw points, retire the cluster
        leaf_paths = sizes.where(F.col("n_pts") <= F.lit(leaf_max)).select("cluster_path")
        leaves = state.join(F.broadcast(leaf_paths), "cluster_path", "left_semi")
        tiles_parts.append(
            leaves.select(
                F.lit(level).alias("level"),
                "cluster_path", "latitude", "longitude",
                F.lit(1).cast("long").alias("label"),
                "info",
                F.lit(True).alias("is_leaf"),
            )
        )
        active = state.join(F.broadcast(leaf_paths), "cluster_path", "left_anti")
        n_active_clusters = sizes.where(F.col("n_pts") > leaf_max).count()
        if n_active_clusters == 0:
            state.unpersist()
            break

        # ---- split active clusters
        if level == 0:
            # one global cluster: fit on a deterministic sample, assign
            # natively — full data never reaches the driver.
            # tie-break the hash key on the coordinates themselves:
            # pmod collisions at the limit boundary would otherwise make
            # the sample (and the whole pyramid) run-dependent.
            sample = (
                active.select("latitude", "longitude")
                .orderBy(
                    F.pmod(F.xxhash64("latitude", "longitude"), F.lit(100003)),
                    "latitude", "longitude",
                )
                .limit(k * _SAMPLE_PER_K)
                .toPandas()
                .to_numpy(dtype=np.float64)
            )
            cents = kmeans_fit(sample, k)
            nxt = assign_native(active, cents).select(
                F.concat_ws("/", "cluster_path", F.col("cluster").cast("string")).alias("cluster_path"),
                "latitude", "longitude", "info",
            )
        else:
            nxt = active.groupBy("cluster_path").applyInPandas(
                lambda pdf: _split_group(pdf, k),
                schema="cluster_path string, latitude double, longitude double, info string",
            )
        nxt = nxt.persist()
        # ---- centroid tiles + extents for the new child clusters
        # centroid display coordinates average through decimal: a double
        # sum's value depends on partial-aggregation merge order, so the
        # low-order bits (and a round() at the boundary) would differ
        # run to run; decimal sums are exact and order-free.
        agg = nxt.groupBy("cluster_path").agg(
            F.avg(F.col("latitude").cast("decimal(24,16)"))
            .cast("double").alias("latitude"),
            F.avg(F.col("longitude").cast("decimal(24,16)"))
            .cast("double").alias("longitude"),
            F.count("*").alias("label"),
            F.min("info").alias("info"),
            F.min("latitude").alias("min_lat"),
            F.max("latitude").alias("max_lat"),
            F.min("longitude").alias("min_lon"),
            F.max("longitude").alias("max_lon"),
        )
        tiles_parts.append(
            agg.select(
                F.lit(level + 1).alias("level"),
                "cluster_path", "latitude", "longitude", "label", "info",
                F.lit(False).alias("is_leaf"),
            )
        )
        extent_parts.append(
            agg.select(
                F.lit(level + 1).alias("level"),
                "cluster_path", "min_lat", "max_lat", "min_lon", "max_lon",
            )
        )
        state.unpersist()
        state = nxt

    tiles = tiles_parts[0]
    for t in tiles_parts[1:]:
        tiles = tiles.unionByName(t)
    if extent_parts:
        extents = extent_parts[0]
        for e in extent_parts[1:]:
            extents = extents.unionByName(e)
    else:
        extents = spark.createDataFrame(
            [], "level int, cluster_path string, min_lat double, max_lat double, min_lon double, max_lon double"
        )
    return tiles, extents


def facet_counts(points: DataFrame, col: str = "loc_name") -> DataFrame:
    """Q8 — group-by counts (cluster-size labels, khooshe.py:105-118)."""
    return points.groupBy(col).agg(F.count("*").alias("cnt"))


def write_tiles(tiles: DataFrame, path: str) -> None:
    """S8 — tile sink, partitioned by level (replaces the CSV tree at
    khooshe.py:110-121); partition pruning serves viewport queries."""
    tiles.write.mode("overwrite").partitionBy("level").parquet(path)


def write_tiles_csv(tiles: DataFrame, extents: DataFrame, path: str) -> None:
    """S8 compatibility sink: khooshe's on-disk contract — a CSV tree
    with header ``latitude,longitude,label,info`` per tile folder
    (khooshe.py:110-121) plus a dict.csv-equivalent extent manifest
    (khooshe.py:83-94) — so existing khooshe-ol.js map clients can read
    the rebuild's output unchanged."""
    (
        tiles.select("level", "cluster_path", "latitude", "longitude",
                     "label", "info")
        .write.mode("overwrite")
        .partitionBy("level", "cluster_path")
        .option("header", True)
        .csv(f"{path}/tiles")
    )
    (
        extents.select(
            "level", "cluster_path",
            F.col("min_lat"), F.col("min_lon"), F.col("max_lat"), F.col("max_lon"),
        )
        .write.mode("overwrite")
        .option("header", True)
        .csv(f"{path}/dict")
    )


def viewport_tiles(tiles: DataFrame, extents: DataFrame,
                   min_lat: float, max_lat: float,
                   min_lon: float, max_lon: float) -> DataFrame:
    """Q11 — choose tiles whose extent intersects the viewport (client
    logic at static/js/khooshe-ol.js:228-269, as range predicates)."""
    hit = extents.where(
        (F.col("min_lat") <= max_lat) & (F.col("max_lat") >= min_lat)
        & (F.col("min_lon") <= max_lon) & (F.col("max_lon") >= min_lon)
    ).select("level", "cluster_path")
    return tiles.join(F.broadcast(hit), ["level", "cluster_path"], "left_semi")
