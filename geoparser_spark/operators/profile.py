"""Table profiling: per-column statistics in ONE scan.

The reference exposes corpus health only as Solr's `numFound` and the
admin core's `idx_size_list` (reference `geoparser_app/solr.py:300-309`,
`solr_admin.py:77-93`).  A 100 TB pipeline needs real data profiling
before any curation decision — null rates, cardinalities, value ranges
per column — and it must come from a single pass over the table, not
one scan per column.

Shape at scale: one `agg()` carrying (5 metrics x N columns) aggregate
expressions — a single scan, map-side partial aggregation, one 1-row
exchange.  The per-column rows are then unpivoted from that single
driver-side row with `explode(array(struct(...)))`, which is a plan
over a 1-row relation — no second scan.  `countDistinct` over multiple
columns in one agg triggers Spark's Expand path: rows are replicated
x(#distinct aggs) map-side; for very wide tables profile in column
groups or switch `approx=True` (HLL sketches, no Expand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """Per-column profile: row count, null count, distinct count and
    min/max rendered as strings (native type ordering, THEN cast —
    '999' < '1000' numerically, not lexicographically).

    Returns one row per column:
    (column, n_rows, n_nulls, n_distinct, min_repr, max_repr).
    """
    cols = columns or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"__nn_{c}"),
            distinct(c).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_repr"),
            F.col(f"__mx_{c}").alias("max_repr"),
        )
        for c in cols
    ])
    return one.select(F.explode(rows).alias("p")).select("p.*")


def histogram(df: DataFrame, col: str, buckets: int = 12) -> DataFrame:
    """Equi-width histogram over a numeric column — the profiling
    companion to profile_table's min/max (what a curation dashboard
    plots before choosing filter thresholds).

    Two passes, both single-scan/column-pruned: (1) one hash aggregate
    for (min, max) collapsed to a driver row — the same bounded
    collect the BM25/IVF stats passes use; (2) a map-only bucket
    expression floor((x - min) / w) clamped to [0, buckets-1] (the
    max value lands in the last bucket), then a bucket-grain count —
    the shuffle moves at most ``buckets`` rows per partition after
    map-side combine.

    Determinism: w = (max - min) / buckets is one IEEE division
    computed driver-side; the bucket expression is the same two IEEE
    ops on both engines, so boundaries bit-agree with an oracle that
    mirrors the formula (never width_bucket, whose edge semantics
    differ).  Empty input or min == max degrade to a single bucket.

    Returns (bucket, lo, hi, n_rows) sorted by bucket; lo/hi are the
    literal bucket bounds min + b*w (half-open except the last).
    """
    vals = df.select(F.col(col).alias("x")).where(F.col("x").isNotNull())
    row = vals.agg(F.min("x").alias("mn"), F.max("x").alias("mx")).collect()[0]
    mn, mx = row["mn"], row["mx"]
    if mn is None:
        return vals.select(
            F.lit(0).alias("bucket"), F.lit(0.0).alias("lo"),
            F.lit(0.0).alias("hi"), F.lit(0).cast("long").alias("n_rows"),
        ).where(F.lit(False))
    mn, mx = float(mn), float(mx)
    if mx == mn:
        return vals.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(0).alias("bucket"), F.lit(mn).alias("lo"),
            F.lit(mx).alias("hi"), "n_rows")
    w = (mx - mn) / buckets
    b = F.least(
        F.floor((F.col("x") - F.lit(mn)) / F.lit(w)).cast("int"),
        F.lit(buckets - 1),
    )
    return (
        vals.select(b.alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bucket",
            (F.lit(mn) + F.col("bucket").cast("double") * F.lit(w)).alias("lo"),
            (F.lit(mn) + (F.col("bucket") + F.lit(1)).cast("double")
             * F.lit(w)).alias("hi"),
            "n_rows",
        )
        .orderBy("bucket")
    )
