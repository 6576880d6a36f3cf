"""Bucketed-table co-location: shuffle-free joins on pre-bucketed keys.

At the 10^12-doc design point the expensive joins are fact-to-fact
(extracted docs x geotag candidates, lineitem x orders): both sides are
far too big to broadcast, so a plain join shuffles BOTH.  Writing the
tables bucketed on the join key — `bucketBy(n, key).sortBy(key)` into
the session catalog (Iceberg: the same layout via a bucket partition
transform) — lets Spark plan a sort-merge join with ZERO exchanges:
every bucket pair joins locally, the physical plan's shuffle count is
the test's assertion, not a hope.

The reference has no counterpart (Solr joins are N+1 HTTP lookups,
geoparser_app/solr.py:384-422); this module is pure scale
infrastructure for the rebuild.

Requires `spark.sql.sources.bucketing.enabled` (default true) and that
both sides share the bucket count.  `spark.sql.autoBroadcastJoinThreshold`
may still pick a broadcast for a tiny side — the co-location matters
when BOTH sides are large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   mode: str = "overwrite") -> None:
    """Materialize a table bucketed+sorted on the join key.  Bucket
    count should be sized so one bucket of the BIGGER table fits an
    executor's memory at the design scale (e.g. 100 TB / 4096 buckets
    ≈ 25 GB per bucket pre-projection)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.  With
    matching layouts Catalyst elides both shuffle exchanges (and both
    sorts, since the buckets are sorted): the join runs bucket-by-bucket
    wherever the data already sits."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key, how)
