"""Streaming idempotent ingest: Structured Streaming -> snapshot table.

Composes the two exactly-once halves the engine already has:

  * the stream checkpoint dedupes MICRO-BATCHES (a restarted query
    never re-delivers a committed batch id), and
  * snapshots.append_dedup dedupes ROWS by content hash (an upstream
    that re-sends yesterday's crawl — at-least-once queues, crawler
    retries — appends zero rows).

Together they give end-to-end idempotent ingest into a versioned,
time-travelable table: the stream can crash anywhere, the upstream can
duplicate anything, and the table converges to exactly-one-row-per-
content.  This is the streaming twin of `job.py snapshot --op
append-dedup`, and the shape Iceberg's own streaming sink provides —
executable here on the parquet snapshot layer.

foreachBatch rather than a direct sink because the snapshot commit
(manifest swap) must be ATOMIC per micro-batch; the batch function is
called exactly once per committed batch id on the no-retry path, and a
replay after a crash-between-commit-and-checkpoint is made harmless by
the content-hash dedup — the replayed batch appends zero rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from geoparser_spark.plans import snapshots as SN


def run_ingest_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    root: str,
    hash_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start (or catch up, with AvailableNow) an ingest stream writing
    every micro-batch into the snapshot table at `root` through
    content-hash append_dedup.  The table must already exist
    (snapshots.create_table) — schema evolution is a CREATE-time
    decision, not an ingest-time accident."""
    if SN.latest_version(root) == 0:
        raise ValueError(
            f"no snapshot table at {root}: create_table first")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        SN.append_dedup(spark, batch_df, root, hash_cols=hash_cols)

    writer = (
        stream_df.writeStream
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
