"""Incremental extract+geotag via Structured Streaming.

The reference's only incremental behavior is a polled driver loop with
a resume offset and a periodic tile-regen thread
(geoparser_app/views.py:322-348, 248-267).  The batch manifest
(plans/runtime.py) replaces that; this module adds the true streaming
seam for continuously-arriving corpora:

  * file-source stream over the docs table directory,
  * the SAME extract/geotag transformations (they are plain DataFrame
    functions, so they compose with readStream unchanged),
  * ``Trigger.AvailableNow`` for catch-up-then-stop semantics,
  * ``foreachBatch`` so each micro-batch appends to the output table —
    the streaming checkpoint gives exactly-once per micro-batch,
    mirroring the reference's KHOOSHE_GEN_FREQ periodic materialization
    (views.py:48,339-348) without the single-flight flag hack.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from geoparser_spark.operators.extract import extract
from geoparser_spark.schemas import DOCS


def stream_docs(spark: SparkSession, docs_dir: str,
                max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(DOCS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(docs_dir)


def run_incremental_extract(
    spark: SparkSession,
    docs_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] = extract,
    available_now: bool = True,
    batch_transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Process whatever has arrived, then stop (AvailableNow), writing
    each micro-batch to the output table.  Restart-safe via the stream
    checkpoint — the streaming twin of resumable_stage.

    ``transform`` runs on the streaming DataFrame and must be
    stream-safe (map-only, e.g. extract).  ``batch_transform`` runs on
    each micro-batch INSIDE foreachBatch with full batch semantics —
    the place for per-doc aggregations like geotag, which streaming
    append mode rejects without a watermark.  Per-doc grouping is
    globally correct there because the file source delivers every doc
    in exactly one micro-batch."""
    stream = transform(stream_docs(spark, docs_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_transform is not None:
            batch_df = batch_transform(batch_df)
        batch_df.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window_duration: str = "1 hour",
                          watermark: str = "30 minutes") -> DataFrame:
    """Event-time tumbling-window aggregation with a late-data
    watermark — the streaming twin of the batch ``events_windowed_agg``
    query.  Rows later than ``watermark`` past the max seen event time
    are dropped and their window finalized; append-mode sinks emit each
    window exactly once when it closes.  (The reference has no event
    time at all — its 'incremental' unit is a poll counter,
    geoparser_app/views.py:339-348.)"""
    from pyspark.sql import functions as F

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col, "cnt", "sum_value",
        )
    )


def run_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "ts timestamp, event_type string, value double",
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
) -> StreamingQuery:
    """File-stream → watermarked windowed counts → parquet, append mode
    (only closed windows are written; late rows beyond the watermark
    are dropped — the documented late-data policy)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = windowed_event_counts(stream, window_duration=window_duration,
                                watermark=watermark)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def run_streaming_dedup(
    spark: SparkSession,
    docs_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id string, ts timestamp, text string",
    watermark: str = "30 minutes",
) -> StreamingQuery:
    """Streaming exact dedup by doc_id with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's state only until
    the watermark passes it, so re-deliveries inside the watermark
    horizon (the at-least-once file/queue source contract) are
    suppressed while state never grows with the corpus — the streaming
    twin of the batch ``dedup_exact`` family.  A plain
    ``dropDuplicates`` on an unbounded stream would accumulate every
    doc_id ever seen; at 10^12 docs that state IS the corpus."""
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["doc_id"])
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def run_streaming_content_dedup(
    spark: SparkSession,
    docs_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id string, ts timestamp, text string",
    watermark: str = "30 minutes",
) -> StreamingQuery:
    """Streaming CONTENT dedup: suppress re-posts of the same text
    under a different doc_id (mirror feeds, syndication) by deduping on
    the 64-bit SimHash fingerprint within the watermark horizon.

    The signature is the batch family's shuffle-free higher-order
    expression (operators/dedup.simhash_col), evaluated map-side per
    micro-batch; ``dropDuplicatesWithinWatermark`` then keys state on
    the 64-bit signature — bounded by the watermark, never by corpus
    size.  Recall boundary, stated plainly: only hamming-distance-0
    collisions dedup here (identical or near-identically tokenized
    text — SimHash maps small edits to the same fingerprint with high
    probability but not certainty); hamming 1..k near-dups pass through
    and are the batch ``simhash_near_dup_pairs`` / MinHash-LSH
    pipeline's job downstream.  A streaming hamming-ball dedup would
    need per-band cross-row state (doc drops if ANY band matched any
    earlier doc) — not expressible with bounded per-key state without
    accepting band-level false drops."""
    from geoparser_spark.operators.dedup import simhash_col

    stream = spark.readStream.schema(schema).parquet(docs_dir)
    # docs whose text is NULL or normalizes to zero tokens all share
    # one degenerate signature — deduping them against each other would
    # silently DROP unrelated documents ('!!!' vs '???').  Key those on
    # their own doc_id instead, so they pass through unconditionally.
    normalized = F.trim(F.lower(F.regexp_replace(
        F.coalesce(F.col("text"), F.lit("")), r"[^\p{L}\p{N}]+", " ")))
    deduped = (
        stream.withColumn(
            "simhash",
            F.when(normalized == "",
                   F.concat(F.lit("uniq:"), F.col("doc_id")))
            .otherwise(simhash_col("text")),
        )
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["simhash"])
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def session_event_counts(events: DataFrame, ts_col: str = "ts",
                         key_col: str = "user_id",
                         gap: str = "30 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Event-time SESSION windows: per-key dynamic-width windows that
    close after ``gap`` of inactivity — the streaming twin of the
    batch ``events_sessionize`` query (same 30-minute gap semantics;
    the batch query's window-sweep becomes session_window state).
    Adjacent events of one key merge while their gaps stay under
    ``gap``; the watermark finalizes a session once event time moves
    ``watermark`` past its end, bounding state per live session, not
    per event."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col, "n_events", "sum_value",
        )
    )


def run_session_counts(
    spark: SparkSession,
    events_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "ts timestamp, user_id bigint, value double",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> StreamingQuery:
    """File-stream → session windows → parquet, append mode (a session
    is written exactly once, after the watermark passes its end)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = session_event_counts(stream, gap=gap, watermark=watermark)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
