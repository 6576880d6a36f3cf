"""Custom stateful streaming operator: running per-key aggregates via
``applyInPandasWithState`` (SURVEY.md §2.5 seam).

The reference's only cross-batch state is a resume offset plus a
periodic tile-regen counter (geoparser_app/views.py:48,322-348).  This
module is the Structured-Streaming-native generalization: arbitrary
per-key state maintained across micro-batches, checkpointed with the
stream, surviving restarts — e.g. running extraction counters per
corpus source, used by the incremental pipeline's progress/metrics
surface (R4).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        (n, s) = state.get
    else:
        n, s = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "sum_value": [s]})


def running_counts(events: DataFrame, key_col: str = "key") -> DataFrame:
    """Streaming DataFrame (key, value) → running (key, n_events,
    sum_value), state kept per key across micro-batches."""
    return events.groupBy(key_col).applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_counts(
    spark: SparkSession,
    events_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "key string, value double",
) -> StreamingQuery:
    """File-stream → stateful running counts → parquet (latest row per
    key wins on the read side).  AvailableNow: catch up, then stop;
    state lives in the checkpoint, so a later run continues the
    counts."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = running_counts(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn(
            "batch_id", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(batch_id)
        ).write.mode("append").parquet(output_dir)

    return (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
