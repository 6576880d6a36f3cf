"""Structured Streaming incremental extract: AvailableNow catch-up,
restart-safe checkpoint, output equality with the batch path.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from geoparser_spark.operators.extract import extract
from geoparser_spark.streaming.incremental import run_incremental_extract
from geoparser_spark.testing.corpus import build_docs


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="gp_stream_")
    yield {k: os.path.join(d, k) for k in ("docs", "out", "ckpt")}
    shutil.rmtree(d, ignore_errors=True)


def _write_batch(spark, n, seed, docs_dir):
    build_docs(spark, n, seed=seed).write.mode("append").parquet(docs_dir)


def test_incremental_catchup_then_resume(spark, dirs):
    _write_batch(spark, 30, 42, dirs["docs"])
    q = run_incremental_extract(spark, dirs["docs"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    out1 = spark.read.parquet(dirs["out"])
    assert out1.count() == 30

    # streaming output == batch output, span for span
    batch = extract(spark.read.parquet(dirs["docs"]))
    j = out1.alias("s").join(batch.alias("b"), "doc_id", "full")
    assert j.where(~(F.col("s.spans") == F.col("b.spans"))).count() == 0

    # second wave of NEW docs; restart from the same checkpoint —
    # only the new files are processed, nothing is double-appended
    build_docs(spark, 70, seed=42).where(F.col("doc_id") > "doc-00000029") \
        .write.mode("append").parquet(dirs["docs"])
    q2 = run_incremental_extract(spark, dirs["docs"], dirs["out"], dirs["ckpt"])
    q2.awaitTermination(120)
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() == 70
    assert out2.select("doc_id").distinct().count() == 70


def _latest_per_key(spark, out):
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("key").orderBy(F.col("batch_id").desc(), F.col("n_events").desc())
    latest = (
        spark.read.parquet(out)
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
    )
    return {r.key: (r.n_events, r.sum_value) for r in latest.collect()}


def test_streaming_geotag_end_to_end(spark, dirs, gazetteer):
    """The full extract+geotag pipeline as a streaming transform: the
    batch operators compose with readStream unchanged, and the
    micro-batch output equals the batch run location for location."""
    from geoparser_spark.operators.geotag import geotag

    _write_batch(spark, 25, 42, dirs["docs"])
    q = run_incremental_extract(
        spark, dirs["docs"], dirs["out"], dirs["ckpt"],
        batch_transform=lambda df: geotag(df, gazetteer),
    )
    q.awaitTermination(120)
    stream_out = spark.read.parquet(dirs["out"])
    batch_out = geotag(extract(spark.read.parquet(dirs["docs"])), gazetteer)
    # geotag emits only docs with >= 1 location; stream == batch exactly
    assert stream_out.count() == batch_out.count() > 0
    j = stream_out.alias("s").join(batch_out.alias("b"), "doc_id", "full")
    bad = j.where(
        F.col("s.locations").isNull()
        | F.col("b.locations").isNull()
        | ~(F.col("s.locations") == F.col("b.locations"))
    )
    assert bad.count() == 0


def test_watermarked_window_closes_and_drops_late(spark, dirs):
    """Event-time window + watermark semantics (§2.5): a window is
    emitted exactly once after the watermark passes its end, and rows
    later than the watermark are dropped, not merged."""
    from pyspark.sql import Row
    from geoparser_spark.streaming.incremental import run_windowed_counts

    ev, out, ckpt = dirs["docs"], dirs["out"], dirs["ckpt"]

    def write(rows):
        spark.createDataFrame(
            [Row(ts=t, event_type=k, value=v) for t, k, v in rows],
            "ts string, event_type string, value double",
        ).select(
            F.to_timestamp("ts").alias("ts"), "event_type", "value"
        ).write.mode("append").parquet(ev)

    def run():
        q = run_windowed_counts(spark, ev, out, ckpt)
        q.awaitTermination(120)

    def windows():
        try:
            return {
                (str(r.window_start), r.event_type): (r.cnt, r.sum_value)
                for r in spark.read.parquet(out).collect()
            }
        except Exception:
            return {}

    write([("2024-01-01 10:00:00", "A", 1.0),
           ("2024-01-01 10:10:00", "A", 2.0),
           ("2024-01-01 10:20:00", "B", 5.0)])
    run()  # watermark still inside the 10:00 window: nothing final yet

    write([("2024-01-01 13:00:00", "A", 1.0)])
    run()  # watermark -> 12:30, the 10:00-11:00 window closes
    got = windows()
    assert got.get(("2024-01-01 10:00:00", "A")) == (2, 3.0)
    assert got.get(("2024-01-01 10:00:00", "B")) == (1, 5.0)

    # a LATE row for the already-closed window + a fresh wave that
    # closes the 13:00 window
    write([("2024-01-01 10:05:00", "A", 100.0),
           ("2024-01-01 15:00:00", "C", 1.0)])
    run()
    got = windows()
    # late row dropped: the closed window's values are unchanged and
    # appear exactly once
    assert got.get(("2024-01-01 10:00:00", "A")) == (2, 3.0)
    assert got.get(("2024-01-01 13:00:00", "A")) == (1, 1.0)


def test_stateful_running_counts_across_restarts(spark, dirs):
    from pyspark.sql import Row, functions as F
    from geoparser_spark.streaming.stateful import run_stateful_counts

    ev, out, ckpt = dirs["docs"], dirs["out"], dirs["ckpt"]
    spark.createDataFrame(
        [Row(key="a", value=1.0), Row(key="a", value=2.0), Row(key="b", value=5.0)]
    ).write.mode("append").parquet(ev)
    q = run_stateful_counts(spark, ev, out, ckpt)
    q.awaitTermination(120)
    got = _latest_per_key(spark, out)
    assert got == {"a": (2, 3.0), "b": (1, 5.0)}

    # restart with new data: state must carry the previous totals
    spark.createDataFrame(
        [Row(key="a", value=10.0), Row(key="c", value=7.0)]
    ).write.mode("append").parquet(ev)
    q2 = run_stateful_counts(spark, ev, out, ckpt)
    q2.awaitTermination(120)
    got = _latest_per_key(spark, out)
    assert got["a"] == (3, 13.0)   # cumulative across the restart
    assert got["c"] == (1, 7.0)
    assert got["b"] == (1, 5.0)    # untouched key keeps its state row


def test_streaming_dedup_within_watermark_bounded_state(spark, dirs):
    """Re-delivered doc_ids inside the watermark horizon are
    suppressed; output carries each doc exactly once per delivery
    epoch, with state bounded by the watermark instead of corpus
    size."""
    from geoparser_spark.streaming.incremental import run_streaming_dedup

    rows = [
        ("d1", "2024-01-01 10:00:00", "alpha"),
        ("d2", "2024-01-01 10:00:10", "beta"),
        ("d1", "2024-01-01 10:00:20", "alpha"),   # re-delivery: dropped
        ("d3", "2024-01-01 10:05:00", "gamma"),
        ("d2", "2024-01-01 10:05:01", "beta"),    # re-delivery: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id string, ts string, text string") \
        .select("doc_id", F.col("ts").cast("timestamp").alias("ts"), "text")
    df.write.mode("append").parquet(dirs["docs"])
    q = run_streaming_dedup(spark, dirs["docs"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    out = spark.read.parquet(dirs["out"])
    got = sorted(r.doc_id for r in out.collect())
    assert got == ["d1", "d2", "d3"]


def test_streaming_content_dedup_suppresses_reposts(spark, dirs):
    """Re-posts of the same TEXT under different doc_ids dedup on the
    SimHash signature; distinct content passes.  The signature is a
    pure projection (no shuffle before the stateful dedup)."""
    from geoparser_spark.streaming.incremental import run_streaming_content_dedup

    body = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        ("d1", "2024-01-01 10:00:00", body),
        ("d2", "2024-01-01 10:00:10", body),              # repost: dropped
        ("d3", "2024-01-01 10:00:20", "entirely different content here " * 3),
        ("d4", "2024-01-01 10:05:00", body + "!!"),       # same tokens: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id string, ts string, text string") \
        .select("doc_id", F.col("ts").cast("timestamp").alias("ts"), "text")
    df.write.mode("append").parquet(dirs["docs"])
    q = run_streaming_content_dedup(spark, dirs["docs"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    out = spark.read.parquet(dirs["out"])
    kept_texts = sorted(r.text[:10] for r in out.collect())
    assert out.count() == 2
    # one of the body reposts survives (either id), plus the distinct doc
    assert any(t.startswith("entirely") for t in kept_texts)


def test_streaming_content_dedup_keeps_degenerate_texts(spark, dirs):
    """Docs whose text is NULL or normalizes to zero tokens must NOT
    dedup against each other — '!!!' and '???' are unrelated documents
    sharing a degenerate signature."""
    from geoparser_spark.streaming.incremental import run_streaming_content_dedup

    rows = [
        ("p1", "2024-01-01 10:00:00", "!!!"),
        ("p2", "2024-01-01 10:00:05", "???"),
        ("p3", "2024-01-01 10:00:10", None),
        ("p4", "2024-01-01 10:00:15", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, ts string, text string") \
        .select("doc_id", F.col("ts").cast("timestamp").alias("ts"), "text")
    df.write.mode("append").parquet(dirs["docs"])
    q = run_streaming_content_dedup(spark, dirs["docs"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    out = spark.read.parquet(dirs["out"])
    assert sorted(r.doc_id for r in out.collect()) == ["p1", "p2", "p3", "p4"]


def test_streaming_idempotent_ingest_into_snapshot_table(spark, dirs):
    """Stream -> append_dedup -> snapshot table: duplicated upstream
    deliveries and a checkpoint restart both converge to exactly one
    row per content (streaming/ingest.py)."""
    import os

    from pyspark.sql import Row

    from geoparser_spark.plans import snapshots as SN
    from geoparser_spark.streaming.ingest import run_ingest_stream

    root = os.path.join(os.path.dirname(dirs["out"]), "snap_tbl")
    src = os.path.join(os.path.dirname(dirs["out"]), "incoming")
    seed = spark.createDataFrame([Row(doc_id=0, text="seed")])
    SN.create_table(seed, root, key="doc_id")

    batch1 = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(1, 11)])
    batch1.write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = run_ingest_stream(spark, stream, root, ["doc_id", "text"],
                          dirs["ckpt"])
    q.awaitTermination(120)
    assert SN.read_snapshot(spark, root).count() == 11

    # upstream re-sends batch1 (new files, same content) + 5 new rows
    batch1.write.mode("append").parquet(src)
    spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(11, 16)]
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = run_ingest_stream(spark, stream, root, ["doc_id", "text"],
                          dirs["ckpt"])
    q.awaitTermination(120)
    got = SN.read_snapshot(spark, root)
    assert got.count() == 16                      # no twins, 5 new
    assert got.select("doc_id").distinct().count() == 16


def test_ingest_stream_requires_existing_table(spark, dirs):
    import os

    import pytest as _pytest

    from geoparser_spark.streaming.ingest import run_ingest_stream

    from pyspark.sql import Row

    src = os.path.join(os.path.dirname(dirs["out"]), "guard_src")
    spark.createDataFrame([Row(doc_id=1, text="x")]) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    with _pytest.raises(ValueError):
        run_ingest_stream(spark, stream, os.path.join(
            os.path.dirname(dirs["out"]), "missing_tbl"),
            ["doc_id"], dirs["ckpt"])


def test_session_windows_merge_and_close(spark, dirs):
    """session_window semantics: events under the 30-min gap merge
    into one session (end = last event + gap); a >gap pause starts a
    new session; sessions finalize only after the watermark passes."""
    from pyspark.sql import Row
    from geoparser_spark.streaming.incremental import run_session_counts

    ev, out, ckpt = dirs["docs"], dirs["out"], dirs["ckpt"]

    def write(rows):
        spark.createDataFrame(
            [Row(ts=t, user_id=u, value=v) for t, u, v in rows],
            "ts string, user_id long, value double",
        ).select(
            F.to_timestamp("ts").alias("ts"), "user_id", "value"
        ).write.mode("append").parquet(ev)

    def run():
        run_session_counts(spark, ev, out, ckpt).awaitTermination(120)

    def sessions():
        try:
            return {
                (str(r.session_start), r.user_id):
                    (str(r.session_end), r.n_events, r.sum_value)
                for r in spark.read.parquet(out).collect()
            }
        except Exception:
            return {}

    # user 1: two bursts 45 min apart (> gap) -> two sessions;
    # user 2: one event
    write([("2024-01-01 10:00:00", 1, 1.0),
           ("2024-01-01 10:10:00", 1, 2.0),
           ("2024-01-01 10:55:00", 1, 4.0),
           ("2024-01-01 10:00:00", 2, 8.0)])
    run()  # nothing can finalize yet (watermark at 10:25)
    assert sessions() == {}

    write([("2024-01-01 14:00:00", 3, 0.5)])
    run()  # watermark -> 13:30: every earlier session closes
    got = sessions()
    # burst 1 merged: 10:00-10:10 events -> session ends 10:40
    assert got[("2024-01-01 10:00:00", 1)] == ("2024-01-01 10:40:00", 2, 3.0)
    # the 10:55 event opened a NEW session (gap 45 min > 30)
    assert got[("2024-01-01 10:55:00", 1)] == ("2024-01-01 11:25:00", 1, 4.0)
    assert got[("2024-01-01 10:00:00", 2)] == ("2024-01-01 10:30:00", 1, 8.0)
    assert ("2024-01-01 14:00:00", 3) not in got  # still open
