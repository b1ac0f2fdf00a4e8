"""Streaming surface: windowed aggs (batch/stream parity) and
exactly-once incremental file ingestion with checkpoint."""

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smartbots_etl_facturas_spark.streaming.ingest import incremental_file_stream
from smartbots_etl_facturas_spark.streaming.windows import tumbling_agg, sliding_agg

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
])


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Timestamped event parquet files written in two slices."""
    rows1 = [(1, "2024-01-01 10:05:00", "click", 1.0),
             (2, "2024-01-01 10:45:00", "click", 2.0),
             (3, "2024-01-01 11:05:00", "view", 3.0)]
    rows2 = [(4, "2024-01-01 11:30:00", "click", 4.0),
             (5, "2024-01-01 12:01:00", "view", 5.0)]
    src = str(tmp_path / "events")
    for i, rows in enumerate([rows1, rows2]):
        df = spark.createDataFrame(
            [(e, t, ty, v) for e, t, ty, v in rows], "event_id long, ts string, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").parquet(src)
    return src


def test_tumbling_batch_counts(spark, events_dir):
    df = spark.read.parquet(events_dir)
    out = {(r.window_start.strftime("%H:%M"), r.event_type): r.n
           for r in tumbling_agg(df).collect()}
    assert out[("10:00", "click")] == 2
    assert out[("11:00", "view")] == 1
    assert out[("11:00", "click")] == 1
    assert out[("12:00", "view")] == 1


def test_sliding_overlap(spark, events_dir):
    df = spark.read.parquet(events_dir)
    total_tumbling = sum(r.n for r in tumbling_agg(df).collect())
    total_sliding = sum(r.n for r in sliding_agg(df).collect())
    assert total_sliding == 2 * total_tumbling   # 1h window / 30m slide → 2 panes per event


def test_streaming_matches_batch_and_is_idempotent(spark, events_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    batch_total = spark.read.parquet(events_dir).count()

    q = incremental_file_stream(
        spark, events_dir, EVENT_SCHEMA, ckpt,
        transform=None, output_dir=out_dir,
    )
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir).count()
    assert first == batch_total

    # second run with the same checkpoint: nothing new → no duplicates (J5)
    q2 = incremental_file_stream(spark, events_dir, EVENT_SCHEMA, ckpt,
                                 transform=None, output_dir=out_dir)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == batch_total

    # new file arrives → only the delta is processed
    extra = spark.createDataFrame(
        [(9, "2024-01-01 13:00:00", "click", 9.0)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    extra.coalesce(1).write.mode("append").parquet(events_dir)
    q3 = incremental_file_stream(spark, events_dir, EVENT_SCHEMA, ckpt,
                                 transform=None, output_dir=out_dir)
    q3.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == batch_total + 1


def test_streaming_windowed_agg_with_watermark(spark, events_dir, tmp_path):
    """The SAME tumbling_agg plan runs on a stream with watermark +
    foreachBatch (complete-mode-free append of finalized windows)."""
    ckpt = str(tmp_path / "ckpt-window")
    seen = {}

    def on_batch(bdf, batch_id):
        for r in bdf.collect():
            key = (r.window_start.strftime("%H:%M"), r.event_type)
            # update mode re-emits a window with its cumulative count
            # every time it changes — last write wins
            seen[key] = r.n

    q = incremental_file_stream(
        spark, events_dir, EVENT_SCHEMA, ckpt,
        transform=lambda df: tumbling_agg(df, watermark="10 minutes"),
        on_batch=on_batch,
        output_mode="update",
    )
    q.awaitTermination(120)
    # availableNow drains everything; every window's final cumulative
    # count must match the batch computation
    batch = {(r.window_start.strftime("%H:%M"), r.event_type): r.n
             for r in tumbling_agg(spark.read.parquet(events_dir)).collect()}
    assert seen == batch
