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


def test_sessionize_batch_gap_semantics(spark):
    """Events exactly gap apart still merge (closed [t, t+gap]
    windows); only a strictly larger gap starts a new session."""
    from smartbots_etl_facturas_spark.streaming.sessions import sessionize

    rows = [(1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 11:00:00", 2.0),   # exactly 3600s → merges
            (1, "2024-01-01 12:00:01", 3.0),   # 3601s → new session
            (2, "2024-01-01 10:00:00", 4.0)]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {(r.user_id, r.session_start.strftime("%H:%M")): (r.n_events, r.sum_value)
           for r in sessionize(df, gap_seconds=3600).collect()}
    assert out[(1, "10:00")] == (2, 3.0)
    assert out[(1, "12:00")] == (1, 3.0)
    assert out[(2, "10:00")] == (1, 4.0)


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """The same session_window plan on a watermarked stream emits the
    closed sessions the batch plan computes."""
    from smartbots_etl_facturas_spark.streaming.sessions import sessionize

    rows = [(1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 10:10:00", 2.0),
            (1, "2024-01-01 12:00:00", 3.0),
            (2, "2024-01-01 10:05:00", 4.0),
            (2, "2024-01-01 15:00:00", 5.0)]   # advances watermark far
    src = str(tmp_path / "sess-src")
    df = spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(src)

    schema = "user_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (sessionize(stream, gap_seconds=3600, watermark="0 seconds")
         .writeStream.format("memory").queryName("sess_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sess-ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.session_start.strftime("%H:%M")): (r.n_events, r.sum_value)
           for r in spark.sql("select * from sess_out").collect()}
    batch = {(r.user_id, r.session_start.strftime("%H:%M")): (r.n_events, r.sum_value)
             for r in sessionize(df, gap_seconds=3600).collect()}
    # append mode emits only watermark-closed sessions; all emitted
    # sessions must match the batch computation exactly
    assert got
    for k, v in got.items():
        assert batch[k] == v


def test_sessionize_stateful_custom_operator(spark, tmp_path):
    """applyInPandasWithState twin: per-key open-session state with
    event-time timeout; closed sessions match batch session_window."""
    from smartbots_etl_facturas_spark.streaming.sessions import (
        sessionize,
        sessionize_stateful,
    )

    rows = [(1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 10:10:00", 2.0),
            (1, "2024-01-01 12:00:00", 3.0),   # closes session 1 by gap
            (2, "2024-01-01 10:05:00", 4.0),
            (2, "2024-01-01 16:00:00", 5.0)]
    src = str(tmp_path / "st-src")
    df = spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(src)

    schema = "user_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(src).withWatermark("ts", "0 seconds")
    q = (sessionize_stateful(stream, gap_seconds=3600)
         .writeStream.format("memory").queryName("sess_state_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "st-ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.session_start.strftime("%H:%M")): (r.n_events, r.sum_value)
           for r in spark.sql("select * from sess_state_out").collect()}
    batch = {(r.user_id, r.session_start.strftime("%H:%M")): (r.n_events, r.sum_value)
             for r in sessionize(df, gap_seconds=3600).collect()}
    assert got                                   # in-data gaps close sessions
    for k, v in got.items():
        assert batch[k] == v


def test_streaming_consolidation_foreachbatch(spark, tmp_path):
    """Streaming twin of plans/consolidation: the file source +
    checkpoint IS the J5 idempotency ledger; every micro-batch
    upserts (insert-only) into the staged-published consolidated
    table inside foreachBatch — exactly-once across re-runs."""
    from smartbots_etl_facturas_spark.operators.upsert import upsert_insert_only
    from smartbots_etl_facturas_spark.sinks.staged import publish, read_published
    from smartbots_etl_facturas_spark.streaming.ingest import incremental_file_stream

    src = str(tmp_path / "inv-src")
    base = str(tmp_path / "consolidated")
    ckpt = str(tmp_path / "inv-ckpt")
    schema = "invoice_number string, reference_number string, total_amount double"
    pk = ["invoice_number", "reference_number"]

    spark.createDataFrame(
        [("F-1", "R-1", 119.0), ("F-2", "R-1", 238.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    def on_batch(bdf, batch_id):
        try:
            current = read_published(bdf.sparkSession, base)
        except FileNotFoundError:
            current = bdf.limit(0)
        merged = upsert_insert_only(current, bdf.dropDuplicates(pk), pk)
        publish(merged, base)

    for _ in range(2):  # second run: checkpoint says nothing new
        q = incremental_file_stream(
            spark, src, T._parse_datatype_string(schema), ckpt, on_batch=on_batch
        )
        q.awaitTermination(120)
    assert read_published(spark, base).count() == 2

    # late file: overlapping PK must NOT overwrite, new PK appends
    spark.createDataFrame(
        [("F-1", "R-1", 999.0), ("F-9", "R-9", 10.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = incremental_file_stream(
        spark, src, T._parse_datatype_string(schema), ckpt, on_batch=on_batch
    )
    q.awaitTermination(120)
    rows = {r.invoice_number: r.total_amount for r in read_published(spark, base).collect()}
    assert rows == {"F-1": 119.0, "F-2": 238.0, "F-9": 10.0}


def _write_slice(spark, src, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("append").parquet(src)


def test_ingest_crash_resume_exactly_once(spark, tmp_path):
    """Mid-run CRASH + resume from checkpoint (VERDICT r1 #7): the
    drain is sliced into one-file micro-batches; the foreachBatch hook
    raises after committing batch 0's output but BEFORE batch 1's
    commit (a kill between sink write and checkpoint commit — the
    worst spot). The resumed query must replay the uncommitted batch
    and process the rest, and the per-batch-id idempotent sink must
    yield every event exactly once."""
    src = str(tmp_path / "crash-src")
    ckpt = str(tmp_path / "crash-ckpt")
    out = str(tmp_path / "crash-out")
    all_rows = []
    for i in range(5):
        rows = [(10 * i + j, f"2024-01-01 1{i}:0{j}:00", "click", float(j))
                for j in range(3)]
        all_rows += rows
        _write_slice(spark, src, rows)

    crashed = {"flag": False}

    def on_batch_crashing(bdf, batch_id):
        # idempotent per-batch sink: overwrite this batch id's path
        bdf.write.mode("overwrite").parquet(f"{out}/b{batch_id}")
        if batch_id >= 1 and not crashed["flag"]:
            crashed["flag"] = True
            raise RuntimeError("injected crash after sink write, before commit")

    q = incremental_file_stream(
        spark, src, EVENT_SCHEMA, ckpt,
        on_batch=on_batch_crashing,
        reader_options={"maxFilesPerTrigger": "1"},
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
        raise RuntimeError(str(q.exception() or "injected crash (propagated)"))
    assert crashed["flag"]

    def on_batch(bdf, batch_id):
        bdf.write.mode("overwrite").parquet(f"{out}/b{batch_id}")

    q2 = incremental_file_stream(
        spark, src, EVENT_SCHEMA, ckpt,
        on_batch=on_batch,
        reader_options={"maxFilesPerTrigger": "1"},
    )
    q2.awaitTermination(120)

    got = spark.read.parquet(f"{out}/b*")
    assert got.count() == len(all_rows)                      # no drops, no dupes
    assert got.select("event_id").distinct().count() == len(all_rows)


def test_windowed_agg_crash_resume(spark, tmp_path):
    """tumbling_agg state survives a mid-run crash: the resumed query
    recovers the window aggregation state from the checkpoint, and the
    final update-mode emissions converge to the batch computation."""
    src = str(tmp_path / "wcrash-src")
    ckpt = str(tmp_path / "wcrash-ckpt")
    # two files whose events share windows — state must carry across
    _write_slice(spark, src, [(1, "2024-01-01 10:05:00", "click", 1.0),
                              (2, "2024-01-01 10:15:00", "click", 1.0)])
    _write_slice(spark, src, [(3, "2024-01-01 10:25:00", "click", 1.0),
                              (4, "2024-01-01 11:05:00", "view", 1.0)])

    seen = {}
    crashed = {"flag": False}

    def on_batch(bdf, batch_id):
        rows = bdf.collect()
        if batch_id >= 1 and not crashed["flag"]:
            crashed["flag"] = True
            raise RuntimeError("injected crash")
        for r in rows:
            seen[(r.window_start.strftime("%H:%M"), r.event_type)] = r.n

    def start():
        return incremental_file_stream(
            spark, src, EVENT_SCHEMA, ckpt,
            transform=lambda df: tumbling_agg(df, watermark="10 minutes"),
            on_batch=on_batch,
            output_mode="update",
            reader_options={"maxFilesPerTrigger": "1"},
        )

    q = start()
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
    assert crashed["flag"]
    q2 = start()                        # same checkpoint → state recovery
    q2.awaitTermination(120)

    batch = {(r.window_start.strftime("%H:%M"), r.event_type): r.n
             for r in tumbling_agg(spark.read.parquet(src)).collect()}
    # update mode re-emits cumulative counts; after the resumed drain
    # the last-write-wins view must equal the batch result — counting
    # events 1-2 twice (replayed batch) would overshoot, dropping 3-4
    # would undershoot
    assert seen == batch


def test_sessionize_stateful_crash_resume(spark, tmp_path):
    """applyInPandasWithState survives a mid-run crash: the per-key
    open-session state is recovered from the checkpoint, so a session
    whose events SPAN the crash boundary still comes out as one
    session, and closed-session emissions are neither dropped nor
    duplicated (per-batch-id idempotent sink)."""
    from smartbots_etl_facturas_spark.streaming.sessions import (
        sessionize,
        sessionize_stateful,
    )

    src = str(tmp_path / "stcrash-src")
    ckpt = str(tmp_path / "stcrash-ckpt")
    out = str(tmp_path / "stcrash-out")
    schema = "user_id long, ts timestamp, value double"

    def _slice(rows):
        df = spark.createDataFrame(rows, "user_id long, ts string, value double") \
            .withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").parquet(src)

    # user 1's first session spans the two files (10:00 + 10:10);
    # the 12:00 event in file 2 closes it; user 2's session closes at 16:00
    _slice([(1, "2024-01-01 10:00:00", 1.0),
            (2, "2024-01-01 10:05:00", 4.0)])
    _slice([(1, "2024-01-01 10:10:00", 2.0),
            (1, "2024-01-01 12:00:00", 3.0),
            (2, "2024-01-01 16:00:00", 5.0)])

    crashed = {"flag": False}

    def make_on_batch(crash):
        def on_batch(bdf, batch_id):
            bdf.write.mode("overwrite").parquet(f"{out}/b{batch_id}")
            if crash and batch_id >= 1 and not crashed["flag"]:
                crashed["flag"] = True
                raise RuntimeError("injected crash")
        return on_batch

    def start(crash):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(src)
                  .withWatermark("ts", "0 seconds"))
        return (sessionize_stateful(stream, gap_seconds=3600)
                .writeStream.foreachBatch(make_on_batch(crash))
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())

    q = start(crash=True)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
    assert crashed["flag"]
    q2 = start(crash=False)
    q2.awaitTermination(120)

    got = {(r.user_id, r.session_start.strftime("%H:%M")): (r.n_events, r.sum_value)
           for r in spark.read.parquet(f"{out}/b*").collect()}
    batch_df = spark.read.parquet(src)
    batch = {(r.user_id, r.session_start.strftime("%H:%M")): (r.n_events, r.sum_value)
             for r in sessionize(batch_df, gap_seconds=3600).collect()}
    # user 1's first session spans the crash boundary (10:00 from
    # file 1, 10:10 from file 2) — recovered state must merge them
    # into ONE session; 12:00 is >gap later and opens a new one
    assert got[(1, "10:00")] == (2, 3.0)
    assert got
    for k, v in got.items():
        assert batch[k] == v


def test_streaming_incremental_dedup(spark, tmp_path):
    """Streaming exact dedup: dropDuplicatesWithinWatermark drops a
    re-sent doc_id across MICRO-BATCHES (state-backed, watermark-
    bounded — the streaming twin of operators.dedup.exact_dedup for
    continuous corpus ingestion)."""
    src = str(tmp_path / "dd-src")
    ckpt = str(tmp_path / "dd-ckpt")
    schema = "doc_id long, ts timestamp, text string"

    def _slice(rows):
        df = spark.createDataFrame(rows, "doc_id long, ts string, text string") \
            .withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").parquet(src)

    _slice([(1, "2024-01-01 10:00:00", "a"), (2, "2024-01-01 10:01:00", "b")])
    _slice([(1, "2024-01-01 10:02:00", "a"),      # dup of batch-1 doc
            (3, "2024-01-01 10:03:00", "c")])

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src)
              .withWatermark("ts", "1 hour"))
    q = (stream.dropDuplicatesWithinWatermark(["doc_id"])
         .writeStream.format("memory").queryName("dd_out")
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.sql("select * from dd_out").collect())
    assert got == [1, 2, 3]                       # re-sent doc 1 dropped once


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (clicks ↔ conversions within 30min)
    emits exactly the pairs the batch join computes; the interval
    bound + watermark is what lets streaming evict join state."""
    from smartbots_etl_facturas_spark.streaming.joins import interval_join

    clicks_src = str(tmp_path / "clicks")
    conv_src = str(tmp_path / "convs")
    clicks = [(1, "2024-01-01 10:00:00", "c1"),
              (1, "2024-01-01 11:00:00", "c2"),
              (2, "2024-01-01 10:05:00", "c3")]
    convs = [(1, "2024-01-01 10:20:00", "v1"),   # ← c1 (20min)
             (1, "2024-01-01 11:25:00", "v2"),   # ← c2 (25min), not c1
             (2, "2024-01-01 12:00:00", "v3")]   # no click within 30min
    for src, rows in ((clicks_src, clicks), (conv_src, convs)):
        df = spark.createDataFrame(rows, "user_id long, ts string, tag string") \
            .withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.parquet(src)

    schema = "user_id long, ts timestamp, tag string"
    sc = spark.readStream.schema(schema).parquet(clicks_src)
    sv = spark.readStream.schema(schema).parquet(conv_src)
    q = (interval_join(sc, sv, "user_id", 0, 1800)
         .writeStream.format("memory").queryName("ssj_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ssj-ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.l_tag, r.r_tag)
           for r in spark.sql("select * from ssj_out").collect()}

    batch = {(r.user_id, r.l_tag, r.r_tag)
             for r in interval_join(
                 spark.read.parquet(clicks_src),
                 spark.read.parquet(conv_src),
                 "user_id", 0, 1800).collect()}
    assert got == batch == {(1, "c1", "v1"), (1, "c2", "v2")}


def test_sessionize_stateful_state_bounded_by_watermark(spark, tmp_path):
    """PROOF that watermark timeouts actually bound the stateful
    sessionizer's state: four query cycles over one checkpoint, each
    bringing K brand-new keys two gaps later than the previous cycle
    (so every earlier session has timed out). Without eviction,
    numRowsTotal would climb to cycles*K; with EventTimeTimeout it
    must plateau around the one live cycle's K sessions."""
    from smartbots_etl_facturas_spark.streaming.sessions import sessionize_stateful

    K = 5
    gap_s = 600
    base = 1_700_000_000  # epoch seconds
    src = str(tmp_path / "bounded-src")
    ckpt = str(tmp_path / "bounded-ckpt")
    schema = "user_id long, ts timestamp, value double"

    out = str(tmp_path / "bounded-out")

    def on_batch(bdf, batch_id):
        bdf.write.mode("overwrite").parquet(f"{out}/b{batch_id}")

    state_rows = []
    for cycle in range(4):
        t0 = base + cycle * 3 * gap_s          # 3 gaps apart: all prior time out
        rows = [
            (cycle * K + k, float(t0 + 30 * j), 1.0)
            for k in range(K)
            for j in range(3)
        ]
        (spark.createDataFrame(rows, "user_id long, ts double, value double")
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("append").parquet(src))

        stream = (spark.readStream.schema(schema).parquet(src)
                  .withWatermark("ts", "0 seconds"))
        q = (sessionize_stateful(stream, gap_seconds=gap_s)
             .writeStream.foreachBatch(on_batch)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        progress = [p for p in q.recentProgress if p.get("stateOperators")]
        assert progress, f"cycle {cycle}: no state operator progress"
        state_rows.append(progress[-1]["stateOperators"][0]["numRowsTotal"])
    emitted_total = spark.read.parquet(f"{out}/b*").count()

    # 4 cycles x K keys = 20 sessions ever; unbounded state would show
    # 10/15/20 by cycles 2/3/4. Eviction keeps it at the live cycle's
    # K (+K during the timeout-handoff batch at most).
    assert state_rows[0] <= 2 * K
    assert all(s <= 2 * K for s in state_rows), state_rows
    assert state_rows[-1] < 3 * K < 4 * K  # nowhere near the unbounded total
    # and the evicted sessions were EMITTED, not dropped: every closed
    # cycle's K sessions surfaced by the final cycle
    assert emitted_total >= 3 * K


def test_interval_join_state_bounded_by_watermark(spark, tmp_path):
    """PROOF that the watermark + interval bound actually EVICT
    stream-stream join state (streaming/joins.py): four query cycles
    over one checkpoint, each bringing K brand-new keys three
    intervals later than the previous cycle, so every earlier row is
    outside any future match window. Without eviction numRowsTotal
    climbs ~2K per cycle (both sides keep state); with it the total
    plateaus around the last two cycles (eviction uses the watermark
    as of the PREVIOUS batch end, so one cycle of lag is expected)."""
    from smartbots_etl_facturas_spark.streaming.joins import interval_join

    K = 6
    upper_s = 1800
    base = 1_700_000_000
    clicks_src = str(tmp_path / "ij-clicks")
    conv_src = str(tmp_path / "ij-convs")
    ckpt = str(tmp_path / "ij-ckpt")
    schema = "user_id long, ts timestamp, tag string"

    out = str(tmp_path / "ij-out")

    def on_batch(bdf, batch_id):
        bdf.write.mode("overwrite").parquet(f"{out}/b{batch_id}")

    state_rows = []
    for cycle in range(4):
        t0 = base + cycle * 3 * upper_s
        keys = [cycle * K + k for k in range(K)]
        click_rows = [(u, float(t0), f"c{cycle}") for u in keys]
        conv_rows = [(u, float(t0 + 60), f"v{cycle}") for u in keys]
        for src, rows in ((clicks_src, click_rows), (conv_src, conv_rows)):
            (spark.createDataFrame(rows, "user_id long, ts double, tag string")
             .withColumn("ts", F.col("ts").cast("timestamp"))
             .coalesce(1).write.mode("append").parquet(src))

        sc = spark.readStream.schema(schema).parquet(clicks_src)
        sv = spark.readStream.schema(schema).parquet(conv_src)
        q = (interval_join(sc, sv, "user_id", 0, upper_s)
             .writeStream.foreachBatch(on_batch)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        progress = [p for p in q.recentProgress if p.get("stateOperators")]
        assert progress, f"cycle {cycle}: no state operator progress"
        state_rows.append(progress[-1]["stateOperators"][0]["numRowsTotal"])

    # every cycle's K pairs matched and were emitted across the runs
    emitted = spark.read.parquet(f"{out}/b*").count()
    assert emitted == 4 * K
    # 4 cycles x 2K state rows ever => unbounded shows 4K/6K/8K by
    # cycles 2/3/4; eviction (1 cycle of watermark lag) caps at ~2
    # cycles' worth
    assert all(s <= 2 * 2 * K for s in state_rows), state_rows
    assert state_rows[-1] < 3 * 2 * K < 4 * 2 * K


def test_ewma_stream_matches_batch(spark, tmp_path):
    """Streaming EWMA (applyInPandasWithState) == batch EWMA: the
    per-key accumulator carries across micro-batches (file 2's first
    row continues file 1's recurrence), and emissions are exact
    integer matches against operators/timeseries.ewma_smooth on the
    same rows."""
    from smartbots_etl_facturas_spark.operators.timeseries import ewma_smooth
    from smartbots_etl_facturas_spark.streaming.timeseries import ewma_stateful

    src = str(tmp_path / "ewma-src")
    ckpt = str(tmp_path / "ewma-ckpt")
    out = str(tmp_path / "ewma-out")
    schema = "user_id long, ts timestamp, x_units long"

    def _slice(rows):
        (spark.createDataFrame(rows, "user_id long, ts string, x_units long")
         .withColumn("ts", F.to_timestamp("ts"))
         .coalesce(1).write.mode("append").parquet(src))

    _slice([(1, "2024-01-01 10:00:00", 100),
            (1, "2024-01-01 10:01:00", 200),
            (2, "2024-01-01 10:00:30", 50)])
    _slice([(1, "2024-01-01 10:02:00", 60),
            (2, "2024-01-01 10:03:00", 90),
            (1, "2024-01-01 10:04:00", 1000)])

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src)
              .withWatermark("ts", "0 seconds"))
    q = (ewma_stateful(stream)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.user_id, int(r.ts.timestamp())): r.ewma_units
           for r in spark.read.parquet(out).collect()}
    batch_src = (spark.read.parquet(src)
                 .withColumn("tsl", F.unix_micros("ts"))
                 .withColumn("event_id", F.unix_micros("ts")))
    batch = {(r.user_id, r.tsl // 1_000_000): r.ewma_units
             for r in ewma_smooth(batch_src, ts_col="tsl").collect()}
    assert len(got) == 6
    assert got == batch
    # hand-checked recurrence for user 1: 100, 125, 109, 331
    u1 = [v for (u, _), v in sorted(got.items()) if u == 1]
    assert u1 == [100, 125, 109, 331]


def test_streaming_incremental_agg_maintenance(spark, tmp_path):
    """Streaming materialized-view maintenance: each micro-batch is
    aggregated and merged into the PUBLISHED monoid state via
    foreachBatch + the versioned sink (state read back from the sink
    each batch — restartable), and the final state equals a full
    batch recompute over everything streamed. Ties
    operators/incremental.py to the streaming + publish surfaces."""
    from smartbots_etl_facturas_spark.operators.incremental import (
        aggregate_state,
        merge_agg_state,
    )
    from smartbots_etl_facturas_spark.sinks.staged import (
        publish,
        read_published,
    )

    src = str(tmp_path / "inc-src")
    ckpt = str(tmp_path / "inc-ckpt")
    state_base = str(tmp_path / "inc-state")
    schema = "k string, ts timestamp, x decimal(18,2)"

    def _slice(rows):
        (spark.createDataFrame(rows, "k string, ts string, x string")
         .withColumn("ts", F.to_timestamp("ts"))
         .withColumn("x", F.col("x").cast("decimal(18,2)"))
         .coalesce(1).write.mode("append").parquet(src))

    _slice([("a", "2024-01-01 10:00:00", "10.50"),
            ("b", "2024-01-01 10:01:00", "3.25")])
    _slice([("a", "2024-01-01 10:02:00", "4.75"),
            ("c", "2024-01-01 10:03:00", "7.00"),
            ("a", "2024-01-01 10:04:00", "1.00")])

    def on_batch(bdf, batch_id):
        delta = aggregate_state(bdf, ["k"], ["x"], ["x"])
        try:
            state = read_published(spark, state_base)
        except FileNotFoundError:
            merged = delta
        else:
            merged = merge_agg_state(state, delta, ["k"], ["x"], ["x"])
        publish(merged, state_base)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", "1").parquet(src)
         .writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r.k: (r.cnt, float(r.sum_x), float(r.min_x), float(r.max_x))
           for r in read_published(spark, state_base).collect()}
    full = {r.k: (r.cnt, float(r.sum_x), float(r.min_x), float(r.max_x))
            for r in aggregate_state(
                spark.read.parquet(src), ["k"], ["x"], ["x"]).collect()}
    assert got == full
    assert got["a"] == (3, 16.25, 1.0, 10.5)


def test_dedup_exact_stream_matches_batch(spark, tmp_path):
    """Stream == batch for content-digest dedup (streaming/dedup.py):
    draining a corpus with content duplicates through
    dedup_exact_stream emits exactly ONE row per distinct digest, the
    same digest set the batch twin (operators.dedup.exact_dedup)
    produces, and each emitted id belongs to that digest's member
    set."""
    from smartbots_etl_facturas_spark.operators.dedup import exact_dedup
    from smartbots_etl_facturas_spark.streaming.dedup import dedup_exact_stream

    src = str(tmp_path / "dx-src")
    ckpt = str(tmp_path / "dx-ckpt")
    schema = "doc_id long, ts timestamp, text string"
    rows = [
        (1, "2024-01-01 10:00:00", "alpha"),
        (2, "2024-01-01 10:01:00", "beta"),
        (3, "2024-01-01 10:02:00", "alpha"),    # content dup of 1
        (4, "2024-01-01 10:03:00", "gamma"),
        (5, "2024-01-01 10:04:00", "beta"),     # content dup of 2
        (6, "2024-01-01 10:05:00", "alpha"),    # third copy
    ]
    batch_df = (
        spark.createDataFrame(rows, "doc_id long, ts string, text string")
        .withColumn("ts", F.to_timestamp("ts"))
    )
    batch_df.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (dedup_exact_stream(stream, watermark="1 hour")
         .writeStream.format("memory").queryName("dx_out")
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select doc_id, doc_hash from dx_out").collect()

    batch = {r.doc_hash: r.keep_id for r in exact_dedup(batch_df).collect()}
    import hashlib

    by_digest: dict[str, set] = {}
    for did, _ts, text in rows:
        by_digest.setdefault(
            hashlib.md5(text.encode()).hexdigest(), set()
        ).add(did)

    assert len(got) == len(batch) == 3            # one row per digest
    assert {r.doc_hash for r in got} == set(batch)
    for r in got:
        assert r.doc_id in by_digest[r.doc_hash]  # a real member survived


def test_dedup_exact_stream_state_bounded_by_watermark(spark, tmp_path):
    """PROOF that the watermark actually EVICTS digest-dedup state
    (streaming/dedup.py): four query cycles over one checkpoint, each
    bringing K brand-new digests (plus one in-cycle duplicate each)
    three watermark horizons later than the previous cycle. Without
    eviction numRowsTotal climbs to cycles*K; with it the total
    plateaus around one cycle's K digests (+ lag headroom)."""
    from smartbots_etl_facturas_spark.streaming.dedup import dedup_exact_stream

    K = 5
    wm_s = 600
    base = 1_700_000_000
    src = str(tmp_path / "dxb-src")
    ckpt = str(tmp_path / "dxb-ckpt")
    schema = "doc_id long, ts timestamp, text string"
    out = str(tmp_path / "dxb-out")

    def on_batch(bdf, batch_id):
        bdf.write.mode("overwrite").parquet(f"{out}/b{batch_id}")

    state_rows = []
    for cycle in range(4):
        t0 = base + cycle * 3 * wm_s
        rows = [
            (cycle * K + k, float(t0 + 10 * k), f"doc-{cycle}-{k}")
            for k in range(K)
        ] + [(900 + cycle, float(t0 + 10 * K), f"doc-{cycle}-0")]  # in-cycle dup
        (spark.createDataFrame(rows, "doc_id long, ts double, text string")
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("append").parquet(src))

        stream = spark.readStream.schema(schema).parquet(src)
        q = (dedup_exact_stream(stream, watermark="0 seconds")
             .writeStream.foreachBatch(on_batch)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        progress = [p for p in q.recentProgress if p.get("stateOperators")]
        assert progress, f"cycle {cycle}: no state operator progress"
        state_rows.append(progress[-1]["stateOperators"][0]["numRowsTotal"])

    emitted = spark.read.parquet(f"{out}/b*")
    # in-cycle duplicates were dropped: K survivors per cycle
    assert emitted.count() == 4 * K
    # 4 cycles x K digests ever; unbounded state would show 10/15/20
    # by cycles 2/3/4 — eviction plateaus at the live cycle's K (+K lag)
    assert all(s <= 2 * K for s in state_rows), state_rows
    assert state_rows[-1] < 3 * K


def test_sketch_stream_matches_batch(spark, tmp_path):
    """Mergeable sketches as stream state (streaming/sketches.py):
    drain a keyed stream one file per micro-batch through the
    SketchAccumulator; the merged HLL registers and CMS cells must be
    BIT-IDENTICAL to the batch sketches over the union of all data
    (associative+commutative merge ⇒ batch slicing is invisible),
    and state stays at sketch size (≤ m registers, ≤ d·w cells)."""
    from smartbots_etl_facturas_spark.operators.sketches import (
        cms_cells,
        hll_registers,
    )
    from smartbots_etl_facturas_spark.streaming.sketches import SketchAccumulator

    src = str(tmp_path / "sk-src")
    ckpt = str(tmp_path / "sk-ckpt")
    # 5 files × 200 rows, overlapping key ranges so merges matter
    for i in range(5):
        (spark.range(i * 150, i * 150 + 200)
         .select((F.col("id") % 331).alias("user_id"))
         .coalesce(1).write.mode("append").parquet(src))

    acc = SketchAccumulator(key="user_id", p=6, d=4, w=256)
    q = (spark.readStream.schema("user_id long")
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(acc)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert len(acc._seen) >= 2, "expected multiple micro-batches"

    full = spark.read.parquet(src)
    batch_hll = {r.bucket: r.rho_max
                 for r in hll_registers(full, "user_id", p=6).collect()}
    batch_cms = {(r.row, r.col): r.cnt
                 for r in cms_cells(full, "user_id", d=4, w=256).collect()}
    assert acc.hll == batch_hll
    assert acc.cms == batch_cms
    assert len(acc.hll) <= 64 and len(acc.cms) <= 4 * 256

    # idempotent on redelivery: replaying a seen batch id is a no-op
    before = (dict(acc.hll), dict(acc.cms))
    acc(full, batch_id=min(acc._seen))
    assert (acc.hll, acc.cms) == before


def test_cusum_stream_matches_batch(spark, tmp_path):
    """Streaming CUSUM (applyInPandasWithState, direct max(0, s+d)
    recurrence) == batch CUSUM (two-window drawdown identity): the
    per-key statistic carries across micro-batches and every emitted
    row matches operators/timeseries.cusum on the same data — the
    identity between the two formulations, pinned end to end."""
    from smartbots_etl_facturas_spark.operators.timeseries import cusum
    from smartbots_etl_facturas_spark.streaming.timeseries import cusum_stateful

    src = str(tmp_path / "cusum-src")
    ckpt = str(tmp_path / "cusum-ckpt")
    out = str(tmp_path / "cusum-out")
    schema = "user_id long, ts timestamp, x_units long"

    def _slice(rows):
        (spark.createDataFrame(rows, "user_id long, ts string, x_units long")
         .withColumn("ts", F.to_timestamp("ts"))
         .coalesce(1).write.mode("append").parquet(src))

    _slice([(1, "2024-01-01 10:00:00", 100),
            (1, "2024-01-01 10:01:00", 200),
            (2, "2024-01-01 10:00:30", 350)])
    _slice([(1, "2024-01-01 10:02:00", 60),
            (2, "2024-01-01 10:03:00", 90),
            (1, "2024-01-01 10:04:00", 1000)])

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src)
              .withWatermark("ts", "0 seconds"))
    q = (cusum_stateful(stream, target_units=100)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.user_id, int(r.ts.timestamp())): r.cusum_units
           for r in spark.read.parquet(out).collect()}
    batch_src = (spark.read.parquet(src)
                 .withColumn("tsl", F.unix_micros("ts"))
                 .withColumn("event_id", F.unix_micros("ts")))
    batch = {(r.user_id, r.tsl // 1_000_000): r.cusum_units
             for r in cusum(batch_src, "x_units", target_units=100,
                            ts_col="tsl").collect()}
    assert len(got) == 6
    assert got == batch
    # hand-checked: user 1 -> 0, 100, 60, 960 (batch 2 continues s=100
    # from batch 1); user 2 -> 250, 240
    u1 = [v for (u, _), v in sorted(got.items()) if u == 1]
    assert u1 == [0, 100, 60, 960]
    u2 = [v for (u, _), v in sorted(got.items()) if u == 2]
    assert u2 == [250, 240]


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: clicks with no
    conversion inside the interval must STILL be emitted (with null
    right side) once the watermark passes their match window — the
    outer-join-on-streams capability inner joins don't exercise.
    Late cycles advance the watermark so earlier unmatched rows
    finalize."""
    from smartbots_etl_facturas_spark.streaming.joins import interval_join

    upper_s = 600
    base = 1_700_000_000
    clicks_src = str(tmp_path / "lo-clicks")
    conv_src = str(tmp_path / "lo-convs")
    ckpt = str(tmp_path / "lo-ckpt")
    out = str(tmp_path / "lo-out")
    schema = "user_id long, ts timestamp, tag string"

    def _write(src, rows):
        (spark.createDataFrame(rows, "user_id long, ts double, tag string")
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("append").parquet(src))

    # cycle structure: users 1,2 click at t0; only user 1 converts.
    # a second far-future cycle pushes the watermark past t0+upper.
    _write(clicks_src, [(1, float(base), "c1"), (2, float(base), "c2")])
    _write(conv_src, [(1, float(base + 60), "v1")])
    _write(clicks_src, [(9, float(base + 10_000), "c9")])
    _write(conv_src, [(9, float(base + 10_060), "v9")])

    def on_batch(bdf, batch_id):
        bdf.write.mode("overwrite").parquet(f"{out}/b{batch_id}")

    for cycle in range(2):
        sc = spark.readStream.schema(schema).parquet(clicks_src)
        sv = spark.readStream.schema(schema).parquet(conv_src)
        q = (interval_join(sc, sv, "user_id", 0, upper_s,
                           how="left_outer")
             .writeStream.foreachBatch(on_batch)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    got = spark.read.parquet(f"{out}/b*").collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    # matched users carry their conversion
    assert [r.r_tag for r in by_user[1]] == ["v1"]
    assert [r.r_tag for r in by_user[9]] == ["v9"]
    # user 2 never converted: emitted exactly once with a NULL right
    # side after the watermark passed base+upper
    assert len(by_user[2]) == 1
    assert by_user[2][0].r_tag is None and by_user[2][0].r_ts is None


def test_streaming_join_view_maintenance(spark, tmp_path):
    """Streaming materialized JOIN-VIEW maintenance: each micro-batch
    of fact deltas extends the published view V = A ⋈ B via
    join_view_delta (ΔA⋈B only — B is static here), appended through
    the versioned sink, and the final view equals a full recompute
    over everything streamed. The join half of what
    test_streaming_incremental_agg_maintenance proves for aggregates."""
    from smartbots_etl_facturas_spark.operators.incremental import (
        join_view_delta,
    )
    from smartbots_etl_facturas_spark.sinks.staged import (
        publish,
        read_published,
    )

    src = str(tmp_path / "jv-src")
    ckpt = str(tmp_path / "jv-ckpt")
    view_base = str(tmp_path / "jv-view")
    schema = "id long, k long, x long"
    dim = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two")], ["k", "name"]
    )

    def _slice(rows):
        (spark.createDataFrame(rows, schema)
         .coalesce(1).write.mode("append").parquet(src))

    _slice([(1, 0, 10), (2, 1, 20), (3, 9, 30)])   # k=9 never joins
    _slice([(4, 2, 40), (5, 0, 50)])

    empty_a = spark.createDataFrame([], schema)
    empty_b = dim.filter("k < 0")

    def on_batch(bdf, batch_id):
        delta = join_view_delta(empty_a, bdf, dim, empty_b, "k")
        try:
            view = read_published(spark, view_base)
        except FileNotFoundError:
            merged = delta
        else:
            merged = view.unionByName(delta)
        publish(merged, view_base)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", "1").parquet(src)
         .writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sorted(tuple(r) for r in read_published(spark, view_base).collect())
    full = sorted(tuple(r)
                  for r in spark.read.parquet(src).join(dim, "k").collect())
    assert got == full
    assert len(got) == 4  # k=9 fact row correctly absent


def test_sketch_state_survives_driver_restart_redelivery(spark, tmp_path):
    """Durable exactly-once for the sketch accumulator: a RESTARTED
    driver (new accumulator process, same state_dir) must recognize a
    redelivered batch id and not double-count the sum-merged CMS
    cells — the in-memory seen-set alone cannot (round-6 ADVICE).
    Crash-window semantics: a batch merged but not yet persisted is
    re-merged on recovery against the last persisted state, so every
    batch lands exactly once."""
    from smartbots_etl_facturas_spark.operators.sketches import (
        cms_cells,
        hll_registers,
    )
    from smartbots_etl_facturas_spark.streaming.sketches import (
        SketchAccumulator,
    )

    state = str(tmp_path / "sk-state")
    b0 = spark.range(0, 200).select((F.col("id") % 97).alias("user_id"))
    b1 = spark.range(150, 350).select((F.col("id") % 97).alias("user_id"))
    b2 = spark.range(300, 500).select((F.col("id") % 97).alias("user_id"))

    acc = SketchAccumulator(key="user_id", p=6, d=4, w=256, state_dir=state)
    acc(b0, batch_id=0)
    acc(b1, batch_id=1)

    # driver restart: fresh instance, empty memory, same state_dir
    acc2 = SketchAccumulator(key="user_id", p=6, d=4, w=256, state_dir=state)
    assert acc2._seen == {0, 1} and acc2.cms == acc.cms
    before = dict(acc2.cms)
    acc2(b1, batch_id=1)  # post-restart redelivery
    assert acc2.cms == before, "redelivered batch double-counted CMS"
    acc2(b2, batch_id=2)

    full = b0.unionByName(b1).unionByName(b2)
    assert acc2.hll == {
        r.bucket: r.rho_max
        for r in hll_registers(full, "user_id", p=6).collect()
    }
    assert acc2.cms == {
        (r.row, r.col): r.cnt
        for r in cms_cells(full, "user_id", d=4, w=256).collect()
    }


def test_sketch_state_shape_mismatch_rejected(spark, tmp_path):
    from smartbots_etl_facturas_spark.streaming.sketches import (
        SketchAccumulator,
    )

    state = str(tmp_path / "sk-shape")
    acc = SketchAccumulator(key="user_id", p=6, d=4, w=256, state_dir=state)
    acc(spark.range(10).select(F.col("id").alias("user_id")), batch_id=0)
    with pytest.raises(ValueError, match="not mergeable"):
        SketchAccumulator(key="user_id", p=7, d=4, w=256, state_dir=state)


def test_quantile_stream_rank_valid_and_bounded(spark, tmp_path):
    """Streaming KLL quantiles (streaming/sketches.py:
    QuantileAccumulator): drain a keyed value stream one file per
    micro-batch; the final per-group sketches must carry EXACT group
    counts, satisfy the 1% rank-error contract against the union of
    all data, and hold bounded state (compactor levels, not rows)."""
    import bisect

    from smartbots_etl_facturas_spark.streaming.sketches import (
        QuantileAccumulator,
    )

    src = str(tmp_path / "kq-src")
    ckpt = str(tmp_path / "kq-ckpt")
    for i in range(4):
        (spark.range(i * 500, i * 500 + 700)
         .selectExpr("CAST(id % 3 AS STRING) AS g",
                     "CAST((id * 48271) % 99991 AS DOUBLE) AS v")
         .coalesce(1).write.mode("append").parquet(src))

    acc = QuantileAccumulator(key="g", value="v", k=128)
    q = (spark.readStream.schema("g string, v double")
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(acc)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert len(acc._seen) >= 2, "expected multiple micro-batches"

    by_g = {}
    for r in spark.read.parquet(src).collect():
        by_g.setdefault(r["g"], []).append(r["v"])
    for g, vals in by_g.items():
        vals.sort()
        sk = acc.groups[g]
        assert sk.n == len(vals)  # exact counts survive slicing
        assert sum(len(l) for l in sk.levels) <= 128 * 25  # bounded
        for qq in (0.1, 0.5, 0.9):
            rank = bisect.bisect_right(vals, acc.quantile(g, qq))
            assert abs(rank - qq * len(vals)) <= max(0.01 * len(vals), 1.0)


def test_quantile_fold_matches_batch_partials_merge(spark):
    """The QuantileAccumulator fold is BIT-IDENTICAL to the batch
    path over the same per-batch partials with batch-offset __pid —
    the kll_incremental merge-order contract carried into streaming:
    slicing is visible only as partial boundaries, which the pinned
    (batch, pid) merge order reproduces exactly."""
    from smartbots_etl_facturas_spark.operators.quantiles import (
        kll_group_partials,
        kll_group_quantiles,
    )
    from smartbots_etl_facturas_spark.streaming.sketches import (
        QuantileAccumulator,
    )

    batches = [
        spark.range(i * 1000, i * 1000 + 1300).selectExpr(
            "CAST(id % 2 AS STRING) AS g",
            "CAST((id * 69621) % 65521 AS DOUBLE) AS v",
        )
        for i in range(3)
    ]
    acc = QuantileAccumulator(key="g", value="v", k=64)
    for i, b in enumerate(batches):
        acc(b, batch_id=i)

    union_partials = None
    for i, b in enumerate(batches):
        p = kll_group_partials(b, "g", "v", k=64).withColumn(
            "__pid", F.col("__pid") + F.lit(i * 1_000_000)
        )
        union_partials = p if union_partials is None else union_partials.unionByName(p)
    est = kll_group_quantiles(
        batches[0], "g", "v", [0.25, 0.5, 0.75], k=64, partials=union_partials
    ).collect()
    for r in est:
        assert r["n"] == acc.groups[r["g"]].n
        assert r["est"] == acc.quantile(r["g"], r["q"])  # bit-identical


def test_quantile_accumulator_restart_redelivery(spark, tmp_path):
    """Durable exactly-once for the quantile stream state: fresh
    accumulator + same state_dir reloads sketches and seen ids; a
    redelivered batch after the restart is a no-op; k mismatch on
    reload fails fast."""
    import pytest as _pytest

    from smartbots_etl_facturas_spark.streaming.sketches import (
        QuantileAccumulator,
    )

    state = str(tmp_path / "kq-state")
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "CAST(id % 2 AS STRING) AS g", "CAST(id AS DOUBLE) AS v"
    )
    acc = QuantileAccumulator(key="g", value="v", k=64, state_dir=state)
    acc(mk(0, 400), batch_id=0)
    acc(mk(300, 800), batch_id=1)

    acc2 = QuantileAccumulator(key="g", value="v", k=64, state_dir=state)
    assert acc2._seen == {0, 1}
    before = {g: s.to_row() for g, s in acc2.groups.items()}
    acc2(mk(300, 800), batch_id=1)  # post-restart redelivery
    assert {g: s.to_row() for g, s in acc2.groups.items()} == before
    acc2(mk(800, 1000), batch_id=2)
    assert acc2.groups["0"].n + acc2.groups["1"].n == 400 + 500 + 200

    with _pytest.raises(ValueError):
        QuantileAccumulator(key="g", value="v", k=128, state_dir=state)
