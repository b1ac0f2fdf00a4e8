"""Streaming observability parity (round-11, r10 verdict #8): every
micro-batch a streaming monitor folds leaves ONE queryable
stream_batches audit row through the same append-only parquet
discipline as the batch S9 sinks — the reference's tracker logs every
file event (sqlite_tracker.py:70-257); the streaming half now does
too. Exactly-once under foreachBatch redelivery, with crash-window
back-fill."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.sinks.observability import (
    StreamBatchAuditor,
)
from smartbots_etl_facturas_spark.streaming.drift import DriftMonitor
from smartbots_etl_facturas_spark.streaming.sketches import SketchAccumulator
from smartbots_etl_facturas_spark.streaming.topk import HeavyHittersMonitor


def _write_batches(spark, src, nfiles=3, rows=50):
    for i in range(nfiles):
        (spark.range(rows).select(
            (F.col("id") % 7).cast("string").alias("k"),
            (F.col("id") % 100).cast("double").alias("v"))
         .coalesce(1).write.mode("append").parquet(src))


def _drain(spark, src, ckpt, mon, schema="k string, v double"):
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(mon)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def _audit_rows(auditor):
    return sorted(
        ((r.batch_id, r.n_rows, r.status) for r in auditor.table().collect())
    )


def test_one_completed_row_per_micro_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src, nfiles=3, rows=50)
    auditor = StreamBatchAuditor(spark, str(tmp_path / "audit"), "sketch")
    mon = SketchAccumulator("k", state_dir=str(tmp_path / "state"),
                            auditor=auditor)
    _drain(spark, src, str(tmp_path / "ckpt"), mon)
    rows = _audit_rows(auditor)
    assert [r[0] for r in rows] == [0, 1, 2]
    assert all(r[1] == 50 and r[2] == "COMPLETED" for r in rows)
    # wall time recorded
    assert all(r.wall_seconds > 0 for r in auditor.table().collect())


def test_redelivery_is_exactly_once(spark, tmp_path):
    auditor = StreamBatchAuditor(spark, str(tmp_path / "audit"), "topk")
    mon = HeavyHittersMonitor("k", state_dir=str(tmp_path / "state"),
                              auditor=auditor)
    batch = spark.createDataFrame([("a",)] * 20 + [("b",)] * 5, ["k"])
    mon(batch, 0)
    mon(batch, 0)          # same-process redelivery
    # restart: fresh monitor off the persisted snapshot, redeliver again
    mon2 = HeavyHittersMonitor("k", state_dir=str(tmp_path / "state"),
                               auditor=auditor)
    mon2(batch, 0)
    rows = _audit_rows(auditor)
    assert rows == [(0, 25, "COMPLETED")]


def test_crash_between_state_commit_and_audit_backfills(spark, tmp_path):
    """Crash AFTER the monitor persisted its state but BEFORE the audit
    append: the batch is in `seen`, the audit table has no row. The
    redelivered batch must skip the fold yet back-fill the row."""
    state = str(tmp_path / "state")
    batch = spark.createDataFrame([("a", 1.0)] * 7, ["k", "v"])
    # fold WITHOUT an auditor == the audit append never happened
    SketchAccumulator("k", state_dir=state)(batch, 0)
    auditor = StreamBatchAuditor(spark, str(tmp_path / "audit"), "sketch")
    mon = SketchAccumulator("k", state_dir=state, auditor=auditor)
    mon(batch, 0)          # redelivery after 'restart'
    assert _audit_rows(auditor) == [(0, 7, "COMPLETED")]
    # the fold itself really was skipped (HLL unchanged by redelivery)
    assert mon.hll == SketchAccumulator("k", state_dir=state).hll


def test_drift_monitor_counts_without_second_scan(spark, tmp_path):
    auditor = StreamBatchAuditor(spark, str(tmp_path / "audit"), "drift")
    mon = DriftMonitor("v", lo=0.0, hi=100.0, nbins=10,
                       ref_counts={i: 10 for i in range(10)},
                       state_dir=str(tmp_path / "state"), auditor=auditor)
    batch = spark.createDataFrame(
        [(float(i % 100),) for i in range(42)] + [(None,)], "v double"
    )
    mon(batch, 3)
    rows = _audit_rows(auditor)
    assert rows == [(3, 43, "COMPLETED")]  # null clamps into bin 0 (see operators/drift.py:_bin)


def test_audited_sink_wraps_stateful_stream(spark, tmp_path):
    """The generic foreachBatch wrapper: a stateful streaming query's
    OUTPUT batches each leave an audit row (the funnel/ordered-fold
    path, whose state lives in Spark, not a driver monitor)."""
    import datetime

    from smartbots_etl_facturas_spark.streaming.funnel import funnel_stateful
    from tests.test_streaming_buffered import _drain as drain_batches

    base = datetime.datetime(2026, 1, 1)

    def ts(m):
        return base + datetime.timedelta(minutes=m)

    auditor = StreamBatchAuditor(spark, str(tmp_path / "audit"), "funnel")
    collected = []

    def inner(batch_df, batch_id):
        collected.extend(batch_df.collect())

    schema = "user_id long, ts timestamp, event_type string"
    batches = [
        [(1, ts(0), "view"), (2, ts(0), "view")],
        [(1, ts(1), "cart")],
    ]
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite").parquet(f"{src}/b{i:02d}")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/b*"))
    q = (funnel_stateful(stream, ["view", "cart", "buy"])
         .writeStream.outputMode("update")
         .foreachBatch(auditor.audited_sink(inner))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = _audit_rows(auditor)
    assert [r[0] for r in rows] == [0, 1]
    assert all(r[2] == "COMPLETED" for r in rows)
    assert sum(r[1] for r in rows) == len(collected)


def test_error_rows_logged_then_completed_backfilled(spark, tmp_path):
    auditor = StreamBatchAuditor(spark, str(tmp_path / "audit"), "m")
    calls = {"n": 0}

    def flaky(batch_df, batch_id):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")

    sink = auditor.audited_sink(flaky)
    batch = spark.createDataFrame([("a",)] * 3, ["k"])
    try:
        sink(batch, 0)
    except RuntimeError:
        pass
    sink(batch, 0)  # at-least-once redelivery succeeds
    rows = _audit_rows(auditor)
    assert (0, 3, "ERROR") in rows and (0, 3, "COMPLETED") in rows
    assert len(rows) == 2


def test_sampler_audit_rows(spark, tmp_path):
    from smartbots_etl_facturas_spark.streaming.sampling import (
        BottomKSampler,
    )

    auditor = StreamBatchAuditor(spark, str(tmp_path / "audit"), "sampler")
    mon = BottomKSampler("doc_id", ["lang"], k=5,
                         state_dir=str(tmp_path / "state"), auditor=auditor)
    b0 = spark.createDataFrame(
        [(i, "en") for i in range(10)], "doc_id long, lang string")
    mon(b0, 0)
    mon(b0, 0)  # redelivery: no second row
    rows = _audit_rows(auditor)
    assert rows == [(0, 10, "COMPLETED")]


def test_restart_with_fresh_auditor_does_not_duplicate(spark, tmp_path):
    """Round-11 review: the default run_uuid must be restart-stable
    (uuid5 of base_dir+monitor) — a restarted process's fresh auditor
    must SEE pre-crash COMPLETED rows, or the back-fill path appends a
    duplicate for every redelivered batch."""
    state = str(tmp_path / "state")
    audit = str(tmp_path / "audit")
    batch = spark.createDataFrame([("a", 1.0)] * 4, ["k", "v"])
    a1 = StreamBatchAuditor(spark, audit, "sketch")
    SketchAccumulator("k", state_dir=state, auditor=a1)(batch, 0)
    # 'restart': new process constructs everything fresh
    a2 = StreamBatchAuditor(spark, audit, "sketch")
    assert a2.run_uuid == a1.run_uuid  # deterministic lineage identity
    SketchAccumulator("k", state_dir=state, auditor=a2)(batch, 0)
    assert _audit_rows(a2) == [(0, 4, "COMPLETED")]


def test_monitors_survive_null_keys(spark, tmp_path):
    """Round-11 streaming review: null keys crashed the driver folds
    (None > int, int(None)). Sketch/topk exclude nulls (SQL
    count-distinct convention, matching the oracles); the sampler
    fails fast (its contract requires identifying ids)."""
    import pytest

    from smartbots_etl_facturas_spark.streaming.sampling import (
        BottomKSampler,
    )

    batch = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "k string"
    )
    sk = SketchAccumulator("k", state_dir=str(tmp_path / "s1"))
    sk(batch, 0)
    assert all(b is not None for b in sk.hll)          # no null bucket
    assert all(c[1] is not None for c in sk.cms)       # no null col
    hh = HeavyHittersMonitor("k", state_dir=str(tmp_path / "s2"))
    hh(batch, 0)
    assert None not in hh.candidates
    assert hh.top(2) == [("a", 1), ("b", 1)]
    samp = BottomKSampler("k", k=3, state_dir=str(tmp_path / "s3"))
    with pytest.raises(ValueError, match="NULL 'k'"):
        samp(batch, 0)


def test_drift_monitor_validates_reference_domain(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="outside 0..9"):
        DriftMonitor("v", lo=0.0, hi=100.0, nbins=10,
                     ref_counts={i: 10 for i in range(1, 11)})
    with pytest.raises(ValueError, match="nbins"):
        DriftMonitor("v", lo=0.0, hi=100.0, nbins=0, ref_counts={})


def test_completed_set_compacts_behind_watermark(spark, tmp_path, monkeypatch):
    """Round-12 verdict #2: the auditor's in-memory COMPLETED id set
    is bounded by the _batchlog low-watermark discipline — a
    long-lived stream holds O(SEEN_CAP) ids, not O(batches), and a
    restarted auditor compacts the loaded set the same way while
    keeping idempotency for every id at/below the watermark."""
    from smartbots_etl_facturas_spark.streaming import _batchlog

    monkeypatch.setattr(_batchlog, "SEEN_CAP", 8)
    monkeypatch.setattr(_batchlog, "SEEN_KEEP", 4)
    base = str(tmp_path / "audit")
    auditor = StreamBatchAuditor(spark, base, "mon")
    for i in range(10):
        assert auditor.emit(i, n_rows=1) is True
    # live set compacted: explicit tail only, watermark covers the rest
    assert len(auditor._load_completed()) <= 8
    assert auditor._low >= 0
    assert all(auditor.already_emitted(i) for i in range(10))
    assert auditor.emit(3, n_rows=1) is False  # below watermark: idempotent
    # restart: fresh auditor loads 10 ids from the table and compacts
    fresh = StreamBatchAuditor(spark, base, "mon")
    assert len(fresh._load_completed()) <= 8
    assert fresh._low == 5  # max 9 - SEEN_KEEP 4
    assert all(fresh.already_emitted(i) for i in range(10))
    assert not fresh.already_emitted(10)
    # exactly one COMPLETED row per id despite the re-emit attempts
    ids = sorted(r.batch_id for r in fresh.table().collect())
    assert ids == list(range(10))


def test_fresh_auditor_probe_below_watermark_without_explicit_load(
    spark, tmp_path, monkeypatch
):
    """Round-13 (ADVICE low): already_emitted on a FRESHLY constructed
    auditor, probed for an id below the compaction watermark, with NO
    explicit _load_completed() call first — the probe itself must
    establish the watermark before testing it, else the pruned id
    reads as "not emitted" and emit() back-fills a duplicate row."""
    from smartbots_etl_facturas_spark.streaming import _batchlog

    monkeypatch.setattr(_batchlog, "SEEN_CAP", 8)
    monkeypatch.setattr(_batchlog, "SEEN_KEEP", 4)
    base = str(tmp_path / "audit")
    auditor = StreamBatchAuditor(spark, base, "mon")
    for i in range(10):
        auditor.emit(i, n_rows=1)
    # fresh auditor: FIRST interaction is the probe for a pruned id
    fresh = StreamBatchAuditor(spark, base, "mon")
    assert fresh.already_emitted(0) is True
    assert fresh.emit(0, n_rows=1) is False
    ids = sorted(r.batch_id for r in fresh.table().collect())
    assert ids == list(range(10))  # no duplicate back-fill


def test_redelivery_skip_does_not_recount(spark, tmp_path):
    """Round-12 ADVICE: on the redelivered-batch skip path the
    monitor probes already_emitted BEFORE touching the batch — a
    plain redelivery whose audit row already exists must not invoke
    emit (and so never pays the count() action)."""
    auditor = StreamBatchAuditor(spark, str(tmp_path / "audit"), "topk")
    mon = HeavyHittersMonitor("k", state_dir=str(tmp_path / "state"),
                              auditor=auditor)
    batch = spark.createDataFrame([("a",)] * 5, ["k"])
    mon(batch, 0)
    calls = []
    orig = auditor.emit
    auditor.emit = lambda *a, **kw: (calls.append(a), orig(*a, **kw))[1]
    mon(batch, 0)  # redelivery: row exists -> no emit, no count
    assert calls == []
    auditor.emit = orig


def test_stream_batches_compaction_preserves_rows(spark, tmp_path):
    """Round-12 verdict #3: one parquet file per micro-batch accretes
    on long streams; StreamBatchAuditor.compact folds them (N batches
    -> <= M files) with the audit rows hash-identical before/after."""
    import os

    from smartbots_etl_facturas_spark.sinks.layout import (
        _append_dir_data_files,
    )

    auditor = StreamBatchAuditor(spark, str(tmp_path / "audit"), "mon")
    for i in range(12):
        auditor.emit(i, n_rows=i * 10, wall_seconds=0.5,
                     status="ERROR" if i == 5 else "COMPLETED")
    path = auditor._path()
    assert len(_append_dir_data_files(path)) >= 12
    before = sorted(map(tuple, auditor.table().collect()))
    out = auditor.compact(target_files=2)
    assert out["compacted"] and out["files_after"] <= 2
    assert len(_append_dir_data_files(path)) <= 2
    assert sorted(map(tuple, auditor.table().collect())) == before
    # idempotency probe still correct off the compacted table
    fresh = StreamBatchAuditor(spark, str(tmp_path / "audit"), "mon")
    assert fresh.already_emitted(4) and not fresh.already_emitted(5)


def test_compaction_crash_recovery_both_phases(spark, tmp_path):
    """Intent-log protocol: an UNCOMMITTED crash rolls back (moved
    outputs deleted, inputs intact); a COMMITTED crash rolls forward
    (leftover inputs deleted) — rows identical either way."""
    import json
    import os

    from smartbots_etl_facturas_spark.sinks.layout import (
        _append_dir_data_files,
        compact_append_dir,
        recover_compactions,
    )

    path = str(tmp_path / "tbl")
    for i in range(4):
        (spark.range(i * 10, i * 10 + 10).coalesce(1)
         .write.mode("append").parquet(path))
    rows = sorted(r.id for r in spark.read.parquet(path).collect())
    inputs = _append_dir_data_files(path)

    # --- uncommitted crash: output moved in, marker never written ---
    dup = os.path.join(path, "compact-deadbeef-00000.parquet")
    import shutil
    shutil.copy(os.path.join(path, inputs[0]), dup)
    with open(os.path.join(path, "_compact_deadbeef.intent.json"), "w") as fh:
        json.dump({"outputs": [os.path.basename(dup)], "inputs": inputs}, fh)
    assert recover_compactions(path) == 1
    assert not os.path.exists(dup)                      # rolled back
    assert _append_dir_data_files(path) == inputs       # inputs intact
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows

    # --- committed crash: marker written, one input not yet deleted ---
    shutil.copy(os.path.join(path, inputs[0]), dup)
    # the committed output replaces input[0]'s rows; pretend the crash
    # happened before deleting input[0]
    with open(os.path.join(path, "_compact_cafebabe.intent.json"), "w") as fh:
        json.dump({"outputs": [os.path.basename(dup)],
                   "inputs": [inputs[0]]}, fh)
    open(os.path.join(path, "_compact_cafebabe.committed"), "w").close()
    assert recover_compactions(path) == 1
    assert os.path.exists(dup)                          # rolled forward
    assert not os.path.exists(os.path.join(path, inputs[0]))
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows

    # a real compaction over the recovered dir still preserves rows
    out = compact_append_dir(spark, path, target_files=1)
    assert out["compacted"] and out["rows"] == len(rows)
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows


def test_audit_writer_compaction(spark, tmp_path):
    """AuditWriter.compact sweeps the three S9 tables through the same
    protocol — rows identical, file counts bounded."""
    from smartbots_etl_facturas_spark.sinks.audit import AuditWriter
    from smartbots_etl_facturas_spark.sinks.layout import (
        _append_dir_data_files,
    )

    w = AuditWriter(spark, str(tmp_path / "audit"))
    runs = [w.start_run() for _ in range(6)]
    for r in runs:
        w.log_file(r, f"file_{r[:4]}.xlsx", rows_total=10)
    before = {
        t: sorted(map(tuple, w.table(t).drop("created_at").collect()))
        for t in ("execution_runs", "file_log")
    }
    out = w.compact(target_files=1)
    assert set(out) == {"execution_runs", "file_log"}
    for t in ("execution_runs", "file_log"):
        assert out[t]["compacted"]
        assert len(_append_dir_data_files(
            str(tmp_path / "audit" / t))) == 1
        assert sorted(
            map(tuple, w.table(t).drop("created_at").collect())
        ) == before[t]
