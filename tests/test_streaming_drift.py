"""Streaming PSI drift monitor: stream-final bin counts bit-identical
to the batch groupBy over the union; PSI matches the batch operator's
contributions; restart-with-redelivery lands every batch exactly once
through the persisted snapshot."""

import math

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.drift import psi_bins
from smartbots_etl_facturas_spark.streaming.drift import DriftMonitor

LO, HI, NBINS = 0.0, 1000.0, 10


def _write_batches(spark, src, start=0, nfiles=4, rows=300):
    for i in range(nfiles):
        base = start + i * rows
        (
            spark.range(base, base + rows)
            .select(((F.col("id") * 7919) % 1100).cast("double").alias("amount"))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )


def _drain(spark, src, ckpt, mon):
    q = (
        spark.readStream.schema("amount double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_drift_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(spark, src)
    ref = {b: 100 for b in range(NBINS)}  # flat reference
    mon = DriftMonitor("amount", LO, HI, NBINS, ref_counts=ref)
    _drain(spark, src, str(tmp_path / "ckpt"), mon)
    assert len(mon.seen) >= 2, "expected multiple micro-batches"

    # stream-final counts == one batch groupBy over the union, using
    # the operator's own bin expression
    from smartbots_etl_facturas_spark.operators.drift import _bin

    full = spark.read.parquet(src)
    batch_counts = {
        r.bin: r.c
        for r in full.groupBy(
            _bin(F.col("amount"), LO, (HI - LO) / NBINS, NBINS).alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert mon.counts == batch_counts

    # PSI == the batch operator's contribution sum when the reference
    # is presented as cohort B of the same frame
    rows = [(float(v), True) for v in full.select("amount").toPandas()["amount"]]
    rows += [(LO + (b + 0.5) * (HI - LO) / NBINS, False)
             for b, c in ref.items() for _ in range(c)]
    both = spark.createDataFrame(rows, "amount double, live boolean")
    want = sum(
        r.psi_contrib
        for r in psi_bins(both, "amount", F.col("live"), LO, HI, NBINS).collect()
    )
    # the batch operator ships per-bin contributions rounded to 9
    # places; 10 bins accumulate up to ~5e-9 of rounding
    assert mon.psi() == pytest.approx(want, abs=1e-8)
    assert math.isfinite(mon.psi())


def test_drift_monitor_restart_redelivery_exactly_once(spark, tmp_path):
    """A restarted monitor reloads the snapshot and skips a
    redelivered batch id — counts identical to the single-delivery
    run; a NEW batch id still merges."""
    src = str(tmp_path / "src")
    _write_batches(spark, src, nfiles=3)
    state = str(tmp_path / "state")
    ref = {b: 100 for b in range(NBINS)}
    mon = DriftMonitor("amount", LO, HI, NBINS, ref_counts=ref, state_dir=state)
    _drain(spark, src, str(tmp_path / "ckpt"), mon)
    final_counts = dict(mon.counts)
    last_batch = max(mon.seen)

    # simulated driver restart: fresh instance, same state_dir
    mon2 = DriftMonitor("amount", LO, HI, NBINS, ref_counts=ref, state_dir=state)
    assert mon2.counts == final_counts and last_batch in mon2.seen

    # redelivery of the last in-flight batch: must be a no-op
    some_file = spark.read.parquet(src).limit(50)
    mon2(some_file, last_batch)
    assert mon2.counts == final_counts

    # a genuinely new batch still folds in
    mon2(spark.createDataFrame([(5.0,)], "amount double"), last_batch + 1)
    assert sum(mon2.counts.values()) == sum(final_counts.values()) + 1
