"""Streaming heavy hitters: candidate estimates equal the batch CMS
over the union, true heavy keys are never missed, and restart
redelivery lands exactly once through the persisted snapshot."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.sketches import (
    cms_cells,
    cms_lookup,
)
from smartbots_etl_facturas_spark.streaming.topk import HeavyHittersMonitor


def _write_skewed(spark, src, nfiles=4, rows=400):
    # keys 'hot-0'/'hot-1' dominate every file; a long uniform tail
    for i in range(nfiles):
        (
            spark.range(rows)
            .select(
                F.when(F.col("id") % 4 < 2, F.concat(F.lit("hot-"), (F.col("id") % 2)))
                .otherwise(
                    F.concat(F.lit("t"), ((F.col("id") * 7919 + i * 131) % 500))
                )
                .cast("string")
                .alias("k")
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )


def _drain(spark, src, ckpt, mon):
    q = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_heavy_hitters_match_batch_cms(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_skewed(spark, src)
    mon = HeavyHittersMonitor("k", d=4, w=256, m=16, capacity=32)
    _drain(spark, src, str(tmp_path / "ckpt"), mon)
    assert len(mon.seen) >= 2

    # merged cells == one batch CMS over the union
    full = spark.read.parquet(src)
    batch_cells = {
        (r.row, r.col): r.cnt for r in cms_cells(full, "k", d=4, w=256).collect()
    }
    assert mon.cells == batch_cells

    # the two true heavy keys are present with the batch CMS estimate
    top = dict(mon.top(5))
    probes = spark.createDataFrame([("hot-0",), ("hot-1",)], "k string")
    want = {
        r.k: r.cms_est
        for r in cms_lookup(
            cms_cells(full, "k", d=4, w=256), probes, "k", d=4, w=256
        ).collect()
    }
    for hk in ("hot-0", "hot-1"):
        assert hk in top and top[hk] == want[hk]
        # each hot key truly holds 1/4 of all rows; estimates never
        # under-count
        assert top[hk] >= full.filter(F.col("k") == hk).count()

    # state is bounded
    assert len(mon.candidates) <= 32 and len(mon.cells) <= 4 * 256


def test_heavy_hitters_restart_redelivery(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_skewed(spark, src, nfiles=3)
    state = str(tmp_path / "state")
    mon = HeavyHittersMonitor("k", m=16, capacity=32, state_dir=state)
    _drain(spark, src, str(tmp_path / "ckpt"), mon)
    cells, cands, last = dict(mon.cells), dict(mon.candidates), max(mon.seen)

    mon2 = HeavyHittersMonitor("k", m=16, capacity=32, state_dir=state)
    assert mon2.cells == cells and mon2.candidates == cands

    # redelivered batch id: no-op
    mon2(spark.read.parquet(src).limit(100), last)
    assert mon2.cells == cells

    # a new batch still merges and can only grow estimates
    mon2(spark.createDataFrame([("hot-0",)] * 10, "k string"), last + 1)
    assert dict(mon2.top(1))["hot-0"] >= dict(mon.top(1))["hot-0"] + 10
