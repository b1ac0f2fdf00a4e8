"""Streaming funnel: stream-final per-user stages equal the batch
funnel_stages over the union when per-user delivery is time-ordered
across micro-batches (the module's ordered-delivery contract)."""

import datetime

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.events import funnel_stages
from smartbots_etl_facturas_spark.streaming.funnel import funnel_stateful

STEPS = ["view", "cart", "buy"]


def _events(spark):
    """60 users with assorted funnel shapes: completions, stalls,
    out-of-order types (cart before view must NOT count), repeats."""
    base = datetime.datetime(2026, 1, 1)
    rows = []
    for u in range(60):
        kinds = []
        if u % 4 == 0:          # full completion
            kinds = ["view", "cart", "buy"]
        elif u % 4 == 1:        # stalls after cart
            kinds = ["view", "cart", "cart"]
        elif u % 4 == 2:        # wrong order: cart first
            kinds = ["cart", "view", "buy"]  # view->?: buy strictly after view? stage2 needs cart AFTER view -> no
        else:                   # view only
            kinds = ["view"]
        for i, kind in enumerate(kinds):
            rows.append(
                (u, base + datetime.timedelta(minutes=u + 100 * i), kind)
            )
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_stream_matches_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    # split into time-ordered files so per-user cross-batch order holds
    cuts = ["2026-01-01 01:00:00", "2026-01-01 03:00:00"]
    frames = [
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter(F.col("ts") >= cuts[1]),
    ]
    for f in frames:
        assert f.count() > 0
        f.coalesce(1).write.mode("append").parquet(src)
    # parquet append order is not file order; feed files oldest-first
    # by reading back with ordered file listing via maxFilesPerTrigger
    # only works per file mtime order — rewrite deterministically:
    import shutil

    shutil.rmtree(src)
    for i, f in enumerate(frames):
        f.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")

    latest = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            latest[r.user_id] = r.stage

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = (
        funnel_stateful(stream, STEPS)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    want = {
        r.stage: r.n_users for r in funnel_stages(ev, STEPS).collect()
    }
    got = {
        i: sum(1 for s in latest.values() if s >= i)
        for i in range(1, len(STEPS) + 1)
    }
    # batch funnel reports non-increasing n_users per 1-based stage
    assert got == {i: want.get(i, 0) for i in range(1, len(STEPS) + 1)}
    # sanity on the fixture: all four shapes occurred
    assert got[1] > got[2] > got[3] > 0
