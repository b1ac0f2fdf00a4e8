"""Incremental, idempotent file ingestion — the streaming twin of J5.

The reference skips files whose (name, modified_time) already have a
COMPLETED file_log entry (consolidate_invoices.py:235-240,
sqlite_tracker.py:232-240). Structured Streaming's file source with a
checkpoint gives exactly those semantics natively: each discovered
file is processed once, progress survives restarts, and
Trigger.AvailableNow drains everything currently available then stops
(batch-like runs on a streaming plan — the reference's cron-driven
run model).

The per-run report (A5) is emitted per micro-batch via foreachBatch,
mirroring the reference's end-of-run ExecutionReport email hook.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def incremental_file_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    on_batch: Callable[[DataFrame, int], None] | None = None,
    output_dir: str | None = None,
    file_format: str = "parquet",
    output_mode: str | None = None,
    reader_options: dict | None = None,
):
    """Drain all unprocessed files from source_dir exactly once.

    Returns the StreamingQuery (already started, AvailableNow).
    - transform: plan applied to the raw stream (projections, window
      aggs — anything unified-batch/streaming-compatible).
    - on_batch: foreachBatch hook (report emission, audit writes).
      foreachBatch delivery is at-least-once across crash/restart —
      EXACTLY-once requires the hook to be idempotent per ``batch_id``
      (e.g. overwrite a per-batch path), which is what the checkpoint's
      replayed batch ids make possible.
    - output_dir: when given (and no on_batch), append as parquet
      (the file sink commits via the checkpoint log → exactly-once).
    - reader_options: extra file-source options (e.g.
      ``maxFilesPerTrigger`` to slice the drain into micro-batches).
    """
    reader = spark.readStream.schema(schema).format(file_format)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.load(source_dir)
    if transform is not None:
        stream = transform(stream)

    writer = stream.writeStream.option("checkpointLocation", checkpoint_dir)
    if output_mode is not None:
        writer = writer.outputMode(output_mode)
    if on_batch is not None:
        writer = writer.foreachBatch(on_batch)
    elif output_dir is not None:
        writer = writer.format("parquet").option("path", output_dir).outputMode("append")
    else:
        raise ValueError("need on_batch or output_dir")
    return writer.trigger(availableNow=True).start()
