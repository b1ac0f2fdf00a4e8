"""Streaming exact dedup — the streaming twin of
operators/dedup.py:exact_dedup (document-level content-digest dedup,
batch query ``dedup_exact_docs``).

Semantics: the FIRST arrival per content digest passes through; any
duplicate arriving within the watermark delay of that first arrival
is dropped. Digest state is evicted once the watermark passes it
(``dropDuplicatesWithinWatermark`` — the state row carries only the
32-char digest + timestamp, never the document body), so state size
is bounded by the number of DISTINCT digests inside one watermark
horizon, not by stream length — proven by the numRowsTotal plateau
test in tests/test_streaming.py.

Contract vs the batch twin: batch exact_dedup keeps ``min(id)`` per
digest over the whole corpus; the stream keeps the first ARRIVAL and
forgets digests older than the watermark, so a duplicate pair
spanning more than the watermark horizon is NOT collapsed (the
standard streaming-dedup tradeoff: exact within the horizon, bounded
state forever). Choose the watermark to cover the max duplicate
spread you need collapsed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Digest-keyed streaming dedup within a watermark.

    Input: a streaming DataFrame with an event-time column. Output:
    the input rows minus within-horizon duplicates, plus the
    ``doc_hash`` digest column (same digest definition as the batch
    twin — md5 over UTF-8 bytes, so batch and stream agree on what
    "duplicate" means).
    """
    hashed = df.withColumn(
        "doc_hash", F.md5(F.encode(F.col(text_col), "UTF-8"))
    )
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["doc_hash"])
    )
