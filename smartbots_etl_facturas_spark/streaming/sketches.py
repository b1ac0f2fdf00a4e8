"""Streaming sketch maintenance: mergeable summaries as stream state.

The whole point of building HLL/CMS as plain integer dataflow
(operators/sketches.py) is that their merge IS a SQL aggregation —
which makes them maintainable under a stream with foreachBatch and
O(sketch) state, independent of stream length:

  per micro-batch:  delta = sketch(batch)        (bounded rows)
  state update:     state = merge(state, delta)  (groupBy max / sum)

No watermark, no timeout, no per-key state store — the "state" is
the sketch table itself (64 register rows / d·w counter cells), and
because merge is associative+commutative, replaying or reordering
batches converges to the same sketch the batch build produces over
the union of all data (pinned by tests/test_streaming.py).

This is the streaming twin of ``hll_distinct``/``cms_heavy_hitters``
the same way streaming/dedup.py twins ``dedup_exact_docs``: identical
hash definitions, so stream-final state is BIT-IDENTICAL to the batch
sketch — not merely approximately equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.sketches import (
    cms_cells,
    hll_registers,
)

__all__ = ["SketchAccumulator"]


class SketchAccumulator:
    """foreachBatch hook that folds each micro-batch into running HLL
    register + CMS cell tables (driver-held lists of at most m and
    d·w rows — collecting them is bounded metadata, not data).

    Usage::

        acc = SketchAccumulator(key="user_id", p=6, d=4, w=256)
        stream.writeStream.foreachBatch(acc).trigger(availableNow=True)

    After the stream drains, ``acc.hll`` / ``acc.cms`` hold the merged
    sketches as plain dicts; ``merge`` is re-runnable (idempotent per
    batch id — foreachBatch may redeliver a batch on recovery, so the
    hook tracks seen batch ids)."""

    def __init__(self, key: str, p: int = 6, d: int = 4, w: int = 256):
        self.key, self.p, self.d, self.w = key, p, d, w
        self.hll: dict[int, int] = {}
        self.cms: dict[tuple[int, int], int] = {}
        self._seen: set[int] = set()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen:  # redelivery after recovery
            return
        self._seen.add(batch_id)
        for r in hll_registers(batch_df, self.key, p=self.p).collect():
            cur = self.hll.get(r.bucket, 0)
            if r.rho_max > cur:
                self.hll[r.bucket] = r.rho_max
        for r in cms_cells(batch_df, self.key, d=self.d, w=self.w).collect():
            cell = (r.row, r.col)
            self.cms[cell] = self.cms.get(cell, 0) + r.cnt
