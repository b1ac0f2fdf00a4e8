"""Streaming heavy hitters: the CMS + candidate-set serving pattern
as bounded stream state.

The batch count-min sketch (operators/sketches.py:cms_cells) answers
point queries; a serving layer also needs "which keys are big right
now" WITHOUT remembering every key. The classic answer keeps two
bounded structures per stream:

  * the CMS cell matrix (d·w integers) — the frequency oracle,
    sum-merged per micro-batch exactly like streaming/sketches.py;
  * a CANDIDATE set of at most ``capacity`` keys — per micro-batch,
    only that batch's top-``m`` keys (a TakeOrdered heap, never a
    full collect of the batch's key space) are probed against the
    merged CMS, inserted, and the set is re-trimmed to capacity by
    estimate.

Heuristic no-miss property (pinned in tests/test_streaming_topk.py):
a key is probed — and its never-under-counting CMS estimate recorded
— every time it makes some batch's top-``m``. Precisely: a key with
total count T over n batches has a batch with count ≥ T/n_batches,
and it enters the candidate set iff that count clears that batch's
m-th-largest count; a sufficiently skewed adversarial stream can keep
a large-total key below every batch's bar, so this is a strong
heuristic for real skewed streams, not a worst-case guarantee.
Trimming can evict a then-small key, but it re-enters the next time
it makes a batch top-m.

Exactly-once across driver restarts follows the house contract:
(cells, candidates, seen batch ids) persist as one atomically-
replaced JSON snapshot after each merge; redelivered batch ids are
skipped, and in-memory state is only mutated after BOTH per-batch
Spark actions succeed, so a mid-batch failure + redelivery cannot
double-fold. Sketch state is O(d·w + capacity); the seen-id set
grows with the batch count (a few bytes per micro-batch — compact
the snapshot offline if a stream runs for years).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._batchlog import already_merged, mark_merged

from smartbots_etl_facturas_spark.operators.sketches import cms_cells

__all__ = ["HeavyHittersMonitor"]


class HeavyHittersMonitor:
    """foreachBatch hook maintaining a CMS + bounded candidate set.

    ``top(k)`` returns the current best-k [(key, cms_estimate)] by
    estimate (desc), key (asc) — deterministic ties.

    Usage::

        mon = HeavyHittersMonitor("user_id", d=4, w=256, m=32,
                                  capacity=64, state_dir=ckpt + "/hh")
        stream.writeStream.foreachBatch(mon).trigger(availableNow=True)
    """

    def __init__(
        self,
        key: str,
        d: int = 4,
        w: int = 256,
        m: int = 32,
        capacity: int = 64,
        seed: str = "cms-v1",
        state_dir: str | None = None,
        auditor=None,
    ):
        self.key, self.d, self.w, self.m = key, d, w, m
        #: optional StreamBatchAuditor: one stream_batches row per
        #: folded micro-batch; idempotent emit back-fills on
        #: redelivery. Auditing adds one count() action per batch.
        self.auditor = auditor
        self.capacity, self.seed = capacity, seed
        self.cells: dict[tuple[int, int], int] = {}
        self.candidates: dict[str, int] = {}  # key -> last CMS estimate
        self.seen: set[int] = set()
        self.low = -1  # seen-id compaction watermark (_batchlog)
        self.state_dir = state_dir
        if state_dir and os.path.exists(os.path.join(state_dir, "state.json")):
            with open(os.path.join(state_dir, "state.json")) as fh:
                snap = json.load(fh)
            self.cells = {
                (int(r), int(c)): int(v) for r, c, v in snap["cells"]
            }
            self.candidates = {k: int(v) for k, v in snap["candidates"]}
            self.seen = set(snap["seen"])
            self.low = int(snap.get("low", -1))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if already_merged(self.seen, self.low, batch_id,
                          "HeavyHittersMonitor"):
            # back-fill a crash-lost audit row; probe first so a plain
            # redelivery skips the count() action entirely
            if self.auditor and not self.auditor.already_emitted(batch_id):
                self.auditor.emit(batch_id, batch_df.count())
            return  # redelivered after recovery: already folded in
        _t0 = time.perf_counter()
        # Run BOTH Spark actions before touching any in-memory state:
        # if either collect fails and the query restarts, this batch id
        # is still absent from ``seen`` and the redelivery folds the
        # delta exactly once (no partial mutation to double-count on).
        delta = cms_cells(
            batch_df, self.key, d=self.d, w=self.w, seed=self.seed
        ).collect()  # bounded: at most d*w rows
        batch_top = (
            # group by Spark's OWN string cast of the key so the
            # candidate string matches what cms_cells hashed — Python
            # str() renders booleans/timestamps/decimals differently
            batch_df.filter(F.col(self.key).isNotNull())
            .groupBy(
                F.col(self.key).cast("string").alias("__k")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.col("__k"))
            .limit(self.m)  # TakeOrdered: per-partition heap, m rows out
            .collect()
        )
        for r in delta:
            cell = (int(r.row), int(r.col))
            self.cells[cell] = self.cells.get(cell, 0) + int(r.cnt)
        for r in batch_top:
            self.candidates[r["__k"]] = 0  # estimate refreshed below
        # refresh EVERY candidate against the merged cells (estimates
        # are monotone under sum-merge), then trim to capacity
        for k in list(self.candidates):
            self.candidates[k] = self._estimate(k)
        if len(self.candidates) > self.capacity:
            keep = sorted(
                self.candidates.items(), key=lambda kv: (-kv[1], kv[0])
            )[: self.capacity]
            self.candidates = dict(keep)
        self.low = mark_merged(self.seen, self.low, batch_id)
        self._persist()
        if self.auditor:
            self.auditor.emit(
                batch_id, batch_df.count(), time.perf_counter() - _t0
            )

    def _estimate(self, key_value: str) -> int:
        import hashlib

        est = None
        for i in range(self.d):
            h = hashlib.md5(
                f"{self.seed}:{i}:{key_value}".encode()
            ).hexdigest()
            col = int(h[:12], 16) % self.w
            v = self.cells.get((i, col), 0)
            est = v if est is None else min(est, v)
        return est or 0

    def _persist(self) -> None:
        if not self.state_dir:
            return
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = os.path.join(self.state_dir, "state.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "cells": [[r, c, v] for (r, c), v in self.cells.items()],
                    "candidates": sorted(self.candidates.items()),
                    "seen": sorted(self.seen),
                    "low": self.low,
                },
                fh,
            )
        os.replace(tmp, os.path.join(self.state_dir, "state.json"))

    def top(self, k: int) -> list[tuple[str, int]]:
        return sorted(
            self.candidates.items(), key=lambda kv: (-kv[1], kv[0])
        )[:k]
