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

Exactly-once across DRIVER RESTARTS: foreachBatch may redeliver the
last in-flight batch after recovery, and CMS cells are SUM-merged, so
a redelivered batch that is not recognized double-counts. With
``state_dir`` set, the accumulator persists (registers, cells, seen
batch ids) as one atomically-replaced JSON snapshot AFTER each merge
— the same stage-then-``os.replace`` publish discipline as
sinks/staged.py — so a restarted accumulator reloads the snapshot and
skips any batch id it already folded in. A crash between merge and
persist loses only the un-persisted merge, and the redelivery then
re-merges it: every batch lands exactly once in the persisted state.
Without ``state_dir`` the seen-set lives in driver memory only, which
is sufficient for single-process ``availableNow`` runs but NOT for
recovery-with-redelivery.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._batchlog import already_merged, mark_merged

from smartbots_etl_facturas_spark.operators.sketches import (
    cms_cells,
    hll_registers,
)

__all__ = ["SketchAccumulator", "QuantileAccumulator"]


class SketchAccumulator:
    """foreachBatch hook that folds each micro-batch into running HLL
    register + CMS cell tables (driver-held lists of at most m and
    d·w rows — collecting them is bounded metadata, not data).

    Usage::

        acc = SketchAccumulator(key="user_id", p=6, d=4, w=256,
                                state_dir=ckpt + "/sketch_state")
        stream.writeStream.foreachBatch(acc).trigger(availableNow=True)

    After the stream drains, ``acc.hll`` / ``acc.cms`` hold the merged
    sketches as plain dicts. ``merge`` is idempotent per batch id:
    redelivered batches are skipped via the seen-id set, which is
    PERSISTED beside the sketch state when ``state_dir`` is given —
    that is what makes the skip survive a real driver restart (the
    in-memory set alone only covers same-process redelivery)."""

    def __init__(
        self,
        key: str,
        p: int = 6,
        d: int = 4,
        w: int = 256,
        state_dir: str | None = None,
        auditor=None,
    ):
        self.key, self.p, self.d, self.w = key, p, d, w
        #: optional sinks.observability.StreamBatchAuditor — one
        #: stream_batches audit row per folded micro-batch (r10
        #: verdict #8); emission is idempotent per batch id, so the
        #: skip path back-fills a row lost to a crash between the
        #: state commit and the audit append. Auditing adds one
        #: count() action per batch (the audited row count includes
        #: null keys, which the sketch deltas cannot report).
        self.auditor = auditor
        self.hll: dict[int, int] = {}
        self.cms: dict[tuple[int, int], int] = {}
        self._seen: set[int] = set()
        self._low = -1  # seen-id compaction watermark (_batchlog)
        self.state_dir = state_dir
        if state_dir:
            self._load()

    # --- durable state ------------------------------------------------------

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "sketch_state.json")

    def _load(self) -> None:
        path = self._state_path()
        if not os.path.exists(path):
            return
        with open(path) as fh:
            st = json.load(fh)
        if (st["p"], st["d"], st["w"]) != (self.p, self.d, self.w):
            raise ValueError(
                f"persisted sketch state at {path} was built with "
                f"(p,d,w)=({st['p']},{st['d']},{st['w']}), not "
                f"({self.p},{self.d},{self.w}) — sketches with "
                "different shapes are not mergeable"
            )
        self.hll = {int(b): r for b, r in st["hll"].items()}
        self.cms = {
            (int(row), int(col)): cnt for row, col, cnt in st["cms"]
        }
        self._seen = set(st["seen"])
        self._low = int(st.get("low", -1))

    def _persist(self) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        staged = self._state_path() + ".staging"
        with open(staged, "w") as fh:
            json.dump(
                {
                    "p": self.p, "d": self.d, "w": self.w,
                    "hll": {str(b): r for b, r in self.hll.items()},
                    "cms": [
                        [row, col, cnt]
                        for (row, col), cnt in self.cms.items()
                    ],
                    "seen": sorted(self._seen),
                    "low": self._low,
                },
                fh,
            )
        os.replace(staged, self._state_path())

    # --- foreachBatch hook --------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if already_merged(self._seen, self._low, batch_id,
                          "SketchAccumulator"):
            # back-fill a crash-lost audit row; probe BEFORE counting so a
            # plain redelivery does not pay a full count() action
            if self.auditor and not self.auditor.already_emitted(batch_id):
                self.auditor.emit(batch_id, batch_df.count())
            return
        _t0 = time.perf_counter()
        for r in hll_registers(batch_df, self.key, p=self.p).collect():
            cur = self.hll.get(r.bucket, 0)
            if r.rho_max > cur:
                self.hll[r.bucket] = r.rho_max
        for r in cms_cells(batch_df, self.key, d=self.d, w=self.w).collect():
            cell = (r.row, r.col)
            self.cms[cell] = self.cms.get(cell, 0) + r.cnt
        # mark seen only after the merge succeeded, persist after
        # marking: a crash anywhere in between re-runs this batch on
        # recovery against the LAST PERSISTED state — exactly once
        self._low = mark_merged(self._seen, self._low, batch_id)
        if self.state_dir:
            self._persist()
        if self.auditor:
            self.auditor.emit(
                batch_id, batch_df.count(), time.perf_counter() - _t0
            )


class QuantileAccumulator:
    """foreachBatch hook maintaining per-group KLL quantile sketches
    (operators/quantiles.py) as stream state — the quantile member of
    the streaming-sketch family above. Per micro-batch: build the
    bounded per-(group, partition) partials MAP-SIDE (the raw values
    never leave their executors), collect the sketch rows (O(groups ×
    partitions × k·log n) doubles — metadata, not data) and fold them
    into the running per-group compactor hierarchies.

    Exactness contract: the deterministic KLL merge is sequential,
    not commutative, so the stream-final sketch is pinned to the
    BATCH path that merges the same per-batch partials in (batch id,
    partition id) order — i.e. ``kll_group_quantiles(partials=union
    of per-batch partials with batch-offset __pid)`` reproduces the
    stream state bit-for-bit (tests/test_streaming.py). The
    rank-error bound eps·n holds regardless of slicing (each merge
    round obeys the compaction error budget), which is what callers
    consume.

    Durable exactly-once: with ``state_dir`` the per-group sketches
    and seen batch ids persist as one atomically-replaced JSON
    snapshot after each merge — the SketchAccumulator recovery
    discipline, so post-restart redelivery is a no-op."""

    def __init__(
        self,
        key: str,
        value: str,
        k: int = 256,
        state_dir: str | None = None,
        auditor=None,
    ):
        from smartbots_etl_facturas_spark.operators.quantiles import KllSketch

        self._sketch_cls = KllSketch
        self.key, self.value, self.k = key, value, int(k)
        self.groups: dict = {}
        self._seen: set[int] = set()
        self._low = -1  # seen-id compaction watermark (_batchlog)
        self.state_dir = state_dir
        self.auditor = auditor  # see SketchAccumulator
        if state_dir:
            self._load()

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "quantile_state.json")

    def _load(self) -> None:
        path = self._state_path()
        if not os.path.exists(path):
            return
        with open(path) as fh:
            st = json.load(fh)
        if st["k"] != self.k:
            raise ValueError(
                f"persisted quantile state at {path} was built with "
                f"k={st['k']}, not k={self.k} — sketches with different "
                "k are not mergeable"
            )
        self.groups = {
            g: self._sketch_cls.from_row(self.k, n, levels)
            for g, (n, levels) in st["groups"].items()
        }
        self._seen = set(st["seen"])
        self._low = int(st.get("low", -1))

    def _persist(self) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        staged = self._state_path() + ".staging"
        with open(staged, "w") as fh:
            json.dump(
                {
                    "k": self.k,
                    "groups": {
                        str(g): list(s.to_row())
                        for g, s in sorted(self.groups.items())
                    },
                    "seen": sorted(self._seen),
                    "low": self._low,
                },
                fh,
            )
        os.replace(staged, self._state_path())

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from smartbots_etl_facturas_spark.operators.quantiles import (
            kll_group_partials,
        )

        if already_merged(self._seen, self._low, batch_id,
                          "QuantileAccumulator"):
            # back-fill only when the audit row is actually missing
            if self.auditor and not self.auditor.already_emitted(batch_id):
                self.auditor.emit(batch_id, batch_df.count())
            return
        _t0 = time.perf_counter()
        rows = kll_group_partials(
            batch_df, self.key, self.value, self.k
        ).collect()
        # (group, __pid) order pins the sequential merge — identical
        # to the batch merge over batch-offset __pid partials
        for r in sorted(rows, key=lambda r: (str(r[self.key]), r["__pid"])):
            delta = self._sketch_cls.from_row(self.k, r["n"], r["levels"])
            cur = self.groups.get(str(r[self.key]))
            if cur is None:
                self.groups[str(r[self.key])] = delta
            else:
                cur.merge(delta)
        self._low = mark_merged(self._seen, self._low, batch_id)
        if self.state_dir:
            self._persist()
        if self.auditor:
            self.auditor.emit(
                batch_id, batch_df.count(), time.perf_counter() - _t0
            )

    def quantile(self, group, q: float) -> float:
        return self.groups[str(group)].quantile(q)
