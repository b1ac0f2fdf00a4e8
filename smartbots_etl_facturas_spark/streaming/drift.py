"""Streaming distribution-drift monitor: PSI against a frozen
reference, maintained as bounded stream state.

The batch operator (operators/drift.py:psi_bins) compares two static
cohorts; in production the question is CONTINUOUS — "has the live
feed drifted from the distribution we trained/validated on?". Bin
counts are a sum-monoid, so the same foreachBatch discipline as
streaming/sketches.py applies: each micro-batch is binned with the
IDENTICAL pure-arithmetic bin expression (shared `_bin`), reduced to
at most ``nbins`` delta rows, and folded into a running count vector
— O(nbins) state forever, independent of stream length.

PSI itself is computed on demand from the nbins-sized state against
the frozen reference histogram (0.5 pseudo-counts on both sides,
matching the batch operator), so the monitor never rescans history.

Exactly-once across driver restarts follows the sketch accumulator's
contract: with ``state_dir`` set, (counts, seen batch ids) persist as
one atomically-replaced JSON snapshot after each merge, so redelivery
of the last in-flight batch after recovery is recognized and skipped;
stream-final counts are BIT-IDENTICAL to a batch groupBy over the
union of the data (pinned by tests/test_streaming_drift.py).
"""

from __future__ import annotations

import json
import math
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._batchlog import already_merged, mark_merged

from smartbots_etl_facturas_spark.operators.drift import _bin

__all__ = ["DriftMonitor"]


class DriftMonitor:
    """foreachBatch hook folding per-micro-batch bin counts into a
    running histogram and scoring PSI against a frozen reference.

    ``ref_counts``: bin -> count of the reference cohort (e.g. the
    training snapshot), frozen at construction. ``psi()`` returns the
    current index; ``psi_contributions()`` the per-bin terms.

    Usage::

        mon = DriftMonitor("amount", lo=0.0, hi=5e5, nbins=10,
                           ref_counts=ref, state_dir=ckpt + "/drift")
        stream.writeStream.foreachBatch(mon).trigger(availableNow=True)
    """

    def __init__(
        self,
        value_col: str,
        lo: float,
        hi: float,
        nbins: int,
        ref_counts: dict[int, int],
        state_dir: str | None = None,
        auditor=None,
    ):
        if nbins < 1:
            raise ValueError("nbins must be >= 1")
        bad = sorted(int(b) for b in ref_counts if not 0 <= int(b) < nbins)
        if bad:
            raise ValueError(
                f"ref_counts bins {bad} outside 0..{nbins - 1} — they "
                "would inflate the reference total without ever being "
                "scored (1-indexed histogram?)"
            )
        self.value_col = value_col
        #: optional StreamBatchAuditor (see streaming/topk.py)
        self.auditor = auditor
        self.lo, self.hi, self.nbins = lo, hi, nbins
        self.width = (hi - lo) / nbins
        self.ref = {int(b): int(c) for b, c in ref_counts.items()}
        self.counts: dict[int, int] = {}
        self.seen: set[int] = set()
        self.low = -1  # seen-id compaction watermark (_batchlog)
        self.state_dir = state_dir
        if state_dir and os.path.exists(os.path.join(state_dir, "state.json")):
            with open(os.path.join(state_dir, "state.json")) as fh:
                snap = json.load(fh)
            self.counts = {int(k): int(v) for k, v in snap["counts"].items()}
            self.seen = set(snap["seen"])
            self.low = int(snap.get("low", -1))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if already_merged(self.seen, self.low, batch_id, "DriftMonitor"):
            # back-fill a crash-lost audit row; probe first so a plain
            # redelivery skips the count() action entirely
            if self.auditor and not self.auditor.already_emitted(batch_id):
                self.auditor.emit(batch_id, batch_df.count())
            return  # redelivered after recovery: already folded in
        _t0 = time.perf_counter()
        delta = (
            batch_df.groupBy(
                _bin(
                    F.col(self.value_col), self.lo, self.width, self.nbins
                ).alias("bin")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()  # bounded: at most nbins rows
        )
        for r in delta:
            self.counts[int(r.bin)] = self.counts.get(int(r.bin), 0) + int(r.c)
        self.low = mark_merged(self.seen, self.low, batch_id)
        self._persist()
        if self.auditor:
            # sum of bin counts == rows in the batch (every row lands
            # in exactly one bin: _bin clamps out-of-range AND null
            # values into the edge bins — see operators/drift.py) —
            # no second scan needed
            self.auditor.emit(
                batch_id, sum(int(r.c) for r in delta),
                time.perf_counter() - _t0,
            )

    def _persist(self) -> None:
        if not self.state_dir:
            return
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = os.path.join(self.state_dir, "state.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(
                {"counts": self.counts, "seen": sorted(self.seen),
                 "low": self.low}, fh
            )
        os.replace(tmp, os.path.join(self.state_dir, "state.json"))

    def psi_contributions(self) -> dict[int, float]:
        """Per-bin (p-q)·ln(p/q) of live vs reference, 0.5
        pseudo-counts — the same formula as the batch operator."""
        tot_live = sum(self.counts.values())
        tot_ref = sum(self.ref.values())
        if tot_live == 0:
            raise ValueError(
                "psi undefined before any micro-batch has been folded "
                "(live histogram is empty)"
            )
        if tot_ref == 0:
            raise ValueError(
                "psi undefined against an all-zero reference histogram"
            )
        out = {}
        for b in range(self.nbins):
            p = max(self.counts.get(b, 0), 0.5) / tot_live
            q = max(self.ref.get(b, 0), 0.5) / tot_ref
            out[b] = (p - q) * math.log(p / q)
        return out

    def psi(self) -> float:
        return sum(self.psi_contributions().values())
