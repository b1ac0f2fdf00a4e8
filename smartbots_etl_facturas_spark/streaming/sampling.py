"""Streaming EXACT-k deterministic uniform sample: the bottom-k-by-
hash contract of the batch sampler (``q_sample_exact_k`` — smallest
md5 draws win) carried across micro-batches as bounded stream state.

Bottom-k is a MONOID: bottom_k(A ∪ B) = bottom_k(bottom_k(A) ∪
bottom_k(B)), so each micro-batch reduces to its own ≤ k rows via
TakeOrdered (a per-partition heap — never a full collect of the
batch) and merges into the running sample with a k-row trim. The
stream-final sample is therefore EXACTLY the batch bottom-k over the
union of every batch — the reservoir-sampling contract with zero RNG
state, identical on any delivery order or batch split (pinned in
tests/test_streaming_buffered.py).

Exactly-once across driver restarts follows the house sketch
contract: (sample, seen batch ids) persist as one atomically-replaced
JSON snapshot after each merge; redelivered batch ids are skipped,
and the in-memory sample is only mutated after the batch's single
Spark action succeeds. State is O(k) rows plus a BOUNDED seen-id set:
batch ids are monotone per checkpoint, so ids at or below a low
watermark are dropped from the set and membership is ``id <= low or
id in seen`` — long-lived streams cannot grow the snapshot.

Payload values are snapshot-serialized with ``default=str`` — exotic
types (datetime, Decimal) round-trip as strings across a restart;
keep payloads to JSON-native types where bit-exact recovery matters.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._batchlog import already_merged, mark_merged

__all__ = ["BottomKSampler"]


class BottomKSampler:
    """foreachBatch hook maintaining the k rows with the smallest
    md5 draw over the whole stream.

    ``id_col`` must uniquely identify rows (the draw is derived from
    it, so duplicates of an id hash identically — re-deliveries of
    the same row cannot inflate the sample). ``payload_cols`` ride
    along. ``sample()`` returns the current [(draw, id, payload...)]
    sorted by (draw, id).

    Usage::

        mon = BottomKSampler("doc_id", ["lang"], k=50,
                             state_dir=ckpt + "/sample")
        stream.writeStream.foreachBatch(mon).trigger(availableNow=True)
    """

    def __init__(
        self,
        id_col: str,
        payload_cols: list[str] | None = None,
        k: int = 50,
        seed: str = "sample-v1",
        state_dir: str | None = None,
        auditor=None,
    ):
        self.id_col = id_col
        #: optional StreamBatchAuditor (see streaming/topk.py): one
        #: stream_batches row per merged micro-batch, idempotent
        #: emit. Auditing adds one count() action per batch.
        self.auditor = auditor
        self.payload_cols = list(payload_cols or [])
        self.k, self.seed = int(k), seed
        # rows keyed by (draw, id_str): [draw, id_str, *payloads]
        self.rows: list[list] = []
        self.seen: set[int] = set()
        self.low = -1  # all batch ids <= low are known-merged
        self.state_dir = state_dir
        if state_dir and os.path.exists(os.path.join(state_dir, "state.json")):
            with open(os.path.join(state_dir, "state.json")) as fh:
                snap = json.load(fh)
            self.rows = snap["rows"]
            self.seen = set(snap["seen"])
            self.low = snap.get("low", -1)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # seen-id compaction + monotonicity invariant now shared with
        # the whole monitor family — see streaming/_batchlog.py
        if already_merged(self.seen, self.low, batch_id, "exact-k sampler"):
            # back-fill a crash-lost audit row; probe first so a plain
            # redelivery skips the count() action entirely
            if self.auditor and not self.auditor.already_emitted(batch_id):
                self.auditor.emit(batch_id, batch_df.count())
            return  # redelivered after recovery: already merged
        _t0 = time.perf_counter()
        draw = F.md5(
            F.concat(
                F.lit(self.seed + ":"), F.col(self.id_col).cast("string")
            )
        )
        batch_bottom = (
            batch_df.select(
                draw.alias("__draw"),
                F.col(self.id_col).cast("string").alias("__id"),
                *self.payload_cols,
            )
            .orderBy("__draw", "__id")
            .limit(self.k)  # TakeOrdered: per-partition heap, ≤ k rows out
            .collect()
        )
        for r in batch_bottom:
            if r["__id"] is None or r["__draw"] is None:
                raise ValueError(
                    f"exact-k sampler: NULL {self.id_col!r} in batch "
                    f"{batch_id} — id_col must uniquely identify rows "
                    "(a null draw would sort first and displace the "
                    "sample); drop or default null ids upstream"
                )
        merged = {(row[0], row[1]): row for row in self.rows}
        for r in batch_bottom:
            merged[(r["__draw"], r["__id"])] = [r["__draw"], r["__id"]] + [
                r[c] for c in self.payload_cols
            ]
        self.rows = [
            merged[key] for key in sorted(merged)[: self.k]
        ]
        self.low = mark_merged(self.seen, self.low, batch_id)
        self._persist()
        if self.auditor:
            self.auditor.emit(
                batch_id, batch_df.count(), time.perf_counter() - _t0
            )

    def sample(self) -> list[tuple]:
        return [tuple(r) for r in self.rows]

    def _persist(self) -> None:
        if not self.state_dir:
            return
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = os.path.join(self.state_dir, "state.json.tmp")
        with open(tmp, "w") as fh:
            # default=str: non-JSON payload values (datetime, Decimal,
            # date) snapshot as strings instead of raising mid-stream
            # (documented restart-fidelity caveat in the module doc).
            json.dump(
                {"rows": self.rows, "seen": sorted(self.seen),
                 "low": self.low},
                fh,
                default=str,
            )
        os.replace(tmp, os.path.join(self.state_dir, "state.json"))
