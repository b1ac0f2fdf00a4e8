"""Bounded seen-batch-id bookkeeping for foreachBatch monitors.

Every driver-held monitor skips redelivered micro-batches via a
persisted ``seen`` id set. Structured Streaming's foreachBatch ids are
contiguous-monotone per checkpoint (redelivery is only ever the LAST
batch), so the set can be compacted behind a LOW WATERMARK: every id
at or below ``low`` is treated as seen, and only a recent tail is kept
explicitly — snapshot size and per-batch cost stay bounded over a
years-lived stream instead of growing with its lifetime (round-11
review; generalizes the BottomKSampler mechanism to the whole monitor
family). The monotonicity invariant is ASSERTED: a genuinely new id
below the max seen so far means the source violated the contract and
the watermark may have swallowed an unseen batch — fail loudly.
"""

from __future__ import annotations

SEEN_CAP = 1024
SEEN_KEEP = 512


def already_merged(seen: set[int], low: int, batch_id: int,
                   where: str) -> bool:
    """True when ``batch_id`` was already folded (explicitly seen or
    at/below the compaction watermark); raises on a non-monotone NEW
    id, which would make the watermark unsound."""
    if batch_id <= low or batch_id in seen:
        return True
    if seen and batch_id < max(seen):
        raise ValueError(
            f"{where}: non-monotone new batch_id {batch_id} "
            f"(max seen {max(seen)}, low watermark {low}) — "
            "foreachBatch ids must be contiguous-monotone for "
            "seen-id compaction to be exactly-once"
        )
    return False


def mark_merged(seen: set[int], low: int, batch_id: int) -> int:
    """Record ``batch_id`` as folded and compact; returns the new
    low watermark (callers persist both)."""
    seen.add(batch_id)
    if len(seen) > SEEN_CAP:
        low = max(low, max(seen) - SEEN_KEEP)
        for i in [i for i in seen if i <= low]:
            seen.discard(i)
    return low
