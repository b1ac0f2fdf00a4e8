"""Stream-stream interval join — correlate two live streams.

The reference is batch-only; this is engine surface for the events
stream (SURVEY §2.8 extension): e.g. attribute a conversion to the
click that preceded it within a window. Structured Streaming keeps
per-key state for BOTH sides; the watermarks plus the interval bound
are what let it EVICT state (a click older than the upper bound can
never match a future conversion), so memory stays bounded on an
unbounded stream — the interval condition is not optional at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower_s: int,
    upper_s: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join right rows to left rows with the same ``key`` whose
    timestamp lies in ``[left_ts + lower_s, left_ts + upper_s]``.

    Works identically on batch frames (plain range-condition join) and
    on streaming frames (state-bounded stream-stream join) — the
    unified-API property every operator in this engine keeps. Output
    columns: key, left_ts as ``l_ts``, right_ts as ``r_ts``, remaining
    columns prefixed ``l_`` / ``r_``.
    """
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in lcols],
    )
    r = right.select(
        F.col(key).alias("__rkey"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in rcols],
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (l[key] == r["__rkey"])
        & (r["r_ts"] >= l["l_ts"] + F.expr(f"INTERVAL {int(lower_s)} SECONDS"))
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {int(upper_s)} SECONDS"))
    )
    return l.join(r, cond, how).drop("__rkey")
