"""Bucketed range (interval) join — equi-join plan for a non-equi
predicate.

Matches pairs with the same key where the right timestamp falls in a
window relative to the left one::

    left.ts + lower  <=  right.ts  <=  left.ts + upper

The reference has only hash-equi joins (SURVEY.md §2.3); this is
engine surface beyond it, motivated by the events table (e.g. "all
purchases within 24h before each click").

Why not express the predicate directly: Spark plans a non-equi join
condition as BroadcastNestedLoopJoin (or a cartesian product when
neither side fits in memory) — O(n·m) pair evaluation that does not
survive a 100× scale-up. The bucketed plan restores an equi-join:

- pick bucket width w = (upper - lower), the window span;
- each RIGHT row lands in bucket ``ts div w`` (one row, no blowup);
- each LEFT row *probes* every bucket overlapping its window —
  ``(ts+lower) div w .. (ts+upper) div w``, at most 2 buckets when
  w equals the span (small constant fan-out via explode);
- equi-join on (key, bucket) — a plain shuffled hash join Catalyst
  and AQE handle like any other — then the exact range predicate
  filters the per-bucket candidates.

Cost: one shuffle per side on (key, bucket), candidate set bounded by
rows within ±w of each left row instead of the whole key group.
Arithmetic stays in LongType (epoch micros ~1.7e18 exceeds the 2^53
double mantissa — float bucket math would corrupt bucket ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    lower: int = 0,
    upper: int = 0,
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner range join: pairs with ``l.ts+lower <= r.ts <= l.ts+upper``.

    ``lower``/``upper`` are signed offsets in the timestamp's own unit
    (``lower <= upper``; e.g. lower=-86400e6, upper=0 for "right within
    the 24h before left" on epoch-µs longs). Output = every left
    column plus every right non-key column aliased ``{right_prefix}*``.

    Assumes non-negative timestamps (epoch-based): SQL ``div``
    truncates toward zero, so bucket ids of negative timestamps would
    not align between the probe and build sides.
    """
    if lower > upper:
        raise ValueError(f"lower ({lower}) must be <= upper ({upper})")
    keys = [on] if isinstance(on, str) else list(on)
    w = max(int(upper) - int(lower), 1)

    r_payload = [c for c in right.columns if c not in keys]
    r = right.select(
        *keys,
        F.expr(f"{ts_col} div {w}").alias("__bucket"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_payload],
    )
    l = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"({ts_col} + {int(lower)}) div {w}"),
                F.expr(f"({ts_col} + {int(upper)}) div {w}"),
            )
        ),
    )
    rts = F.col(f"{right_prefix}{ts_col}")
    lts = F.col(ts_col)
    return (
        l.join(r, on=[*keys, "__bucket"])
        .filter((rts >= lts + F.lit(int(lower))) & (rts <= lts + F.lit(int(upper))))
        .drop("__bucket")
    )
