"""Incremental materialized-aggregate maintenance: merge a delta
batch into a persisted aggregate state so the maintained table equals
a full recompute — without ever touching the full base table again.

This is the algebraic (monoid) core of incremental view maintenance:
every maintained measure must merge associatively —

- ``cnt``  : cnt + Δcnt
- ``sum``  : sum + Δsum         (exact decimals, so merge order is free)
- ``min``  : least(min, Δmin)
- ``max``  : greatest(max, Δmax)

Derived measures (avg = sum/cnt, …) are computed AT READ TIME from the
monoid state, never stored.

Retractions (deletes/updates as negative rows) are supported for
cnt/sum via an ``op_col`` of +1/-1 multipliers; min/max are NOT
retractable from state alone (removing the current min needs the
runner-up) — requesting min/max together with retractions raises, by
design, rather than silently returning a wrong answer.

Scale design: the delta aggregates with map-side partial combine to
one row per touched key, then merges into state with a single
equi-join on the group keys (broadcastable when the delta touches few
keys — the common case). The full base table is never re-read; cost
is O(|delta| + |touched keys|) regardless of state size.

Reference parity note: the reference engine recomputes its summary
tables per run (consolidate_invoices.py run report); this operator is
the incremental-refresh extension an analytics engine needs at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    minmax_cols: Sequence[str] = (),
    op_col: str | None = None,
) -> DataFrame:
    """Build (or partially aggregate) monoid state from rows.

    Output columns: keys + ``cnt`` + ``sum_<c>`` per sum column +
    ``min_<c>``/``max_<c>`` per minmax column. ``op_col`` (+1/-1)
    turns rows into insertions/retractions for cnt/sum.
    """
    if op_col is not None and minmax_cols:
        raise ValueError(
            "min/max state is not retractable: drop minmax_cols or op_col"
        )
    op = F.col(op_col).cast("long") if op_col else F.lit(1).cast("long")
    aggs = [F.sum(op).alias("cnt")]
    for c in sum_cols:
        aggs.append(F.sum(F.col(c) * op).alias(f"sum_{c}"))
    for c in minmax_cols:
        aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"max_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_state(
    state: DataFrame,
    delta_state: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    minmax_cols: Sequence[str] = (),
    prune_empty: bool = True,
) -> DataFrame:
    """Merge two monoid states (full-outer on keys, null-safe monoid
    ops per measure). ``prune_empty`` drops keys whose merged cnt
    reaches 0 (fully retracted groups disappear, matching a full
    recompute)."""
    keys = list(keys)
    d = delta_state.select(
        *[F.col(k) for k in keys],
        F.col("cnt").alias("__d_cnt"),
        *[F.col(f"sum_{c}").alias(f"__d_sum_{c}") for c in sum_cols],
        *[x for c in minmax_cols
          for x in (F.col(f"min_{c}").alias(f"__d_min_{c}"),
                    F.col(f"max_{c}").alias(f"__d_max_{c}"))],
    )
    merged = state.join(d, on=keys, how="full_outer")
    z = F.lit(0).cast("long")
    out_cols = [F.col(k) for k in keys]
    cnt = F.coalesce(F.col("cnt"), z) + F.coalesce(F.col("__d_cnt"), z)
    out_cols.append(cnt.alias("cnt"))
    for c in sum_cols:
        a, b = F.col(f"sum_{c}"), F.col(f"__d_sum_{c}")
        out_cols.append(
            (F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))).alias(f"sum_{c}")
        )
    for c in minmax_cols:
        out_cols.append(F.least(F.col(f"min_{c}"), F.col(f"__d_min_{c}")).alias(f"min_{c}"))
        out_cols.append(F.greatest(F.col(f"max_{c}"), F.col(f"__d_max_{c}")).alias(f"max_{c}"))
    out = merged.select(*out_cols)
    if prune_empty:
        out = out.filter(F.col("cnt") != 0)
    return out


def join_view_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str] | str,
) -> DataFrame:
    """Delta rows for the maintained inner equi-join view
    ``V = A ⋈ B`` under insert-only deltas — the join half of
    incremental view maintenance (the aggregate half is
    :func:`incremental_agg`).

    With ``A_new = A ∪ ΔA`` and ``B_new = B ∪ ΔB``::

        ΔV = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    so ``V_old ∪ ΔV = A_new ⋈ B_new`` exactly (multiset semantics —
    unionByName never dedups). The three terms partition the new join
    rows by which side(s) contributed a fresh row, so no row is
    produced twice.

    Scale design: the full ``A_old ⋈ B_old`` recompute is never run —
    each delta term joins a (typically small) delta batch against the
    other side on the join key, broadcastable when the delta is
    small; cost is O(|ΔA| + |ΔB| + matched rows), independent of
    |V_old|. Retractions compose via the op-multiplier convention of
    :func:`aggregate_state` when V is maintained as a counted
    multiset; this helper covers the dominant append-only case.
    """
    on = [on] if isinstance(on, str) else list(on)
    return (
        delta_a.join(b_old, on)
        .unionByName(a_old.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )


def incremental_agg(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    minmax_cols: Sequence[str] = (),
    op_col: str | None = None,
) -> DataFrame:
    """One maintenance step: aggregate the delta batch, merge into
    state. The result equals ``aggregate_state(base ∪ delta)`` for
    insert-only deltas, and equals a full recompute of the surviving
    rows when retractions are exact inverses of prior insertions."""
    d = aggregate_state(delta, keys, sum_cols, minmax_cols, op_col)
    return merge_agg_state(state, d, keys, sum_cols, minmax_cols)
