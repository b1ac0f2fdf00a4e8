"""Streaming ordered funnel: the batch greedy-advance semantics of
operators/events.py:funnel_stages carried across micro-batches with
``applyInPandasWithState`` — per-user state is one (stage, bound)
pair (stages completed so far, timestamp of the last completion), so
state is O(distinct users) at any stream length.

Semantics match the batch operator exactly: a user completes step i
at the earliest event of type ``steps[i]`` STRICTLY AFTER their
step-(i-1) completion — greedy advance over time-ordered events is
precisely that chain, and the (stage, bound) pair is the only state
the greedy walk needs. Rows inside a micro-batch fold in event-time
order (stable sort).

Ordered-delivery contract (same family as the streaming EWMA): per
user, events must arrive in non-decreasing event-time order ACROSS
micro-batches — an event older than the state's bound cannot be
folded into an order-sequential walk and is dropped like any late
row past a watermark. Under that contract stream-final stages equal
the batch funnel over the union (pinned in
tests/test_streaming_funnel.py).

Each accepted batch emits the group's CURRENT (user, stage,
bound_ts) — consumers keep the latest row per user (update-mode
shape); per-stage counts are then "users with stage >= i".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def funnel_stateful(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
):
    """Per-user streaming funnel over a streaming DataFrame. Emits one
    row per (user, micro-batch touching that user): the user's current
    (stage, bound_ts) after folding the batch's events."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    key_type = df.schema[user_col].dataType.simpleString()
    out_schema = f"{user_col} {key_type}, stage long, bound_ts timestamp"
    state_schema = "stage long, bound_us long"
    k = len(steps)

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values(
            [ts_col], kind="mergesort"
        )
        ts_us = (rows[ts_col].astype("int64") // 1000).tolist()
        types = rows[type_col].tolist()

        stage, bound_us = (state.get if state.exists else (0, -1))
        for t, ty in zip(ts_us, types):
            if stage < k and ty == steps[stage] and t > bound_us:
                stage += 1
                bound_us = t
        state.update((int(stage), int(bound_us)))
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "stage": [int(stage)],
                "bound_ts": [
                    pd.Timestamp(bound_us * 1000) if bound_us >= 0 else pd.NaT
                ],
            }
        )

    return (
        df.filter(df[type_col].isin(steps))
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
