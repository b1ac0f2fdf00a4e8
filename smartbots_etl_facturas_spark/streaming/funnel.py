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

``funnel_stateful_buffered`` relaxes that contract to the standard
watermark discipline a real event pipeline needs: events may arrive
out of order within a bounded ``horizon_us``. The state buffers each
user's not-yet-final events and only FOLDS an event once the user's
observed max event time has moved ``horizon_us`` past it (the
per-user watermark), at which point no reordering within the horizon
can precede it anymore — so the greedy walk sees events in true
event-time order and stream-final stages equal the batch funnel over
the union for ANY within-horizon shuffle (pinned in
tests/test_streaming_funnel.py). Events older than the already-
finalized frontier are dropped exactly like rows past a watermark.
Per-user state is (stage, bound, frontier) plus the buffer, whose
size is bounded by the user's event volume inside one horizon — the
same bound a watermarked window aggregation carries.

Each accepted batch emits the group's CURRENT (user, stage,
bound_ts) — consumers keep the latest row per user (update-mode
shape); per-stage counts are then "users with stage >= i".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from smartbots_etl_facturas_spark.streaming.timeseries import (
    _reject_null_fold_input,
)


def funnel_stateful(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    state_ttl_us: int | None = None,
):
    """Per-user streaming funnel over a streaming DataFrame. Emits one
    row per (user, micro-batch touching that user): the user's current
    (stage, bound_ts) after folding the batch's events.

    ``state_ttl_us`` (optional, round-10): evicts users idle past the
    TTL via an event-time timeout, bounding state on an unbounded user
    universe — eviction is a semantic reset (a returning user restarts
    at stage 0) and adds ``withWatermark(ts, ttl)`` with its standard
    late-drop. Default None keeps the exact r9 behavior (no watermark,
    state lives forever; see streaming/timeseries.py:ewma_stateful for
    the shared TTL contract)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from .timeseries import MIN_US, _arm_ttl, _validate_ttl

    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    _validate_ttl(state_ttl_us)
    key_type = df.schema[user_col].dataType.simpleString()
    out_schema = f"{user_col} {key_type}, stage long, bound_ts timestamp"
    state_schema = "stage long, bound_us long"
    k = len(steps)

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # idle past the TTL: evict; a returning user starts over
            state.remove()
            return

        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values(
            [ts_col], kind="mergesort"
        )
        _reject_null_fold_input(rows, key, ts_col, type_col, None)
        ts_us = (rows[ts_col].astype("int64") // 1000).tolist()
        types = rows[type_col].tolist()

        stage, bound_us = (state.get if state.exists else (0, MIN_US))
        for t, ty in zip(ts_us, types):
            if stage < k and ty == steps[stage] and t > bound_us:
                stage += 1
                bound_us = t
        state.update((int(stage), int(bound_us)))
        _arm_ttl(state, state_ttl_us, bound_us)
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "stage": [int(stage)],
                "bound_ts": [
                    pd.Timestamp(bound_us * 1000) if bound_us > MIN_US else pd.NaT
                ],
            }
        )

    src = df.filter(df[type_col].isin(steps))
    if state_ttl_us is not None:
        return (
            src.withWatermark(ts_col, f"{state_ttl_us} microseconds")
            .groupBy(user_col)
            .applyInPandasWithState(
                fn,
                outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
    return src.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stateful_buffered(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_us: int = 600_000_000,
    watermark_delay_us: int | None = None,
):
    """Watermark-buffered per-user streaming funnel: tolerates events
    arriving out of order within ``horizon_us`` (microseconds) of the
    user's max observed event time — PROVIDED each event also clears
    the stream's GLOBAL watermark (delay ``watermark_delay_us``,
    default ``horizon_us``): an event more than the delay behind the
    global max event time is dropped by Spark before it reaches the
    fold, even when its own user lags. Raise ``watermark_delay_us``
    above ``horizon_us`` to give slow users cross-user slack without
    widening the per-user reorder window (only cost: a later
    quiet-user flush).

    Folding rule: an event is final — and only then folded into the
    greedy walk, in (event-time, type) order, matching the batch
    twin's ``sort_array`` struct order — once the user's max observed
    event time is at least ``horizon_us`` past it. Events at or
    before the already-finalized frontier are dropped (late beyond
    the horizon). ALL of the user's events advance the frontier
    (non-step types fold as no-ops), so a stream with trailing
    activity drains its buffer naturally; a user who goes SILENT is
    flushed by an event-time timeout once the global watermark passes
    their newest buffered event + horizon (the round-9 quiet-key
    flush — see timeseries._buffered_fold_stream for the argument),
    so no tail waits forever.

    Emits one row per (user, micro-batch touching that user) and one
    on the timeout flush: (user, stage, bound_ts, n_buffered) —
    ``n_buffered`` is the user's not-yet-final step events still held
    in state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from .timeseries import MIN_US

    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    if horizon_us < 0:
        raise ValueError("horizon_us must be >= 0")
    if watermark_delay_us is None:
        watermark_delay_us = horizon_us
    if watermark_delay_us < horizon_us:
        raise ValueError("watermark_delay_us must be >= horizon_us")
    key_type = df.schema[user_col].dataType.simpleString()
    out_schema = (
        f"{user_col} {key_type}, stage long, bound_ts timestamp, "
        "n_buffered long"
    )
    state_schema = (
        "stage long, bound_us long, fin_us long, "
        "buf_ts array<long>, buf_ty array<string>"
    )
    k = len(steps)
    step_set = set(steps)

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            st = state.get
            stage, bound_us, fin_us = int(st[0]), int(st[1]), int(st[2])
            buf = list(zip(list(st[3] or []), list(st[4] or [])))
        else:
            stage, bound_us, fin_us = 0, MIN_US, MIN_US
            buf = []

        if state.hasTimedOut:
            # quiet-user flush: the global watermark passed (newest
            # buffered event + horizon) — the whole buffer is final.
            frontier = max([fin_us] + [e[0] for e in buf])
        else:
            rows = pd.concat(list(pdf_iter), ignore_index=True)
            _reject_null_fold_input(rows, key, ts_col, type_col, None)
            new_ts = (rows[ts_col].astype("int64") // 1000).tolist()
            new_ty = rows[type_col].tolist()

            # admit new rows: anything at-or-before the finalized
            # frontier arrived later than the horizon allows and is
            # dropped; only step-typed rows consume buffer space
            # (others just advance the frontier via max_us below)
            max_us = max([fin_us + horizon_us] + new_ts) if new_ts else (
                fin_us + horizon_us
            )
            for t, ty in zip(new_ts, new_ty):
                if t > fin_us and ty in step_set:
                    buf.append((t, ty))
            frontier = max(fin_us, max_us - horizon_us)

        ready = sorted(
            [e for e in buf if e[0] <= frontier]
        )  # (ts, type) order == the batch twin's sort_array struct order
        buf = [e for e in buf if e[0] > frontier]
        for t, ty in ready:
            if stage < k and ty == steps[stage] and t > bound_us:
                stage += 1
                bound_us = t

        state.update((
            int(stage), int(bound_us), int(frontier),
            [int(t) for t, _ in buf], [ty for _, ty in buf],
        ))
        if buf:
            # arm the quiet-user flush (ceil to ms, strictly above the
            # current watermark)
            timeout_ms = -(-(max(e[0] for e in buf) + horizon_us) // 1000)
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "stage": [int(stage)],
                "bound_ts": [
                    pd.Timestamp(bound_us * 1000) if bound_us > MIN_US else pd.NaT
                ],
                "n_buffered": [len(buf)],
            }
        )

    return (
        df.withWatermark(
            ts_col, f"{max(watermark_delay_us, 0)} microseconds"
        )
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
