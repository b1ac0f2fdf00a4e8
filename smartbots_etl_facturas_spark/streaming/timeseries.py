"""Streaming EWMA: the batch integer recurrence of
operators/timeseries.py carried across micro-batches with
``applyInPandasWithState`` — per-key state is one (accumulator,
last-event-time) pair, so state size is O(distinct keys) and never
grows with stream length (no timeout needed; the state IS the
operator's meaning).

Late-data policy: a row with event time strictly BEFORE the state's
last processed time cannot be folded into the recurrence (EWMA is
order-sequential) and is dropped — the same discard semantics a
watermark gives an aggregation. Rows inside one micro-batch are
processed in event-time order.

Determinism matches the batch twin exactly — integer units,
truncating division toward zero, stable (ts, tie) ordering — PROVIDED
``tie_col`` is passed when one key can carry same-timestamp rows
(see :func:`ewma_stateful`); tests pin stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _reject_null_fold_input(rows, key, ts_col, units_col, tie_col):
    """Fail FAST with a named column and key on null event-time, units
    or tie-break values: a null would otherwise surface as an opaque
    pandas/NoneType comparison or astype error deep inside the state
    function (round-8 ADVICE). Folds require non-null inputs — filter
    upstream if the source can carry nulls."""
    for c in [ts_col, units_col] + ([tie_col] if tie_col else []):
        if rows[c].isna().any():
            raise ValueError(
                f"streaming fold input for key {key!r} has a null in "
                f"column {c!r}: ts/tie/units must be non-null (drop or "
                "default them upstream)"
            )


#: fresh-state "processed bound" sentinel: strictly below any real
#: epoch-micros value, INCLUDING pre-1970 negatives — a -1 sentinel
#: silently dropped pre-epoch events on fresh keys, diverging from the
#: batch twins (round-11 streaming review; the buffered family always
#: used this value)
MIN_US = -(1 << 62)


def _validate_ttl(state_ttl_us) -> None:
    if state_ttl_us is not None and state_ttl_us <= 0:
        raise ValueError("state_ttl_us must be positive (or None)")


def _arm_ttl(state, state_ttl_us, base_us: int) -> None:
    """Arm the idle-key eviction timeout at (newest ACCEPTED event +
    TTL), clamped strictly past the current watermark (Spark rejects
    timeouts at or before it). Shared by the strict fold family.

    Round-11 (ADVICE): ``base_us`` is the fold's accepted-event bound
    (``last_us``), NOT the batch max — a batch of only late/duplicate
    rows must not refresh an idle key's TTL, or the documented
    "idle = no accepted events" eviction contract silently weakens to
    "no arrivals". A key that never accepted anything (base −1) or
    whose accepted events are pre-1970 (base < 0) arms at the
    watermark clamp instead of living forever."""
    if state_ttl_us is None:
        return
    timeout_ms = -(-(base_us + state_ttl_us) // 1000)  # ceil to ms
    state.setTimeoutTimestamp(
        max(timeout_ms, state.getCurrentWatermarkMs() + 1)
    )


def ewma_stateful(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    units_col: str = "x_units",
    alpha_denom: int = 4,
    tie_col: str | None = None,
    state_ttl_us: int | None = None,
):
    """Per-key streaming EWMA (α = 1/alpha_denom) over a streaming
    DataFrame with a watermark on ``ts_col``. Emits one row per
    accepted input row: (key, ts, x_units, ewma_units).

    Determinism contract: within a micro-batch, rows fold in
    (``ts_col``, ``tie_col``) order under a STABLE sort. Pass
    ``tie_col`` whenever same-timestamp rows can occur for one key —
    without it, equal-ts rows fold in arrival order, which is
    partition-order dependent (the batch twin requires a tie column
    for exactly this reason).

    ``state_ttl_us`` (optional, round-10): per-key state is one small
    tuple — bounded by design at O(distinct keys) — but a years-lived
    stream over an unbounded key universe still accretes. When set, a
    key idle (no accepted events) past the TTL is EVICTED via an
    event-time timeout; a later arrival restarts the recurrence from
    scratch (the accumulator is genuinely gone — eviction is a
    semantic reset, not a pause). Setting a TTL adds
    ``withWatermark(ts, ttl)``, so rows more than the TTL behind the
    global max event time are dropped before the fold (the lateness
    bound any TTL implies). Default None keeps the exact r9 behavior:
    no watermark, no eviction."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if alpha_denom < 2:
        raise ValueError("alpha_denom must be >= 2")
    _validate_ttl(state_ttl_us)
    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, {ts_col} timestamp, "
        f"{units_col} long, ewma_units long"
    )
    # the state carries the last processed (ts, tie) so a LATER
    # micro-batch can be cut at exactly the batch twin's sort position
    # — without the tie a cross-batch equal-ts arrival would fold
    # after already-processed equal-ts rows, where the batch sort
    # would have placed it before/among them.
    if tie_col:
        tie_type = df.schema[tie_col].dataType.simpleString()
        state_schema = f"acc long, last_us long, last_tie {tie_type}"
    else:
        state_schema = "acc long, last_us long"

    sort_cols = [ts_col] + ([tie_col] if tie_col else [])

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # idle past the TTL: evict; a re-arrival restarts fresh
            state.remove()
            return

        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values(
            sort_cols, kind="mergesort"   # stable: ties keep a fixed order
        )
        _reject_null_fold_input(rows, key, ts_col, units_col, tie_col)
        ts_us = (rows[ts_col].astype("int64") // 1000).tolist()
        xs = rows[units_col].astype("int64").tolist()
        ties = rows[tie_col].tolist() if tie_col else None

        if state.exists:
            st = state.get
            acc, bound_us = st[0], st[1]
            bound_tie = st[2] if tie_col else None
        else:
            acc, bound_us, bound_tie = None, MIN_US, None

        last_us, last_tie = bound_us, bound_tie
        out_t, out_x, out_s = [], [], []
        for i, (t, x) in enumerate(zip(ts_us, xs)):
            # cross-batch boundary: any row at-or-before the state's
            # last processed (ts, tie) in batch-sort order would have
            # folded EARLIER in the batch twin — folding it now would
            # diverge, so it is dropped like any other late row.
            # Without a tie column, equal-ts rows arriving in a later
            # micro-batch are dropped too (module-doc contract: pass
            # tie_col when equal-ts rows can span batches).
            if t < bound_us:
                continue
            if t == bound_us and (ties is None or ties[i] <= bound_tie):
                continue
            if acc is None:
                acc = int(x)
            else:
                d = int(x) - acc
                q = abs(d) // alpha_denom     # truncation toward zero
                acc = acc + (q if d >= 0 else -q)
            last_us = t
            last_tie = ties[i] if ties is not None else None
            out_t.append(t)
            out_x.append(x)
            out_s.append(acc)
        if acc is not None:
            state.update(
                (acc, last_us, last_tie) if tie_col else (acc, last_us)
            )
            _arm_ttl(state, state_ttl_us, last_us)
        if out_t:
            yield pd.DataFrame({
                key_col: [key[0]] * len(out_t),
                ts_col: [pd.Timestamp(t, unit="us") for t in out_t],
                units_col: out_x,
                "ewma_units": out_s,
            })

    if state_ttl_us is not None:
        return (
            df.withWatermark(ts_col, f"{state_ttl_us} microseconds")
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, out_schema, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout,
            )
        )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def holt_stateful(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    units_col: str = "x_units",
    alpha_denom: int = 4,
    beta_denom: int = 8,
    tie_col: str | None = None,
    state_ttl_us: int | None = None,
):
    """Streaming twin of :func:`...operators.timeseries.holt_linear`:
    the coupled (level, trend) integer recurrences carried across
    micro-batches — per-key state is (level, trend, last position),
    O(distinct keys) forever. Ordering/late-data contract is
    ewma_stateful's: in-batch rows fold in stable (ts, tie) order,
    rows at-or-before the state's last processed position are
    dropped. Emits one row per accepted input row:
    (key, ts, x_units, level_units, trend_units, forecast_units);
    tests pin stream == batch bit-for-bit. ``state_ttl_us`` evicts
    idle keys (see :func:`ewma_stateful` — same opt-in TTL contract:
    eviction is a semantic reset and adds a watermark).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if alpha_denom < 2 or beta_denom < 2:
        raise ValueError("alpha_denom and beta_denom must be >= 2")
    _validate_ttl(state_ttl_us)
    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, {ts_col} timestamp, {units_col} long, "
        "level_units long, trend_units long, forecast_units long"
    )
    if tie_col:
        tie_type = df.schema[tie_col].dataType.simpleString()
        state_schema = (
            f"lvl long, trd long, last_us long, last_tie {tie_type}"
        )
    else:
        state_schema = "lvl long, trd long, last_us long"
    sort_cols = [ts_col] + ([tie_col] if tie_col else [])

    def _trunc_div(n: int, d: int) -> int:
        q = abs(n) // d
        return q if n >= 0 else -q

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # idle past the TTL: evict; a re-arrival restarts fresh
            state.remove()
            return

        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values(
            sort_cols, kind="mergesort"
        )
        _reject_null_fold_input(rows, key, ts_col, units_col, tie_col)
        ts_us = (rows[ts_col].astype("int64") // 1000).tolist()
        xs = rows[units_col].astype("int64").tolist()
        ties = rows[tie_col].tolist() if tie_col else None

        if state.exists:
            st = state.get
            level = None if st[0] is None else int(st[0])
            trend, bound_us = int(st[1]), int(st[2])
            bound_tie = st[3] if tie_col else None
        else:
            level, trend, bound_us, bound_tie = None, 0, MIN_US, None

        last_us, last_tie = bound_us, bound_tie
        out_t, out_x, out_l, out_b = [], [], [], []
        for i, (t, x) in enumerate(zip(ts_us, xs)):
            if t < bound_us:
                continue
            if t == bound_us and (ties is None or ties[i] <= bound_tie):
                continue
            if level is None:
                level, trend = int(x), 0
            else:
                pred = level + trend
                new_level = pred + _trunc_div(int(x) - pred, alpha_denom)
                trend = trend + _trunc_div(new_level - pred, beta_denom)
                level = new_level
            last_us = t
            last_tie = ties[i] if ties is not None else None
            out_t.append(t)
            out_x.append(x)
            out_l.append(level)
            out_b.append(trend)
        if level is not None:
            state.update(
                (level, trend, last_us, last_tie) if tie_col
                else (level, trend, last_us)
            )
            _arm_ttl(state, state_ttl_us, last_us)
        if out_t:
            yield pd.DataFrame({
                key_col: [key[0]] * len(out_t),
                ts_col: [pd.Timestamp(t, unit="us") for t in out_t],
                units_col: out_x,
                "level_units": out_l,
                "trend_units": out_b,
                "forecast_units": [a + b for a, b in zip(out_l, out_b)],
            })

    if state_ttl_us is not None:
        return (
            df.withWatermark(ts_col, f"{state_ttl_us} microseconds")
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, out_schema, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout,
            )
        )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def _buffered_fold_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    units_col: str,
    tie_col: str | None,
    horizon_us: int,
    state_extra_schema: str,
    n_state: int,
    fold_one,
    out_extra_schema: str,
    out_extra_names: list[str],
    watermark_delay_us: int | None = None,
):
    """Shared machinery for the watermark-buffered ordered-fold
    family (EWMA / Holt / CUSUM buffered variants).

    Contract (the buffered-funnel discipline,
    streaming/funnel.py:funnel_stateful_buffered): a row is FINAL —
    and only then folded into the recurrence and emitted, in
    (ts, tie) order — once the key's max observed event time is at
    least ``horizon_us`` past it; until then it waits in state. Rows
    at or before the already-finalized frontier are dropped (late
    beyond the horizon). Per-key state = ``n_state`` fold fields
    (None until the first fold) + frontier + the within-horizon
    buffer — bounded by one horizon's event volume per key, the
    watermarked-aggregation bound. Stream-final output equals the
    batch twin over the union for any within-horizon shuffle,
    PROVIDED each row also clears the stream's GLOBAL watermark
    (delay = ``watermark_delay_us``, default ``horizon_us``): a row
    more than that delay behind the global max event time is dropped
    by Spark before it reaches the fold, even when its own key's
    frontier would still admit it. A key that lags other keys by more
    than the delay therefore sees rows its batch twin would fold —
    raise ``watermark_delay_us`` above ``horizon_us`` to give slow
    keys cross-key slack without widening the per-key reorder window
    (the only cost is a later quiet-key flush).

    QUIET-KEY FLUSH (round-9): the per-key frontier only advances on
    that key's own arrivals, so under ``NoTimeout`` a key that goes
    silent would hold its within-horizon tail forever and never emit
    it. The fold therefore runs under an EVENT-TIME timeout: the
    stream carries a ``withWatermark(ts, watermark_delay)`` and each
    update arms a timeout at (newest buffered event + horizon); when
    the GLOBAL watermark passes it, the state function fires with no
    input and folds/emits the whole buffer in order. Safe because
    any row that could still arrive is at or above the watermark,
    i.e. newer than everything flushed.

    ``fold_one(state_tuple_or_None, x) -> (state_tuple, out_tuple)``
    defines the recurrence; it must be pure integer arithmetic so the
    fold is bit-identical to the batch twin.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if horizon_us < 0:
        raise ValueError("horizon_us must be >= 0")
    if watermark_delay_us is None:
        watermark_delay_us = horizon_us
    if watermark_delay_us < horizon_us:
        # a global delay tighter than the per-key horizon would drop
        # rows the frontier still admits — never a sane configuration.
        raise ValueError("watermark_delay_us must be >= horizon_us")
    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, {ts_col} timestamp, "
        f"{units_col} long, {out_extra_schema}"
    )
    state_schema = (
        f"{state_extra_schema}, fin_us long, "
        "buf_ts array<long>, buf_x array<long>"
    )
    if tie_col:
        tie_type = df.schema[tie_col].dataType.simpleString()
        state_schema += f", buf_tie array<{tie_type}>"

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            st = state.get
            fold_st = (
                None if st[0] is None
                else tuple(int(v) for v in st[:n_state])
            )
            fin_us = int(st[n_state])
            b_ts = list(st[n_state + 1] or [])
            b_x = list(st[n_state + 2] or [])
            b_tie = (
                list(st[n_state + 3] or []) if tie_col
                else [None] * len(b_ts)
            )
            buf = list(zip(b_ts, b_x, b_tie))
        else:
            fold_st, fin_us, buf = None, -(1 << 62), []

        if state.hasTimedOut:
            # quiet-key flush: the global watermark passed (newest
            # buffered event + horizon) — everything buffered is
            # final; fold and emit the whole tail in order.
            frontier = max([fin_us] + [e[0] for e in buf])
        else:
            rows = pd.concat(list(pdf_iter), ignore_index=True)
            _reject_null_fold_input(rows, key, ts_col, units_col, tie_col)
            new_ts = (rows[ts_col].astype("int64") // 1000).tolist()
            new_x = rows[units_col].astype("int64").tolist()
            new_tie = (
                rows[tie_col].tolist() if tie_col else [None] * len(new_ts)
            )
            max_us = max([fin_us + horizon_us] + new_ts) if new_ts else (
                fin_us + horizon_us
            )
            for t, x, tie in zip(new_ts, new_x, new_tie):
                if t > fin_us:
                    buf.append((t, x, tie))
            frontier = max(fin_us, max_us - horizon_us)

        if tie_col:
            ready = sorted(
                (e for e in buf if e[0] <= frontier),
                key=lambda e: (e[0], e[2]),
            )
        else:
            # no tie column: equal-ts rows fold in buffer (arrival)
            # order under a stable sort — same caveat as the strict
            # variants' module-doc contract
            ready = sorted(
                (e for e in buf if e[0] <= frontier), key=lambda e: e[0]
            )
        buf = [e for e in buf if e[0] > frontier]

        out_t, out_x, out_extra = [], [], []
        for t, x, _tie in ready:
            fold_st, out_vals = fold_one(fold_st, int(x))
            out_t.append(t)
            out_x.append(x)
            out_extra.append(out_vals)

        buf_cols = (
            [int(t) for t, _, _ in buf],
            [int(x) for _, x, _ in buf],
        )
        if tie_col:
            buf_cols = buf_cols + ([tie for _, _, tie in buf],)
        packed = (
            (None,) * n_state if fold_st is None
            else tuple(int(v) for v in fold_st)
        )
        state.update((*packed, int(frontier), *buf_cols))
        if buf:
            # arm the quiet-key flush: fire once the global watermark
            # passes the newest buffered event + horizon (ceil to ms;
            # must stay strictly above the current watermark).
            timeout_ms = -(-(max(e[0] for e in buf) + horizon_us) // 1000)
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        if out_t:
            data = {
                key_col: [key[0]] * len(out_t),
                ts_col: [pd.Timestamp(t, unit="us") for t in out_t],
                units_col: out_x,
            }
            for i, name in enumerate(out_extra_names):
                data[name] = [vals[i] for vals in out_extra]
            yield pd.DataFrame(data)

    delay_interval = f"{max(watermark_delay_us, 0)} microseconds"
    return (
        df.withWatermark(ts_col, delay_interval)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def ewma_stateful_buffered(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    units_col: str = "x_units",
    alpha_denom: int = 4,
    tie_col: str | None = None,
    horizon_us: int = 600_000_000,
    watermark_delay_us: int | None = None,
):
    """Watermark-buffered streaming EWMA — :func:`ewma_stateful`'s
    recurrence under the buffered ordered-fold contract (see
    :func:`_buffered_fold_stream`): out-of-order delivery within
    ``horizon_us`` reproduces the batch EWMA exactly (pinned in
    tests/test_streaming_buffered.py); rows beyond the horizon drop
    with watermark semantics."""
    if alpha_denom < 2:
        raise ValueError("alpha_denom must be >= 2")

    def fold(st, x):
        if st is None:
            return (x,), (x,)
        acc = st[0]
        d = x - acc
        q = abs(d) // alpha_denom  # truncation toward zero
        acc = acc + (q if d >= 0 else -q)
        return (acc,), (acc,)

    return _buffered_fold_stream(
        df, key_col, ts_col, units_col, tie_col, horizon_us,
        watermark_delay_us=watermark_delay_us,
        state_extra_schema="acc long", n_state=1, fold_one=fold,
        out_extra_schema="ewma_units long", out_extra_names=["ewma_units"],
    )


def holt_stateful_buffered(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    units_col: str = "x_units",
    alpha_denom: int = 4,
    beta_denom: int = 8,
    tie_col: str | None = None,
    horizon_us: int = 600_000_000,
    watermark_delay_us: int | None = None,
):
    """Watermark-buffered streaming Holt — :func:`holt_stateful`'s
    coupled (level, trend) recurrences under the buffered
    ordered-fold contract: within-horizon shuffle reproduces the
    batch ``holt_linear`` exactly."""
    if alpha_denom < 2 or beta_denom < 2:
        raise ValueError("alpha_denom and beta_denom must be >= 2")

    def _trunc_div(n, d):
        q = abs(n) // d
        return q if n >= 0 else -q

    def fold(st, x):
        if st is None:
            return (x, 0), (x, 0, x)
        level, trend = st
        pred = level + trend
        new_level = pred + _trunc_div(x - pred, alpha_denom)
        trend = trend + _trunc_div(new_level - pred, beta_denom)
        return (new_level, trend), (new_level, trend, new_level + trend)

    return _buffered_fold_stream(
        df, key_col, ts_col, units_col, tie_col, horizon_us,
        watermark_delay_us=watermark_delay_us,
        state_extra_schema="lvl long, trd long", n_state=2, fold_one=fold,
        out_extra_schema=(
            "level_units long, trend_units long, forecast_units long"
        ),
        out_extra_names=["level_units", "trend_units", "forecast_units"],
    )


def cusum_stateful_buffered(
    df: DataFrame,
    target_units: int,
    slack_units: int = 0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    units_col: str = "x_units",
    tie_col: str | None = None,
    horizon_us: int = 600_000_000,
    watermark_delay_us: int | None = None,
):
    """Watermark-buffered streaming CUSUM — :func:`cusum_stateful`'s
    drift recurrence ``s = max(0, s + (x - target - slack))`` under
    the buffered ordered-fold contract: within-horizon shuffle
    reproduces the batch ``cusum`` exactly."""
    drift = int(target_units + slack_units)

    def fold(st, x):
        s = 0 if st is None else st[0]
        s = max(0, s + x - drift)
        return (s,), (s,)

    return _buffered_fold_stream(
        df, key_col, ts_col, units_col, tie_col, horizon_us,
        watermark_delay_us=watermark_delay_us,
        state_extra_schema="s long", n_state=1, fold_one=fold,
        out_extra_schema="cusum_units long", out_extra_names=["cusum_units"],
    )


def cusum_stateful(
    df: DataFrame,
    target_units: int,
    slack_units: int = 0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    units_col: str = "x_units",
    tie_col: str | None = None,
    state_ttl_us: int | None = None,
):
    """Streaming twin of :func:`...operators.timeseries.cusum`: the
    one-sided CUSUM drift statistic carried across micro-batches.

    Unlike the batch twin — which exploits the drawdown identity to
    run as two windows — the stream keeps the DIRECT recurrence
    ``s = max(0, s + (x - target - slack))`` as per-key state: ONE
    int64 per key (plus the (ts, tie) boundary), so state size is
    O(distinct keys) forever. The two formulations are equal by the
    drawdown identity; tests pin stream == batch row for row.

    Ordering/late-data contract is ewma_stateful's: in-batch rows fold
    in stable (ts, tie) order, rows at-or-before the state's last
    processed position are dropped. ``state_ttl_us`` evicts idle
    keys (see :func:`ewma_stateful` — same opt-in TTL contract).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    _validate_ttl(state_ttl_us)
    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, {ts_col} timestamp, "
        f"{units_col} long, cusum_units long"
    )
    if tie_col:
        tie_type = df.schema[tie_col].dataType.simpleString()
        state_schema = f"s long, last_us long, last_tie {tie_type}"
    else:
        state_schema = "s long, last_us long"
    sort_cols = [ts_col] + ([tie_col] if tie_col else [])
    drift = int(target_units + slack_units)

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # idle past the TTL: evict; a re-arrival restarts fresh
            state.remove()
            return

        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values(
            sort_cols, kind="mergesort"
        )
        _reject_null_fold_input(rows, key, ts_col, units_col, tie_col)
        ts_us = (rows[ts_col].astype("int64") // 1000).tolist()
        xs = rows[units_col].astype("int64").tolist()
        ties = rows[tie_col].tolist() if tie_col else None

        if state.exists:
            st = state.get
            s, bound_us = st[0], st[1]
            bound_tie = st[2] if tie_col else None
        else:
            s, bound_us, bound_tie = 0, MIN_US, None

        last_us, last_tie = bound_us, bound_tie
        out_t, out_x, out_s = [], [], []
        for i, (t, x) in enumerate(zip(ts_us, xs)):
            if t < bound_us:
                continue
            if t == bound_us and (ties is None or ties[i] <= bound_tie):
                continue
            s = max(0, s + int(x) - drift)
            last_us = t
            last_tie = ties[i] if ties is not None else None
            out_t.append(t)
            out_x.append(x)
            out_s.append(s)
        state.update((s, last_us, last_tie) if tie_col else (s, last_us))
        _arm_ttl(state, state_ttl_us, last_us)
        if out_t:
            yield pd.DataFrame({
                key_col: [key[0]] * len(out_t),
                ts_col: [pd.Timestamp(t, unit="us") for t in out_t],
                units_col: out_x,
                "cusum_units": out_s,
            })

    if state_ttl_us is not None:
        return (
            df.withWatermark(ts_col, f"{state_ttl_us} microseconds")
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, out_schema, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout,
            )
        )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
