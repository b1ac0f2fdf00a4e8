"""Gap-based sessionization — built-in session windows plus a custom
stateful twin.

The reference has no session concept; this is engine surface for the
events stream (SURVEY §2.8 extension). Two tiers, per the engine's
"built-in first" rule:

- :func:`sessionize` — ``F.session_window`` groupBy. Batch AND
  streaming (with watermark) from the same plan; Spark merges
  overlapping per-event windows [t, t+gap) into sessions. This is the
  hot path: JVM-side, codegen, map-side partial merge.
- :func:`sessionize_stateful` — ``applyInPandasWithState`` with an
  explicit per-key session state and event-time timeout. Exists as
  the pattern for session semantics ``session_window`` cannot express
  (max-duration caps, per-key dynamic gaps, emit-on-update): custom
  stateful logic in Arrow-batched pandas, state bounded by watermark
  timeouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Sessions = maximal event runs per key with inter-event gap
    <= gap_seconds (an event EXACTLY gap_seconds later still merges —
    Spark merges touching [t, t+gap] windows; only a strictly larger
    gap opens a new session).

    Output: key, session_start/session_end (first/last event time),
    n_events, sum_value. On a streaming frame pass ``watermark`` so
    closed sessions finalize and state stays bounded.
    """
    src = df.withWatermark(ts_col, watermark) if (watermark and df.isStreaming) else df
    return (
        src.groupBy(key_col, F.session_window(F.col(ts_col), f"{gap_seconds} seconds"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .drop("session_window")
    )


def sessionize_stateful(
    df: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
):
    """Custom stateful sessionization via applyInPandasWithState.

    Per-key state = the one open session (start, last, n, sum) in
    epoch micros; an event-time timeout ``gap_seconds`` past the last
    event closes and emits it. Input must be a streaming DataFrame
    with a watermark on ``ts_col``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .timeseries import _reject_null_fold_input

    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, session_start timestamp, "
        "session_end timestamp, n_events long, sum_value double"
    )
    state_schema = "start long, last long, n long, s double"
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        def emit(start_us, last_us, n, s):
            return pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )

        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield emit(start, last, n, s)
            return

        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values(ts_col)
        _reject_null_fold_input(rows, key, ts_col, value_col, None)
        ts_us = (rows[ts_col].astype("int64") // 1000).tolist()
        vals = rows[value_col].astype(float).tolist()

        start = last = None
        n, s = 0, 0.0
        if state.exists:
            start, last, n, s = state.get
        for t, v in zip(ts_us, vals):
            if last is not None and t - last > gap_us:
                yield emit(start, last, n, s)
                start, n, s = t, 0, 0.0
            if start is None:
                start = t
            # cross-batch out-of-order rows (admitted by the watermark)
            # MERGE into the open session without regressing its span:
            # last = max, start = min — the r11 review found a plain
            # `last = t` producing session_end < session_start. A row
            # more than gap BEFORE session_start still merges (one
            # open session per key; reopening history is the buffered
            # family's job — documented semantics, not batch parity).
            start = min(start, t)
            last = t if last is None else max(last, t)
            n, s = n + 1, s + v
        state.update((start, last, n, s))
        state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)

    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
