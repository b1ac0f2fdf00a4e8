"""Sequential per-key time-series operators.

EWMA is the canonical operator that CANNOT be a window expression —
each output depends on the previous output (s_t = s_{t-1} +
(x_t - s_{t-1})/k), so it runs as ONE Arrow-batched partition pass
(``repartition(key) + sortWithinPartitions(key, ts, tie)`` +
``mapInPandas`` with key-boundary resets): the per-entity sequential
state family (streaming/sessions.py's stateful kernel), but with
~|partitions| Python invocations instead of the ~|keys| a
``groupBy().applyInPandas`` costs when entities are many and small.

Scale design: one hash shuffle on the key, a partition-local sort,
then embarrassingly parallel partition passes; state is O(1) per
task. No driver participation.

Cross-engine determinism: values are scaled to exact integer units
and the recurrence uses TRUNCATING integer division (toward zero) on
the signed delta — matching SQL integer division (DuckDB's integer
``//`` truncates: -7 // 4 = -1, unlike numpy's floor_divide which
floors to -2), so the recursive-CTE oracle replays the walk exactly.
Float EWMA would accumulate non-portable rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ewma_smooth(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    units_col: str = "x_units",
    alpha_denom: int = 4,
) -> DataFrame:
    """Exponentially-weighted moving average per key, α = 1/alpha_denom.

    Input rows carry an exact integer measurement ``units_col``
    (pre-scale decimals to units); output adds ``ewma_units`` with
    s_1 = x_1 and s_t = s_{t-1} + trunc((x_t - s_{t-1}) / alpha_denom)
    (truncating division toward zero — SQL integer-division
    semantics), ordered by (ts_col, tie_col) — a TOTAL order per key.
    """
    if alpha_denom < 2:
        raise ValueError("alpha_denom must be >= 2")
    out_schema = T.StructType(
        df.select(key_col, ts_col, tie_col, units_col).schema.fields
        + [T.StructField("ewma_units", T.LongType(), False)]
    )

    # Partition-wise kernel instead of groupBy().applyInPandas: with
    # many small per-entity histories the per-group pandas overhead
    # (one Python call + frame assembly per key) dominates the O(rows)
    # recurrence. One hash repartition on the key co-locates each
    # key's rows; a partition-local sort establishes the same (ts,
    # tie) total order per key; ONE Arrow-batched pass then walks the
    # recurrence, resetting at key boundaries and carrying (key, acc)
    # across Arrow batch splits within the task. Identical rows out —
    # same shuffle count as the groupBy form, ~|partitions| Python
    # calls instead of ~|keys| (optimization guide §4.5).
    src = (
        df.select(key_col, ts_col, tie_col, units_col)
        .repartition(key_col)
        .sortWithinPartitions(key_col, ts_col, tie_col)
    )

    def _partitions(batches):
        import numpy as np

        sentinel = object()
        last_key, acc = sentinel, 0
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            keys = pdf[key_col].to_numpy()
            x = pdf[units_col].to_numpy(dtype=np.int64)
            s = np.empty_like(x)
            lk, a = last_key, acc
            for i in range(n):
                k = keys[i]
                # NaN-safe key equality: a null key hashes to one
                # partition and sorts first, but NaN != NaN would
                # split it into per-row groups
                same = (k == lk) or (k != k and lk != lk)
                xi = int(x[i])
                if not same:
                    a = xi
                    lk = k
                else:
                    d = xi - a
                    q = abs(d) // alpha_denom  # truncation toward zero
                    a = a + (q if d >= 0 else -q)
                s[i] = a
            last_key, acc = lk, a
            yield pdf.assign(ewma_units=s)

    return src.mapInPandas(_partitions, out_schema)


def holt_linear(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    units_col: str = "x_units",
    alpha_denom: int = 4,
    beta_denom: int = 8,
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per key —
    the forecasting step up from :func:`ewma_smooth`, which tracks a
    level but goes flat on trending series. Two coupled integer
    recurrences over the (ts, tie) total order:

        pred_t  = l_{t-1} + b_{t-1}
        l_t     = pred_t + trunc((x_t - pred_t) / alpha_denom)
        b_t     = b_{t-1} + trunc((l_t - pred_t) / beta_denom)

    seeded l_1 = x_1, b_1 = 0. All arithmetic is exact int64 with
    truncation toward zero (SQL integer-division semantics), so every
    (level, trend) pair is bit-identical across engines and
    partitionings — the oracle replays the identical walk as a
    recursive CTE. The one-step forecast for t+1 is level + trend,
    shipped per row as ``forecast_units``.

    Plan: ONE user-keyed shuffle + partition-local sort + Arrow-batched
    partition pass — the recurrence is inherently sequential per key,
    and keys are independent, which is exactly the parallelism a keyed
    shuffle gives. O(rows) work, state O(1) per task.
    """
    if alpha_denom < 2 or beta_denom < 2:
        raise ValueError("alpha_denom and beta_denom must be >= 2")
    out_schema = T.StructType(
        df.select(key_col, ts_col, tie_col, units_col).schema.fields
        + [
            T.StructField("level_units", T.LongType(), False),
            T.StructField("trend_units", T.LongType(), False),
            T.StructField("forecast_units", T.LongType(), False),
        ]
    )

    def _trunc_div(n: int, d: int) -> int:
        q = abs(n) // d
        return q if n >= 0 else -q

    # Partition-wise kernel with key-boundary resets — same rewrite
    # (and rationale) as :func:`ewma_smooth` above.
    src = (
        df.select(key_col, ts_col, tie_col, units_col)
        .repartition(key_col)
        .sortWithinPartitions(key_col, ts_col, tie_col)
    )

    def _partitions(batches):
        import numpy as np

        sentinel = object()
        last_key, level, trend = sentinel, 0, 0
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            keys = pdf[key_col].to_numpy()
            x = pdf[units_col].to_numpy(dtype=np.int64)
            lvl = np.empty_like(x)
            trd = np.empty_like(x)
            lk, lv, tr = last_key, level, trend
            for i in range(n):
                k = keys[i]
                same = (k == lk) or (k != k and lk != lk)
                xi = int(x[i])
                if not same:
                    lv, tr = xi, 0
                    lk = k
                else:
                    pred = lv + tr
                    new_level = pred + _trunc_div(xi - pred, alpha_denom)
                    tr = tr + _trunc_div(new_level - pred, beta_denom)
                    lv = new_level
                lvl[i], trd[i] = lv, tr
            last_key, level, trend = lk, lv, tr
            yield pdf.assign(
                level_units=lvl, trend_units=trd, forecast_units=lvl + trd
            )

    return src.mapInPandas(_partitions, out_schema)


def cusum(
    df: DataFrame,
    x_col: str,
    target_units: int,
    slack_units: int = 0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """One-sided (upper) CUSUM drift statistic per key over the
    integer-unit series ``x_col``:

        s_0 = 0;   s_i = max(0, s_{i-1} + (x_i - target - slack))

    Although the recurrence looks sequential like EWMA, the max-reset
    has a closed window form — with d_i = x_i - (target + slack) and
    prefix sums S_i,  s_i = S_i - min(0, min_{j<=i} S_j)  (the
    running-drawdown identity) — so unlike :func:`ewma_smooth` this
    runs as two key-partitioned WINDOW expressions, whole-stage
    codegen, no Python anywhere. All arithmetic is int64 on
    pre-scaled units: bit-identical across engines.

    Returns the input keys/ordering columns plus ``cusum_units``;
    callers flag change points by filtering ``cusum_units > h``.
    Plan: ONE key shuffle shared by both window frames.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(tie_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (F.col(x_col).cast("long") - F.lit(int(target_units + slack_units)))
    out = df.withColumn("__S", F.sum(d).over(w))
    out = out.withColumn(
        "cusum_units",
        (F.col("__S") - F.least(F.lit(0).cast("long"), F.min("__S").over(w)))
        .cast("long"),
    )
    return out.drop("__S")


def acf_lags(
    series: DataFrame,
    time_col: str,
    value_col: str,
    lags: list[int],
) -> DataFrame:
    """Autocorrelation of an integer-valued regular series at each
    lag in ``lags``: one row (lag_k, n_pairs, acf) per requested lag.

    r_k is the Pearson correlation of the PAIRED series
    {(x_t, x_{t+k}) : both present} — the lag-k join is an equi-join
    on the shifted integer time index (``time_col`` must be an
    integer axis, e.g. days-since-epoch), NOT a global window: a
    window ``lag(k)`` over the whole series would collapse it onto
    one task, while the shifted self-join shuffles by time key and
    scales with the series.

    Determinism: ``value_col`` must be integral (counts). All five
    sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are LONG sums —
    exact and reduction-order independent — so the single final
    double expression per lag is bit-portable to the SQL oracle;
    it ships rounded to 9 places.
    """
    a = series.select(
        F.col(time_col).cast("long").alias("__t"),
        F.col(value_col).cast("long").alias("__x"),
    )
    per_lag = []
    for k in lags:
        b = series.select(
            (F.col(time_col).cast("long") + F.lit(int(k))).alias("__t"),
            F.col(value_col).cast("long").alias("__y"),
        )
        paired = a.join(b, "__t")
        per_lag.append(
            paired.agg(
                F.lit(int(k)).cast("long").alias("lag_k"),
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum("__x").alias("__sx"),
                F.sum("__y").alias("__sy"),
                F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
                F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
                F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
            )
        )
    out = per_lag[0]
    for frame in per_lag[1:]:
        out = out.unionByName(frame)
    m = F.col("n_pairs").cast("double")
    num = m * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = F.sqrt(
        (m * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
        * (m * F.col("__syy") - F.col("__sy") * F.col("__sy"))
    )
    return out.select(
        "lag_k", "n_pairs", F.round(num / den, 9).alias("acf")
    )


def seasonal_index(
    df: DataFrame,
    period_col: Column,
    n_periods: int,
) -> DataFrame:
    """Multiplicative seasonal index over a cyclic period axis:
    (period, cnt, seas_index) where seas_index = cnt · n_periods /
    total — how far each cycle position (day-of-week, month) runs
    above/below the cycle mean. 1.0 = no seasonality.

    One map-side-combined hash aggregation builds the period counts
    (frame bounded at ``n_periods`` rows); the total returns as a
    1-row broadcast normalizer. The index is a single double
    expression over exact longs — portable to the SQL oracle."""
    counts = df.groupBy(period_col.alias("period")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))  # 1-row normalizer
        .select(
            "period",
            "cnt",
            F.round(
                F.col("cnt").cast("double")
                * F.lit(float(n_periods))
                / F.col("__total").cast("double"),
                9,
            ).alias("seas_index"),
        )
    )
