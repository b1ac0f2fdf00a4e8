"""Sequential per-key time-series operators.

EWMA is the canonical operator that CANNOT be a window expression —
each output depends on the previous output (s_t = s_{t-1} +
(x_t - s_{t-1})/k), so it runs as ``applyInPandas`` with one ordered
pass per key: the Spark-sanctioned shape for per-entity sequential
state (same family as streaming/sessions.py's stateful kernel).

Scale design: one hash shuffle on the key, then embarrassingly
parallel per-group passes; group size is bounded by per-entity
history, never by corpus size. No driver participation.

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

    def _group(pdf):
        import numpy as np

        pdf = pdf.sort_values([ts_col, tie_col]).reset_index(drop=True)
        x = pdf[units_col].to_numpy(dtype=np.int64)
        s = np.empty_like(x)
        acc = int(x[0])
        s[0] = acc
        for i in range(1, len(x)):
            d = int(x[i]) - acc
            q = abs(d) // alpha_denom          # truncation toward zero
            acc = acc + (q if d >= 0 else -q)
            s[i] = acc
        return pdf[[key_col, ts_col, tie_col, units_col]].assign(ewma_units=s)

    return (
        df.select(key_col, ts_col, tie_col, units_col)
        .groupBy(key_col)
        .applyInPandas(_group, out_schema)
    )


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
