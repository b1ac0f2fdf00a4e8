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

from pyspark.sql import DataFrame
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
