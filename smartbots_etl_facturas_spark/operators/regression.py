"""Per-key least-squares trend as pure aggregation.

Simple linear regression has a closed form over five sufficient
statistics — n, Σx, Σy, Σxy, Σx² — so a per-key trend fit is ONE
map-side-combining keyed aggregation at any history length: the
textbook "algebraic aggregate" (the same monoid property
operators/incremental.py exploits, so trend state is incrementally
maintainable for free).

The slope is reported as an exact integer RATIO —

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)  =  slope_num / slope_den

— never divided: float division rounds non-portably, while the two
products are exact on DECIMAL(38,0) (128-bit intermediates; int64
would overflow at n·Σxy for long histories — DuckDB promotes BIGINT
sums to HUGEINT for the same reason). Callers compare trends by
cross-multiplying or divide at the edge.

Inputs must be pre-scaled integers (x e.g. minutes since the key's
first observation, y e.g. value ten-thousandths — the engine's
fixed-point discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

D38 = "decimal(38,0)"


def group_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key OLS slope of y over x as an exact rational.

    Returns ``(key, n, slope_num, slope_den)`` with slope_num/den as
    DECIMAL(38,0); slope_den = 0 when x is constant within the key
    (undefined slope — callers filter or treat as flat). Keys with a
    single observation report (1, 0, 0).
    """
    x = F.col(x_col).cast(D38)
    y = F.col(y_col).cast(D38)
    stats = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast(D38).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    return stats.select(
        key_col,
        F.col("__n").cast("long").alias("n"),
        (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
        .cast(D38)
        .alias("slope_num"),
        (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
        .cast(D38)
        .alias("slope_den"),
    )
