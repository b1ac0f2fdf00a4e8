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


def linreg_sufficient_stats(
    df: DataFrame,
    features: dict[str, "F.Column"],
    target: "F.Column",
    products: str = "decimal",
) -> DataFrame:
    """Multivariate OLS sufficient statistics in ONE scan: the
    normal-equation blocks X'X (with intercept: n, Σfᵢ, Σfᵢfⱼ for
    i ≤ j) and X'y (Σy, Σfᵢy) plus Σy², every one an EXACT
    DECIMAL(38,0) sum of integer columns (callers pre-scale to
    cents/fixed-point — the engine's discipline). The output is ONE
    row with deterministic column names ``n, s_<f>, s_<f>_<g>,
    sy, s_<f>_y, syy`` — bounded by k² cells at any input size, the
    distributed HALF of least squares; solving the (k+1)×(k+1)
    system is driver-side arithmetic on this row (``fit_linear``).

    Map-side partial aggregation reduces every partition to one
    stats row before the single-cell shuffle. Rows with a NULL in
    any used column are dropped first (complete-case fit).

    ``products`` selects the per-row product tier (same contract as
    profile.corr_matrix): ``"decimal"`` (default, safe at any long
    magnitude), or ``"long"`` — a guarded raw long multiply that
    raises visibly past |v| <= floor(sqrt(2^63-1)), exact within it,
    without per-row BigDecimal cost.
    """
    from smartbots_etl_facturas_spark.operators.profile import _guarded_long

    if products not in ("decimal", "long"):
        raise ValueError("products must be 'decimal' or 'long'")
    names = list(features)
    cols = [features[n].cast("long").alias(f"__f_{n}") for n in names]
    base = df.select(*cols, target.cast("long").alias("__y")).na.drop()
    aggs = [F.count(F.lit(1)).cast(D38).alias("n")]
    # Decimal tier: factors cast to DECIMAL(19,0) BEFORE multiplying
    # (product type: decimal(38,0)) — a raw long*long past ±9.2e18
    # silently wraps under non-ANSI Spark; the decimal product stays
    # exact to 38 digits and fails visibly beyond. Long tier: guarded
    # long multiply, widened to decimal only at the SUM.
    D19 = "decimal(19,0)"

    if products == "decimal":
        def _prod(a, b):
            return (a.cast(D19) * b.cast(D19))
    else:
        def _prod(a, b):
            return (
                _guarded_long(a, "linreg_sufficient_stats")
                * _guarded_long(b, "linreg_sufficient_stats")
            ).cast(D38)

    y = F.col("__y")
    for i, a in enumerate(names):
        fa = F.col(f"__f_{a}")
        aggs.append(F.sum(fa.cast(D38)).alias(f"s_{a}"))
        for b in names[i:]:
            aggs.append(
                F.sum(_prod(fa, F.col(f"__f_{b}"))).alias(f"s_{a}_{b}")
            )
        aggs.append(F.sum(_prod(fa, y)).alias(f"s_{a}_y"))
    aggs.append(F.sum(y.cast(D38)).alias("sy"))
    aggs.append(F.sum(_prod(y, y)).alias("syy"))
    return base.agg(*aggs)


def fit_linear(
    df: DataFrame,
    features: dict[str, "F.Column"],
    target: "F.Column",
) -> dict:
    """Exact ordinary least squares with intercept: coefficients and
    R² solved from the sufficient-statistics row by EXACT rational
    Gaussian elimination (fractions.Fraction — no pivot-order float
    drift, bit-reproducible on any machine), floated only at the
    return boundary. Degenerate (collinear) systems raise.

    Returns {"intercept": float, "coef": {name: float}, "r2": float,
    "n": int}. The data-scale work is ONE aggregation
    (``linreg_sufficient_stats``); this solve is O(k³) driver-side
    arithmetic on a 1-row frame.
    """
    from fractions import Fraction

    names = list(features)
    row = linreg_sufficient_stats(df, features, target).collect()[0]
    g = {k: Fraction(int(row[k])) for k in row.asDict()}

    def cross(a: str, b: str) -> Fraction:
        return g.get(f"s_{a}_{b}", g.get(f"s_{b}_{a}"))

    k = len(names)
    # augmented [X'X | X'y], intercept first
    mat: list[list[Fraction]] = []
    mat.append([g["n"]] + [g[f"s_{n}"] for n in names] + [g["sy"]])
    for a in names:
        mat.append(
            [g[f"s_{a}"]]
            + [cross(a, b) for b in names]
            + [g[f"s_{a}_y"]]
        )
    dim = k + 1
    for col in range(dim):
        piv = next(
            (r for r in range(col, dim) if mat[r][col] != 0), None
        )
        if piv is None:
            raise ValueError("collinear features: singular normal equations")
        mat[col], mat[piv] = mat[piv], mat[col]
        pv = mat[col][col]
        mat[col] = [v / pv for v in mat[col]]
        for r in range(dim):
            if r != col and mat[r][col] != 0:
                f = mat[r][col]
                mat[r] = [v - f * w for v, w in zip(mat[r], mat[col])]
    beta = [mat[r][dim] for r in range(dim)]

    # R² from the same stats: SSE = y'y - β'X'y ; SST = y'y - (Σy)²/n
    xty = [g["sy"]] + [g[f"s_{a}_y"] for a in names]
    sse = g["syy"] - sum(b * v for b, v in zip(beta, xty))
    sst = g["syy"] - g["sy"] * g["sy"] / g["n"]
    r2 = float(1 - sse / sst) if sst != 0 else float("nan")
    return {
        "intercept": float(beta[0]),
        "coef": {n: float(b) for n, b in zip(names, beta[1:])},
        "r2": r2,
        "n": int(g["n"]),
    }
