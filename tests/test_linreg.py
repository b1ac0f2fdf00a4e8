"""Multivariate OLS: exact-rational solve vs numpy lstsq, recovery of
planted coefficients, collinearity refusal, and the one-scan shape of
the sufficient-statistics aggregation."""

import random

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.regression import (
    fit_linear,
    linreg_sufficient_stats,
)


def _toy(spark, n=400, seed=3):
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        x1 = rng.randrange(0, 100)
        x2 = rng.randrange(0, 50)
        noise = rng.randrange(-5, 6)
        y = 7 + 3 * x1 - 2 * x2 + noise
        rows.append((x1, x2, y))
    return spark.createDataFrame(rows, "x1 long, x2 long, y long")


def test_fit_linear_matches_numpy(spark):
    np = pytest.importorskip("numpy")
    df = _toy(spark)
    got = fit_linear(
        df, {"x1": F.col("x1"), "x2": F.col("x2")}, F.col("y")
    )
    rows = df.collect()
    A = np.array([[1.0, r.x1, r.x2] for r in rows])
    y = np.array([float(r.y) for r in rows])
    beta = np.linalg.lstsq(A, y, rcond=None)[0]
    assert got["intercept"] == pytest.approx(beta[0], abs=1e-8)
    assert got["coef"]["x1"] == pytest.approx(beta[1], abs=1e-8)
    assert got["coef"]["x2"] == pytest.approx(beta[2], abs=1e-8)
    assert got["n"] == 400


def test_fit_linear_exact_plane_r2_one(spark):
    """Noise-free plane: coefficients recovered exactly (rational
    solve, no float drift) and R^2 == 1."""
    rows = [(i % 20, (i * 7) % 13, 10 + 4 * (i % 20) - 3 * ((i * 7) % 13))
            for i in range(200)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    got = fit_linear(df, {"x1": F.col("x1"), "x2": F.col("x2")}, F.col("y"))
    assert got["intercept"] == pytest.approx(10.0, abs=1e-12)
    assert got["coef"]["x1"] == pytest.approx(4.0, abs=1e-12)
    assert got["coef"]["x2"] == pytest.approx(-3.0, abs=1e-12)
    assert got["r2"] == pytest.approx(1.0, abs=1e-12)


def test_fit_linear_rejects_collinear(spark):
    rows = [(i, 2 * i, i * 3) for i in range(50)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    with pytest.raises(ValueError, match="collinear"):
        fit_linear(df, {"x1": F.col("x1"), "x2": F.col("x2")}, F.col("y"))


def test_sufficient_stats_single_aggregate_plan(spark):
    """The stats frame is ONE aggregation over one scan — no join, no
    window, no second exchange after the partial/final agg pair."""
    df = _toy(spark, n=100)
    stats = linreg_sufficient_stats(
        df, {"x1": F.col("x1"), "x2": F.col("x2")}, F.col("y")
    )
    row = stats.collect()[0]
    assert int(row["n"]) == 100
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
    # null rows are dropped before aggregation (complete-case)
    df2 = spark.createDataFrame(
        [(1, 1, 1), (None, 2, 2)], "x1 long, x2 long, y long"
    )
    row2 = linreg_sufficient_stats(
        df2, {"x1": F.col("x1"), "x2": F.col("x2")}, F.col("y")
    ).collect()[0]
    assert int(row2["n"]) == 1


def test_long_product_tier_matches_decimal_and_guards(spark):
    """Round-9 fast tier: the guarded LONG products produce the SAME
    sufficient statistics as the decimal tier within the magnitude
    bound (both are exact integer arithmetic), and a value past
    floor(sqrt(2^63-1)) raises visibly instead of wrapping."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F
    from pyspark.sql.utils import CapturedException

    from smartbots_etl_facturas_spark.operators.profile import (
        LONG_PRODUCT_BOUND,
        corr_matrix,
    )
    from smartbots_etl_facturas_spark.operators.regression import (
        linreg_sufficient_stats,
    )

    df = spark.range(1000).select(
        (F.col("id") * 37 % 9973 - 5000).alias("a"),
        (F.col("id") * 91 % 7919 - 4000).alias("b"),
        (F.col("id") * 13 % 4999).alias("y"),
    )
    feats = {"a": F.col("a"), "b": F.col("b")}
    dec = linreg_sufficient_stats(df, feats, F.col("y")).collect()[0]
    fast = linreg_sufficient_stats(
        df, feats, F.col("y"), products="long"
    ).collect()[0]
    assert dec.asDict() == fast.asDict()

    cdec = {(r.col_x, r.col_y): (r.n, r.corr)
            for r in corr_matrix(df, feats).collect()}
    cfast = {(r.col_x, r.col_y): (r.n, r.corr)
             for r in corr_matrix(df, feats, products="long").collect()}
    assert cdec == cfast

    big = spark.range(3).select(
        (F.lit(LONG_PRODUCT_BOUND) + F.col("id")).alias("a"),
        F.col("id").alias("b"),
    )
    with pytest.raises((Py4JJavaError, CapturedException),
                       match="LONG"):
        corr_matrix(
            big, {"a": F.col("a"), "b": F.col("b")}, products="long"
        ).collect()
    # the decimal default stays safe at the same magnitudes (use the
    # stats frame: corr itself would hit the documented double-
    # cancellation 0/0 on a near-constant huge column, which is the
    # portable-expression tradeoff, not an overflow)
    row = linreg_sufficient_stats(
        big, {"a": F.col("a")}, F.col("b")
    ).collect()[0]
    assert int(row["s_a_a"]) == sum(
        (LONG_PRODUCT_BOUND + i) ** 2 for i in range(3)
    )
