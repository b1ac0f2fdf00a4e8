"""Distribution-drift measures between two cohorts of one table.

A 100 TB training pipeline re-ingests sources continuously; the
question "did this month's data move?" is a per-BIN comparison, not
a row-level diff. Two operators, both count-exact until the final
scalar expression so the DuckDB oracle reproduces them bit-for-bit:

``psi_bins``: Population Stability Index contributions per
equi-width bin. Rows are binned with pure column arithmetic (no
shuffle), counted per (bin, cohort) — ONE hash aggregation — and the
per-cohort totals arrive via a 1-row broadcast crossJoin (the repo's
bounded-normalizer pattern). Zero counts take the standard 0.5
pseudo-count so ln() stays finite; the per-bin contribution
(p-q)*ln(p/q) ships rounded, and the caller sums bins if it wants
the scalar PSI (bin count is fixed and tiny).

``chi_square_cells``: contingency cells of two categorical columns
with expected counts and chi-square contributions. Observed / row /
column / grand totals are four aggregations of the same counts frame
(the cells frame after the first groupBy is category-scale, so the
re-aggregations are metadata-sized); expected = row*col/grand is
computed per cell from EXACT longs, so no cross-partition float
summation order can perturb the result.

Both outputs are category/bin-scale — bounded regardless of input
rows — and contain no window, no driver loop, no data-scale collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["psi_bins", "chi_square_cells", "mi_cells"]


def _bin(col: Column, lo: float, width: float, nbins: int) -> Column:
    """Equi-width bin index 0..nbins-1, clamping out-of-range values
    into the edge bins (floor semantics match SQL floor()).

    NULL values land in bin 0: ``greatest`` skips nulls in BOTH Spark
    and DuckDB (so the oracle agrees), making a null indistinguishable
    from a below-range value. Callers who want nulls excluded must
    filter upstream — documented rather than changed (round-11 review)
    because the registered queries and the stream==batch twins pin
    this exact cross-engine arithmetic."""
    raw = F.floor((col - F.lit(lo)) / F.lit(width)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1))


def psi_bins(
    df: DataFrame,
    value_col: str,
    cohort: Column,
    lo: float,
    hi: float,
    nbins: int = 10,
) -> DataFrame:
    """(bin, n_a, n_b, psi_contrib) per equi-width bin of
    ``value_col`` over [lo, hi); ``cohort`` is a boolean Column
    (true = cohort A). Includes empty bins (0 counts) so the bin axis
    is always complete."""
    width = (hi - lo) / nbins
    counts = (
        df.withColumn("__bin", _bin(F.col(value_col), lo, width, nbins))
        .groupBy("__bin")
        .agg(
            F.sum(cohort.cast("long")).alias("n_a"),
            F.sum((~cohort).cast("long")).alias("n_b"),
        )
    )
    spark = df.sparkSession
    all_bins = spark.range(nbins).select(F.col("id").alias("bin"))
    counts = (
        all_bins.join(counts, all_bins.bin == counts.__bin, "left")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    totals = counts.agg(
        F.sum("n_a").alias("__tot_a"), F.sum("n_b").alias("__tot_b")
    )
    p = F.greatest(F.col("n_a").cast("double"), F.lit(0.5)) / F.col("__tot_a")
    q = F.greatest(F.col("n_b").cast("double"), F.lit(0.5)) / F.col("__tot_b")
    return (
        counts.crossJoin(F.broadcast(totals))  # 1-row normalizer
        .select(
            "bin",
            "n_a",
            "n_b",
            F.round((p - q) * F.log(p / q), 9).alias("psi_contrib"),
        )
    )


def chi_square_cells(df: DataFrame, x: str, y: str) -> DataFrame:
    """(x, y, observed, expected, chi2_contrib) per contingency cell
    of two categorical columns. Expected and the contribution are
    derived per cell from exact long totals (rounded at the ship
    boundary), so the result is reduction-order independent."""
    cells = df.groupBy(
        F.col(x).alias("x"), F.col(y).alias("y")
    ).agg(F.count(F.lit(1)).alias("observed"))
    row_tot = cells.groupBy("x").agg(F.sum("observed").alias("__rt"))
    col_tot = cells.groupBy("y").agg(F.sum("observed").alias("__ct"))
    grand = cells.agg(F.sum("observed").alias("__gt"))
    exp = (
        F.col("__rt").cast("double")
        * F.col("__ct").cast("double")
        / F.col("__gt").cast("double")
    )
    return (
        cells.join(F.broadcast(row_tot), "x")
        .join(F.broadcast(col_tot), "y")
        .crossJoin(F.broadcast(grand))  # 1-row normalizer
        .select(
            "x",
            "y",
            "observed",
            F.round(exp, 9).alias("expected"),
            F.round(
                (F.col("observed").cast("double") - exp) ** 2 / exp, 9
            ).alias("chi2_contrib"),
        )
    )


def mi_cells(df: DataFrame, x: str, y: str) -> DataFrame:
    """Mutual-information contributions per contingency cell of two
    categorical columns: (x, y, n_xy, mi_contrib) with mi_contrib =
    (n_xy/N)·ln(N·n_xy / (n_x·n_y)). Summing the (category-scale)
    cells gives I(X;Y); shipping contributions — same contract as
    ``chi_square_cells`` — keeps each double ONE expression over
    exact long counts, immune to cross-partition float-summation
    order.

    Same plan shape as the chi-square operator: one hash aggregation
    builds the cells, the margins re-aggregate that bounded frame and
    return as broadcast equi-joins, the grand total as a 1-row
    broadcast crossJoin. Every cell has n_xy >= 1 so the log is
    always finite.
    """
    cells = df.groupBy(
        F.col(x).alias("x"), F.col(y).alias("y")
    ).agg(F.count(F.lit(1)).alias("n_xy"))
    row_tot = cells.groupBy("x").agg(F.sum("n_xy").alias("__nx"))
    col_tot = cells.groupBy("y").agg(F.sum("n_xy").alias("__ny"))
    grand = cells.agg(F.sum("n_xy").alias("__n"))
    nd = F.col("__n").cast("double")
    cd = F.col("n_xy").cast("double")
    return (
        cells.join(F.broadcast(row_tot), "x")
        .join(F.broadcast(col_tot), "y")
        .crossJoin(F.broadcast(grand))  # 1-row normalizer
        .select(
            "x",
            "y",
            "n_xy",
            F.round(
                (cd / nd)
                * F.log(
                    nd * cd
                    / (F.col("__nx").cast("double")
                       * F.col("__ny").cast("double"))
                ),
                9,
            ).alias("mi_contrib"),
        )
    )
