"""Data-quality assertion suite and table diff — the dbt-tests /
datafold-shaped tooling an analytics engine ships alongside its
pipelines.

Checks are DATAFLOW, not driver assertions: each check is one
aggregation producing (check_name, n_violations, passed), unioned
into a single small report frame — so a 100 TB table's entire quality
suite is a handful of scans/aggs with map-side combine, and the
report can gate a publish (sinks/staged.publish(check=...)).

``table_diff`` reconciles two snapshots by primary key: full-outer
join on the PK, value columns compared null-safely, one row per
status with counts — the added/removed/changed/unchanged summary
every migration and backfill wants before a cutover.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _report(name: str, violations) -> DataFrame:
    return violations.agg(
        F.lit(name).alias("check_name"),
        F.count(F.lit(1)).alias("n_violations"),
        (F.count(F.lit(1)) == 0).alias("passed"),
    )


def check_unique(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Violations = rows beyond the first per key (duplicate mass)."""
    dupes = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select((F.col("__n") - 1).alias("__extra"))
    )
    return dupes.agg(
        F.lit("unique:" + ",".join(cols)).alias("check_name"),
        F.coalesce(F.sum("__extra"), F.lit(0)).cast("long").alias("n_violations"),
        (F.coalesce(F.sum("__extra"), F.lit(0)) == 0).alias("passed"),
    )


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    return _report(f"not_null:{col}", df.filter(F.col(col).isNull()))


def check_accepted_values(df: DataFrame, col: str, values: Sequence) -> DataFrame:
    return _report(
        f"accepted_values:{col}",
        df.filter(~F.col(col).isin(list(values)) | F.col(col).isNull()),
    )


def check_referential(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Violations = child rows whose key has no parent (anti join —
    broadcastable parent key set)."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return _report(f"referential:{child_key}", orphans)


def run_checks(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the per-check reports into one frame."""
    if not checks:
        raise ValueError("no checks given")
    return reduce(DataFrame.unionByName, checks)


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """PK-level reconciliation of two snapshots.

    Output: one row per status of ``added`` (right only), ``removed``
    (left only), ``changed`` (both, any compare col differs —
    null-safe), ``unchanged`` — with row counts. Statuses with zero
    rows are still emitted (a report consumer should not need to
    infer absence)."""
    keys = list(keys)
    l = left.select(
        *keys, *[F.col(c).alias(f"__l_{c}") for c in compare_cols],
        F.lit(True).alias("__in_l"),
    )
    r = right.select(
        *keys, *[F.col(c).alias(f"__r_{c}") for c in compare_cols],
        F.lit(True).alias("__in_r"),
    )
    joined = l.join(r, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
    status = (
        F.when(F.col("__in_l").isNull(), "added")
        .when(F.col("__in_r").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    counted = joined.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    statuses = left.sparkSession.createDataFrame(
        [("added",), ("removed",), ("changed",), ("unchanged",)], ["status"]
    )
    return (
        statuses.join(counted, "status", "left")
        .select("status", F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows"))
    )


def impute_group_median(
    df: DataFrame,
    key: str,
    value_col: str,
    order_tiebreak: Sequence[str],
) -> DataFrame:
    """Data repair: fill NULLs in ``value_col`` with the EXACT median
    of the column's non-null values within the same ``key`` group —
    the standard imputation step before any distance/aggregate
    modeling, with the engine's determinism discipline: the median is
    the VALUE at rank ceil(n/2) under a total order (``value_col``
    then ``order_tiebreak``), pure integer rank arithmetic, no
    interpolation — so the filled value is an exact number both
    engines agree on (the mad_outliers recipe, reused for repair).
    ``order_tiebreak`` is kept for API continuity but cannot change
    the result: the value AT a rank is tie-break-independent (only
    ties among equal values reorder).

    Plan shape (histogram selection — orderstats.py:
    group_quantile_values): the non-null rows are reduced by ONE
    map-side-combinable ``groupBy(key, value).count()``; the
    cumulative window runs on that (key × distinct-value)-bounded
    frame, NEVER on the data. The previous key-partitioned data rank
    put each group's every row on one task — with key cardinality ≪
    parallelism (e.g. 6 returnflag|linestatus groups over a 100 TB
    fact) that is a single-task sort of the corpus, the hot-group
    cliff topk_per_group documents. Medians join back per key
    (broadcast-scale frame) and the fill is a coalesce. Output =
    input columns + ``was_imputed``; rows in a group with NO
    observed values keep their NULL (flag still true) rather than
    inventing a number.
    """
    from smartbots_etl_facturas_spark.operators.orderstats import (
        group_quantile_values,
    )

    med = group_quantile_values(
        df, [key], value_col, [("__med", 1, 2)]
    ).select(key, "__med")
    return (
        df.join(med, key, "left")
        .withColumn("was_imputed", F.col(value_col).isNull())
        .withColumn(value_col, F.coalesce(F.col(value_col), F.col("__med")))
        .drop("__med")
    )
