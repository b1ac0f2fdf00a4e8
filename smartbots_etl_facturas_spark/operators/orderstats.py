"""Exact distributed order statistics WITHOUT a global sort.

The classic histogram-selection scheme: aggregate the corpus to one
count per DISTINCT VALUE (a keyed map-side-combining shuffle), take a
cumulative sum over that reduced frame, and select each requested
quantile as the smallest value whose cumulative count reaches its
target rank. The global window runs on the distinct-VALUE frame —
bounded by the value domain (e.g. 50 quantity levels), not the corpus
— the same reduced-frame discipline as ``vocab_coverage``; the corpus
itself is touched by exactly one aggregation pass.

This is the exact complement to ``approx_percentile_sketch``: sketches
for wide domains, histogram selection when the domain is bounded —
which at 100 TB is the common case for coded/categorical/integer
measures (quantities, statuses, bucketed latencies).

The bounded-domain assumption is ENFORCED, not hoped for (round-9):
the distinct-value count per group rides the same window pass, and a
group whose domain exceeds ``max_domain_per_key`` raises a
USER_RAISED_EXCEPTION naming the KLL tier at execution time — a
caller profiling a continuous double gets a visible failure with the
fix in the message instead of silently recreating the hot-group
window this rewrite removed, one level down. An automatic KLL
dispatch was deliberately rejected: these operators are EXACT and
oracle-checked; switching to an approximation behind the caller's
back would change answers silently.

Cross-engine determinism: ranks are exact integers — for probability
num/den the target rank is ``ceil(n·num/den)`` computed as
``(n·num + den - 1) div den`` — matching SQL ``quantile_disc``
semantics (lower interpolation, 1-based ceil rank) with zero float
arithmetic anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: distinct values per group above which exact histogram selection
#: refuses to run: the reduced frame's per-group window sorts this
#: many rows on ONE task, so the limit mirrors the measured
#: single-task window crossover (ranking.SMALL_FRAME_ROWS).
MAX_DOMAIN_PER_KEY = 2_000_000


def _domain_guarded_n(n: Column, nv: Column, limit: int | None,
                      where: str) -> Column:
    """``n``, or a raised USER_RAISED_EXCEPTION at execution time when
    the group's distinct-value count ``nv`` exceeds ``limit``. The
    guard wraps the total count every quantile rank derives from, so
    column pruning can never drop it; evaluation is lazy (the error
    branch costs nothing when the domain is bounded)."""
    if limit is None:
        return n
    msg = (
        f"{where}: a group has more than {limit} distinct values — "
        "exact histogram selection would sort a data-scale frame on "
        "one task. Use the KLL tier for wide/continuous domains "
        "(quantiles.kll_group_quantiles per key, "
        "approx_percentile_sketch globally), or raise "
        "max_domain_per_key explicitly."
    )
    return F.when(nv <= F.lit(limit), n).otherwise(
        F.raise_error(F.lit(msg)).cast("long")
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: Sequence[tuple[str, int, int]] = (
        ("p25", 1, 4),
        ("p50", 1, 2),
        ("p75", 3, 4),
        ("p90", 9, 10),
        ("p99", 99, 100),
    ),
    max_domain_per_key: int | None = MAX_DOMAIN_PER_KEY,
) -> DataFrame:
    """Exact quantiles of ``value_col`` (orderable, bounded-domain).

    ``probs`` are (label, numerator, denominator) rationals so the
    rank arithmetic stays integer-exact. Returns one row per label:
    ``(quantile, value)`` where value is the smallest v with
    cumulative count >= ceil(n·num/den) — ``quantile_disc``
    semantics. NULL values are excluded (SQL aggregate convention).
    """
    spark = df.sparkSession
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    cum = counts.withColumn("cum", F.sum("c").over(w))
    total = counts.agg(
        F.sum("c").cast("long").alias("__n_raw"),
        F.count(F.lit(1)).alias("__nv"),
    ).select(
        _domain_guarded_n(
            F.col("__n_raw"), F.col("__nv"), max_domain_per_key,
            "exact_quantiles",
        ).alias("__n")
    )
    pframe = spark.createDataFrame(
        [(lbl, num, den) for lbl, num, den in probs],
        ["quantile", "__num", "__den"],
    )
    ranks = pframe.crossJoin(F.broadcast(total)).select(
        "quantile",
        F.expr("(__n * __num + __den - 1) div __den").alias("__rank"),
    )
    return (
        cum.crossJoin(F.broadcast(ranks))
        .filter(F.col("cum") >= F.col("__rank"))
        .groupBy("quantile")
        .agg(F.min("v").alias("value"))
    )


def group_quantile_values(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    probs: Sequence[tuple[str, int, int]],
    max_domain_per_key: int | None = MAX_DOMAIN_PER_KEY,
) -> DataFrame:
    """Per-key exact quantile VALUES by histogram selection — the
    grouped form of ``exact_quantiles``, and the scale-safe
    replacement for ``Window.partitionBy(key).orderBy(value)`` data
    ranks when the key cardinality is far below the parallelism.

    A fact-scale rank window puts an ENTIRE group's rows on one task
    — with ~6 groups the whole corpus sorts on ≤6 tasks, the exact
    hot-group cliff ``topk_per_group`` documents. Here the corpus is
    touched by ONE map-side-combinable aggregation
    (``groupBy(keys, value).count()``); every window after that runs
    on the reduced (key × distinct-value) frame, bounded by the value
    domain, not the row count.

    ``probs`` are (out_column, numerator, denominator) rationals; the
    selected value is the smallest v whose cumulative count reaches
    rank ceil(n·num/den), computed as ``(n·num + den - 1) div den`` —
    pure integer arithmetic, identical to ``quantile_disc`` and to
    the rank-window convention ``rk == ceil(n·q)`` (the value at a
    rank never depends on the tie-break order, only ties among EQUAL
    values are reordered). NULL values are excluded.

    Returns one row per key: ``(*keys, <label...>, __n)`` where
    ``__n`` is the group's non-null count.
    """
    key_cols = [F.col(k) for k in keys]
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*keys)
    cum = counts.select(
        *keys,
        "__v",
        F.sum("__c").over(w_cum).alias("__cum"),
        _domain_guarded_n(
            F.sum("__c").over(w_tot),
            F.count(F.lit(1)).over(w_tot),
            max_domain_per_key,
            "group_quantile_values",
        ).alias("__n"),
    )
    aggs = []
    for label, num, den in probs:
        # integer ceil(n*num/den): (n*num + den - 1) div den
        rank = F.expr(f"(__n * {int(num)} + {int(den) - 1}) div {int(den)}")
        aggs.append(
            F.min(F.when(F.col("__cum") >= rank, F.col("__v"))).alias(label)
        )
    aggs.append(F.max("__n").alias("__n"))
    return cum.groupBy(*keys).agg(*aggs)


def group_equi_depth_bins(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_bins: int = 10,
    max_domain_per_key: int | None = MAX_DOMAIN_PER_KEY,
) -> DataFrame:
    """Per-key equi-depth bin PROFILE (count/min/max per NTILE bucket)
    by histogram selection — the scale-safe replacement for
    ``ntile(B) OVER (PARTITION BY key ORDER BY value)`` followed by a
    per-bin rollup, when the key cardinality is far below the
    parallelism.

    NTILE itself needs a per-row bucket label, hence a total order —
    but the PROFILE (per-bucket n / v_min / v_max) is fully determined
    by per-VALUE cumulative counts, because NTILE's bucket boundaries
    are pure rank arithmetic: with n rows and B buckets, bucket b
    (1-based) covers ranks ``(b-1)·q + min(b-1, r) + 1 .. b·q +
    min(b, r)`` where ``q = n div B``, ``r = n mod B`` — and the value
    at any rank k is the smallest v whose cumulative count reaches k.
    Tie-break order inside equal values can move WHICH row lands in a
    straddling bucket, but never the bucket's count or its min/max
    VALUE, so the profile is tie-order independent (and therefore
    engine-portable without a tie column).

    The corpus is touched by ONE map-side-combinable
    ``groupBy(keys, value).count()``; the cumulative window and the
    B-row bin-bounds frame both live on the reduced
    (key × distinct-value) frame, domain-guarded like
    :func:`group_quantile_values`. Buckets that NTILE would leave
    empty (n < B) are omitted, matching the windowed rollup exactly.

    Returns one row per (key, bin) with ``bin`` in 1..B:
    ``(*keys, bin, n, v_min, v_max)``.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    key_cols = [F.col(k) for k in keys]
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        *keys,
        "__v",
        F.sum("__c").over(w_cum).alias("__cum"),
    )
    # per-key bin bounds: B rows per key, derived from the group total
    # alone — a frame of (|keys| × B) rows, joined back onto the
    # reduced cumulative frame (both bounded by the value domain).
    # The domain guard wraps the total every bin bound derives from,
    # so column pruning can never drop it (group_quantile_values'
    # discipline).
    totals = counts.groupBy(*keys).agg(
        F.sum("__c").alias("__n_raw"),
        F.count(F.lit(1)).alias("__nv"),
    ).select(
        *keys,
        _domain_guarded_n(
            F.col("__n_raw"), F.col("__nv"), max_domain_per_key,
            "group_equi_depth_bins",
        ).alias("__n"),
    )
    b = F.col("__bin")
    q = F.expr(f"__n div {int(n_bins)}")
    r = F.expr(f"__n % {int(n_bins)}")
    bins = (
        totals.select(
            *keys,
            F.explode(F.sequence(F.lit(1), F.lit(int(n_bins)))).alias("__bin"),
            "__n",
        )
        .select(
            *keys,
            "__bin",
            ((b - 1) * q + F.least(b - 1, r) + 1).alias("__start"),
            (b * q + F.least(b, r)).alias("__end"),
        )
        .filter(F.col("__end") >= F.col("__start"))  # NTILE emits no empty bins
    )
    joined = cum.join(bins, list(keys))
    return (
        joined.groupBy(*keys, F.col("__bin").alias("bin"))
        .agg(
            F.max(F.col("__end") - F.col("__start") + 1).alias("n"),
            F.min(F.when(F.col("__cum") >= F.col("__start"), F.col("__v"))
                  ).alias("v_min"),
            F.min(F.when(F.col("__cum") >= F.col("__end"), F.col("__v"))
                  ).alias("v_max"),
        )
    )
