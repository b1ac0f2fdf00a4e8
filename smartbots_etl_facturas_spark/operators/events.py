"""Product-analytics operators over an event stream table: ordered
funnel conversion and cohort retention — the two queries every
events warehouse runs daily.

Scale design: both operators are per-user aggregations and equi-joins
on the user key (never global windows, never driver collects); a
funnel of k steps is ONE scan + ONE user-keyed aggregation folding
the funnel state over each user's time-sorted step events, and
retention is two aggregations plus one equi-join. All shuffles are
keyed on user/cohort — the same plan shape at any event volume, with
AQE absorbing hot-user skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: count users completing each step IN ORDER.

    A user completes step i at the EARLIEST event of type ``steps[i]``
    that is STRICTLY AFTER their step-(i-1) completion time (the
    standard ordered-funnel semantics; simultaneous events do not
    satisfy "after").

    Output: one row per step ``(stage, step_event, n_users)`` with
    ``stage`` 1-based; ``n_users`` is non-increasing by construction.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    spark = df.sparkSession
    k = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    ts_type = df.schema[ts_col].dataType

    # ONE scan + ONE user-keyed shuffle: collect each user's step-typed
    # events time-sorted and fold the funnel state over them (greedy
    # advance at the earliest strictly-later matching event == the
    # sequential min-after-min chain, but without re-evaluating the
    # whole join chain per stage — the old shape re-scanned events
    # O(k^2) times in one plan). Per-user array size is bounded by that
    # user's step-typed activity, the same bound sessionization needs.
    evs = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("t"), F.col(type_col).alias("ty")
        ).alias("__e"),
    )
    init = F.struct(
        F.lit(0).cast("int").alias("s"), F.lit(None).cast(ts_type).alias("t")
    )
    # F.get is 0-based and null-safe past the end (element_at would
    # throw under ANSI once s == k); null == ty is null -> no advance.
    fold = F.aggregate(
        F.sort_array(F.collect_list("__e")),
        init,
        lambda st, e: F.when(
            (F.get(step_arr, st["s"]) == e["ty"])
            & (st["t"].isNull() | (e["t"] > st["t"])),
            F.struct((st["s"] + F.lit(1)).cast("int").alias("s"),
                     e["t"].alias("t")),
        ).otherwise(st),
    )["s"]
    per_user = evs.groupBy(user_col).agg(fold.alias("__max"))
    reached = (
        per_user.filter(F.col("__max") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("__max"))).alias("__s"))
        .select(F.col("__s").cast("long").alias("stage"))
    )
    hist = reached.groupBy("stage").agg(F.count(F.lit(1)).alias("__n"))
    stages = spark.range(1, k + 1).select(F.col("id").alias("stage"))
    return (
        stages.join(F.broadcast(hist), "stage", "left")
        .select(
            "stage",
            F.element_at(step_arr, F.col("stage").cast("int")).alias("step_event"),
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_users"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_ns: int = 7 * 24 * 3600 * 1_000_000_000,
) -> DataFrame:
    """Cohort retention: users grouped by first-activity bucket
    (default weekly), counted in each later bucket they were active.

    Output: ``(cohort_bucket, bucket_offset, n_users)`` where
    ``cohort_bucket`` is the cohort's bucket index (ts // bucket_ns)
    and ``bucket_offset`` >= 0 counts buckets since the cohort's
    first. ``n_users`` at offset 0 is the cohort size.
    """
    # integer division — ts is int64 nanos, which exceeds double's
    # exact range, so a float divide-then-truncate would misbucket
    bucket = F.expr(f"{ts_col} div {bucket_ns}L").cast("long")
    activity = df.select(
        F.col(user_col), bucket.alias("__bucket")
    ).distinct()
    cohorts = activity.groupBy(user_col).agg(
        F.min("__bucket").alias("cohort_bucket")
    )
    return (
        activity.join(cohorts, user_col)
        .groupBy(
            "cohort_bucket",
            (F.col("__bucket") - F.col("cohort_bucket")).alias("bucket_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts/probabilities over each
    user's time-ordered event sequence: for every observed
    ``(from_type, to_type)`` adjacency, the transition count and its
    row-normalized probability.

    Probabilities are exact integer micro-units —
    ``prob_micros = (n · 1e6) div row_total`` — so the matrix is
    bit-identical across engines (the :mod:`.graph` integer-nanos
    discipline; float division would round non-portably near ties).
    ``tie_col`` makes the per-user ordering total, so lag() is
    deterministic even when one user has same-timestamp events.

    Plan: one user-keyed window (the lag), one (from,to)-keyed count
    aggregation, one from-keyed total aggregation + equi-join — all
    shuffles keyed, matrix size is |types|², never corpus-scale.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(tie_col))
    )
    pairs = (
        df.select(
            F.col(user_col), F.col(ts_col), F.col(tie_col),
            F.col(type_col).alias("to_type"),
        )
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("(n * 1000000) div __tot").cast("long").alias("prob_micros"),
        )
    )
