"""Product-analytics operators over an event stream table: ordered
funnel conversion and cohort retention — the two queries every
events warehouse runs daily.

Scale design: both operators are chains of per-user aggregations and
equi-joins on the user key (never global windows, never driver
collects); a funnel of k steps is k small aggregation stages joined
on user_id, and retention is two aggregations plus one equi-join.
All shuffles are keyed on user/cohort — the same plan shape at any
event volume, with AQE absorbing hot-user skew.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
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
    stage_counts = []
    reached = None  # DataFrame[user_col, __t] — completion time so far
    for i, ev in enumerate(steps):
        hits = df.filter(F.col(type_col) == ev).select(
            F.col(user_col), F.col(ts_col).alias("__ts")
        )
        if reached is None:
            reached = hits.groupBy(user_col).agg(F.min("__ts").alias("__t"))
        else:
            reached = (
                hits.join(reached, user_col)
                .filter(F.col("__ts") > F.col("__t"))
                .groupBy(user_col)
                .agg(F.min("__ts").alias("__t"))
            )
        stage_counts.append(
            reached.agg(
                F.lit(i + 1).cast("long").alias("stage"),
                F.lit(ev).alias("step_event"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    return reduce(DataFrame.unionByName, stage_counts)


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
