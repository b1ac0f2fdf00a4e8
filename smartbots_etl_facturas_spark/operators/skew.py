"""Skew mitigation — salting for hot keys.

At 100 TB a handful of hot keys (one carrier with 30% of invoices,
one document hash duplicated millions of times) turns a shuffle into
a single straggler task. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in the session factory)
handles sort-merge JOIN skew at runtime; these helpers cover the
cases AQE does not: skewed AGGREGATIONS, and broadcast-averse joins
where one side's hot keys must be fanned out explicitly.

Both are pure DataFrame rewrites — deterministic results, verified
equal to the unsalted plans in tests/test_skew.py.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_salt_buckets(
    df: DataFrame,
    keys: Sequence[str],
    target_parallelism: int | None = None,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> int:
    """Derive the salt width from the OBSERVED key histogram, so the
    same call is correct at any skew instead of trusting a fixed
    guess.

    With the hottest key holding share ``s`` of the rows, an unsalted
    shuffle hands one reducer ``s·N`` rows against the ideal ``N/P``
    (P = target parallelism) — so the hot key needs to spread over
    ``ceil(s·P)`` reducers to even out, clamped to [1, P]. A uniform
    key distribution yields 1 (no salting — don't pay the fan-out when
    there is no straggler).

    The histogram is a ``groupBy(keys).count()`` — itself skew-safe
    (map-side partial aggregation collapses the hot key before the
    shuffle), so tuning never hits the straggler it is sizing.
    ``sample_fraction`` bounds the tuning pass at very large N
    (deterministic: fixed ``seed``); share estimates only need ~1%
    precision, which a 1% sample of any realistically hot key gives.
    """
    keys = list(keys)
    sdf = df.select(*keys)
    if sample_fraction is not None:
        sdf = sdf.sample(fraction=sample_fraction, seed=seed)
    p = target_parallelism or df.sparkSession.sparkContext.defaultParallelism
    row = (
        sdf.groupBy(*keys)
        .count()
        .agg(F.max("count").alias("top"), F.sum("count").alias("total"))
        .collect()[0]
    )
    if not row.total:
        return 1
    share = row.top / row.total
    return max(1, min(math.ceil(share * p), p))


def _resolve_buckets(salt_buckets, df, keys, sample_fraction=None) -> int:
    if salt_buckets == "auto":
        return auto_salt_buckets(df, keys, sample_fraction=sample_fraction)
    if not isinstance(salt_buckets, int) or salt_buckets < 1:
        raise ValueError(f"salt_buckets must be a positive int or 'auto', "
                         f"got {salt_buckets!r}")
    return salt_buckets


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int | str = 16,
    salt_col: str | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Two-stage aggregation: (keys, salt) partial → keys final.

    ``aggs`` maps output name → (input column, fn) with fn in
    {"sum", "count", "min", "max"} — the re-aggregatable functions
    (sum of partial sums, sum of partial counts, min of mins, max of
    maxes). The salt spreads one hot key over ``salt_buckets``
    reducers in stage 1; stage 2 combines the (few) partials per key.

    ``salt_col``: optional existing column to salt by (deterministic,
    e.g. a line number); default derives the salt from a hash of the
    whole row via ``spark_partition_id``-free stable expression so
    results stay reproducible under retries.

    ``salt_buckets="auto"`` sizes the width from the observed key
    histogram (:func:`auto_salt_buckets`, optionally sampled via
    ``sample_fraction``) — 1 (no fan-out) on uniform keys, ~share×P
    on hot ones.
    """
    keys = list(keys)
    salt_buckets = _resolve_buckets(salt_buckets, df, keys, sample_fraction)
    salt = (
        F.col(salt_col) % salt_buckets
        if salt_col
        else F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets))
    )
    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        p = f"__p_{out}"
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-reaggregatable fn {fn!r}")
    staged = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return staged.groupBy(*keys).agg(*final_exprs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_buckets: int | str = 16,
    how: str = "inner",
    sample_fraction: float | None = None,
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated ``salt_buckets``× (explode), so each hot key's rows
    spread over ``salt_buckets`` join tasks.

    Use when the small side is too big to broadcast but small enough
    to replicate; for genuinely large-large skew, prefer AQE skew-join
    splitting. Only the listed equi ``keys`` are supported.

    ``salt_buckets="auto"`` sizes the width from the skewed side's
    observed key histogram (:func:`auto_salt_buckets`) — replication
    cost is only paid in proportion to the measured skew.
    """
    keys = list(keys)
    salt_buckets = _resolve_buckets(salt_buckets, skewed, keys, sample_fraction)
    lhs = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(k) for k in skewed.columns]), F.lit(salt_buckets))
    )
    rhs = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    return lhs.join(rhs, on=keys + ["__salt"], how=how).drop("__salt")


def key_skew_profile(df: DataFrame, key: str, k: int = 20) -> DataFrame:
    """Heavy-hitter profile of a prospective join/agg key: the top
    ``k`` keys by row count with each key's share of the table —
    (key, cnt, share) — the measurement that drives
    ``auto_salt_buckets`` and broadcast-vs-shuffle decisions.

    Plan shape: ``groupBy(key).count()`` is itself skew-safe
    (map-side partials collapse the hot key before the shuffle);
    the top-k is ``orderBy(...).limit(k)`` — Spark's TakeOrdered,
    a per-partition k-heap + single k-row merge, never a global
    sort — and the total arrives as a 1-row broadcast crossJoin.
    Ties at the boundary are broken by the key value, so the result
    is deterministic. Output is k rows regardless of input size.
    """
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    top = counts.orderBy(F.desc("cnt"), F.col("key")).limit(k)
    return (
        top.crossJoin(F.broadcast(total))  # 1-row normalizer
        .select(
            "key",
            "cnt",
            F.round(
                F.col("cnt").cast("double") / F.col("__total").cast("double"),
                9,
            ).alias("share"),
        )
    )
