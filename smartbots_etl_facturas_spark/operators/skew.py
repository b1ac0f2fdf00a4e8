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

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_col: str | None = None,
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
    """
    keys = list(keys)
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
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated ``salt_buckets``× (explode), so each hot key's rows
    spread over ``salt_buckets`` join tasks.

    Use when the small side is too big to broadcast but small enough
    to replicate; for genuinely large-large skew, prefer AQE skew-join
    splitting. Only the listed equi ``keys`` are supported.
    """
    keys = list(keys)
    lhs = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(k) for k in skewed.columns]), F.lit(salt_buckets))
    )
    rhs = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    return lhs.join(rhs, on=keys + ["__salt"], how=how).drop("__salt")
