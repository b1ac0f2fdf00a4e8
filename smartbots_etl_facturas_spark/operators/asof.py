"""As-of (point-in-time) join — a temporal operator Spark lacks.

For each left row, attach the payload of the *latest* right row with
the same key and ``right.ts <= left.ts`` (non-strict, matching DuckDB
``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts``); ``NULL`` payload
when no prior right row exists (left-outer semantics).

The reference has no temporal joins (SURVEY.md §2.3: "No
sort-merge/broadcast distinction, no theta/range/as-of joins") — this
is engine surface beyond the reference, motivated by the events
stream table: enrich each event with the most recent prior state
(last quote before a trade, last config before a request, ...).

Plan (the 100 TB shape): instead of a range join (O(n·m) explosion)
or per-key collect, both sides are unioned into ONE frame tagged by
side, shuffled ONCE on the key, sorted by (ts, side, tiebreak) within
each key partition, and the right payload is carried forward with
``last(..., ignorenulls=True)`` over a running window. Left rows then
filter out with their matched payload attached.

- exactly one shuffle (the window exchange); no broadcast needed, so
  neither side must fit in memory;
- no candidate explosion: cost is sort + linear scan per key
  partition, the same work a dedicated as-of merge would do;
- skewed keys behave like any window: AQE skew handling applies.

Tie semantics: right rows sort BEFORE the left row at an equal
timestamp (side 0 < 1), so an equal-ts right row is visible to the
left row. Among right duplicates at the same (key, ts), the greatest
``tiebreak`` value wins deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    tiebreak: str | None = None,
    prefix: str = "matched_",
    salt_partitions: int | None = None,
) -> DataFrame:
    """Left as-of join: latest right payload at-or-before each left row.

    Output = every left column, plus ``{prefix}{ts_col}`` (the matched
    right timestamp) and ``{prefix}{c}`` for each payload column —
    NULL when the key has no right row at or before the left ts.

    ``payload_cols`` defaults to every right column except the keys
    and the timestamp. ``tiebreak`` (a right column, e.g. an id)
    resolves right duplicates at the same (key, ts) to the greatest
    value; without it the winner among exact duplicates is undefined
    (same as DuckDB ASOF).

    ``salt_partitions`` (round-11): the carry-forward window's
    parallelism equals the KEY cardinality — right for per-user/
    per-device keys, a handful-of-tasks serialization for a
    low-cardinality key (3 currencies over a 100 TB fact). The as-of
    result is PER-LEFT-ROW independent, so the key group can be
    split: left rows spread across S salt buckets by a deterministic
    hash of the whole row, right rows REPLICATE to all S buckets, and
    the merge runs per (key, salt) — identical output, S× the
    parallelism, at the cost of an S× copy of the (small) right side.
    Use when keys ≪ parallelism and the right side is quote-table
    sized; leave None when the key itself distributes.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if salt_partitions is not None and salt_partitions < 1:
        raise ValueError("salt_partitions must be >= 1 (or None)")
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in keys and c != ts_col]
    carried = [ts_col, *payload_cols]

    l_types = dict(left.dtypes)
    r_types = dict(right.dtypes)
    left_payload = [c for c in left.columns if c not in keys and c != ts_col]

    tb_left = F.lit(0).cast("long")
    tb_right = (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long"))

    l_side = left.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        tb_left.alias("__tb"),
        *[F.col(c).alias(f"__l_{c}") for c in left_payload],
        *[F.lit(None).cast(r_types[c]).alias(f"__r_{c}") for c in carried],
    )
    r_side = right.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        tb_right.alias("__tb"),
        *[F.lit(None).cast(l_types[c]).alias(f"__l_{c}") for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )

    part_keys: list = list(keys)
    if salt_partitions and salt_partitions > 1:
        s = int(salt_partitions)
        # left rows spread by a whole-row hash (any even spread is
        # correct — each left row's answer is independent); right rows
        # post once per bucket so every bucket sees the full quote
        # stream. Right rows sort before left at equal ts (side 0 < 1),
        # so tie semantics are unchanged within every bucket.
        l_side = l_side.withColumn(
            "__salt", F.pmod(F.xxhash64(*l_side.columns), F.lit(s))
        )
        r_side = r_side.withColumn(
            "__salt",
            F.explode(F.sequence(F.lit(0), F.lit(s - 1)).cast("array<long>")),
        )
        part_keys.append("__salt")
    w = (
        Window.partitionBy(*part_keys)
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_side.unionByName(r_side).select(
        "*",
        *[F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{prefix}{c}")
          for c in carried],
    )
    return matched.filter(F.col("__side") == 1).select(
        *keys,
        F.col("__ts").alias(ts_col),
        *[F.col(f"__l_{c}").alias(c) for c in left_payload],
        *[F.col(f"{prefix}{c}") for c in carried],
    )
