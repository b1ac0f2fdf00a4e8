"""Distributed global ranking: total-order row numbers, running sums
and ntile buckets WITHOUT a single-partition window.

``Window.orderBy(...)`` with no partition key collapses the whole
frame into ONE task — the classic scale cliff: fine on a
customer-scale aggregate at sf0.1, a straggler at a 100M-customer
rank. The standard two-pass rewrite (the same scheme Spark's own
sort and zipWithIndex use):

  1. ``repartitionByRange(n, *order)`` — Spark samples the sort key
     and assigns contiguous key ranges to partitions 0..n-1 in order
     (ascending partition id == ascending range position).
  2. The frame is ``localCheckpoint``-pinned. REQUIRED for
     correctness, not a perf nicety: the range partitioner samples
     bounds per job, so without materialization the offsets job and
     the output job could see different partition assignments.
  3. Per-partition local ``row_number``/running sums under
     ``Window.partitionBy(partition_id)`` — parallel windows, no
     global collapse.
  4. Per-partition (count, sum) totals — ONE bounded driver collect
     of n_partitions rows (cluster-parallelism-scale metadata, the
     repo's bounded-collect policy) — cumulated into offsets and
     broadcast-joined back.

Global rank = local rank + offset; global running sum = local
running sum + sum-offset. Exact for any TOTAL order (callers must
tie-break to uniqueness, which every registered caller already does
for cross-engine determinism); with a total order no two rows share
a key, so range boundaries cannot split a tie group.

ADAPTIVE SMALL-FRAME TIER (round 8): the two-pass scheme costs a
fixed ~0.4-0.6 s of jobs (persist + range sampling + shuffle +
checkpoint + offsets collect) regardless of frame size — pure
overhead when the frame is small. Below ``SMALL_FRAME_ROWS``
(measured crossover on local[32]: single-task window beats two-pass
under ~2-3M rows; 1M: 1.1 s vs 1.8 s, 4M: 4.5 s vs 3.8 s — PERF.md
round 8) the rank runs as ONE window partitioned by a constant. That
single task is bounded BY CONSTRUCTION (the tier engages only after
counting the frame), unlike the accidental global windows the plan
doctor trips on — which is why the tier partitions by a literal
rather than leaving the spec empty: the doctor's unpartitioned-
window tripwire stays armed for windows whose input size nobody
measured. Results are bit-identical across tiers (exact integer rank
arithmetic both ways).

ntile is derived from the global rank in closed form (matching SQL
NTILE's first-buckets-get-the-remainder contract) instead of its own
window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "SMALL_FRAME_ROWS",
    "global_order_index",
    "multi_order_index",
    "ntile_from_rank",
    "topk_per_group",
]

# measured single-task-window vs two-pass crossover on local[32]
# (see module docstring); frames at or below this row count rank in
# one bounded task, larger frames take the two-pass scheme
SMALL_FRAME_ROWS = 2_000_000


def global_order_index(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    cumsum_cols: dict[str, str] | None = None,
    total_count_col: str | None = None,
    total_sum_cols: dict[str, str] | None = None,
    partitions: int | None = None,
    small_frame_threshold: int | None = None,
) -> DataFrame:
    """``df`` + ``rank_col`` (1-based global row_number under the
    total order ``order``) without a global window.

    ``cumsum_cols``: {out_name: source_col} global running sums in
    the same order (inclusive of the current row).
    ``total_count_col`` / ``total_sum_cols``: optionally attach the
    driver-known grand totals as LITERAL columns — they fall out of
    the offsets pass for free, replacing the 1-row normalizer
    crossJoin that a separate total aggregation would need.
    ``small_frame_threshold``: row count at or under which the rank
    runs as one constant-partitioned window instead of the two-pass
    scheme (see module docstring); ``None`` = ``SMALL_FRAME_ROWS``,
    ``0`` forces the two-pass path (and skips the count action).
    """
    cumsum_cols = dict(cumsum_cols or {})
    total_sum_cols = dict(total_sum_cols or {})
    sum_srcs = sorted(set(cumsum_cols.values()) | set(total_sum_cols.values()))
    threshold = (
        SMALL_FRAME_ROWS if small_frame_threshold is None
        else small_frame_threshold
    )
    n_part = partitions or df.sparkSession.sparkContext.defaultParallelism
    # repartitionByRange runs TWO jobs over the input lineage (range-
    # bound sampling, then the shuffle); when the input is itself an
    # aggregation that means two full upstream scans. Cache across the
    # pair, release once the checkpoint has materialized.
    cached = df.persist()
    n_rows = cached.count() if threshold > 0 else None
    if n_rows is not None and n_rows <= threshold:
        # small-frame tier: frame measured ≤ threshold — one bounded
        # single-task window beats the two-pass fixed job overhead
        try:
            sums = {}
            if sum_srcs:
                row = cached.agg(
                    *[F.sum(c).cast("long").alias(c) for c in sum_srcs]
                ).collect()[0]
                sums = {c: row[c] or 0 for c in sum_srcs}
            pinned = cached.withColumn("__one", F.lit(0)).localCheckpoint(
                eager=True
            )
        finally:
            cached.unpersist()
        w = Window.partitionBy("__one").orderBy(*order)
        out = pinned.withColumn(
            rank_col, F.row_number().over(w).cast("long")
        )
        for name, src in cumsum_cols.items():
            out = out.withColumn(
                name,
                F.sum(src).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ).cast("long"),
            )
        if total_count_col:
            out = out.withColumn(
                total_count_col, F.lit(n_rows).cast("long")
            )
        for name, src in total_sum_cols.items():
            out = out.withColumn(name, F.lit(sums[src]).cast("long"))
        return out.drop("__one")
    try:
        ranged = (
            cached.repartitionByRange(n_part, *order)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=True)
        )
    finally:
        cached.unpersist()
    # bounded driver read: one row per PARTITION (parallelism-scale,
    # not data-scale)
    stats = ranged.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[F.sum(c).cast("long").alias(f"__s_{c}") for c in sum_srcs],
    ).collect()
    stats.sort(key=lambda r: r["__pid"])
    rows, run_cnt = [], 0
    run_sum = {c: 0 for c in sum_srcs}
    for r in stats:
        rows.append((r["__pid"], run_cnt, *[run_sum[c] for c in sum_srcs]))
        run_cnt += r["__cnt"]
        for c in sum_srcs:
            run_sum[c] += r[f"__s_{c}"] or 0
    off_schema = "__pid int, __off_cnt long" + "".join(
        f", __off_{c} long" for c in sum_srcs
    )
    offsets = df.sparkSession.createDataFrame(rows, off_schema)

    w = Window.partitionBy("__pid").orderBy(*order)
    out = ranged.withColumn("__lrank", F.row_number().over(w))
    for name, src in cumsum_cols.items():
        out = out.withColumn(
            f"__lcum_{name}",
            F.sum(src).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("long"),
        )
    out = out.join(F.broadcast(offsets), "__pid").withColumn(
        rank_col, (F.col("__lrank") + F.col("__off_cnt")).cast("long")
    )
    for name, src in cumsum_cols.items():
        out = out.withColumn(
            name, (F.col(f"__lcum_{name}") + F.col(f"__off_{src}")).cast("long")
        )
    if total_count_col:
        out = out.withColumn(total_count_col, F.lit(run_cnt).cast("long"))
    for name, src in total_sum_cols.items():
        out = out.withColumn(name, F.lit(run_sum[src]).cast("long"))
    drop = ["__pid", "__lrank", "__off_cnt"]
    drop += [f"__lcum_{n}" for n in cumsum_cols]
    drop += [f"__off_{c}" for c in sum_srcs]
    return out.drop(*drop)


def multi_order_index(
    df: DataFrame,
    orders: dict[str, list[Column]],
    total_count_col: str | None = None,
    partitions: int | None = None,
    small_frame_threshold: int | None = None,
) -> DataFrame:
    """``df`` + one 1-based global rank column per entry of
    ``orders`` ({rank_col: total-order expressions}) — the RFM shape,
    where one frame needs several independent rankings.

    Chaining ``global_order_index`` per order pays the full
    persist + count + checkpoint cycle N times on the SAME frame.
    This variant measures and pins the frame ONCE: below the
    small-frame threshold all N ranks are windows over one
    checkpointed frame (one persist/count/checkpoint total); above
    it the two-pass passes still chain — N range shuffles are
    inherent to N different sort keys — but each chained pass skips
    the redundant count (threshold 0) and its input is already
    checkpoint-backed.
    """
    threshold = (
        SMALL_FRAME_ROWS if small_frame_threshold is None
        else small_frame_threshold
    )
    cached = df.persist()
    # unpersist in a finally even if the count or checkpoint action
    # fails, matching global_order_index — otherwise a failed job
    # leaks the persisted input for the session.
    try:
        n_rows = cached.count()
        pinned = (
            cached.withColumn("__one", F.lit(0)).localCheckpoint(eager=True)
            if n_rows <= threshold
            else None
        )
    finally:
        cached.unpersist()
    if pinned is not None:
        out = pinned
        for rank_col, order in orders.items():
            w = Window.partitionBy("__one").orderBy(*order)
            out = out.withColumn(
                rank_col, F.row_number().over(w).cast("long")
            )
        out = out.drop("__one")
        if total_count_col:
            out = out.withColumn(
                total_count_col, F.lit(n_rows).cast("long")
            )
        return out
    out = df
    first = True
    for rank_col, order in orders.items():
        out = global_order_index(
            out,
            order,
            rank_col=rank_col,
            total_count_col=total_count_col if first else None,
            partitions=partitions,
            small_frame_threshold=0,
        )
        first = False
    return out


def topk_per_group(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-``k`` rows per group under the total order ``order``,
    WITHOUT sorting any full group.

    The naive ``row_number().over(partitionBy(keys).orderBy(order))
    <= k`` plan shuffles every row to its group's task and sorts the
    ENTIRE group to keep k of it — a hot group (one carrier = 30% of
    a 100 TB fact) lands on one task and sorts there. Two-pass
    rewrite:

      1. Local prune: window over ``(keys, spark_partition_id())``.
         The same total shuffle volume, but the hash key now includes
         the source partition id, so a hot group is SPREAD over up to
         n_input_partitions tasks (built-in salting — the salt is
         free and collision-less because it's the source partition
         id) and each task sorts only its slice. At most ``k`` rows
         per (group, source partition) survive.
      2. Global select: the same window keyed by ``keys`` alone, over
         the surviving candidate set — bounded at
         ``k * n_input_partitions`` rows PER GROUP regardless of
         group size, so the per-group sort that was the scale cliff
         is now metadata-sized.

    Exact for any TOTAL order (callers tie-break to uniqueness, as
    every registered caller does): the true global top-k of a group
    is a subset of the union of its per-slice top-k.

    ``rank_col``: optionally keep the 1-based global rank (from pass
    2's row_number) in the output.

    MEASURED trade-off (scripts/topk_skew_experiment.py, local[32],
    30% hot group): the naive window is 1.2-1.8x FASTER at 8-32M
    rows, because locally a shuffle is a memcpy and sorting the
    whole hot group on one task is cheap — while this plan pays a
    second (survivor-sized) pass. The rewrite is for the cluster
    regime the local box cannot exhibit: there the naive plan
    fetches the hot group's entire shuffle output INTO ONE executor
    (30% of the table through one NIC) and must fit/spill it in one
    task, which stops scaling long before wall-clock parity matters;
    this plan bounds per-task rows at k·n_input_partitions at ANY
    skew. Prefer the naive window when the largest group is known to
    fit a task comfortably.
    """
    pruned = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lrk",
            F.row_number().over(
                Window.partitionBy(*keys, "__pid").orderBy(*order)
            ),
        )
        .filter(F.col("__lrk") <= k)
        .drop("__pid", "__lrk")
    )
    out = pruned.withColumn(
        "__grk",
        F.row_number().over(Window.partitionBy(*keys).orderBy(*order)),
    ).filter(F.col("__grk") <= k)
    if rank_col:
        return out.withColumnRenamed("__grk", rank_col)
    return out.drop("__grk")


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) derived from a 1-based global rank and the total
    row count: the first ``n % k`` buckets get ``n div k + 1`` rows,
    the rest ``n div k`` — identical assignment to the window
    function, as pure integer Column arithmetic."""
    q = (n / k).cast("long")  # floor for non-negative
    r = n - q * k
    big = r * (q + 1)  # rows living in the oversized buckets
    return (
        F.when(rank <= big, ((rank + q) / (q + 1)).cast("long"))
        .otherwise(r + ((rank - big + q - 1) / q).cast("long"))
        .cast("long")
    )
