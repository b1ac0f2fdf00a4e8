"""Deterministic training-shard materialization + weighted curriculum
interleaving — the "last mile" of a training-data pipeline: after
curation/dedup/packing, examples must land in N shard files in a
GLOBALLY SHUFFLED but fully REPRODUCIBLE order, and multi-source
corpora must interleave sources at prescribed ratios.

Both ops are pure dataflow with no RNG state:

``assign_shards``: shard = md5-uniform(seed, id) mod n_shards (content-
independent, uniform ⇒ shards balanced to sampling error), position
within shard = rank of a SECOND independent md5 draw. One hash
shuffle on the shard key + a per-shard sort — no global ordering
anywhere, so the plan is identical at any corpus size; writers then
emit shard files with ``partitionBy(shard)`` + sortWithinPartitions.
Reruns, cluster resizes and engine swaps reproduce the exact same
(shard, position) for every row — the property that makes training
runs repeatable and resumable mid-epoch.

``interleave_key``: deterministic weighted round-robin across
sources (the mixture scheduler of multilingual/multi-domain
training, cf. the sampling-ratio treatment in GPT-3/T5 data notes):
a source with integer weight w emits its r-th example at schedule
key r·L/w (L = lcm-scale constant), so in any schedule prefix the
sources appear in ~w-proportion. The key is computed with ONE
per-source window (rank within source ordered by an md5 draw);
consumers range-partition by the key — again no global window in
the plan. Ties across sources are broken by the md5 hex draw, then
id, so the total order is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_shards", "interleave_key"]


def _md5_hex(seed: str, id_col: Column) -> Column:
    return F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string")))


def _u32(hex_col: Column) -> Column:
    """First 8 hex chars as a uniform 32-bit draw (same idiom as
    operators/sampling.py; reproducible in any engine that has md5)."""
    return F.conv(F.substring(hex_col, 1, 8), 16, 10).cast("long")


def assign_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "shards-v1",
) -> DataFrame:
    """Input rows + (shard, pos): shard in [0, n_shards) from one
    md5 draw, pos = 1-based rank inside the shard by an independent
    second draw (tie-broken by id ⇒ total order). Choose n_shards
    well above executor count so shards both parallelize the write
    and cap file sizes."""
    h_shard = _u32(_md5_hex(seed + ":s", F.col(id_col)))
    h_order = _md5_hex(seed + ":o", F.col(id_col))
    with_shard = df.withColumn(
        "shard", F.pmod(h_shard, F.lit(n_shards)).cast("int")
    ).withColumn("__ord", h_order)
    w = Window.partitionBy("shard").orderBy(F.col("__ord"), F.col(id_col))
    return with_shard.withColumn("pos", F.row_number().over(w)).drop("__ord")


def interleave_key(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, int],
    seed: str = "interleave-v1",
    scale: int = 720720,
) -> DataFrame:
    """Input rows + (rank_in_source, schedule_key): the r-th example
    (1-based, md5-shuffled order within its source) of source s gets
    key r·(scale/w_s) — exact integer arithmetic as long as every
    weight divides ``scale`` (720720 = lcm(1..16) covers weights up
    to 16). Sorting by (schedule_key, draw, id) yields the weighted
    round-robin schedule; unknown sources get weight 1.

    Scale shape (round-11): sources are FEW by definition (languages,
    domains), so ``row_number() OVER (PARTITION BY source)`` would
    sort each source's entire corpus on one task — the hot-group
    cliff. Instead the per-source rank derives from the adaptive
    GLOBAL rank under the (source, draw, id) total order
    (ranking.global_order_index: measured single-window under the 2M
    crossover, range-partitioned two-pass above) minus the source's
    first global rank + 1 — a |sources|-row offsets frame broadcast
    back. Identical output, parallelism independent of source count.
    """
    from .ranking import global_order_index

    for w_ in weights.values():
        if scale % w_ != 0:
            raise ValueError(f"weight {w_} must divide scale={scale}")
    h = _md5_hex(seed, F.col(id_col))
    step = F.coalesce(
        *[
            F.when(F.col(source_col) == s, F.lit(scale // w_))
            for s, w_ in weights.items()
        ],
        F.lit(scale),
    )
    ranked = global_order_index(
        df.withColumn("__draw", h),
        [F.col(source_col).asc(), F.col("__draw").asc(),
         F.col(id_col).asc()],
        rank_col="__g",
    )
    # Null-safe offsets join: rows with a NULL source form their own
    # rank block (the global order sorts them contiguously and groupBy
    # folds NULL into one group), and the coalesce weight fallback
    # already gives them weight 1 — a plain inner join on source_col
    # would silently drop them (NULL != NULL in join conditions).
    offsets = ranked.groupBy(source_col).agg(
        F.min("__g").alias("__g0")
    ).withColumnRenamed(source_col, "__src0")
    return (
        ranked.join(
            F.broadcast(offsets),
            F.col(source_col).eqNullSafe(F.col("__src0")),
        )
        .drop("__src0")
        .withColumn(
            "rank_in_source",
            (F.col("__g") - F.col("__g0") + 1).cast("int"),
        )
        .withColumn(
            "schedule_key", (F.col("rank_in_source").cast("long") * step)
        )
        .drop("__g", "__g0")
    )
