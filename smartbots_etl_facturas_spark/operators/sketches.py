"""Engine-portable mergeable sketches: HyperLogLog registers and
count-min counters as plain integer dataflow.

Spark ships approx_count_distinct/approx_percentile, but their sketch
internals are engine-private — results can't be value-checked across
engines, and the sketches can't be persisted and merged by anything
else. These twins rebuild the two classic mergeable summaries
(Flajolet et al. 2007 HyperLogLog; Cormode & Muthukrishnan 2005
count-min) from md5-derived hashes and integer aggregations only, so

  * any engine with md5 reproduces every register/counter BIT-FOR-BIT
    (the DuckDB oracle value-checks them exactly — not "close", equal);
  * merge is ordinary SQL (HLL: max per bucket; CMS: cell-wise sum),
    so per-partition/per-day sketches roll up with a groupBy — the
    property that makes them work as streaming/cube state at 100 TB;
  * the full sketch state is bounded (m registers / d·w cells)
    regardless of input size, and the build is one map-side-combinable
    keyed aggregation over the data.

Float discipline: the only non-integer step is the final HLL estimate
ratio. The harmonic sum Σ 2^-M[j] is computed as the EXACT integer
Σ 2^(S-M[j]) (S = hash width), so the estimate is a single IEEE
division of two exactly-agreed numbers — deterministic across engines;
no correctly-rounded-log assumptions anywhere (rho uses the length of
the binary string, not log2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_estimate",
    "hll_registers_by",
    "hll_estimate_by",
    "cms_cells",
    "cms_lookup",
    "kmv_minima",
    "kmv_estimate",
    "kmv_set_estimates",
]

# 48-bit hashes: 12 hex chars of md5 — wide enough that rho saturation
# is unreachable at any realistic cardinality, small enough that
# 2^(S - M) sums stay far inside int64
HLL_BITS = 48


def _u48(key: Column, seed: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), key.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")


def hll_registers(
    df: DataFrame, key: str, p: int = 6, seed: str = "hll-v1"
) -> DataFrame:
    """(bucket, rho_max) — the HLL register table for the distinct
    values of ``df[key]``: bucket = top p bits of the 48-bit hash,
    rho = 1 + leading zeros of the remaining (48-p)-bit suffix.
    ≤ 2^p rows out (absent bucket ⇒ register 0); merge of two
    register tables = groupBy(bucket).max — plain SQL."""
    if not 2 <= p <= 14:
        raise ValueError("p out of range")
    rest_bits = HLL_BITS - p
    h = _u48(F.col(key), seed)
    bucket = (h / (1 << rest_bits)).cast("long")
    rest = h % (1 << rest_bits)
    # length(bin(x)) is the bit length for x > 0 in both Spark and
    # DuckDB — no float log anywhere
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + 1
    )
    return (
        # NULL keys are excluded — SQL count-distinct convention (and
        # the oracles' count(DISTINCT ...) agrees); a null key would
        # otherwise hash to a NULL bucket row that poisons the
        # driver-side fold (round-11 streaming review)
        df.filter(F.col(key).isNotNull())
        .select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(registers: DataFrame, p: int = 6) -> DataFrame:
    """One row (int_sum, n_zero_buckets, hll_estimate) from a register
    table. The harmonic sum Σ 2^-M[j] is scaled by 2^(s+1) (s =
    suffix width; max rho = s+1, so every scaled term 2^(s+1-M) is an
    integer) with absent buckets at M = 0 — EXACT int64, so the
    estimate α·m²·2^(s+1) / int_sum is one deterministic IEEE
    division. Raw HLL estimate (no small/large-range corrections —
    callers value-check registers, and the relative-error contract is
    asserted at the query level)."""
    m = 1 << p
    s = HLL_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return registers.agg(
        (
            F.coalesce(
                F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {s + 1} - rho_max)")),
                F.lit(0).cast("long"),
            )
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << (s + 1))
        ).alias("int_sum"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("n_zero_buckets"),
    ).select(
        "int_sum",
        "n_zero_buckets",
        F.round(
            F.lit(alpha * m * m)
            * F.lit(float(1 << (s + 1)))
            / F.col("int_sum").cast("double"),
            3,
        ).alias("hll_estimate"),
    )


def hll_registers_by(
    df: DataFrame, group_col: str, key: str, p: int = 6, seed: str = "hll-v1"
) -> DataFrame:
    """GROUPED register tables: (grp, bucket, rho_max) — one
    independent HLL per value of ``group_col``, built in the SAME
    single map-side-combinable aggregation (the group key simply
    joins the bucket in the groupBy). This is the cube/rollup form of
    the sketch: per-group tables merge with groupBy(grp, bucket).max,
    and rolling groups up (drop grp, re-max) yields exactly the
    global sketch — the property that lets one pass serve every
    drill-down level. ≤ groups·2^p rows at any input size."""
    if not 2 <= p <= 14:
        raise ValueError("p out of range")
    rest_bits = HLL_BITS - p
    h = _u48(F.col(key), seed)
    bucket = (h / (1 << rest_bits)).cast("long")
    rest = h % (1 << rest_bits)
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + 1
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            bucket.alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate_by(registers: DataFrame, p: int = 6) -> DataFrame:
    """Per-group twin of ``hll_estimate``: (grp, int_sum,
    n_zero_buckets, hll_estimate) from a grouped register table —
    the same exact-integer harmonic sum per group, one IEEE division
    each. Output is group-count-scale."""
    m = 1 << p
    s = HLL_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return registers.groupBy("grp").agg(
        (
            F.coalesce(
                F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {s + 1} - rho_max)")),
                F.lit(0).cast("long"),
            )
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << (s + 1))
        ).alias("int_sum"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("n_zero_buckets"),
    ).select(
        "grp",
        "int_sum",
        "n_zero_buckets",
        F.round(
            F.lit(alpha * m * m)
            * F.lit(float(1 << (s + 1)))
            / F.col("int_sum").cast("double"),
            3,
        ).alias("hll_estimate"),
    )


def cms_cells(
    df: DataFrame, key: str, d: int = 4, w: int = 256, seed: str = "cms-v1"
) -> DataFrame:
    """(row, col, cnt) — the count-min matrix for ``df[key]``: d
    independent md5-derived hash rows, each key incrementing one of w
    cells per row. ≤ d·w rows out; merge of two matrices = groupBy
    (row, col).sum — plain SQL. The build is one explode(d) + one
    map-side-combinable aggregation."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(_u48(F.col(key), f"{seed}:{i}"), F.lit(w)).alias("col"),
                )
                for i in range(d)
            ]
        )
    ).alias("c")
    return (
        # NULL keys excluded (see hll_registers): a null would emit d
        # (row, NULL-col) cells that crash the monitors' int() folds
        df.filter(F.col(key).isNotNull())
        .select(cells)
        .select("c.row", "c.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    cells: DataFrame,
    probes: DataFrame,
    key: str,
    d: int = 4,
    w: int = 256,
    seed: str = "cms-v1",
) -> DataFrame:
    """probes + cms_est: the count-min estimate min_i cells[i, h_i(k)]
    for each probe key — never under the true count, over by at most
    the collision mass (≤ 2·n/w per row with prob 1/2^d combined).
    One explode(d) + keyed equi-join against the cell table + min per
    probe: no broadcast of the data, only of the d·w cell table if
    the planner chooses to."""
    pk = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(_u48(F.col(key), f"{seed}:{i}"), F.lit(w)).alias("col"),
                )
                for i in range(d)
            ]
        )
    ).alias("c")
    probe_cells = probes.select(F.col(key), pk).select(key, "c.row", "c.col")
    return (
        probe_cells.join(cells, ["row", "col"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est"))
    )


def kmv_minima(
    df: DataFrame, key: str, k: int = 64, seed: str = "kmv-v1"
) -> DataFrame:
    """k-minimum-values distinct sketch (Beyer et al. 2007, "On
    synopses for distinct-value estimation under multiset
    operations"): the k smallest DISTINCT 48-bit md5-derived hashes
    of ``df[key]``, one ``h`` column, ≤ k rows.

    What HLL cannot do and KMV can: the minima are an md5-uniform
    SAMPLE of the distinct values, so two sketches support direct
    INTERSECTION estimation (count shared members under the combined
    k-th minimum) — HLL only gets there by inclusion–exclusion, whose
    error is unbounded relative to a small intersection.

    Plan shape: the hash is a pure Column (same ``_u48`` idiom as
    HLL, so any engine reproduces the minima bit-for-bit); a map-side
    Arrow pass keeps the k smallest unique hashes PER PARTITION
    (bounded k rows each — the raw values never shuffle, matching the
    64-rows-per-partition exchange discipline of ``hll_registers``),
    then a k-row TakeOrdered merge. Merge of two sketches = union →
    distinct → k smallest, i.e. this same tail over their union."""
    if k < 2:
        raise ValueError("k must be >= 2")
    hashed = df.select(_u48(F.col(key), seed).alias("h"))

    def _partial(it):
        import pandas as pd

        best: set = set()
        cap = None
        for pdf in it:
            for h in pdf["h"].to_numpy():
                h = int(h)
                if cap is not None and h >= cap:
                    continue
                best.add(h)
                if len(best) > k:
                    best.remove(max(best))
                    cap = max(best)
        if best:
            yield pd.DataFrame({"h": sorted(best)})

    partials = hashed.mapInPandas(_partial, "h long")
    return partials.distinct().orderBy("h").limit(k)


def kmv_estimate(minima: DataFrame, k: int = 64) -> DataFrame:
    """One row ``(n_minima, kth_h, kmv_estimate)`` from a minima
    table. With fewer than k distinct values the sketch holds ALL of
    them and is exact (estimate = n_minima); otherwise the classic
    unbiased estimator (k-1)·2^48 / h_k — a single IEEE division of
    two exactly-agreed integers, rounded to 3 places (the
    ``hll_estimate`` float discipline)."""
    w = float(1 << HLL_BITS)
    return minima.agg(
        F.count(F.lit(1)).cast("long").alias("n_minima"),
        F.max("h").alias("kth_h"),
    ).select(
        "n_minima",
        "kth_h",
        F.when(F.col("n_minima") < k, F.col("n_minima").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1)) * F.lit(w) / F.col("kth_h").cast("double"),
                3,
            )
        )
        .alias("kmv_estimate"),
    )


def kmv_set_estimates(
    minima_a: DataFrame, minima_b: DataFrame, k: int = 64
) -> DataFrame:
    """Union / intersection cardinality estimates from two KMV
    sketches over the SAME (k, seed): one row ``(n_union_minima,
    union_kth_h, n_both, est_union, est_intersect)``.

    K = k smallest of distinct(A ∪ B) is exactly the KMV sketch of
    the UNION, so est_union follows from ``kmv_estimate``; within K,
    the fraction ρ = |K ∩ A ∩ B| / |K| of members carried by BOTH
    input sketches estimates the Jaccard similarity, and
    est_intersect = ρ · est_union (Beyer 2007 §4). Every count is an
    exact integer; the two estimates are fixed-shape IEEE expressions
    an oracle engine replays bit-for-bit. All frames here are ≤ k
    rows — the joins are sketch-sized, never data-sized."""
    union_min = minima_a.unionByName(minima_b).distinct().orderBy("h").limit(k)
    both = minima_a.intersect(minima_b)
    in_both = union_min.join(both, "h", "left_semi")
    stats = union_min.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_minima"),
        F.max("h").alias("union_kth_h"),
    ).crossJoin(in_both.agg(F.count(F.lit(1)).cast("long").alias("n_both")))
    w = float(1 << HLL_BITS)
    est_union = F.when(
        F.col("n_union_minima") < k, F.col("n_union_minima").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(w) / F.col("union_kth_h").cast("double"),
            3,
        )
    )
    return stats.select(
        "n_union_minima",
        "union_kth_h",
        "n_both",
        est_union.alias("est_union"),
        F.round(
            F.col("n_both").cast("double")
            * est_union
            / F.col("n_union_minima").cast("double"),
            3,
        ).alias("est_intersect"),
    )
