"""Distributed Bloom-filter join pruning (runtime semi-join filter).

The classic 100 TB shuffle-reduction technique (Spark's own
InjectRuntimeFilter / "row-level runtime filtering", Hive/Impala
runtime filters): when a fact ⋈ dim join keeps only a small fraction
of fact rows, build a Bloom filter over the dim keys FIRST, broadcast
it (a few KB-MB regardless of fact size), and drop non-matching fact
rows map-side BEFORE the join shuffle. The exact join afterwards
removes the Bloom's false positives, so the final result is
bit-identical to the plain join — only the shuffled volume changes.

This build doesn't expose ``bloom_filter_agg``/``might_contain`` as
SQL functions (Spark keeps them internal to the optimizer rule), so
the filter is built as plain DataFrame aggregation — which is also
the shape that works on ANY engine:

  build:  k probe positions per dim key (xxhash64 with per-probe
          seeds, mod m) → bit = (word index, bit-in-word) → groupBy
          word index, bit_or of the set bits → ≤ m/64 rows →
          densified into a ONE-ROW frame holding an array<int64> of
          exactly m/64 words (array, not map: Spark map element_at
          linearly scans the entries; array access is O(1)).
  probe:  broadcast-crossJoin the 1-row bitmap onto the fact and
          test all k bits with element_at + shift/mask — pure Column
          expressions, whole-stage-codegen'd, zero Python.

Sizing: m bits for n keys at k hashes gives false-positive rate
≈ (1 - e^(-kn/m))^k; the default m = 16·n_hint rounded up to a power
of two with k = 5 lands ≈ 1 %. The bitmap is at most m/64 longs
(≈ 2 MB per 1e6 dim keys) — broadcastable at any fact scale, and the
build aggregation is bounded by m/64 rows, not by the fact.

No false negatives ever: every dim key sets exactly the bits the
probe tests (same seeds, same modulus), so ``fact ⋉ dim`` survives
the pre-filter intact — asserted by the ``bloom_prune_invariants``
driver query and tests/test_bloom.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom", "bloom_probe", "bloom_prefilter", "auto_m_bits"]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k probe positions for ``key``: xxhash64 seeded per probe
    (seed = probe index) so the k hashes are independent; pmod keeps
    positions in [0, m)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def build_bloom(
    dim: DataFrame, key: str, m_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """ONE-ROW frame ``(bf: array<bigint>, m_bits, k)`` — the Bloom
    bitmap over ``dim[key]`` as a DENSE array of exactly m/64 int64
    words (word i at 1-based position i+1). Dense array, not a map:
    Spark's ``element_at`` on a map is a LINEAR scan of the entries
    (measured 57× at ×8 scale when auto-sizing grew the map to 16k
    words), while array access is O(1) positional. Build cost: one
    explode (k rows per dim key) + one aggregation bounded by m/64
    output rows + a sorted collect of the ≤ m/64 set words."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    words = (
        dim.select(pos)
        # SQL shiftleft takes a column shift amount (the PySpark
        # wrapper doesn't), hence selectExpr
        .selectExpr(
            "CAST(pos DIV 64 AS INT) AS word_idx",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS bit",
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    # densify: left-join the full word-index range so every position
    # exists exactly once, then one sorted collect — O(W log W) in
    # W = m/64 words, no quadratic lambda anywhere
    full = (
        dim.sparkSession.range(n_words)
        .select(F.col("id").cast("int").alias("word_idx"))
        .join(words, "word_idx", "left")
        .select(
            "word_idx",
            F.coalesce(F.col("word"), F.lit(0).cast("long")).alias("word"),
        )
    )
    return full.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("word_idx", "word"))),
            lambda x: x["word"],
        ).alias("bf"),
        F.lit(m_bits).alias("m_bits"),
        F.lit(k).alias("k"),
    )


def bloom_probe(pos_cols: list[str], bitmap_col: str = "bf") -> Column:
    """Boolean Column: the bit named by each position column (already
    in [0, m)) is set in the in-scope DENSE array column
    ``bitmap_col`` (1-based positional access, O(1) per probe). Built
    as a SQL expression because shift amounts are columns (the PySpark
    shiftleft/shiftrightunsigned wrappers only take int literals)."""
    tests = [
        "(shiftrightunsigned("
        f"element_at({bitmap_col}, CAST({p} DIV 64 AS INT) + 1),"
        f" CAST({p} % 64 AS INT)) & 1) = 1"
        for p in pos_cols
    ]
    return F.expr(" AND ".join(tests))


def auto_m_bits(n_keys: int, bits_per_key: int = 16) -> int:
    """Bitmap size for ``n_keys`` build-side keys: ``bits_per_key``
    bits each (16 ⇒ ~0.6% fp at k=5), rounded up to a power of two,
    clamped to [2^10, 2^26] (2^26 = 8 MB of words — still broadcast-
    able). A FIXED m saturates when the build side grows — fp → 1 and
    the filter silently stops pruning — so real runtime filters size
    from the observed build-side count, as this does."""
    m = 1 << max(10, (max(n_keys, 1) * bits_per_key - 1).bit_length())
    return min(m, 1 << 26)


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int | None = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """``fact`` reduced to rows whose ``fact_key`` MIGHT be in
    ``dim[dim_key]`` — a superset of the exact semi-join (no false
    negatives), computed map-side against a broadcast bitmap. Chain
    the exact join after this to get the plain-join result with a
    fraction of the shuffle.

    ``m_bits=None`` sizes the bitmap from the build side (one cheap
    dim count — the pass every sizing-aware runtime filter pays)."""
    if m_bits is None:
        m_bits = auto_m_bits(dim.count())
    # namespace the bitmap frame's columns so a fact table that
    # already has bf/m_bits/k columns joins without ambiguity or
    # silent column loss — only the __bloom_* helpers are dropped
    bloom = build_bloom(dim, dim_key, m_bits=m_bits, k=k).select(
        F.col("bf").alias("__bloom_bf"),
        F.col("m_bits").alias("__bloom_m_bits"),
        F.col("k").alias("__bloom_k"),
    )
    pos = _positions(F.col(fact_key), m_bits, k)
    probed = fact.crossJoin(F.broadcast(bloom))
    for i, p in enumerate(pos):
        probed = probed.withColumn(f"__bp{i}", p)
    return (
        probed.filter(
            bloom_probe(
                [f"__bp{i}" for i in range(k)], bitmap_col="__bloom_bf"
            )
        )
        .drop(
            "__bloom_bf",
            "__bloom_m_bits",
            "__bloom_k",
            *[f"__bp{i}" for i in range(k)],
        )
    )
