"""Bloom-filter join pruning (operators/bloom.py): the no-false-
negative contract, actual pruning, bitmap boundedness, and
equivalence of bloom-prefiltered join vs plain join."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.bloom import (
    bloom_prefilter,
    build_bloom,
)

M, K = 1 << 12, 5


def _frames(spark):
    fact = spark.range(0, 5000).select(F.col("id").alias("fk"))
    # dim keys: every 40th id → 125 true matches out of 5000
    dim = spark.range(0, 5000, 40).select(F.col("id").alias("dk"))
    return fact, dim


def test_no_false_negatives(spark):
    fact, dim = _frames(spark)
    cand = set(
        r.fk
        for r in bloom_prefilter(fact, "fk", dim, "dk", m_bits=M, k=K).collect()
    )
    truth = set(r.dk for r in dim.collect())
    assert truth <= cand, "bloom dropped a true key"


def test_prunes_most_non_matches(spark):
    fact, dim = _frames(spark)
    n_cand = bloom_prefilter(fact, "fk", dim, "dk", m_bits=M, k=K).count()
    # 125 true keys; at m=4096/n=125/k=5 the fp rate is ~1%, so
    # candidates should be well under 10% of the 5000-row fact
    assert 125 <= n_cand < 500


def test_join_after_bloom_equals_plain_join(spark):
    fact, dim = _frames(spark)
    cand = bloom_prefilter(fact, "fk", dim, "dk", m_bits=M, k=K)
    via_bloom = sorted(
        r.fk for r in cand.join(dim, F.col("fk") == F.col("dk")).collect()
    )
    plain = sorted(
        r.fk for r in fact.join(dim, F.col("fk") == F.col("dk")).collect()
    )
    assert via_bloom == plain


def test_bitmap_bounded_by_m(spark):
    _, dim = _frames(spark)
    row = build_bloom(dim, "dk", m_bits=M, k=K).collect()[0]
    assert len(row.bf) == M // 64  # dense: exactly m/64 words
    assert any(w != 0 for w in row.bf)


def test_empty_dim_prunes_everything(spark):
    fact, dim = _frames(spark)
    empty = dim.filter(F.lit(False))
    assert bloom_prefilter(fact, "fk", empty, "dk", m_bits=M, k=K).count() == 0


def test_auto_m_bits_sizes_and_clamps():
    from smartbots_etl_facturas_spark.operators.bloom import auto_m_bits

    assert auto_m_bits(0) == 1 << 10
    assert auto_m_bits(4096) == 1 << 16
    assert auto_m_bits(4097) == 1 << 17
    assert auto_m_bits(10**9) == 1 << 26  # clamp


def test_auto_sizing_keeps_pruning_when_dim_grows(spark):
    from pyspark.sql import functions as F
    from smartbots_etl_facturas_spark.operators.bloom import bloom_prefilter

    fact = spark.range(0, 40000).select(F.col("id").alias("fk"))
    big_dim = spark.range(0, 40000, 2).select(F.col("id").alias("dk"))  # 20k keys
    # fixed m=2^12 saturates at 20k keys (kn/m ≈ 24) — prunes nothing
    sat = bloom_prefilter(fact, "fk", big_dim, "dk", m_bits=1 << 12, k=5).count()
    auto = bloom_prefilter(fact, "fk", big_dim, "dk", m_bits=None, k=5).count()
    assert sat >= 39000  # saturated: nearly everything passes
    assert auto < 22000  # auto-sized: close to the 20k true matches


def test_fact_with_colliding_bitmap_column_names(spark):
    # regression: the broadcast bitmap frame used to carry bare
    # bf/m_bits/k columns — a fact table already owning any of those
    # names hit ambiguous-reference or silent column loss
    dim = spark.createDataFrame([(1,), (2,)], "dk long")
    fact = spark.createDataFrame(
        [(1, "keep-bf", 7, 99), (5, "drop", 8, 98)],
        "fk long, bf string, m_bits long, k long",
    )
    out = bloom_prefilter(fact, "fk", dim, "dk", m_bits=M, k=K)
    assert set(out.columns) == {"fk", "bf", "m_bits", "k"}
    rows = out.collect()
    assert [(r.fk, r.bf, r.m_bits, r.k) for r in rows] == [
        (1, "keep-bf", 7, 99)
    ]
