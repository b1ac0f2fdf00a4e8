"""Engine-portable sketches (operators/sketches.py): mergeability
(the distributed-summary property), CMS no-underestimate + bounds,
HLL accuracy + register boundedness, partition invariance."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.sketches import (
    cms_cells,
    cms_lookup,
    hll_estimate,
    hll_registers,
)


def _keys(spark, n=3000, mod=997):
    # many repeats, 997 distinct values
    return spark.range(0, n).select((F.col("id") % mod).alias("k"))


def test_hll_registers_bounded_and_partition_invariant(spark):
    df = _keys(spark)
    r1 = {r.bucket: r.rho_max for r in hll_registers(df, "k", p=6).collect()}
    r2 = {
        r.bucket: r.rho_max
        for r in hll_registers(df.repartition(11), "k", p=6).collect()
    }
    assert r1 == r2
    assert len(r1) <= 64
    assert all(0 <= b < 64 for b in r1)
    assert all(1 <= v <= 43 for v in r1.values())


def test_hll_merge_is_register_max(spark):
    df = _keys(spark)
    half1 = df.filter(F.col("k") % 2 == 0)
    half2 = df.filter(F.col("k") % 2 == 1)
    full = {r.bucket: r.rho_max for r in hll_registers(df, "k", p=6).collect()}
    merged = {
        r.bucket: r.rho_max
        for r in (
            hll_registers(half1, "k", p=6)
            .unionByName(hll_registers(half2, "k", p=6))
            .groupBy("bucket")
            .agg(F.max("rho_max").alias("rho_max"))
            .collect()
        )
    }
    assert merged == full


def test_hll_estimate_accuracy_and_determinism(spark):
    df = _keys(spark)  # 997 distinct
    est = hll_estimate(hll_registers(df, "k", p=6), p=6).collect()[0]
    # m=64 ⇒ σ ≈ 1.04/√64 ≈ 13%; this seeded draw sits at +20.5%
    # (~1.6σ) — assert the 3σ envelope, and pin the exact value (the
    # sketch is fully deterministic, so any change is a code change)
    assert abs(est.hll_estimate - 997) / 997 < 0.39
    assert est.hll_estimate == 1201.612
    # duplicates must not move the estimate (distinct-ness)
    doubled = df.unionByName(df)
    est2 = hll_estimate(hll_registers(doubled, "k", p=6), p=6).collect()[0]
    assert est2.hll_estimate == est.hll_estimate


def test_cms_never_underestimates_and_bounded(spark):
    df = _keys(spark, n=2000, mod=50)  # 50 keys, 40 each
    cells = cms_cells(df, "k", d=4, w=64)
    assert cells.count() <= 4 * 64
    probes = df.select("k").distinct()
    est = {r.k: r.cms_est for r in cms_lookup(cells, probes, "k", d=4, w=64).collect()}
    true = {r.k: r.cnt for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert all(est[k] >= true[k] for k in true)
    # total over-estimate bounded by collision mass: each row holds
    # all n=2000 increments over w=64 cells
    assert all(est[k] <= true[k] + 2 * 2000 / 64 for k in true)


def test_cms_merge_is_cellwise_sum(spark):
    df = _keys(spark, n=2000, mod=50)
    half1 = df.filter(F.col("k") % 2 == 0)
    half2 = df.filter(F.col("k") % 2 == 1)
    full = {(r.row, r.col): r.cnt for r in cms_cells(df, "k", d=4, w=64).collect()}
    merged = {
        (r.row, r.col): r.cnt
        for r in (
            cms_cells(half1, "k", d=4, w=64)
            .unionByName(cms_cells(half2, "k", d=4, w=64))
            .groupBy("row", "col")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
    }
    assert merged == full


def test_cms_absent_key_estimates_low(spark):
    df = _keys(spark, n=2000, mod=50)
    cells = cms_cells(df, "k", d=4, w=64)
    ghost = spark.range(100000, 100005).select(F.col("id").alias("k"))
    est = cms_lookup(cells, ghost, "k", d=4, w=64).collect()
    # never-seen keys only pick up collision mass
    assert all(r.cms_est <= 2 * 2000 / 64 for r in est)
