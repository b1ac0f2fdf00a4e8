"""KLL mergeable quantile sketch (operators/quantiles.py).

Pins: (1) exact agreement with the value-at-rank convention on small
frames, (2) the additive rank-error bound empirically at k=256, (3)
bit-determinism for a fixed partitioning, (4) mergeability — sketch
of concatenation == merge of sketches, (5) the map-side shape: only
sketch rows cross the shuffle, (6) build-once/probe-many via a
persisted partials table.
"""

import random

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.quantiles import (
    KllSketch,
    kll_group_partials,
    kll_group_quantiles,
)


def _exact_quantile(values, q):
    """Smallest value with rank >= q*n — the SQL convention the
    sketch docstring pins."""
    vals = sorted(values)
    n = len(vals)
    target = q * n
    cum = 0
    for v in vals:
        cum += 1
        if cum >= target:
            return v
    return vals[-1]


class TestKllSketchLocal:
    def test_small_exact(self):
        s = KllSketch(k=64)
        s.add_many(range(50))
        for q in (0.1, 0.25, 0.5, 0.9, 1.0):
            assert s.quantile(q) == _exact_quantile(range(50), q)

    def test_rank_error_bound(self):
        rng = random.Random(7)
        data = [rng.lognormvariate(0, 2) for _ in range(200_000)]
        s = KllSketch(k=256)
        s.add_many(data)
        vals = sorted(data)
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            est = s.quantile(q)
            # true rank of the estimate
            import bisect

            rank = bisect.bisect_right(vals, est)
            assert abs(rank - q * len(vals)) <= 0.01 * len(vals)

    def test_merge_equals_concat(self):
        rng = random.Random(11)
        a = [rng.random() for _ in range(30_000)]
        b = [rng.gauss(5, 1) for _ in range(20_000)]
        sa, sb = KllSketch(k=128), KllSketch(k=128)
        sa.add_many(a)
        sb.add_many(b)
        merged = sa.merge(sb)
        assert merged.n == 50_000
        vals = sorted(a + b)
        import bisect

        for q in (0.1, 0.5, 0.9):
            rank = bisect.bisect_right(vals, merged.quantile(q))
            assert abs(rank - q * 50_000) <= 0.02 * 50_000

    def test_merge_k_mismatch_rejected(self):
        with pytest.raises(ValueError):
            KllSketch(k=64).merge(KllSketch(k=128))

    def test_deterministic(self):
        data = [((i * 48271) % 99991) / 7.0 for i in range(100_000)]
        rows = []
        for _ in range(2):
            s = KllSketch(k=64)
            s.add_many(data)
            rows.append(s.to_row())
        assert rows[0] == rows[1]

    def test_space_bound(self):
        s = KllSketch(k=64)
        s.add_many(range(1_000_000))
        retained = sum(len(l) for l in s.levels)
        # k per level, log2(n/k) levels — well under 25*k
        assert retained <= 64 * 25


class TestKllSpark:
    def test_group_quantiles_vs_exact(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_returnflag", F.col("l_extendedprice").cast("double").alias("v")
        )
        qs = [0.25, 0.5, 0.75, 0.95]
        out = kll_group_quantiles(li, "l_returnflag", "v", qs, k=256)
        got = {(r["l_returnflag"], r["q"]): (r["n"], r["est"]) for r in out.collect()}
        rows = li.collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(r["l_returnflag"], []).append(r["v"])
        import bisect

        for key, vals in by_key.items():
            vals.sort()
            n = len(vals)
            for q in qs:
                got_n, est = got[(key, q)]
                assert got_n == n
                rank = bisect.bisect_right(vals, est)
                assert abs(rank - q * n) <= max(0.01 * n, 1.0)

    def test_spark_deterministic_fixed_partitioning(self, spark, sf_dir):
        li = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select("l_returnflag", F.col("l_quantity").cast("double").alias("v"))
            .repartition(8, "l_returnflag")
        )
        a = kll_group_quantiles(li, "l_returnflag", "v", [0.5], k=128).collect()
        b = kll_group_quantiles(li, "l_returnflag", "v", [0.5], k=128).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_partials_are_bounded_and_probe_matches(self, spark, sf_dir, tmp_path):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_returnflag", F.col("l_extendedprice").cast("double").alias("v")
        )
        partials = kll_group_partials(li, "l_returnflag", "v", k=128)
        path = str(tmp_path / "kll_partials")
        partials.write.parquet(path)
        stored = spark.read.parquet(path)
        # bounded: one row per (group, partition)
        n_part = li.rdd.getNumPartitions()
        n_groups = li.select("l_returnflag").distinct().count()
        assert stored.count() <= n_part * n_groups
        direct = kll_group_quantiles(li, "l_returnflag", "v", [0.5], k=128).collect()
        probed = kll_group_quantiles(
            li, "l_returnflag", "v", [0.5], k=128, partials=stored
        ).collect()
        assert sorted(map(tuple, direct)) == sorted(map(tuple, probed))

    def test_nulls_and_empty_groups(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)],
            "k string, v double",
        )
        out = kll_group_quantiles(df, "k", "v", [0.5], k=8).collect()
        got = {r["k"]: (r["n"], r["est"]) for r in out}
        assert got["a"] == (2, 1.0) or got["a"] == (2, 3.0)
        # q=0.5 of [1,3]: rank target 1 -> smallest with cum>=1 -> 1.0
        assert got["a"] == (2, 1.0)
        assert "b" not in got


    def test_incremental_partials_merge_rank_valid(self, spark, sf_dir):
        """Persisted-state split: partials(corpus) ∪ partials(delta)
        probed together must rank-match the union corpus — the
        kll_incremental contract (delta pids offset to keep the
        merge order total)."""
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey",
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("v"),
        )
        corpus = li.filter(F.col("l_orderkey") % 10 != 0).select(
            "l_returnflag", "v"
        )
        delta = li.filter(F.col("l_orderkey") % 10 == 0).select(
            "l_returnflag", "v"
        )
        pa = kll_group_partials(corpus, "l_returnflag", "v", k=128)
        pb = kll_group_partials(delta, "l_returnflag", "v", k=128).withColumn(
            "__pid", F.col("__pid") + F.lit(1_000_000)
        )
        est = kll_group_quantiles(
            li,
            "l_returnflag",
            "v",
            [0.5, 0.9],
            k=128,
            partials=pa.unionByName(pb),
        ).collect()
        import bisect

        by_key = {}
        for r in li.collect():
            by_key.setdefault(r["l_returnflag"], []).append(r["v"])
        for key in by_key:
            by_key[key].sort()
        for r in est:
            vals = by_key[r["l_returnflag"]]
            assert r["n"] == len(vals)
            rank = bisect.bisect_right(vals, r["est"])
            assert abs(rank - r["q"] * len(vals)) <= max(0.01 * len(vals), 1.0)
