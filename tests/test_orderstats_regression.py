"""Tests for exact histogram-selection quantiles
(operators/orderstats.py), per-key OLS trend sums
(operators/regression.py), and min-label connected components
(operators/graph.py:connected_components)."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.orderstats import exact_quantiles
from smartbots_etl_facturas_spark.operators.regression import group_trend
from smartbots_etl_facturas_spark.operators.graph import connected_components


class TestExactQuantiles:
    def test_quantile_disc_semantics(self, spark):
        # 1..4: ceil-rank semantics — p25->1, p50->2, p75->3, p90->4
        df = spark.createDataFrame([(v,) for v in [10, 20, 30, 40]], ["x"])
        got = {r.quantile: r.value for r in exact_quantiles(df, "x").collect()}
        assert (got["p25"], got["p50"], got["p75"], got["p90"]) == (
            10, 20, 30, 40)

    def test_matches_duckdb_quantile_disc(self, spark):
        import duckdb

        vals = [(i * 7 + 3) % 23 for i in range(200)]
        df = spark.createDataFrame([(v,) for v in vals], ["x"])
        got = {r.quantile: r.value for r in exact_quantiles(df, "x").collect()}
        want = duckdb.sql(
            "SELECT quantile_disc(x, 0.25), quantile_disc(x, 0.5), "
            "quantile_disc(x, 0.75), quantile_disc(x, 0.9), "
            "quantile_disc(x, 0.99) FROM (SELECT unnest($v) AS x)",
            params={"v": vals},
        ).fetchone()
        assert (got["p25"], got["p50"], got["p75"], got["p90"],
                got["p99"]) == want

    def test_duplicates_and_nulls(self, spark):
        df = spark.createDataFrame(
            [(1,)] * 9 + [(2,)] + [(None,)] * 5, "x: int"
        )
        got = {r.quantile: r.value for r in exact_quantiles(df, "x").collect()}
        assert got["p50"] == 1 and got["p99"] == 2

    def test_partition_invariance(self, spark):
        df = spark.createDataFrame([(i % 13,) for i in range(500)], ["x"])
        a = sorted(map(tuple, exact_quantiles(df, "x").collect()))
        b = sorted(map(tuple, exact_quantiles(df.repartition(11), "x").collect()))
        assert a == b


class TestGroupTrend:
    def test_known_slope(self, spark):
        # y = 3x + 7 exactly -> slope_num/slope_den == 3
        rows = [("k", x, 3 * x + 7) for x in range(10)]
        df = spark.createDataFrame(rows, ["k", "x", "y"])
        r = group_trend(df, "k", "x", "y").head()
        assert r.slope_den != 0
        assert r.slope_num == 3 * r.slope_den

    def test_matches_numpy_polyfit(self, spark):
        import numpy as np

        xs = [0, 2, 3, 7, 11, 13, 20]
        ys = [5, 4, 8, 2, 9, 14, 1]
        df = spark.createDataFrame(
            [("k", x, y) for x, y in zip(xs, ys)], ["k", "x", "y"]
        )
        r = group_trend(df, "k", "x", "y").head()
        got = float(r.slope_num) / float(r.slope_den)
        want = np.polyfit(np.array(xs, float), np.array(ys, float), 1)[0]
        assert abs(got - want) < 1e-9

    def test_constant_x_zero_denominator(self, spark):
        df = spark.createDataFrame(
            [("k", 5, 1), ("k", 5, 9)], ["k", "x", "y"]
        )
        r = group_trend(df, "k", "x", "y").head()
        assert r.slope_den == Decimal(0)

    def test_single_row_key(self, spark):
        df = spark.createDataFrame([("k", 3, 4)], ["k", "x", "y"])
        r = group_trend(df, "k", "x", "y").head()
        assert (r.n, r.slope_num, r.slope_den) == (1, Decimal(0), Decimal(0))

    def test_per_key_isolation(self, spark):
        rows = [("up", x, 2 * x) for x in range(5)] + [
            ("down", x, -2 * x) for x in range(5)
        ]
        df = spark.createDataFrame(rows, ["k", "x", "y"])
        got = {r.k: (r.slope_num, r.slope_den)
               for r in group_trend(df, "k", "x", "y").collect()}
        assert got["up"][0] == 2 * got["up"][1]
        assert got["down"][0] == -2 * got["down"][1]


class TestConnectedComponents:
    def _cc(self, spark, pairs, **kw):
        df = spark.createDataFrame(pairs, ["a", "b"])
        return {r.node: r.component
                for r in connected_components(df, **kw).collect()}

    def test_two_components(self, spark):
        got = self._cc(spark, [(1, 2), (2, 3), (10, 11)])
        assert got[1] == got[2] == got[3] == 1
        assert got[10] == got[11] == 10

    def test_chain_converges_past_fixed_rounds(self, spark):
        # a long path needs ~diameter rounds: fixpoint loop must get there
        n = 12
        got = self._cc(spark, [(i, i + 1) for i in range(n)])
        assert set(got.values()) == {0} and len(got) == n + 1

    def test_partition_invariance(self, spark):
        pairs = [(i, (i * 5 + 2) % 17) for i in range(17)]
        df = spark.createDataFrame(pairs, ["a", "b"])
        a = {r.node: r.component for r in connected_components(df).collect()}
        b = {r.node: r.component
             for r in connected_components(df.repartition(7)).collect()}
        assert a == b

    def test_self_loops_ignored(self, spark):
        got = self._cc(spark, [(1, 1), (1, 2)])
        assert got == {1: 1, 2: 1}


class TestStarCC:
    """connected_components_star (large-star/small-star) must produce
    the IDENTICAL (node, component) labeling as min-label
    propagation, including on the adversarial path graph where
    min-label needs O(diameter) rounds."""

    def _both(self, spark, pairs):
        from smartbots_etl_facturas_spark.operators.graph import (
            connected_components,
            connected_components_star,
        )

        df = spark.createDataFrame(pairs, ["a", "b"])
        lbl = {r.node: r.component
               for r in connected_components(df).collect()}
        star = {r.node: r.component
                for r in connected_components_star(df).collect()}
        return lbl, star

    def test_random_graphs_match(self, spark):
        for seed in (3, 7, 11):
            pairs = [((i * seed + 1) % 40, (i * 13 + seed) % 40)
                     for i in range(60)]
            pairs = [(x, y) for x, y in pairs if x != y]
            lbl, star = self._both(spark, pairs)
            assert lbl == star

    def test_long_path_matches(self, spark):
        # 30-node path: diameter 30; star alternation converges in
        # O(log^2 n) rounds and must land on the same labels
        lbl, star = self._both(spark, [(i, i + 1) for i in range(30)])
        assert lbl == star
        assert set(star.values()) == {0}

    def test_two_components_and_pair(self, spark):
        lbl, star = self._both(
            spark, [(5, 9), (9, 2), (30, 31), (100, 7), (7, 2)]
        )
        assert lbl == star


class TestGroupQuantileValues:
    """Per-key histogram selection (group_quantile_values) — the
    scale-safe replacement for fact-scale Window.partitionBy(key)
    ranks in the order-statistics family (round-8 rewrite)."""

    def _gqv(self, spark, rows, probs):
        from smartbots_etl_facturas_spark.operators.orderstats import (
            group_quantile_values,
        )

        df = spark.createDataFrame(rows, ["g", "v"])
        return {
            r.g: r
            for r in group_quantile_values(df, ["g"], "v", probs).collect()
        }

    def test_median_matches_rank_window_convention(self, spark):
        # value at rank ceil(n/2): odd group -> middle, even -> lower
        rows = [("a", v) for v in [5, 1, 3]] + [("b", v) for v in [4, 2, 8, 6]]
        got = self._gqv(spark, rows, [("med", 1, 2)])
        assert got["a"].med == 3 and got["a"]["__n"] == 3
        assert got["b"].med == 4 and got["b"]["__n"] == 4

    def test_duplicates_and_nulls(self, spark):
        rows = [("a", 1), ("a", 1), ("a", 1), ("a", 9), ("a", None)]
        got = self._gqv(spark, rows, [("med", 1, 2), ("p90", 9, 10)])
        # n=4 non-null, rank ceil(4/2)=2 -> 1; p90 rank ceil(36/10)=4 -> 9
        assert got["a"].med == 1 and got["a"].p90 == 9

    def test_matches_duckdb_grouped_quantile_disc(self, spark):
        import duckdb

        rows = [
            (f"g{i % 4}", (i * 13 + 7) % 31) for i in range(311)
        ]
        got = self._gqv(
            spark, rows, [("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10)]
        )
        want = {
            g: (p10, p50, p90)
            for g, p10, p50, p90 in duckdb.sql(
                "SELECT g, quantile_disc(v, 0.1), quantile_disc(v, 0.5), "
                "quantile_disc(v, 0.9) FROM (SELECT unnest($g) AS g, "
                "unnest($v) AS v) GROUP BY g",
                params={"g": [r[0] for r in rows],
                        "v": [r[1] for r in rows]},
            ).fetchall()
        }
        for g, r in got.items():
            assert (r.p10, r.p50, r.p90) == want[g], g

    def test_no_data_scale_window_in_rewritten_queries(self, spark, sf_dir):
        """The round-8 contract: impute_median / mad_outliers /
        winsorized_stats / exact_quantiles_qty windows only ever run
        on the aggregated (key x distinct-value) frame — never on the
        fact. A refactor reintroducing the hot-group data rank fails
        here even while the value oracle stays green."""
        from pyspark.sql import Window

        import __spark_entry__ as entry
        from smartbots_etl_facturas_spark.plans.doctor import (
            data_scale_windows,
        )

        # detector control: a genuine fact-scale rank is seen
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
        assert data_scale_windows(
            li.select(F.row_number().over(w).alias("rk"))
        ) == 1

        qs = entry.queries()
        for name in ("impute_median", "mad_outliers", "winsorized_stats",
                     "exact_quantiles_qty",
                     # round-11 migrations (r10 verdict #1/#2): histogram
                     # selection / peer-semantics cumulative derivation
                     "group_percentiles", "equi_depth_bins",
                     "window_percentiles"):
            assert data_scale_windows(qs[name](spark, sf_dir)) == 0, name

    def test_wide_domain_raises_instead_of_hot_window(self, spark):
        """Round-9 guard: feeding a CONTINUOUS column to the exact
        histogram-selection operators fails visibly (naming the KLL
        tier) instead of silently sorting a data-scale 'reduced'
        frame on one task. Exactness is why there is no automatic
        approx dispatch: these operators are oracle-checked."""
        import pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.sql.utils import CapturedException

        from smartbots_etl_facturas_spark.operators.orderstats import (
            exact_quantiles,
            group_quantile_values,
        )

        # a deterministic 'continuous' column: every value distinct
        cont = spark.range(500).select(
            (F.col("id") % 4).alias("g"),
            (F.col("id") * 7 + 3).alias("v"),
        )
        probs = [("p50", 1, 2)]
        with pytest.raises((Py4JJavaError, CapturedException),
                           match="distinct values"):
            group_quantile_values(
                cont, ["g"], "v", probs, max_domain_per_key=100
            ).collect()
        with pytest.raises((Py4JJavaError, CapturedException),
                           match="approx_percentile_sketch"):
            exact_quantiles(
                cont, "v", probs, max_domain_per_key=100
            ).collect()
        # bounded domain (or an explicit None) still computes exactly
        ok = group_quantile_values(
            cont.select("g", (F.col("v") % 10).alias("v")),
            ["g"], "v", probs, max_domain_per_key=100,
        ).collect()
        assert len(ok) == 4
        ok2 = group_quantile_values(
            cont, ["g"], "v", probs, max_domain_per_key=None
        ).collect()
        assert len(ok2) == 4


class TestGroupEquiDepthBins:
    """group_equi_depth_bins == the NTILE-window rollup it replaces
    (r10 verdict #1): the profile (per-bin n/v_min/v_max) is
    tie-order independent, so the reduced-frame derivation must match
    the windowed formulation exactly on any data."""

    def _ntile_rollup(self, df, key, val, bins):
        from pyspark.sql import Window
        w = Window.partitionBy(key).orderBy(F.col(val).asc())
        return (
            df.filter(F.col(val).isNotNull())
            .withColumn("b", F.ntile(bins).over(w).cast("int"))
            .groupBy(key, "b")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(val).alias("v_min"), F.max(val).alias("v_max"))
        )

    def _assert_match(self, spark, df, key, val, bins):
        from smartbots_etl_facturas_spark.operators.orderstats import (
            group_equi_depth_bins,
        )
        got = sorted(
            (r[key], int(r["bin"]), int(r["n"]), r["v_min"], r["v_max"])
            for r in group_equi_depth_bins(df, [key], val, bins).collect()
        )
        want = sorted(
            (r[key], int(r["b"]), int(r["n"]), r["v_min"], r["v_max"])
            for r in self._ntile_rollup(df, key, val, bins).collect()
        )
        assert got == want

    def test_matches_ntile_with_heavy_ties(self, spark):
        # values drawn from a tiny domain so ties straddle boundaries
        rows = [("g%d" % (i % 3), (i * i) % 7) for i in range(211)]
        df = spark.createDataFrame(rows, ["k", "v"])
        self._assert_match(spark, df, "k", "v", 10)

    def test_fewer_rows_than_bins(self, spark):
        # NTILE(10) over 4 rows emits bins 1..4 only; empty bins omitted
        df = spark.createDataFrame(
            [("a", 5), ("a", 1), ("a", 9), ("a", 1)], ["k", "v"]
        )
        self._assert_match(spark, df, "k", "v", 10)

    def test_nulls_excluded_and_partition_invariance(self, spark):
        rows = [("g", i % 11 if i % 13 else None) for i in range(300)]
        df = spark.createDataFrame(rows, "k: string, v: int")
        self._assert_match(spark, df, "k", "v", 7)
        from smartbots_etl_facturas_spark.operators.orderstats import (
            group_equi_depth_bins,
        )
        a = sorted(map(tuple, group_equi_depth_bins(df, ["k"], "v", 7).collect()))
        b = sorted(map(tuple, group_equi_depth_bins(
            df.repartition(13), ["k"], "v", 7).collect()))
        assert a == b

    def test_wide_domain_raises(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.sql.utils import CapturedException
        from smartbots_etl_facturas_spark.operators.orderstats import (
            group_equi_depth_bins,
        )
        df = spark.range(100).select(
            F.lit("k").alias("k"), F.col("id").alias("v"))
        with pytest.raises((Py4JJavaError, CapturedException, Exception),
                           match="distinct values|KLL"):
            group_equi_depth_bins(
                df, ["k"], "v", 4, max_domain_per_key=10).collect()


def test_domain_guard_raises_on_realistic_continuous_domain(spark):
    """Round-12 verdict #5: the MAX_DOMAIN_PER_KEY guard pinned at a
    REALISTIC domain size, not just a toy limit override — a
    continuous column with >2M distinct values in one group raises at
    execution time naming the KLL tier, and the measured domain-growth
    curve behind the guard value lives in PERF.md round-12."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from smartbots_etl_facturas_spark.operators.orderstats import (
        MAX_DOMAIN_PER_KEY,
        group_quantile_values,
    )

    assert MAX_DOMAIN_PER_KEY == 2_000_000
    n = MAX_DOMAIN_PER_KEY + 100_000
    df = spark.range(n).select(
        F.lit("g").alias("k"),
        (F.col("id") * 2654435761 % n).cast("double").alias("v"),
    )
    q = group_quantile_values(df, ["k"], "v", [("p50", 1, 2)])
    with _pytest.raises(Exception) as ei:
        q.collect()
    assert "KLL tier" in str(ei.value)
    # the same frame passes with the guard lifted (the experiment path)
    ok = group_quantile_values(df, ["k"], "v", [("p50", 1, 2)],
                               max_domain_per_key=None).collect()
    assert len(ok) == 1 and ok[0]["__n"] == n
