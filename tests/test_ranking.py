"""Distributed global rank (operators/ranking.py): the two-pass
range-partitioned scheme must agree EXACTLY with the single-window
formulation on any total order, and its plan must contain no
global (empty-partition) window."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.ranking import (
    global_order_index,
    ntile_from_rank,
)


def _frame(spark, n=500, seed=13):
    # collisions in v force the tie-break column to matter
    return spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * seed) % 37).alias("v"),
    ).repartition(11)


def test_rank_matches_global_window_asc(spark):
    df = _frame(spark)
    got = {
        r.k: r.rank
        for r in global_order_index(df, [F.col("v"), F.col("k")]).collect()
    }
    w = Window.orderBy(F.col("v"), F.col("k"))
    want = {
        r.k: r.i
        for r in df.withColumn("i", F.row_number().over(w)).collect()
    }
    assert got == want


def test_rank_matches_global_window_desc(spark):
    df = _frame(spark, seed=29)
    order = [F.col("v").desc(), F.col("k")]
    got = {r.k: r.rank for r in global_order_index(df, order).collect()}
    want = {
        r.k: r.i
        for r in df.withColumn(
            "i", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_cumsum_and_totals_match_window(spark):
    df = _frame(spark, n=300, seed=7)
    out = global_order_index(
        df,
        [F.col("v").desc(), F.col("k")],
        cumsum_cols={"cum": "v"},
        total_count_col="n",
        total_sum_cols={"total": "v"},
    )
    rows = out.collect()
    w = Window.orderBy(F.col("v").desc(), F.col("k"))
    want = {
        r.k: r.cum
        for r in df.withColumn(
            "cum",
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ).collect()
    }
    assert {r.k: r.cum for r in rows} == want
    tot = df.agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).first()
    assert all(r.n == tot.n and r.total == tot.s for r in rows)


def test_partition_invariance_and_count_param(spark):
    df = _frame(spark, n=200, seed=17)
    a = {r.k: r.rank for r in global_order_index(
        df, [F.col("v"), F.col("k")], partitions=3).collect()}
    b = {r.k: r.rank for r in global_order_index(
        df.repartition(23), [F.col("v"), F.col("k")], partitions=19).collect()}
    assert a == b


def test_plan_has_no_global_window(spark):
    from smartbots_etl_facturas_spark.plans.doctor import plan_report

    out = global_order_index(_frame(spark), [F.col("v"), F.col("k")])
    rep = plan_report(out)
    assert not rep.global_windows


@pytest.mark.parametrize("n,k", [(5, 2), (7, 3), (10, 4), (10, 10),
                                 (3, 10), (40, 7), (1, 1)])
def test_ntile_from_rank_matches_window_ntile(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").alias("v"))
    w = Window.orderBy("v")
    want = {r.v: r.t for r in df.withColumn("t", F.ntile(k).over(w)).collect()}
    got = {
        r.v: r.t
        for r in df.withColumn("rank", F.col("v"))
        .withColumn("t", ntile_from_rank(F.col("rank"), F.lit(n), k))
        .collect()
    }
    assert got == want


class TestAdaptiveTier:
    """Round-8 adaptive small-frame tier: results are bit-identical
    across the single-window and two-pass paths, and multi_order_index
    matches chained global_order_index calls."""

    def _frame(self, spark, n=500):
        from pyspark.sql import functions as F

        return spark.range(n).select(
            (F.col("id") * 48271 % 197).alias("v"),
            ((F.col("id") * 16807) % 89).alias("x"),
            F.col("id"),
        )

    def test_small_tier_matches_two_pass(self, spark):
        from pyspark.sql import functions as F

        from smartbots_etl_facturas_spark.operators.ranking import (
            global_order_index,
        )

        df = self._frame(spark)
        order = [F.col("v"), F.col("id")]
        kw = dict(
            rank_col="r",
            cumsum_cols={"cum_x": "x"},
            total_count_col="n",
            total_sum_cols={"tot_x": "x"},
        )
        small = global_order_index(df, order, **kw)  # default: small tier
        two = global_order_index(df, order, small_frame_threshold=0, **kw)
        cols = ["id", "r", "cum_x", "n", "tot_x"]
        assert sorted(map(tuple, small.select(cols).collect())) == sorted(
            map(tuple, two.select(cols).collect())
        )
        assert dict(small.dtypes) == dict(two.dtypes)

    def test_multi_order_matches_chained(self, spark):
        from pyspark.sql import functions as F

        from smartbots_etl_facturas_spark.operators.ranking import (
            global_order_index,
            multi_order_index,
        )

        df = self._frame(spark)
        orders = {
            "r_v": [F.col("v"), F.col("id")],
            "r_x": [F.col("x"), F.col("id")],
        }
        for thr in (None, 0):  # both tiers
            got = multi_order_index(
                df, orders, total_count_col="n", small_frame_threshold=thr
            )
            want = global_order_index(
                df, orders["r_v"], rank_col="r_v", total_count_col="n",
                small_frame_threshold=thr or 0,
            )
            want = global_order_index(
                want, orders["r_x"], rank_col="r_x",
                small_frame_threshold=thr or 0,
            )
            cols = ["id", "r_v", "r_x", "n"]
            assert sorted(map(tuple, got.select(cols).collect())) == sorted(
                map(tuple, want.select(cols).collect())
            ), thr
