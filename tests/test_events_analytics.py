"""Tests for SCD2 changelog collapse, ordered funnel, and cohort
retention (operators/scd.py, operators/events.py)."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.events import cohort_retention, funnel_stages
from smartbots_etl_facturas_spark.operators.scd import scd2_from_changelog


class TestScd2:
    def test_collapse_and_intervals(self, spark):
        rows = [
            # user 1: A A B A -> 3 intervals (A@1-3, B@3-4, A@4-open)
            (1, 1, 10, "A"), (1, 2, 11, "A"), (1, 3, 12, "B"), (1, 4, 13, "A"),
            # user 2: single observation -> one open interval
            (2, 5, 14, "Z"),
        ]
        df = spark.createDataFrame(rows, ["uid", "ts", "eid", "attr"])
        out = sorted(
            scd2_from_changelog(df, ["uid"], "ts", ["attr"], "eid").collect(),
            key=lambda r: (r.uid, r.valid_from),
        )
        got = [(r.uid, r.attr, r.valid_from, r.valid_to, r.is_current) for r in out]
        assert got == [
            (1, "A", 1, 3, False),
            (1, "B", 3, 4, False),
            (1, "A", 4, None, True),
            (2, "Z", 5, None, True),
        ]

    def test_same_ts_tiebreak(self, spark):
        # two same-ts observations: the tie column orders them, so the
        # later event id wins the open interval
        rows = [(1, 7, 100, "old"), (1, 7, 101, "new")]
        df = spark.createDataFrame(rows, ["uid", "ts", "eid", "attr"])
        out = sorted(
            scd2_from_changelog(df, ["uid"], "ts", ["attr"], "eid").collect(),
            key=lambda r: r.valid_from == r.valid_to,
        )
        current = [r for r in out if r.is_current]
        assert len(current) == 1 and current[0].attr == "new"

    def test_null_attr_change(self, spark):
        rows = [(1, 1, 1, None), (1, 2, 2, "x"), (1, 3, 3, None)]
        df = spark.createDataFrame(
            rows, "uid int, ts int, eid int, attr string"
        )
        out = scd2_from_changelog(df, ["uid"], "ts", ["attr"], "eid").collect()
        assert len(out) == 3  # null -> x -> null are three changes


class TestFunnel:
    def test_strict_order_required(self, spark):
        rows = [
            (1, "view", 1), (1, "click", 2), (1, "purchase", 3),  # full
            (2, "click", 1), (2, "view", 2), (2, "purchase", 3),  # click before view
            (3, "view", 5), (3, "click", 5),                       # simultaneous
            (4, "view", 1),                                        # stalls at view
        ]
        df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
        out = {r.stage: r.n_users for r in
               funnel_stages(df, ["view", "click", "purchase"]).collect()}
        # user 2 has a click AFTER the view too? no: view@2, no click after 2
        # user 3: click not strictly after view (same ts)
        assert out == {1: 4, 2: 1, 3: 1}

    def test_monotone_on_real_data(self, spark, sf_dir):
        import __spark_entry__ as entry

        ev = entry.read_events(spark, sf_dir)
        out = sorted(
            funnel_stages(ev, ["signup", "view", "purchase"]).collect(),
            key=lambda r: r.stage,
        )
        ns = [r.n_users for r in out]
        assert ns == sorted(ns, reverse=True) and ns[0] > 0

    def test_empty_steps_rejected(self, spark):
        df = spark.createDataFrame([(1, "view", 1)], ["user_id", "event_type", "ts"])
        with pytest.raises(ValueError):
            funnel_stages(df, [])


class TestCohortRetention:
    def test_offsets(self, spark):
        wk = 7 * 24 * 3600 * 1_000_000_000
        rows = [
            (1, 0 * wk + 5), (1, 1 * wk + 5), (1, 3 * wk),  # cohort 0: offsets 0,1,3
            (2, 0 * wk + 9), (2, 1 * wk),                    # cohort 0: offsets 0,1
            (3, 2 * wk),                                      # cohort 2: offset 0
        ]
        df = spark.createDataFrame(rows, "user_id long, ts long")
        out = {(r.cohort_bucket, r.bucket_offset): r.n_users
               for r in cohort_retention(df).collect()}
        assert out == {(0, 0): 2, (0, 1): 2, (0, 3): 1, (2, 0): 1}

    def test_offset0_is_cohort_size(self, spark, sf_dir):
        import __spark_entry__ as entry

        ev = entry.read_events(spark, sf_dir)
        ret = cohort_retention(ev)
        base = ret.filter("bucket_offset = 0").agg(
            F.sum("n_users").alias("s")).head().s
        n_users = ev.select("user_id").distinct().count()
        assert base == n_users


class TestEwma:
    def test_recurrence_exact(self, spark):
        from smartbots_etl_facturas_spark.operators.timeseries import ewma_smooth

        rows = [(1, t, t, x) for t, x in
                enumerate([100, 200, 60, 60, 1000], start=1)]
        df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, x_units long")
        out = sorted(ewma_smooth(df).collect(), key=lambda r: r.ts)
        # s1=100; s2=100+(100//4)=125; s3=125+trunc(-65/4)=125-16=109;
        # s4=109+trunc(-49/4)=109-12=97; s5=97+(903//4)=97+225=322
        assert [r.ewma_units for r in out] == [100, 125, 109, 97, 322]

    def test_partition_invariance(self, spark, sf_dir):
        import __spark_entry__ as entry
        from pyspark.sql import functions as F
        from smartbots_etl_facturas_spark.operators.timeseries import ewma_smooth

        ev = entry.read_events(spark, sf_dir).select(
            "user_id", "ts", "event_id",
            (F.col("value").cast("decimal(18,4)") * 10000).cast("long").alias("x_units"),
        )
        a = {(r.user_id, r.event_id): r.ewma_units
             for r in ewma_smooth(ev).collect()}
        b = {(r.user_id, r.event_id): r.ewma_units
             for r in ewma_smooth(ev.repartition(17)).collect()}
        assert a == b and len(a) > 0

    def test_bad_alpha_rejected(self, spark):
        from smartbots_etl_facturas_spark.operators.timeseries import ewma_smooth

        df = spark.createDataFrame([(1, 1, 1, 1)], "user_id long, ts long, event_id long, x_units long")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            ewma_smooth(df, alpha_denom=1)


class TestHoltLinear:
    def test_recurrence_exact(self, spark):
        from smartbots_etl_facturas_spark.operators.timeseries import (
            holt_linear,
        )

        rows = [(1, t, t, x) for t, x in
                enumerate([100, 200, 60, 1000], start=1)]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, event_id long, x_units long"
        )
        out = sorted(holt_linear(df).collect(), key=lambda r: r.ts)
        # t1: l=100 b=0
        # t2: pred=100, l=100+(100//4)=125, b=0+(25//8)=3
        # t3: pred=128, l=128+trunc(-68/4)=128-17=111,
        #     b=3+trunc(-17/8)=3-2=1
        # t4: pred=112, l=112+(888//4)=112+222=334, b=1+(222//8)=1+27=28
        assert [(r.level_units, r.trend_units, r.forecast_units)
                for r in out] == [
            (100, 0, 100), (125, 3, 128), (111, 1, 112), (334, 28, 362)
        ]

    def test_tracks_linear_ramp(self, spark):
        """On a pure linear series the trend converges to the slope
        and the one-step forecast converges to the next value — the
        property EWMA (flat-level) cannot have."""
        from smartbots_etl_facturas_spark.operators.timeseries import (
            holt_linear,
        )

        slope = 80
        rows = [(1, t, t, 1000 + slope * t) for t in range(1, 61)]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, event_id long, x_units long"
        )
        out = sorted(holt_linear(df).collect(), key=lambda r: r.ts)
        tail = out[-1]
        assert abs(tail.trend_units - slope) <= 8  # converged near slope
        nxt = 1000 + slope * 61
        assert abs(tail.forecast_units - nxt) <= 40

    def test_partition_invariance(self, spark, sf_dir):
        import __spark_entry__ as entry
        from pyspark.sql import functions as F
        from smartbots_etl_facturas_spark.operators.timeseries import (
            holt_linear,
        )

        ev = entry.read_events(spark, sf_dir).select(
            "user_id", "ts", "event_id",
            (F.col("value").cast("decimal(18,4)") * 10000)
            .cast("long").alias("x_units"),
        )
        a = {(r.user_id, r.event_id): (r.level_units, r.trend_units)
             for r in holt_linear(ev).collect()}
        b = {(r.user_id, r.event_id): (r.level_units, r.trend_units)
             for r in holt_linear(ev.repartition(17)).collect()}
        assert a == b and len(a) > 0
