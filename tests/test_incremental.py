"""Tests for incremental materialized-aggregate maintenance
(operators/incremental.py): insert path == full recompute, retraction
path, empty-group pruning, min/max+retraction refusal."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.incremental import (
    aggregate_state,
    incremental_agg,
    merge_agg_state,
)


@pytest.fixture(scope="module")
def rows(spark):
    data = [
        ("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 5.0),
        ("a", 4, 40.0), ("b", 5, 15.0), ("c", 6, 7.0),
    ]
    return spark.createDataFrame(data, ["k", "id", "x"]).select(
        "k", "id", F.col("x").cast("decimal(18,2)").alias("x")
    )


def _snap(df):
    return {
        r.k: (r.cnt, float(r.sum_x), float(r.min_x), float(r.max_x))
        for r in df.collect()
    }


class TestInsertPath:
    def test_incremental_equals_full(self, spark, rows):
        base = rows.filter("id <= 3")
        delta = rows.filter("id > 3")
        state = aggregate_state(base, ["k"], ["x"], ["x"])
        merged = incremental_agg(state, delta, ["k"], ["x"], ["x"])
        full = aggregate_state(rows, ["k"], ["x"], ["x"])
        assert _snap(merged) == _snap(full)

    def test_new_key_appears(self, spark, rows):
        base = rows.filter("k != 'c'")
        delta = rows.filter("k = 'c'")
        state = aggregate_state(base, ["k"], ["x"], ["x"])
        merged = incremental_agg(state, delta, ["k"], ["x"], ["x"])
        assert _snap(merged)["c"] == (1, 7.0, 7.0, 7.0)


class TestRetraction:
    def test_retract_cancels_insert(self, spark, rows):
        state = aggregate_state(
            rows.withColumn("op", F.lit(1)), ["k"], ["x"], op_col="op"
        )
        # retract every 'b' row, insert one new 'b'
        delta = rows.filter("k = 'b'").withColumn("op", F.lit(-1)).unionByName(
            spark.createDataFrame([("b", 99, 100.0)], ["k", "id", "x"])
            .select("k", "id", F.col("x").cast("decimal(18,2)").alias("x"))
            .withColumn("op", F.lit(1))
        )
        merged = incremental_agg(state, delta, ["k"], ["x"], op_col="op")
        got = {r.k: (r.cnt, float(r.sum_x)) for r in merged.collect()}
        assert got["b"] == (1, 100.0)

    def test_fully_retracted_group_pruned(self, spark, rows):
        state = aggregate_state(
            rows.withColumn("op", F.lit(1)), ["k"], ["x"], op_col="op"
        )
        delta = rows.filter("k = 'c'").withColumn("op", F.lit(-1))
        merged = incremental_agg(state, delta, ["k"], ["x"], op_col="op")
        assert "c" not in {r.k for r in merged.collect()}

    def test_minmax_with_retraction_refused(self, spark, rows):
        with pytest.raises(ValueError):
            aggregate_state(
                rows.withColumn("op", F.lit(1)), ["k"], ["x"],
                minmax_cols=["x"], op_col="op",
            )


def test_merge_is_associative(spark, rows):
    a = aggregate_state(rows.filter("id <= 2"), ["k"], ["x"], ["x"])
    b = aggregate_state(rows.filter("id in (3, 4)"), ["k"], ["x"], ["x"])
    c = aggregate_state(rows.filter("id >= 5"), ["k"], ["x"], ["x"])
    ab_c = merge_agg_state(merge_agg_state(a, b, ["k"], ["x"], ["x"]),
                           c, ["k"], ["x"], ["x"])
    a_bc = merge_agg_state(a, merge_agg_state(b, c, ["k"], ["x"], ["x"]),
                           ["k"], ["x"], ["x"])
    assert _snap(ab_c) == _snap(a_bc)
