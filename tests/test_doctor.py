"""Plan doctor: anti-pattern detection + the deploy gate."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.plans.doctor import assert_scalable, plan_report


def test_clean_aggregation_passes(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") > 10)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
    )
    r = assert_scalable(df)
    assert r.exchanges >= 1 and not r.warnings
    assert r.scans and r.scans[0]["pushed_filters"]      # filter reached scan
    assert len(r.scans[0]["columns"]) == 2               # pruned projection


def test_cartesian_product_detected(spark, sf_dir):
    a = spark.read.parquet(f"{sf_dir}/region.parquet")
    b = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cross = a.crossJoin(b)
    # crossJoin of two scans plans as BroadcastNestedLoopJoin or
    # CartesianProduct depending on sizes — both are gate-fatal
    with pytest.raises(RuntimeError, match="anti-pattern"):
        assert_scalable(cross)


def test_global_window_detected(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "rn", F.row_number().over(Window.orderBy("o_orderkey"))
    )
    r = plan_report(df)
    assert r.global_windows >= 1
    with pytest.raises(RuntimeError, match="unpartitioned Window"):
        assert_scalable(df)


def test_partitioned_window_passes(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderkey")
        ),
    )
    r = assert_scalable(df)
    assert r.global_windows == 0


def test_engine_flagship_is_scalable(spark, sf_dir):
    """The engine's own flagship plan must pass its own gate."""
    import __spark_entry__ as entry

    r = assert_scalable(entry.queries()["flagship_consolidation"](spark, sf_dir))
    assert r.cartesian_products == 0
