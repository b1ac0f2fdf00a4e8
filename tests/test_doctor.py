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


def test_flagged_node_inside_scalar_subquery_detected(spark, sf_dir):
    """Round-11 ADVICE: children() never reaches plans hanging off
    EXPRESSIONS — a global window (or cartesian) inside a scalar
    subquery must still trip the gate, and its exchanges must count."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "doctor_sq_orders"
    )
    # non-correlated scalar subquery whose plan contains an
    # unpartitioned Window — stays a SubqueryExec in the physical plan
    df = spark.sql(
        """
        SELECT o_orderkey,
               (SELECT max(rn) FROM (
                  SELECT row_number() OVER (ORDER BY o_orderkey) AS rn
                  FROM doctor_sq_orders)) AS total
        FROM doctor_sq_orders
        """
    )
    r = plan_report(df)
    assert r.global_windows >= 1
    with pytest.raises(RuntimeError, match="unpartitioned Window"):
        assert_scalable(df)


def test_data_scale_window_inside_subquery_counted(spark, sf_dir):
    from smartbots_etl_facturas_spark.plans.doctor import data_scale_windows

    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "doctor_dsw_orders"
    )
    df = spark.sql(
        """
        SELECT o_orderkey,
               (SELECT max(rn) FROM (
                  SELECT row_number() OVER (PARTITION BY o_orderstatus
                                            ORDER BY o_orderkey) AS rn
                  FROM doctor_dsw_orders)) AS total
        FROM doctor_dsw_orders
        """
    )
    assert data_scale_windows(df) >= 1


def test_dsv2_scan_reports_pushed_filters(spark, tmp_path):
    """Round-11 ADVICE: BatchScanExec has no V1 metadata map; pushed
    filters must be read off the Scan itself, not defaulted to False."""
    p = str(tmp_path / "dsv2.parquet")
    spark.range(100).selectExpr("id", "id % 7 AS k").write.parquet(p)
    prev = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        df = spark.read.parquet(p).filter(F.col("k") == 3).select("id")
        r = plan_report(df)
        assert r.scans, "no scan node found"
        assert any(s["pushed_filters"] for s in r.scans)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", prev)


def test_reused_subquery_not_double_counted(spark, sf_dir):
    """Round-11 review: subquery REUSE surfaces both SubqueryExec and
    ReusedSubqueryExec via QueryPlan.subqueries — the shared child's
    nodes must count once (same rule as ReusedExchange)."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "doctor_reuse_orders"
    )
    # the same scalar subquery referenced twice -> Spark reuses it
    df = spark.sql(
        """
        SELECT o_orderkey
        FROM doctor_reuse_orders
        WHERE o_totalprice > (SELECT avg(o_totalprice)
                              FROM doctor_reuse_orders)
           OR o_totalprice < (SELECT avg(o_totalprice)
                              FROM doctor_reuse_orders) / 10
        """
    )
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    r = plan_report(df)
    if "ReusedSubquery" in plan_str:
        # one shared subquery plan: its exchanges counted exactly once
        single = spark.sql(
            """
            SELECT o_orderkey FROM doctor_reuse_orders
            WHERE o_totalprice > (SELECT avg(o_totalprice)
                                  FROM doctor_reuse_orders)
            """
        )
        assert r.exchanges == plan_report(single).exchanges
    else:  # Spark planned two independent subqueries: both audited
        assert r.exchanges >= 1
