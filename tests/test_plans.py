"""Plan-shape regression tests — the scale behaviors PERF.md claims,
asserted against `.explain` output so a refactor can't silently lose
pushdown, broadcasts, or the window-limit optimization.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_of(spark, name: str) -> str:
    return _plan(entrymod.queries()[name](spark, SF))


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "upsert_insert_only")
    assert "PushedFilters: [IsNotNull(l_linenumber)" in plan
    # column pruning: the existing-keys scan reads 2 columns, never 16
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>" in plan


def test_dedup_uses_window_group_limit(spark):
    plan = plan_of(spark, "dedup_first_wins")
    assert "WindowGroupLimit" in plan          # partial top-1 before shuffle


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "brand_revenue")
    # tree section + detail section each list the 3 join nodes
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    # fact scan pruned to the 4 join/measure columns
    assert ("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint,"
            "l_extendedprice:double,l_discount:double>") in plan


def test_upsert_anti_join_is_broadcast(spark):
    plan = plan_of(spark, "upsert_insert_only")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_aggregations_have_partial_stage(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "partial_sum" in plan               # map-side combine
    # codegen span ids only render on non-adaptive (final) plans
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert "codegen id" in plan_of(spark, "pricing_summary")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_no_python_udf_in_relational_queries(spark):
    """Python only where the design says so (multimodal mapInPandas);
    the relational/text surface stays JVM-side."""
    for name in ("flagship_consolidation", "text_quality", "money_parse_golden",
                 "sessions", "cube_sales", "token_count"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
    assert "MapInPandas" in plan_of(spark, "multimodal_features")
