"""Physical layout contracts: partition pruning prunes, bucketed
joins drop their shuffles."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.sinks.layout import (
    plan_exchange_count,
    scan_partition_filters,
    write_bucketed,
    write_partitioned,
)


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """A filter on the partition column must appear as a
    PartitionFilter on the scan (directory-level pruning), and the
    pruned read must return exactly the partition's rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_part")
    write_partitioned(li, path, ["l_returnflag"])

    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "A")
    pf = scan_partition_filters(back)
    assert "l_returnflag" in pf, pf
    assert back.count() == li.filter(F.col("l_returnflag") == "A").count()
    # non-partition filters must NOT show up as partition filters
    plain = spark.read.parquet(path).filter(F.col("l_quantity") > 10)
    assert "l_quantity" not in scan_partition_filters(plain)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    join WITHOUT an Exchange on either side; the unbucketed same join
    needs shuffles. This is the write-once-join-forever layout for the
    consolidated-by-PK table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    # disable broadcast so the join shape is governed by layout alone
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8,
                       sort_cols=["o_orderkey"])
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "t_li_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
        )
        bo, bl = spark.table("t_orders_b"), spark.table("t_li_b")
        bucketed = bo.join(bl, "o_orderkey").groupBy("o_custkey").agg(
            F.sum("l_quantity").alias("q")
        )
        plain = orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).groupBy("o_custkey").agg(F.sum("l_quantity").alias("q"))
        # bucketed: only the groupBy aggregation shuffles (1); the join
        # itself is co-located. plain: both join sides shuffle too (3).
        assert plan_exchange_count(bucketed) == 1, plan_exchange_count(bucketed)
        assert plan_exchange_count(plain) >= 3, plan_exchange_count(plain)
        # same answer either way
        a = {r.o_custkey: float(r.q) for r in bucketed.collect()}
        b = {r.o_custkey: float(r.q) for r in plain.collect()}
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_li_b")


def test_bucketed_overwrite_survives_stale_warehouse_dir(spark, sf_dir):
    """A session killed mid-saveAsTable leaves the warehouse DIRECTORY
    without a catalog entry; every later write then dies with
    LOCATION_ALREADY_EXISTS. write_bucketed(mode='overwrite') must
    clear the orphan and succeed (this exact leftover broke the whole
    suite in round 5)."""
    import os
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    spark.sql("DROP TABLE IF EXISTS t_stale_crash")
    stale = os.path.join(warehouse, "t_stale_crash")
    os.makedirs(os.path.join(stale, "junk"), exist_ok=True)
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        write_bucketed(orders, "t_stale_crash", ["o_orderkey"], 4)
        assert spark.table("t_stale_crash").count() == orders.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_stale_crash")


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP: a selective filter on the DIM side of a join against a
    partition-keyed fact must prune fact partitions at RUNTIME
    (dynamicpruning subquery in the scan's partition filters) — the
    Catalyst feature that turns star-schema joins over a partitioned
    lake into partial scans without any hand-written predicate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    path = str(tmp_path / "li_dpp")
    write_partitioned(li, path, ["l_returnflag"])
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("A", "keep"), ("N", "drop"), ("R", "drop")], "flag string, verdict string"
    )
    joined = fact.join(
        dim.filter(F.col("verdict") == "keep"),
        fact.l_returnflag == dim.flag,
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the pruned join returns exactly the A-partition rows
    assert joined.count() == li.filter(F.col("l_returnflag") == "A").count()


# --- Z-order clustering -----------------------------------------------------

def test_zorder_value_interleaves_bits(spark):
    from smartbots_etl_facturas_spark.sinks.layout import zorder_value

    df = spark.createDataFrame([(3, 0), (0, 3), (1, 1), (255, 255)], ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_value([F.col("x"), F.col("y")], bits=8).alias("z")
        ).collect()
    }
    # x occupies even bit positions, y odd: (3,0)->0b0101, (0,3)->0b1010
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(1, 1)] == 0b11
    assert got[(255, 255)] == (1 << 16) - 1


def test_zorder_value_range_guard(spark):
    from smartbots_etl_facturas_spark.sinks.layout import zorder_value

    with pytest.raises(ValueError):
        zorder_value([F.col("a"), F.col("b"), F.col("c")], bits=21)


def test_zorder_skips_files_on_second_dim(spark, tmp_path):
    """The data-skipping CONTRACT: after write_zordered, per-file
    min/max stats are tight on BOTH dimensions, so a selective filter
    on the SECOND column intersects far fewer files than under a
    linear sort on the first column (where dim-2 values spread over
    every file). Mirrors exactly the parquet row-group pruning rule:
    a file is readable iff [min, max] intersects the predicate."""
    from smartbots_etl_facturas_spark.sinks.layout import write_zordered

    n, files = 1 << 14, 16
    base = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), F.lit(256))).cast("long").alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(256))).cast("long").alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(base, zpath, ["x", "y"], bits=8, n_files=files)
    (base.repartitionByRange(files, "x").sortWithinPartitions("x")
         .write.mode("overwrite").parquet(lpath))

    def files_intersecting(path, col, lo, hi):
        stats = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
            .collect()
        )
        assert len(stats) >= files // 2
        return sum(1 for r in stats if r.mn <= hi and r.mx >= lo)

    # selective y-range: z-order keeps y clustered per file; the
    # x-sorted layout spreads every y range across ~all files
    z_hit = files_intersecting(zpath, "y", 0, 31)
    l_hit = files_intersecting(lpath, "y", 0, 31)
    assert l_hit >= files // 2
    assert z_hit <= l_hit // 2, f"z-order {z_hit} vs linear {l_hit}"
    # and x stays skippable too (both layouts cluster x)
    assert files_intersecting(zpath, "x", 0, 31) <= files // 2


def test_bucketed_overwrite_qualified_name_spares_default_db_twin(
    spark, sf_dir
):
    """Regression (data loss): overwriting db.t used to resolve the
    stale-warehouse path as warehouse/t — the DEFAULT database's
    same-named table directory — and rmtree a live table's data. The
    managed location must resolve per-database
    (warehouse/<db>.db/<tbl>)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS aux_db")
    spark.sql("DROP TABLE IF EXISTS t_twin")
    spark.sql("DROP TABLE IF EXISTS aux_db.t_twin")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        write_bucketed(orders, "t_twin", ["o_orderkey"], 4)
        n = spark.table("t_twin").count()
        write_bucketed(orders.limit(10), "aux_db.t_twin", ["o_orderkey"], 4)
        # the default-db twin must still be fully readable
        assert spark.table("t_twin").count() == n
        assert spark.table("aux_db.t_twin").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS t_twin")
        spark.sql("DROP TABLE IF EXISTS aux_db.t_twin")
        spark.sql("DROP DATABASE IF EXISTS aux_db")


def test_bucketed_overwrite_replaces_existing_table(spark, sf_dir):
    """Second overwrite of the SAME table swaps in the new data and
    leaves no staging table behind."""
    spark.sql("DROP TABLE IF EXISTS t_reovw")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        write_bucketed(orders, "t_reovw", ["o_orderkey"], 4)
        write_bucketed(orders.limit(7), "t_reovw", ["o_orderkey"], 4)
        assert spark.table("t_reovw").count() == 7
        leftovers = [
            t.name for t in spark.catalog.listTables()
            if "__staging_" in t.name
        ]
        assert leftovers == []
    finally:
        spark.sql("DROP TABLE IF EXISTS t_reovw")
