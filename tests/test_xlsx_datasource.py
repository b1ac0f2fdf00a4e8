"""The xlsx_grid Python DataSource (sources/xlsx_datasource.py):
format registration, parity with the mapInPandas grid scan,
per-file partitioning, option handling."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.sources.xlsx import (
    read_xlsx_grid_distributed,
    write_xlsx,
)
from smartbots_etl_facturas_spark.sources.xlsx_datasource import (
    XlsxGridDataSource,
)

ROWS1 = [["invoice", "carrier", "total"],
         ["F-1", "ACME", "1.234"],
         ["F-2", "BETA", "99"]]
ROWS2 = [["invoice", "carrier", "total"],
         ["F-9", "GAMMA", "5"]]


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(XlsxGridDataSource)
    return spark


def _write_two(tmp_path):
    write_xlsx(tmp_path / "one.xlsx", ROWS1)
    write_xlsx(tmp_path / "two.xlsx", ROWS2, use_shared_strings=True)
    return str(tmp_path)


def test_matches_mapinpandas_grid_scan(registered, tmp_path):
    base = _write_two(tmp_path)
    via_ds = (
        registered.read.format("xlsx_grid").option("n_cols", 4)
        .load(f"{base}/*.xlsx")
    )
    via_mip = read_xlsx_grid_distributed(registered, f"{base}/*.xlsx", n_cols=4)
    a = sorted(
        (r.source_file.split("/")[-1], r.row_idx, r.c0, r.c1, r.c2, r.c3)
        for r in via_ds.collect()
    )
    b = sorted(
        (r.source_file.split("/")[-1], r.row_idx, r.c0, r.c1, r.c2, r.c3)
        for r in via_mip.collect()
    )
    assert a == b and len(a) == 5


def test_one_partition_per_file(registered, tmp_path):
    base = _write_two(tmp_path)
    df = registered.read.format("xlsx_grid").load(f"{base}/*.xlsx")
    assert df.rdd.getNumPartitions() == 2


def test_row_idx_restarts_per_file(registered, tmp_path):
    base = _write_two(tmp_path)
    df = registered.read.format("xlsx_grid").load(f"{base}/*.xlsx")
    firsts = (
        df.groupBy("source_file").agg(F.min("row_idx").alias("lo")).collect()
    )
    assert all(r.lo == 0 for r in firsts) and len(firsts) == 2


def test_column_pruning_projection(registered, tmp_path):
    base = _write_two(tmp_path)
    out = (
        registered.read.format("xlsx_grid").option("n_cols", 3)
        .load(f"{base}/one.xlsx")
        .select("c0")
        .collect()
    )
    assert [r.c0 for r in out] == ["invoice", "F-1", "F-2"]


def test_directory_path_and_missing_files(registered, tmp_path):
    base = _write_two(tmp_path)
    df = registered.read.format("xlsx_grid").load(base)  # directory form
    assert df.count() == 5
    with pytest.raises(Exception):
        registered.read.format("xlsx_grid").load(f"{base}/nope-*.xlsx").collect()


def test_extract_stack_runs_on_datasource_scan(registered, tmp_path):
    # the downstream header-discovery contract: same positional grid,
    # so discover-and-reheader dataflow works unchanged
    base = _write_two(tmp_path)
    df = (
        registered.read.format("xlsx_grid").option("n_cols", 3)
        .load(f"{base}/one.xlsx")
    )
    header = df.filter(F.col("row_idx") == 0).select("c0", "c1", "c2").collect()[0]
    assert list(header) == ["invoice", "carrier", "total"]
    body = df.filter(F.col("row_idx") > 0)
    assert body.count() == 2
