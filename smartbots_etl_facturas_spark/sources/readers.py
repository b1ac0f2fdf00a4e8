"""S1/S2/S4 — reading with the explicit row-order invariant.

Spark has no implicit row order, so order-sensitive operators (P8
take-while, U4 first-wins dedup, S8 append position) need an explicit
order column. For file formats that carry natural order (CSV/XLSX
line order), attach it at read time; parquet testdata carries
domain order columns instead (e.g. l_linenumber).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_row_idx(df: DataFrame, order_cols: list[str], idx_name: str = "row_idx") -> DataFrame:
    """Attach a dense 0-based row index from explicit order columns.

    A global window sort — use only on per-file-sized frames (the
    reference's inputs are tens of rows per file). Large frames should
    keep their natural order columns instead.
    """
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(idx_name, F.row_number().over(w) - 1)


def read_parquet_table(spark, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
