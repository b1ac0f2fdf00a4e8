"""Invoice view over the driver's TPC-H-ish testdata.

Maps `lineitem` onto the reference's invoice schema (FIXTURES.md §6:
composite PK ≈ (l_orderkey, l_linenumber), amounts ≈ extendedprice/tax)
so every SURVEY §2 operator can be exercised and oracle-checked on the
driver's tables.

The ``dirty`` variant deterministically injects the reference's
error classes (blank carrier / negative total / total≠net+tax) to
feed the P9/P10 validation channel.

Money columns are decimal from the first projection — decimal
arithmetic is exact and order-independent, so downstream sums are
stable under any partitioning (the 100 TB requirement), and the DuckDB
oracle mirrors the same casts.

Determinism invariant (learned the hard way): cast RAW double columns
to decimal (their source values carry ≤4 decimal digits, so the cast
is faithful in both Spark and DuckDB), do all arithmetic in decimal
without ever narrowing a scale (Spark rounds HALF_UP, DuckDB
truncates — narrowing diverges on exact ties), and cast to DOUBLE only
in the final projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def invoice_view(lineitem: DataFrame, dirty: bool = False) -> DataFrame:
    net = F.col("l_extendedprice").cast("decimal(12,2)")
    tax = net * F.col("l_tax").cast("decimal(8,4)")   # exact, scale 6
    base_total = net + tax
    if dirty:
        carrier = F.when(F.col("l_partkey") % 41 == 0, F.lit("")).otherwise(
            F.concat(F.lit("SUPP-"), F.col("l_suppkey").cast("string"))
        )
        total = (
            F.when(F.col("l_linenumber") == 6, -base_total)
            .when(F.col("l_linenumber") == 5, base_total + 7)
            .otherwise(base_total)
        )
    else:
        carrier = F.concat(F.lit("SUPP-"), F.col("l_suppkey").cast("string"))
        total = base_total
    return lineitem.select(
        F.col("l_orderkey").cast("string").alias("invoice_number"),
        F.col("l_linenumber").cast("string").alias("reference_number"),
        carrier.alias("carrier_name"),
        F.col("l_returnflag").alias("ship_name"),
        F.col("l_shipdate").cast("date").alias("invoice_date"),
        net.alias("net_amount"),
        tax.alias("tax_amount"),
        total.alias("total_amount"),
        F.lit("CLP").alias("currency"),
        F.concat(F.lit("file_"), (F.col("l_orderkey") % 8).cast("string")).alias("source_file"),
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
    )


def invoices_cte(name: str = "invoices", dirty: bool = False) -> str:
    """DuckDB twin of :func:`invoice_view` as a named CTE body, kept
    textually adjacent so the two stay in lock-step. Used by
    __spark_entry__.oracle_sql()."""
    net = "CAST(l_extendedprice AS DECIMAL(12,2))"
    tax = f"({net} * CAST(l_tax AS DECIMAL(8,4)))"
    base_total = f"({net} + {tax})"
    if dirty:
        carrier = ("CASE WHEN l_partkey % 41 = 0 THEN ''"
                   " ELSE 'SUPP-' || CAST(l_suppkey AS VARCHAR) END")
        total = (f"CASE WHEN l_linenumber = 6 THEN -({base_total})"
                 f" WHEN l_linenumber = 5 THEN ({base_total}) + 7"
                 f" ELSE {base_total} END")
    else:
        carrier = "'SUPP-' || CAST(l_suppkey AS VARCHAR)"
        total = base_total
    return f"""
{name} AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS invoice_number,
         CAST(l_linenumber AS VARCHAR) AS reference_number,
         {carrier} AS carrier_name,
         l_returnflag AS ship_name,
         CAST(l_shipdate AS DATE) AS invoice_date,
         {net} AS net_amount,
         {tax} AS tax_amount,
         {total} AS total_amount,
         'CLP' AS currency,
         'file_' || CAST(l_orderkey % 8 AS VARCHAR) AS source_file,
         l_orderkey, l_linenumber, l_partkey, l_suppkey
  FROM lineitem
)"""
