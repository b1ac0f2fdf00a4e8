"""Golden money-parse cases ported from the reference
(tests/unit/test_transformers.py:16-47)."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.functions.money import (
    parse_money,
    parse_money_pandas_udf,
)

GOLDEN = [
    ("1.234.567", Decimal("1234567.00")),      # Chilean thousands
    ("$12.345", Decimal("12345.00")),          # dollar sign + Chilean
    ("1234,56", Decimal("1234.56")),           # decimal comma
    ("1,234.56", Decimal("1234.56")),          # US format
    ("50000", Decimal("50000.00")),            # plain int string
    ("123.45", Decimal("123.45")),             # plain decimal (2 frac digits)
    ("1.234,56", Decimal("1234.56")),          # European format
    ("999", Decimal("999.00")),                # int passthrough
    ("  $ 1.000.000  ", Decimal("1000000.00")),  # whitespace + symbol
    ("N/A", None),                             # invalid → NULL
    (None, None),                              # null in → null out
]


@pytest.fixture(scope="module")
def golden_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(GOLDEN)], "idx int, raw string"
    )


def test_expression_tree_golden(spark, golden_df):
    rows = (
        golden_df.withColumn("parsed", parse_money(F.col("raw")))
        .orderBy("idx")
        .collect()
    )
    for row, (raw, expected) in zip(rows, GOLDEN):
        assert row.parsed == expected, f"{raw!r}: {row.parsed} != {expected}"


def test_pandas_udf_matches_expression(spark, golden_df):
    udf = parse_money_pandas_udf()
    rows = (
        golden_df.select(
            "idx", parse_money(F.col("raw")).alias("expr"), udf(F.col("raw")).alias("udf")
        )
        .orderBy("idx")
        .collect()
    )
    for row in rows:
        assert row.expr == row.udf


def test_single_dot_two_decimals_kept(spark):
    df = spark.createDataFrame([("12.34",), ("12.3456",)], "raw string")
    got = [r.parsed for r in df.select(parse_money(F.col("raw")).alias("parsed")).collect()]
    assert got[0] == Decimal("12.34")
    # 4 trailing digits → not Chilean thousands → decimal point, rounded to scale 2
    assert got[1] == Decimal("12.35")
