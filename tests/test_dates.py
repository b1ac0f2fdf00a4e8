"""Golden date-parse cases (reference tests/unit/test_transformers.py:50-66)."""

import datetime

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.functions.dates import (
    EXTRACTOR_FORMATS,
    excel_serial_to_date,
    parse_date_multi,
)

CASES = [
    ("15-02-2026", datetime.date(2026, 2, 15)),
    ("2026-02-15", datetime.date(2026, 2, 15)),
    ("15/02/2026", datetime.date(2026, 2, 15)),
    ("31-13-2026", None),       # invalid month
    ("INVALID-DATE", None),
    (None, None),
]


def test_multi_format_golden(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(CASES)], "idx int, raw string")
    rows = df.withColumn("d", parse_date_multi(F.col("raw"))).orderBy("idx").collect()
    for row, (raw, expected) in zip(rows, CASES):
        assert row.d == expected, f"{raw!r}: {row.d} != {expected}"


def test_extractor_formats(spark):
    df = spark.createDataFrame(
        [("2026-02-15 10:30:00",), ("2026-02-15T10:30:00",)], "raw string"
    )
    rows = df.withColumn(
        "d", parse_date_multi(F.col("raw"), EXTRACTOR_FORMATS)
    ).collect()
    assert all(r.d == datetime.date(2026, 2, 15) for r in rows)


def test_excel_serial(spark):
    # serial 45000 = 2023-03-15 in the 1900 system (day 0 = 1899-12-30)
    df = spark.createDataFrame([(45000,), (1,), (None,)], "n int")
    rows = df.withColumn("d", excel_serial_to_date(F.col("n"))).collect()
    got = {r.n: r.d for r in rows}
    assert got[45000] == datetime.date(2023, 3, 15)
    assert got[1] == datetime.date(1899, 12, 31)
    assert got[None] is None
