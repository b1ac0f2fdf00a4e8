"""P9/P10 — domain-invariant validation with an error side-channel.

The reference raises per-row exceptions in ``InvoiceRecord.__post_init__``
(smartbots-etl/src/domain/entities.py:54-71) and collects
``{file,row_index,error}`` dicts (consolidate_invoices.py:435-473).
Spark computes the *first failing rule* as a column, preserving the
reference's exception ordering, then splits valid/invalid outputs.

Tolerance: ``abs(total - (net+tax)) <= 1`` is **inclusive** (a variance
of exactly 1 passes — entities.py:67 uses ``> Decimal("1")``), proven
by the boundary tests at tests/unit/test_entities.py:77-92.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _blank(c: Column) -> Column:
    return c.isNull() | (F.trim(c.cast("string")) == "")


def error_reason(
    invoice_number: Column,
    reference_number: Column,
    carrier_name: Column,
    net_amount: Column,
    tax_amount: Column,
    total_amount: Column,
) -> Column:
    """First-failing-rule error message, NULL when the row is valid.

    Rule order mirrors entities.py:54-71 exactly.
    """
    expected = F.coalesce(net_amount, F.lit(0)) + F.coalesce(tax_amount, F.lit(0))
    return (
        F.when(_blank(invoice_number), F.lit("invoice_number no puede estar vacío"))
        .when(_blank(reference_number), F.lit("reference_number no puede estar vacío"))
        .when(_blank(carrier_name), F.lit("carrier_name no puede estar vacío"))
        .when(total_amount < 0, F.lit("total_amount no puede ser negativo"))
        .when(
            F.abs(total_amount - expected) > 1,
            F.lit("total_amount no coincide con net + tax"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def with_validation(
    df: DataFrame,
    invoice_number: str = "invoice_number",
    reference_number: str = "reference_number",
    carrier_name: str = "carrier_name",
    net_amount: str = "net_amount",
    tax_amount: str = "tax_amount",
    total_amount: str = "total_amount",
) -> DataFrame:
    """Add ``error_reason`` (string, NULL=valid) and ``valid`` (bool)."""
    reason = error_reason(
        F.col(invoice_number),
        F.col(reference_number),
        F.col(carrier_name),
        F.col(net_amount),
        F.col(tax_amount),
        F.col(total_amount),
    )
    return df.withColumn("error_reason", reason).withColumn(
        "valid", F.col("error_reason").isNull()
    )


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P10 — (valid rows, error rows). Caller should cache ``df`` when
    both sides are consumed (one scan, two filtered outputs)."""
    validated = with_validation(df) if "valid" not in df.columns else df
    return validated.filter(F.col("valid")), validated.filter(~F.col("valid"))
