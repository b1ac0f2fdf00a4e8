"""F4/F7, P2-P4 — pervasive string-normalization column functions.

Reference: smartbots-etl/src/application/transformers.py:51-55 (clean
string), :31 (currency), official_format_extractor.py:32-36 (prefix
strip), excel_handler.py:98-104 (int display cast).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_string(col: Column) -> Column:
    """P2 — None → "" and trim, exactly like `_clean_string`."""
    return F.when(col.isNull(), F.lit("")).otherwise(F.trim(col.cast("string")))


def normalize_currency(col: Column, default: str = "CLP") -> Column:
    """P3 — trim + upper, defaulting when missing/blank."""
    cleaned = F.upper(clean_string(col))
    return F.when(cleaned == "", F.lit(default)).otherwise(cleaned)


def strip_prefix(col: Column, prefix: str = "Aprobado por: ") -> Column:
    """P4 — remove a known leading label then trim."""
    return F.trim(F.regexp_replace(clean_string(col), f"^{prefix}", ""))


def int_display_cast(col: Column) -> Column:
    """F7 — numeric-looking strings rendered as integers ("123.0" → 123),
    non-numeric passed through unchanged."""
    as_num = col.cast("string").try_cast("double")
    return F.when(as_num.isNotNull(), as_num.cast("long").cast("string")).otherwise(
        col.cast("string")
    )
