from smartbots_etl_facturas_spark.functions.money import parse_money, parse_money_pandas_udf
from smartbots_etl_facturas_spark.functions.dates import parse_date_multi, excel_serial_to_date
from smartbots_etl_facturas_spark.functions.cleaning import (
    clean_string,
    normalize_currency,
    strip_prefix,
    int_display_cast,
)

__all__ = [
    "parse_money",
    "parse_money_pandas_udf",
    "parse_date_multi",
    "excel_serial_to_date",
    "clean_string",
    "normalize_currency",
    "strip_prefix",
    "int_display_cast",
]
