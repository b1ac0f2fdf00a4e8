from smartbots_etl_facturas_spark.operators.validation import with_validation, split_valid
from smartbots_etl_facturas_spark.operators.upsert import (
    upsert_insert_only,
    upsert_full,
    audit_actions,
)
from smartbots_etl_facturas_spark.operators.reconcile import reconcile
from smartbots_etl_facturas_spark.operators.ordered import (
    drop_all_null_rows,
    filter_nonblank_key,
    filter_summary_rows,
    take_while,
    dedup_first_wins,
)

__all__ = [
    "with_validation",
    "split_valid",
    "upsert_insert_only",
    "upsert_full",
    "audit_actions",
    "reconcile",
    "drop_all_null_rows",
    "filter_nonblank_key",
    "filter_summary_rows",
    "take_while",
    "dedup_first_wins",
]
