from smartbots_etl_facturas_spark.sinks.audit import AuditWriter
from smartbots_etl_facturas_spark.sinks.staged import (
    publish,
    read_published,
    rollback,
)

__all__ = ["AuditWriter", "publish", "read_published", "rollback"]
