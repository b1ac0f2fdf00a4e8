from smartbots_etl_facturas_spark.sources.manifest import pending_files
from smartbots_etl_facturas_spark.sources.readers import with_row_idx

__all__ = ["pending_files", "with_row_idx"]
