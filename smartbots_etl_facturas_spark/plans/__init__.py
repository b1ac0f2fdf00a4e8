from smartbots_etl_facturas_spark.plans.consolidation import RunReport, consolidate
from smartbots_etl_facturas_spark.plans.invoices import invoice_view

__all__ = ["RunReport", "consolidate", "invoice_view"]
