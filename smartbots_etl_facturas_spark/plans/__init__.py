from smartbots_etl_facturas_spark.plans.invoices import invoice_view

__all__ = ["invoice_view"]
