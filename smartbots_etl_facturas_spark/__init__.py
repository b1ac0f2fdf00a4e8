"""smartbots_etl_facturas_spark — a PySpark-native analytics engine.

Brand-new implementation of the query / data-processing capabilities of
the reference ETL pipeline (HansBuddenberg-SmartBots/smartbots-etl-facturas),
re-expressed as idiomatic Spark SQL / DataFrame operators, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference lacks.

Design stance (SURVEY.md §7): a small library of composable operators —
pure functions ``DataFrame -> DataFrame`` — with Catalyst doing all
optimization. No custom rules, no RDDs, no driver-side row loops.
"""

from smartbots_etl_facturas_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
