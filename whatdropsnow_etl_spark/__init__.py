"""whatdropsnow_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL
(janiskesteris/whatdropsnow-etl), widened into a general
OLAP + LLM-data-pipeline operator library designed for
100 TB-scale execution (broadcast dims, partial aggregation,
pushed-down scans, no driver-side loops).
"""

__version__ = "0.1.0"
