"""etl_mini_spark — a PySpark-native analytics engine.

From-scratch, Spark-first re-expression of the capabilities of the
reference ETL framework (Zaur86/etl-mini, surveyed in SURVEY.md), plus
the relational/streaming/LLM-data-pipeline surface the reference lacks
(SURVEY.md §2.11). Everything is declared through the DataFrame/SQL API
so Catalyst owns optimization; Python UDFs appear only where built-in
operators genuinely cannot express the semantics (see operators/*).
"""

__version__ = "0.1.0"

from etl_mini_spark.session import get_spark  # noqa: F401
