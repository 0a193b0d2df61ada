"""Query plans: the engine's verifiable query surface.

``QUERIES`` maps name -> (spark, sf_dir) -> DataFrame; ``ORACLE`` maps
the same names to DuckDB-runnable ANSI SQL producing identical columns.
"""

from datalake_toolkit_spark.plans.queries import ORACLE, QUERIES
from datalake_toolkit_spark.plans import llm_queries  # noqa: F401  (registers)
from datalake_toolkit_spark.plans import catalog_queries  # noqa: F401  (registers)
from datalake_toolkit_spark.plans import endpoint_queries  # noqa: F401  (registers)

__all__ = ["ORACLE", "QUERIES"]
