"""Sources and sinks (SURVEY.md §2.1)."""

from datalake_toolkit_spark.sources.tables import load_table, load_tables

__all__ = ["load_table", "load_tables"]
