"""Sources and sinks (SURVEY.md §2.1)."""

from datalake_toolkit_spark.sources.dynamicframe import (
    DynamicFrame,
    create_dynamic_frame_from_options,
    write_dynamic_frame_from_options,
)
from datalake_toolkit_spark.sources.formats import read_files, write_files
from datalake_toolkit_spark.sources.tables import load_table, load_tables

__all__ = [
    "DynamicFrame",
    "create_dynamic_frame_from_options",
    "load_table",
    "load_tables",
    "read_files",
    "write_dynamic_frame_from_options",
    "write_files",
]
