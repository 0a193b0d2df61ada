"""Catalog subsystem (SURVEY.md §3.3, M3): Hive-metastore-shaped
relational tables <-> nested catalog documents, plus the engine's own
catalog/search surface."""

from datalake_toolkit_spark.catalog.metastore import (
    assemble_catalog_partitions,
    assemble_catalog_databases,
    assemble_catalog_tables,
    assemble_skewed_info,
    explode_catalog_partitions,
    explode_catalog_tables,
    flatten_catalog_tables,
)
from datalake_toolkit_spark.catalog.json_io import (
    read_catalog_json,
    write_catalog_json,
)
from datalake_toolkit_spark.catalog.search import (
    catalog_columns,
    catalog_sql,
    catalog_walk_documents,
    catalog_search_documents,
    lake_table_documents,
    raw_file_documents,
    raw_file_search_documents,
    register_star_schema,
    search_catalog,
)

__all__ = [
    "assemble_catalog_partitions",
    "assemble_skewed_info",
    "explode_catalog_partitions",
    "assemble_catalog_databases",
    "assemble_catalog_tables",
    "catalog_columns",
    "catalog_sql",
    "catalog_search_documents",
    "lake_table_documents",
    "raw_file_documents",
    "raw_file_search_documents",
    "catalog_walk_documents",
    "explode_catalog_tables",
    "flatten_catalog_tables",
    "read_catalog_json",
    "register_star_schema",
    "search_catalog",
    "write_catalog_json",
]
from datalake_toolkit_spark.catalog.ddl import (  # noqa: E402,F401
    schema_to_ddl,
    table_doc_to_hive_ddl,
)
