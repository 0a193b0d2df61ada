"""JSON catalog endpoints (SURVEY.md §2.1 S9/S14).

The reference round-trips catalog entities through S3 JSON with a
hard-enforced schema on read (hive_metastore_migration.py:1435-1446,
export_from_datacatalog.py:39-48): writes are plain ``format('json')``
overwrites, reads apply the declared ``DATACATALOG_*`` StructType so
malformed or drifted documents surface as nulls instead of schema
inference surprises. Same contract here with the document schemas
from :mod:`datalake_toolkit_spark.catalog.schemas`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datalake_toolkit_spark.catalog.schemas import TABLE_DOC_SCHEMA

DATABASE_DOC_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("locationUri", T.StringType()),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
    ]
)

_SCHEMAS: dict[str, T.StructType] = {
    "table": TABLE_DOC_SCHEMA,
    "database": DATABASE_DOC_SCHEMA,
}


def write_catalog_json(docs: DataFrame, path: str) -> None:
    """S14: JSON sink, overwrite semantics
    (hive_metastore_migration.py:1435-1437)."""
    docs.write.format("json").mode("overwrite").save(path)


def read_catalog_json(spark: SparkSession, path: str, kind: str = "table") -> DataFrame:
    """S9: JSON scan with the declared document schema enforced
    (hive_metastore_migration.py:1444-1446) — no inference, stable
    column order, drifted fields read as null."""
    return spark.read.json(path, schema=_SCHEMAS[kind])
