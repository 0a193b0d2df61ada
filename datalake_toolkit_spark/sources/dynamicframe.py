"""Glue DynamicFrame compatibility facade (SURVEY.md §2.1 S10/S16).

The reference's Glue jobs touch DynamicFrame only as a thin shim:
``create_dynamic_frame.from_options(connection_type='catalog', ...)``
→ ``.toDF()`` on the way in (export_from_datacatalog.py:69-75), and
``DynamicFrame.fromDF(...)`` →
``write_dynamic_frame.from_options(connection_type='catalog', ...)``
on the way out (import_into_datacatalog.py:34-57). This module keeps
that call shape so a reference Glue script ports line-for-line, while
the "catalog" connection binds to the engine's JSON-document catalog
instead of the AWS Data Catalog service:

- every DynamicFrame is a plain DataFrame underneath — Catalyst plans
  everything; no per-record self-describing overhead;
- ``apply_mapping`` / ``resolve_choice`` (the two Glue transforms the
  scripts rely on) compile to select/cast projections;
- connection_type 'catalog' reads/writes the mixed-entity JSON layout
  the reference migrates through S3 (type + database/table/partition
  rows); 'parquet'/'json'/'csv' pass through to spark.read/write.

No AWS client is involved anywhere: the service coupling was the only
part of S10/S16 that had no Spark-native meaning.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DynamicFrame:
    """DataFrame wrapper with the Glue call surface the reference uses."""

    def __init__(self, df: DataFrame, name: str = "") -> None:
        self._df = df
        self.name = name

    # -- Glue API parity ---------------------------------------------------

    @classmethod
    def fromDF(cls, dataframe: DataFrame, glue_ctx=None, name: str = "") -> "DynamicFrame":
        """import_into_datacatalog.py:34-40 shape (glue_ctx accepted
        and ignored — there is no service context)."""
        return cls(dataframe, name=name)

    def toDF(self) -> DataFrame:
        return self._df

    def count(self) -> int:
        return self._df.count()

    def schema(self):
        return self._df.schema

    def apply_mapping(
        self, mappings: Iterable[tuple[str, str, str, str]]
    ) -> "DynamicFrame":
        """Glue ApplyMapping: [(src, src_type, dst, dst_type)] →
        one select of casts/renames (a single Catalyst projection)."""
        cols = [
            F.col(src).cast(dst_type).alias(dst)
            for src, _src_type, dst, dst_type in mappings
        ]
        return DynamicFrame(self._df.select(*cols), name=self.name)

    def resolve_choice(
        self, specs: Iterable[tuple[str, str]] = ()
    ) -> "DynamicFrame":
        """Glue ResolveChoice for the cast action: [(col, 'cast:type')].
        Other actions (make_struct/make_cols) have no meaning without
        Glue's per-record choice types — a DataFrame column already has
        exactly one type — so they are identity here."""
        df = self._df
        for col, action in specs:
            if action.startswith("cast:"):
                df = df.withColumn(col, F.col(col).cast(action[5:]))
        return DynamicFrame(df, name=self.name)


def create_dynamic_frame_from_options(
    spark: SparkSession,
    connection_type: str,
    connection_options: Mapping[str, str],
    format: str | None = None,  # noqa: A002 - Glue's own keyword
) -> DynamicFrame:
    """glue_context.create_dynamic_frame.from_options equivalent.

    'catalog' reads the mixed-entity JSON document layout
    (export_from_datacatalog.py:69-83): one frame holding database /
    table / partition rows distinguished by a ``type`` column, exactly
    what the reference filters with ``df.where('type = "..."')``."""
    if connection_type == "catalog":
        path = connection_options["catalog.path"]
        return DynamicFrame(spark.read.json(path), name="catalog")
    if connection_type in ("parquet", "json", "csv"):
        reader = spark.read
        if connection_type == "csv":
            reader = reader.option(
                "sep", connection_options.get("separator", ",")
            ).option("header", connection_options.get("header", "false"))
        return DynamicFrame(
            getattr(reader, connection_type)(connection_options["path"])
        )
    raise ValueError(f"unsupported connection_type: {connection_type!r}")


def write_dynamic_frame_from_options(
    frame: DynamicFrame,
    connection_type: str,
    connection_options: Mapping[str, str],
) -> None:
    """glue_context.write_dynamic_frame.from_options equivalent
    (import_into_datacatalog.py:49-57): 'catalog' appends entity
    documents to the JSON catalog; file types pass through."""
    if connection_type == "catalog":
        frame.toDF().write.format("json").mode("append").save(
            connection_options["catalog.path"]
        )
        return
    if connection_type in ("parquet", "json", "csv"):
        frame.toDF().write.format(connection_type).mode(
            connection_options.get("mode", "overwrite")
        ).save(connection_options["path"])
        return
    raise ValueError(f"unsupported connection_type: {connection_type!r}")
