"""Hive DDL generation from catalog metadata.

The reference keeps its table definitions as hand-written HQL
artifacts (artifacts/hive_create_table/tb_call_req-raw.hql:1-148,
tb_call_req-analytics.hql:1-146: CREATE EXTERNAL TABLE + ROW FORMAT /
STORED AS + LOCATION). This module GENERATES that DDL instead — from a
collected catalog table document (the assemble_catalog_tables shape)
or directly from a DataFrame schema — so the definition can never
drift from the metadata it describes.

Driver-side by design: DDL is per-table metadata (a few KB), not data.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import types as T


def _quote(v: str) -> str:
    return "'" + str(v).replace("'", "\\'") + "'"


def _col_lines(cols: Sequence[Mapping]) -> str:
    lines = []
    for c in cols:
        line = f"    {c['name']} {c['type']}"
        if c.get("comment"):
            line += f" COMMENT {_quote(c['comment'])}"
        lines.append(line)
    return ",\n".join(lines)


def table_doc_to_hive_ddl(doc: Mapping) -> str:
    """CREATE EXTERNAL TABLE HQL from one catalog table document
    (``assemble_catalog_tables`` row, ``.asDict(recursive=True)``):
    columns + partition keys from the nested storage descriptor,
    ROW FORMAT SERDE with its properties, STORED AS input/output
    formats, LOCATION. Matches the reference artifact layout."""
    sd = doc.get("storageDescriptor") or {}
    name = doc["name"] if not doc.get("database") else f"{doc['database']}.{doc['name']}"
    out = [f"CREATE EXTERNAL TABLE {name}(", _col_lines(sd.get("columns") or []), ")"]
    pkeys = doc.get("partitionKeys") or []
    if pkeys:
        keys = ", ".join(f"{k['name']} {k['type']}" for k in pkeys)
        out.append(f"PARTITIONED BY ({keys})")
    serde = sd.get("serdeInfo") or {}
    if serde.get("serializationLibrary"):
        out.append(f"ROW FORMAT SERDE {_quote(serde['serializationLibrary'])}")
        params = serde.get("parameters") or {}
        if params:
            kv = ", ".join(
                f"{_quote(k)} = {_quote(v)}" for k, v in sorted(params.items())
            )
            out.append(f"WITH SERDEPROPERTIES ({kv})")
    if sd.get("inputFormat") or sd.get("outputFormat"):
        out.append("STORED AS")
        if sd.get("inputFormat"):
            out.append(f"  INPUTFORMAT {_quote(sd['inputFormat'])}")
        if sd.get("outputFormat"):
            out.append(f"  OUTPUTFORMAT {_quote(sd['outputFormat'])}")
    if sd.get("location"):
        out.append(f"LOCATION {_quote(sd['location'])}")
    return "\n".join(out) + ";"


def schema_to_ddl(
    table: str,
    schema: T.StructType,
    location: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    dialect: str = "spark",
) -> str:
    """CREATE TABLE DDL from a DataFrame schema.

    ``dialect="spark"`` emits the executable modern form
    (``CREATE TABLE ... USING parquet ... LOCATION``) that runs on any
    Spark catalog; ``dialect="hive"`` emits the reference-artifact
    form (``CREATE EXTERNAL TABLE ... STORED AS PARQUET``) for Hive
    metastores. Partition columns move out of the column list into
    PARTITIONED BY, matching both engines' requirements."""
    if dialect not in ("spark", "hive"):
        raise ValueError(f"dialect must be 'spark' or 'hive', got {dialect!r}")
    parts = [f.name for f in schema.fields if f.name in set(partition_by)]
    missing = set(partition_by) - set(parts)
    if missing:
        raise ValueError(f"partition_by columns not in schema: {sorted(missing)}")
    data_cols = [f for f in schema.fields if f.name not in set(partition_by)]
    col_list = ",\n".join(
        f"    {f.name} {f.dataType.simpleString()}" for f in data_cols
    )
    if dialect == "spark":
        # Spark's USING syntax declares partition columns IN the column
        # list (Hive's EXTERNAL syntax keeps them out of it)
        all_cols = ",\n".join(
            f"    {f.name} {f.dataType.simpleString()}" for f in schema.fields
        )
        out = [f"CREATE TABLE {table} (", all_cols, f") USING {fmt}"]
        if parts:
            out.append(f"PARTITIONED BY ({', '.join(parts)})")
    else:
        out = [f"CREATE EXTERNAL TABLE {table} (", col_list, ")"]
        if parts:
            by_name = {f.name: f for f in schema.fields}
            keys = ", ".join(
                f"{p} {by_name[p].dataType.simpleString()}" for p in partition_by
            )
            out.append(f"PARTITIONED BY ({keys})")
        out.append(f"STORED AS {fmt.upper()}")
    out.append(f"LOCATION {_quote(location)}")
    return "\n".join(out) + ";"
