"""Catalog/search surface (SURVEY.md S18, §2.1).

The reference walks Athena with SHOW DATABASES / SHOW TABLES /
DESCRIBE via REST polling and indexes the results into Elasticsearch
(lambda/odl_catalog_hive_metadata_es/odl_catalog_hive_metadata_es.py:
63-237). Here the same surface is ``spark.catalog`` turned into
DataFrames — no service hops, one line per listing — plus the
flattened search-document table the ES index held.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_toolkit_spark.sources.tables import TABLES, load_table


def register_star_schema(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the test star schema as temp views (the engine's
    'database')."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def catalog_columns(spark: SparkSession, tables: list[str]) -> DataFrame:
    """(table_name, column_name, ordinal) for every registered table —
    the DESCRIBE walk as one DataFrame. Metadata-only: no data scan."""
    rows = [
        (t, c, i + 1)
        for t in tables
        for i, c in enumerate(spark.table(t).columns)
    ]
    return spark.createDataFrame(
        rows, "table_name string, column_name string, ordinal int"
    )


def catalog_search_documents(spark: SparkSession, tables: list[str]) -> DataFrame:
    """The ES search-document shape
    (odl_catalog_hive_metadata_es.py:211-224): one row per table with
    searchable column/comment tags and a column->type map."""
    rows = []
    for t in tables:
        fields = spark.table(t).schema.fields
        rows.append(
            (
                "default",
                t,
                [f.name for f in fields],
                [f"{t}.{f.name}" for f in fields],
                {f.name: f.dataType.simpleString() for f in fields},
            )
        )
    return spark.createDataFrame(
        rows,
        "database string, `table` string, column_tags array<string>, "
        "comment_tags array<string>, columns map<string,string>",
    )


def lake_table_documents(
    spark: SparkSession, tables: dict[str, str]
) -> DataFrame:
    """Search documents for LakeTable roots (``{name: path}``): the
    SAME shape ``catalog_search_documents`` emits for Hive tables — so
    ``search_catalog`` runs over a mixed Hive+lakehouse catalog —
    plus lakehouse-specific metadata columns (location, current
    version, last op/timestamp, partition scheme, live file count,
    pending merge-on-read entry counts).

    Metadata-only: manifests and directory listings, bounded by table
    count — no Spark job reads any data, so cataloging a fleet of
    100 TB tables costs manifest I/O."""
    import json as _json

    from pyspark.sql import types as T

    from datalake_toolkit_spark.lakehouse import LakeTable

    rows = []
    for name, path in sorted(dict(tables).items()):
        t = LakeTable(spark, path)
        man = t._manifest()
        fields = T.StructType.fromJson(_json.loads(man["schema"])).fields
        rep = t.plan_scan()
        rows.append(
            (
                "lake",
                name,
                [f.name for f in fields],
                [f"{name}.{f.name}" for f in fields],
                {f.name: f.dataType.simpleString() for f in fields},
                path,
                int(man["version"]),
                man["op"],
                float(man["ts"]),
                list(man["partition_by"]),
                int(rep["files_total"]),
                len(man.get("merges") or []),
                len(man.get("deletes") or []),
            )
        )
    return spark.createDataFrame(
        rows,
        "database string, `table` string, column_tags array<string>, "
        "comment_tags array<string>, columns map<string,string>, "
        "location string, version int, last_op string, last_ts double, "
        "partition_keys array<string>, n_files int, "
        "pending_merges int, pending_deletes int",
    )


def raw_file_documents(spark: SparkSession, ledger_path: str) -> DataFrame:
    """Per-file RAW-ZONE search documents from the ingestion ledger —
    the reference indexes every ingested raw file into ES index
    ``datalake-raw`` with id md5(key) and the file's ingestion facts
    (lambda/common.py:286-316, plugins/default.py:84-100). Here the
    ledger (streaming/ingestion.py) already holds those facts as a
    MERGE-maintained LakeTable; this flattens its current snapshot
    into one searchable doc per file:

    (doc_id=md5(path), s3_object_name, object_name=basename,
    data_source=routed plugin, file_status, n_rows, raw_timestamp,
    batch_id) — the datalake-raw doc shape minus the S3-only HTTP
    headers. Pure Catalyst expressions over the ledger read; cost is
    O(ledger), which is O(files ever ingested) metadata, never data.
    A pipeline that has never committed a ledger (nothing ingested
    yet) yields an empty frame, not an error — an empty raw zone is
    a normal catalog state."""
    from datalake_toolkit_spark.lakehouse import LakeTable
    from datalake_toolkit_spark.streaming.ingestion import (
        LEDGER_SCHEMA,
        read_ledger,
    )

    if LakeTable(spark, ledger_path).current_version() is None:
        led = spark.createDataFrame([], LEDGER_SCHEMA)
    else:
        led = read_ledger(spark, ledger_path)
    return led.select(
        F.md5("s3_object_name").alias("doc_id"),
        "s3_object_name",
        F.element_at(F.split("s3_object_name", "/"), -1).alias("object_name"),
        F.col("plugin").alias("data_source"),
        "file_status",
        "n_rows",
        F.col("updated_at").alias("raw_timestamp"),
        "batch_id",
    )


def raw_file_search_documents(
    spark: SparkSession, ledger_path: str
) -> DataFrame:
    """The raw-zone files in the SAME search-document shape as
    ``catalog_search_documents`` / ``lake_table_documents``, so one
    ``search_catalog`` call runs over a MIXED catalog — Hive tables,
    lakehouse tables and raw files side by side, the engine's
    equivalent of the reference's datalake-hive + datalake-raw ES
    indexes answering one search. database is ``raw``; the searchable
    tags are the file's name, routed plugin and status; ``columns``
    carries the ingestion facts as displayable attributes."""
    d = raw_file_documents(spark, ledger_path)
    return d.select(
        F.lit("raw").alias("database"),
        F.col("object_name").alias("table"),
        F.array("object_name", "data_source", "file_status").alias(
            "column_tags"
        ),
        F.array("s3_object_name").alias("comment_tags"),
        F.map_from_arrays(
            F.array(
                F.lit("doc_id"),
                F.lit("data_source"),
                F.lit("file_status"),
                F.lit("n_rows"),
            ),
            F.array(
                "doc_id",
                "data_source",
                "file_status",
                F.col("n_rows").cast("string"),
            ),
        ).alias("columns"),
    )


def search_catalog(docs: DataFrame, pattern: str) -> DataFrame:
    """The ES fuzzy-lookup plane over the search documents
    (odl_catalog_hive_metadata_es.py:211-224): case-insensitive
    substring match of ``pattern`` against table names and column
    tags, returning one row per matching table ranked by hit count.

    Output: (database, table_name, matched_columns csv, n_hits, rank).
    ``rank`` is deterministic (hits desc, then name). The ranking
    window is a global sort over *catalog metadata* — bounded by table
    count, not data size, so the single-partition window is fine at
    any scale (same class as the reference's ES index, which is also
    metadata-sized)."""
    p = pattern.lower()
    matched = F.array_sort(
        F.filter("column_tags", lambda c: F.lower(c).contains(F.lit(p)))
    )
    from pyspark.sql.window import Window

    hits = (
        docs.select(
            "database",
            F.col("table").alias("table_name"),
            F.concat_ws(",", matched).alias("matched_columns"),
            (
                F.size(matched)
                + F.when(F.lower(F.col("table")).contains(F.lit(p)), 1).otherwise(0)
            ).alias("n_hits"),
        )
        .where(F.col("n_hits") > 0)
    )
    return hits.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("n_hits").desc(), F.col("table_name"))
        ),
    )


def catalog_walk_documents(
    spark: SparkSession, tables: list[str], method: str = "sql"
) -> DataFrame:
    """The reference's full three-level catalog walk
    (odl_catalog_hive_metadata_es.py:75-94): SHOW DATABASES ->
    SHOW TABLES -> DESCRIBE per table, every level routed through the
    SQL passthrough (:func:`catalog_sql`), landing the flattened
    search-document rows the ES index held (:211-224) — one scalar row
    per column: (database, table_name, column_name, comment_tag,
    ordinal).

    ``method='sql'`` (default) is parity-by-design with the
    reference's Athena statement loop: one passthrough round trip per
    level and per table. ``method='bulk'`` produces the IDENTICAL
    documents through the native catalog API — database/table listings
    plus resolved schemas read driver-side in one pass, a single
    ``createDataFrame`` at the end — skipping the per-table
    DataFrame+collect round trips (two Spark jobs each), which
    dominate the sql path's wall time. Engine users should take the
    bulk path; the sql path stays for reference parity (both pinned
    equal by ``test_catalog_walk_bulk_matches_sql``).

    Driver-side collects are metadata-sized (db/table/column listings,
    same class as the reference's ES index), never data-sized.
    ``tables`` restricts the walk to the star schema because the
    session may hold unrelated temp views.
    """
    if method not in ("sql", "bulk"):
        raise ValueError(f"method must be sql|bulk, got {method!r}")
    schema = (
        "database string, table_name string, column_name string, "
        "comment_tag string, ordinal int"
    )
    if method == "bulk":
        dbs = sorted(d.name for d in spark.catalog.listDatabases())
        if "default" not in dbs:
            raise ValueError(f"catalog walk found no default database: {dbs}")
        listed = {t.name for t in spark.catalog.listTables()}
        rows = []
        for t in sorted(listed & set(tables)):
            # resolved relation schema, not catalog.listColumns: same
            # (name, type) rows but listColumns re-analyzes the view
            # per call (~0.5 s each — a 10-table walk paid 5 s)
            for i, f in enumerate(spark.table(t).schema.fields):
                rows.append(("default", t, f.name, f"{t}.{f.name}", i + 1))
        return spark.createDataFrame(rows, schema)
    dbs = sorted(
        r.database_name for r in catalog_sql(spark, "SHOW DATABASES").collect()
    )
    if "default" not in dbs:
        raise ValueError(f"catalog walk found no default database: {dbs}")
    listed = {
        r.table_name for r in catalog_sql(spark, "SHOW TABLES").collect()
    }
    rows = []
    for t in sorted(listed & set(tables)):
        for i, c in enumerate(catalog_sql(spark, f"DESCRIBE {t}").collect()):
            rows.append(("default", t, c.col_name, f"{t}.{c.col_name}", i + 1))
    return spark.createDataFrame(rows, schema)


def catalog_sql(spark: SparkSession, statement: str) -> DataFrame:
    """S18: the Athena SQL-passthrough surface as direct catalog
    DataFrames. The reference routes exactly three statement shapes
    through Athena REST + polling waiter
    (odl_catalog_hive_metadata_es.py:75-94, athena_query.py:22-56):

    - ``SHOW DATABASES``            -> (database_name)
    - ``SHOW TABLES [IN db]``       -> (table_name)
    - ``DESCRIBE [db.]table``       -> (col_name, data_type, comment)
    - ``SHOW PARTITIONS t``         -> (partition) — the shape the
      reference's ES index exposes implicitly through partition docs
      (odl_catalog_hive_metadata_es.py:95-137); here it is a first-
      class statement (delegates to Spark's native SHOW PARTITIONS).

    Anything else passes through to ``spark.sql`` untouched, which is
    strictly more capable than the Athena path (no 5-query throttle,
    no 60 s poll timeout).
    """
    stmt = statement.strip().rstrip(";")
    lowered = stmt.lower()
    if lowered == "show databases":
        return spark.createDataFrame(
            [(d.name,) for d in spark.catalog.listDatabases()],
            "database_name string",
        )
    if lowered.startswith("show tables"):
        parts = stmt.split()
        tables = (
            spark.catalog.listTables(parts[-1])
            if len(parts) == 4
            else spark.catalog.listTables()
        )
        return spark.createDataFrame(
            [(t.name,) for t in tables], "table_name string"
        )
    if lowered.startswith("describe ") or lowered.startswith("desc "):
        target = stmt.split()[-1]
        # schema off the resolved relation, not catalog.listColumns:
        # same (name, type, comment) rows, but listColumns re-analyzes
        # the view per call (~0.5 s each — a 10-table walk paid 5 s)
        return spark.createDataFrame(
            [
                (
                    f.name,
                    f.dataType.simpleString(),
                    f.metadata.get("comment"),
                )
                for f in spark.table(target).schema.fields
            ],
            "col_name string, data_type string, comment string",
        )
    return spark.sql(stmt)
