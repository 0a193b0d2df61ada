"""Catalog-subsystem queries: the metastore->catalog-document
assembly (and its reverse) exercised end-to-end, oracle-verified.

The metastore relational inputs are derived deterministically from
the star-schema tables (region->DBS, nation->TBLS/SDS,
supplier->params, part->columns/partition keys, customer->bucket
cols) so the DuckDB oracle can rebuild the same documents with plain
SQL — no side-channel fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_toolkit_spark.catalog import (
    assemble_catalog_partitions,
    assemble_catalog_tables,
    assemble_skewed_info,
    catalog_columns,
    explode_catalog_tables,
    flatten_catalog_tables,
    register_star_schema,
)
from datalake_toolkit_spark.plans.queries import query, _t


def _metastore_from_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    customer = _t(spark, sf_dir, "customer")

    dbs = region.select(
        F.col("r_regionkey").cast("long").alias("DB_ID"),
        F.col("r_name").alias("NAME"),
        F.lit("synthetic db").alias("DESC"),
        F.concat(F.lit("s3a://warehouse/"), F.lower("r_name")).alias(
            "DB_LOCATION_URI"
        ),
        F.lit("hadoop").alias("OWNER_NAME"),
        F.lit("USER").alias("OWNER_TYPE"),
    )
    tbls = nation.select(
        F.col("n_nationkey").cast("long").alias("TBL_ID"),
        F.col("n_regionkey").cast("long").alias("DB_ID"),
        F.col("n_nationkey").cast("long").alias("SD_ID"),
        F.col("n_name").alias("TBL_NAME"),
        F.lit("EXTERNAL_TABLE").alias("TBL_TYPE"),
        (F.col("n_nationkey") * 86400).cast("int").alias("CREATE_TIME"),
        F.lit(None).cast("int").alias("LAST_ACCESS_TIME"),
        F.lit("hadoop").alias("OWNER"),
        F.lit(0).alias("RETENTION"),
        F.lit(None).cast("string").alias("VIEW_EXPANDED_TEXT"),
        F.lit(None).cast("string").alias("VIEW_ORIGINAL_TEXT"),
        F.lit(None).cast("long").alias("LINK_TARGET_ID"),
    )
    table_params = supplier.select(
        (F.col("s_suppkey") % 25).cast("long").alias("TBL_ID"),
        F.concat(F.lit("p"), F.col("s_suppkey").cast("string")).alias("PARAM_KEY"),
        F.col("s_name").alias("PARAM_VALUE"),
    )
    partition_keys = part.where(F.col("p_partkey") < 250).select(
        (F.col("p_partkey") % 25).cast("long").alias("TBL_ID"),
        F.col("p_name").alias("PKEY_NAME"),
        F.col("p_type").alias("PKEY_TYPE"),
        F.lit(None).cast("string").alias("PKEY_COMMENT"),
        (F.col("p_partkey") / 25).cast("int").alias("INTEGER_IDX"),
    )
    columns_v2 = part.where(F.col("p_partkey") < 500).select(
        (F.col("p_partkey") % 25).cast("long").alias("CD_ID"),
        F.col("p_name").alias("COLUMN_NAME"),
        F.col("p_type").alias("TYPE_NAME"),
        F.lit(None).cast("string").alias("COMMENT"),
        (F.col("p_partkey") / 25).cast("int").alias("INTEGER_IDX"),
    )
    sds = nation.select(
        F.col("n_nationkey").cast("long").alias("SD_ID"),
        F.col("n_nationkey").cast("long").alias("CD_ID"),
        (F.col("n_nationkey") % 5).cast("long").alias("SERDE_ID"),
        F.lit("org.apache.hadoop.mapred.TextInputFormat").alias("INPUT_FORMAT"),
        F.lit("org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat").alias(
            "OUTPUT_FORMAT"
        ),
        F.concat(
            F.lit("s3"),
            F.when(F.col("n_nationkey") % 3 == 0, "a")
            .when(F.col("n_nationkey") % 3 == 1, "n")
            .otherwise(""),
            F.lit("://wh/"),
            F.col("n_name"),
        ).alias("LOCATION"),
        F.lit(0).alias("NUM_BUCKETS"),
        F.lit(False).alias("IS_COMPRESSED"),
        F.lit(False).alias("IS_STOREDASSUBDIRECTORIES"),
    )
    sd_params = supplier.select(
        (F.col("s_suppkey") % 25).cast("long").alias("SD_ID"),
        F.concat(F.lit("sd"), F.col("s_suppkey").cast("string")).alias("PARAM_KEY"),
        F.col("s_name").alias("PARAM_VALUE"),
    )
    serdes = region.select(
        F.col("r_regionkey").cast("long").alias("SERDE_ID"),
        F.concat(F.lit("serde_"), F.col("r_name")).alias("NAME"),
        F.lit("org.openx.data.jsonserde.JsonSerDe").alias("SLIB"),
    )
    serde_params = spark.createDataFrame(
        [], "SERDE_ID long, PARAM_KEY string, PARAM_VALUE string"
    )
    bucketing_cols = customer.where(F.col("c_custkey") < 100).select(
        (F.col("c_custkey") % 25).cast("long").alias("SD_ID"),
        F.col("c_mktsegment").alias("BUCKET_COL_NAME"),
        (F.col("c_custkey") / 25).cast("int").alias("INTEGER_IDX"),
    )
    sort_cols = spark.createDataFrame(
        [], "SD_ID long, COLUMN_NAME string, `ORDER` int, INTEGER_IDX int"
    )
    partitions = part.where(
        (F.col("p_partkey") >= 100) & (F.col("p_partkey") < 200)
    ).select(
        F.col("p_partkey").cast("long").alias("PART_ID"),
        (F.col("p_partkey") % 25).cast("long").alias("TBL_ID"),
        (F.col("p_partkey") % 25).cast("long").alias("SD_ID"),
        F.lit(None).cast("string").alias("PART_NAME"),
        (F.col("p_partkey") * 3600).cast("int").alias("CREATE_TIME"),
        F.lit(None).cast("int").alias("LAST_ACCESS_TIME"),
        F.lit(None).cast("long").alias("LINK_TARGET_ID"),
    )
    partition_key_vals = (
        partitions.select(
            "PART_ID",
            F.concat(F.lit("b"), (F.col("PART_ID") % 7).cast("string")).alias(
                "PART_KEY_VAL"
            ),
            F.lit(0).alias("INTEGER_IDX"),
        )
        .unionByName(
            partitions.select(
                "PART_ID",
                F.concat(F.lit("c"), (F.col("PART_ID") % 3).cast("string")).alias(
                    "PART_KEY_VAL"
                ),
                F.lit(1).alias("INTEGER_IDX"),
            )
        )
    )
    partition_params = spark.createDataFrame(
        [], "PART_ID long, PARAM_KEY string, PARAM_VALUE string"
    )
    skewed_col_names = customer.where(
        (F.col("c_custkey") >= 100) & (F.col("c_custkey") < 200)
    ).select(
        (F.col("c_custkey") % 25).cast("long").alias("SD_ID"),
        F.col("c_mktsegment").alias("SKEWED_COL_NAME"),
        ((F.col("c_custkey") - 100) / 25).cast("int").alias("INTEGER_IDX"),
    )
    skewed_string_list_values = nation.select(
        F.col("n_nationkey").cast("long").alias("STRING_LIST_ID"),
        F.col("n_name").alias("STRING_LIST_VALUE"),
        F.lit(0).alias("INTEGER_IDX"),
    ).unionByName(
        nation.select(
            F.col("n_nationkey").cast("long").alias("STRING_LIST_ID"),
            F.concat(F.col("n_name"), F.lit("_v1")).alias("STRING_LIST_VALUE"),
            F.lit(1).alias("INTEGER_IDX"),
        )
    )
    skewed_col_value_loc_map = nation.select(
        F.col("n_nationkey").cast("long").alias("SD_ID"),
        F.col("n_nationkey").cast("long").alias("STRING_LIST_ID_KID"),
        F.concat(F.lit("s3://skew/"), F.col("n_name")).alias("LOCATION"),
    )
    return {
        "PARTITIONS": partitions,
        "PARTITION_PARAMS": partition_params,
        "PARTITION_KEY_VALS": partition_key_vals,
        "SKEWED_COL_NAMES": skewed_col_names,
        "SKEWED_STRING_LIST_VALUES": skewed_string_list_values,
        "SKEWED_COL_VALUE_LOC_MAP": skewed_col_value_loc_map,
        "DBS": dbs,
        "TBLS": tbls,
        "TABLE_PARAMS": table_params,
        "PARTITION_KEYS": partition_keys,
        "COLUMNS_V2": columns_v2,
        "SDS": sds,
        "SD_PARAMS": sd_params,
        "SERDES": serdes,
        "SERDE_PARAMS": serde_params,
        "BUCKETING_COLS": bucketing_cols,
        "SORT_COLS": sort_cols,
    }


@query(
    "q_catalog_table_docs",
    """
    WITH tbls AS (
      SELECT n_nationkey AS tbl_id, n_regionkey AS db_id, n_name AS tname,
             n_nationkey AS sd_id
      FROM nation),
    dbs AS (SELECT r_regionkey AS db_id, r_name AS dbname FROM region),
    p_str AS (
      SELECT CAST(s_suppkey % 25 AS BIGINT) AS tbl_id,
             string_agg('p' || CAST(s_suppkey AS VARCHAR) || '=' || s_name, ';'
                        ORDER BY 'p' || CAST(s_suppkey AS VARCHAR) || '=' || s_name) AS params_str
      FROM supplier GROUP BY 1),
    pk_str AS (
      SELECT CAST(p_partkey % 25 AS BIGINT) AS tbl_id,
             string_agg(p_name || '(' || p_type || ')', ',' ORDER BY p_partkey // 25) AS pkeys_str
      FROM part WHERE p_partkey < 250 GROUP BY 1),
    col_str AS (
      SELECT CAST(p_partkey % 25 AS BIGINT) AS cd_id,
             string_agg(p_name || ':' || p_type, ',' ORDER BY p_partkey // 25) AS columns_str,
             CAST(count(*) AS INTEGER) AS n_columns
      FROM part WHERE p_partkey < 500 GROUP BY 1),
    locs AS (
      SELECT n_nationkey AS sd_id,
             regexp_replace('s3' ||
               CASE WHEN n_nationkey % 3 = 0 THEN 'a'
                    WHEN n_nationkey % 3 = 1 THEN 'n' ELSE '' END ||
               '://wh/' || n_name, '^s3[an]://', 's3://') AS location
      FROM nation)
    SELECT d.dbname AS database, t.tname AS name,
           'hadoop' AS owner, 'EXTERNAL_TABLE' AS tableType,
           coalesce(p.params_str, '') AS params_str,
           coalesce(pk.pkeys_str, '') AS pkeys_str,
           l.location AS location,
           coalesce(c.columns_str, '') AS columns_str,
           coalesce(c.n_columns, 0) AS n_columns
    FROM tbls t
    JOIN dbs d ON d.db_id = t.db_id
    LEFT JOIN p_str p ON p.tbl_id = t.tbl_id
    LEFT JOIN pk_str pk ON pk.tbl_id = t.tbl_id
    LEFT JOIN col_str c ON c.cd_id = t.sd_id
    LEFT JOIN locs l ON l.sd_id = t.sd_id
    """,
)
def q_catalog_table_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full metastore->catalog table-document assembly (J6/J7 join
    chains, A1 param maps, A2 idx-sorted arrays, F6 URI
    normalization), rendered to canonical flat strings for the
    cross-engine hash."""
    ms = _metastore_from_star(spark, sf_dir)
    docs = assemble_catalog_tables(ms)
    flat = flatten_catalog_tables(docs)
    return flat.select(
        "database",
        "name",
        "owner",
        F.col("tableType"),
        "params_str",
        "pkeys_str",
        "location",
        "columns_str",
        "n_columns",
    )


@query(
    "q_catalog_roundtrip_ids",
    """
    WITH docs AS (
      SELECT r_name AS database, n_name AS name
      FROM nation JOIN region ON n_regionkey = r_regionkey)
    SELECT CAST(row_number() OVER (ORDER BY database, name) + 999 AS BIGINT) AS TBL_ID,
           CAST(row_number() OVER (ORDER BY database, name) + 999 AS BIGINT) AS SD_ID,
           database AS DB_NAME, name AS TBL_NAME
    FROM docs
    """,
)
def q_catalog_roundtrip_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse direction: documents -> relational rows with fresh
    consecutive seeded ids (X5 semantics) — the to-metastore id
    seeding (hive_metastore_migration.py:1205-1225)."""
    ms = _metastore_from_star(spark, sf_dir)
    docs = assemble_catalog_tables(ms)
    tables = explode_catalog_tables(docs, start_tbl_id=1000, start_sd_id=1000)
    return tables["TBLS"].select("TBL_ID", "SD_ID", "DB_NAME", "TBL_NAME")


@query(
    "q_catalog_columns",
    """
    SELECT table_name, column_name, CAST(ordinal_position AS INTEGER) AS ordinal
    FROM information_schema.columns
    WHERE table_name IN ('region','nation','customer','supplier','part',
                         'orders','lineitem','events','documents','embeddings')
    """,
)
def q_catalog_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18 catalog walk: SHOW TABLES + DESCRIBE as one metadata-only
    DataFrame (replaces the Athena REST/poll/ES chain)."""
    tables = register_star_schema(spark, sf_dir)
    return catalog_columns(spark, tables)


@query(
    "q_catalog_search",
    """
    WITH hits AS (
      SELECT table_name,
             CAST(COUNT(*) AS INTEGER) AS n_hits,
             string_agg(column_name, ',' ORDER BY column_name)
               AS matched_columns
      FROM information_schema.columns
      WHERE table_name IN ('region','nation','customer','supplier','part',
                           'orders','lineitem','events','documents',
                           'embeddings')
        AND column_name LIKE '%key%'
      GROUP BY table_name
    )
    SELECT 'default' AS database, table_name, matched_columns, n_hits,
           CAST(row_number() OVER (ORDER BY n_hits DESC, table_name)
                AS INTEGER) AS rank
    FROM hits
    """,
)
def q_catalog_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES fuzzy-lookup plane
    (odl_catalog_hive_metadata_es.py:211-224): substring search over
    the flattened search documents, tables ranked by column-tag hit
    count."""
    from datalake_toolkit_spark.catalog import (
        catalog_search_documents,
        search_catalog,
    )

    tables = register_star_schema(spark, sf_dir)
    docs = catalog_search_documents(spark, tables)
    return search_catalog(docs, "key")


@query(
    "q_catalog_walk",
    """
    SELECT 'default' AS database, table_name, column_name,
           table_name || '.' || column_name AS comment_tag,
           CAST(ordinal_position AS INTEGER) AS ordinal
    FROM information_schema.columns
    WHERE table_name IN ('region','nation','customer','supplier','part',
                         'orders','lineitem','events','documents',
                         'embeddings')
    """,
)
def q_catalog_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18 full passthrough walk (odl_catalog_hive_metadata_es.py:
    75-94): SHOW DATABASES -> SHOW TABLES -> DESCRIBE per table, every
    level through catalog_sql, flattened to the ES search-document
    rows (:211-224)."""
    from datalake_toolkit_spark.catalog import catalog_walk_documents

    tables = register_star_schema(spark, sf_dir)
    return catalog_walk_documents(spark, tables)


@query(
    "q_catalog_partition_docs",
    """
    WITH parts AS (
      SELECT p_partkey AS part_id, p_partkey % 25 AS tbl_id,
             p_partkey * 3600 AS create_epoch,
             'b' || CAST(p_partkey % 7 AS VARCHAR) || ',' ||
             'c' || CAST(p_partkey % 3 AS VARCHAR) AS values_str
      FROM part WHERE p_partkey >= 100 AND p_partkey < 200),
    tbls AS (
      SELECT n_nationkey AS tbl_id, n_regionkey AS db_id, n_name AS tname
      FROM nation),
    dbs AS (SELECT r_regionkey AS db_id, r_name AS dbname FROM region),
    locs AS (
      SELECT n_nationkey AS sd_id,
             regexp_replace('s3' ||
               CASE WHEN n_nationkey % 3 = 0 THEN 'a'
                    WHEN n_nationkey % 3 = 1 THEN 'n' ELSE '' END ||
               '://wh/' || n_name, '^s3[an]://', 's3://') AS location
      FROM nation),
    skew AS (
      SELECT n_nationkey AS sd_id,
             CAST(length(n_name) AS VARCHAR) || '%' || n_name ||
             CAST(length(n_name) + 3 AS VARCHAR) || '%' || n_name || '_v1' ||
             '=s3://skew/' || n_name AS locmap_str
      FROM nation)
    SELECT d.dbname AS database, t.tname AS "table",
           p.values_str,
           strftime(to_timestamp(p.create_epoch),
                    '%b %d, %Y %I:%M:%S %p') AS createTime,
           l.location, s.locmap_str
    FROM parts p
    JOIN tbls t ON t.tbl_id = p.tbl_id
    JOIN dbs d ON d.db_id = t.db_id
    LEFT JOIN locs l ON l.sd_id = p.tbl_id
    LEFT JOIN skew s ON s.sd_id = p.tbl_id
    """,
)
def q_catalog_partition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metastore->catalog partition-document assembly (J8 join chain,
    A2 idx-sorted values, gson time rendering F8) with the
    storageDescriptor's skewedInfo (J4/J5/F5/A1) rendered flat."""
    ms = _metastore_from_star(spark, sf_dir)
    docs = assemble_catalog_partitions(ms)
    return docs.select(
        "database",
        "table",
        F.concat_ws(",", "values").alias("values_str"),
        F.col("createTime"),
        F.col("storageDescriptor.location").alias("location"),
        F.concat_ws(
            ";",
            F.array_sort(
                F.transform(
                    F.map_entries(
                        F.col("storageDescriptor.skewedInfo.skewedColumnValueLocationMaps")
                    ),
                    lambda e: F.concat(
                        e.getField("key"), F.lit("="), e.getField("value")
                    ),
                )
            ),
        ).alias("locmap_str"),
    )


@query(
    "q_catalog_skewed_info",
    """
    WITH names AS (
      SELECT CAST(c_custkey % 25 AS BIGINT) AS sd_id,
             string_agg(c_mktsegment, ',' ORDER BY (c_custkey - 100) // 25)
               AS names_str
      FROM customer WHERE c_custkey >= 100 AND c_custkey < 200 GROUP BY 1),
    vals AS (
      SELECT CAST(n_nationkey AS BIGINT) AS sd_id,
             CAST(length(n_name) AS VARCHAR) || '%' || n_name ||
             CAST(length(n_name) + 3 AS VARCHAR) || '%' || n_name || '_v1'
               AS values_str,
             CAST(length(n_name) AS VARCHAR) || '%' || n_name ||
             CAST(length(n_name) + 3 AS VARCHAR) || '%' || n_name || '_v1' ||
             '=s3://skew/' || n_name AS locmap_str
      FROM nation)
    SELECT coalesce(n.sd_id, v.sd_id) AS SD_ID,
           coalesce(n.names_str, '') AS names_str,
           coalesce(v.values_str, '') AS values_str,
           coalesce(v.locmap_str, '') AS locmap_str
    FROM names n FULL OUTER JOIN vals v ON n.sd_id = v.sd_id
    """,
)
def q_catalog_skewed_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-info assembly in isolation: A2 idx-sorted names, F5
    '<len>%<values>' encoding, J4 expression join, A1 value->location
    map, J5 full-outer merge."""
    ms = _metastore_from_star(spark, sf_dir)
    skew = assemble_skewed_info(
        ms["SKEWED_COL_NAMES"],
        ms["SKEWED_STRING_LIST_VALUES"],
        ms["SKEWED_COL_VALUE_LOC_MAP"],
    )
    return skew.select(
        "SD_ID",
        F.concat_ws(",", F.coalesce("skewedColumnNames", F.array())).alias(
            "names_str"
        ),
        F.concat_ws(";", F.coalesce("skewedColumnValues", F.array())).alias(
            "values_str"
        ),
        F.concat_ws(
            ";",
            F.array_sort(
                F.transform(
                    F.map_entries(
                        F.coalesce(
                            "skewedColumnValueLocationMaps", F.create_map()
                        )
                    ),
                    lambda e: F.concat(
                        e.getField("key"), F.lit("="), e.getField("value")
                    ),
                )
            ),
        ).alias("locmap_str"),
    )


@query(
    "q_raw_file_docs",
    """
    WITH base AS (
      SELECT 'docs_even.csv' AS object_name, 'docs' AS data_source,
             'LOADED' AS file_status,
             (SELECT count(*) FROM documents WHERE doc_id % 2 = 0) AS n_rows
      UNION ALL
      SELECT 'ignore_odd.csv', 'skip_file', 'SKIPPED',
             (SELECT count(*) FROM documents WHERE doc_id % 2 = 1)
      UNION ALL
      SELECT 'mystery.tsv', '__unmatched__', 'UNMATCHED',
             (SELECT count(*) FROM documents WHERE doc_id < 5)
    )
    SELECT object_name, data_source, file_status, n_rows FROM base
    """,
)
def q_raw_file_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file RAW-ZONE search documents, end to end: three staged
    files (a routed load, a skip-plugin match, an unmatched quarantine)
    drain through the REAL IngestionPipeline — checkpointed discovery,
    regex routing, ledger state machine — and the committed ledger
    flattens into the datalake-raw-shaped docs
    (catalog.raw_file_documents; reference parity
    lambda/common.py:286-316, one ES doc per ingested file with
    id=md5(key)). The gate hash-checks the deterministic doc columns
    (name, routed plugin, terminal status, row count) against the
    relational expectation; the md5 id and mixed-catalog search shape
    are pinned by pytest (paths are temp-dir-relative here)."""
    import os
    import shutil
    import tempfile

    from datalake_toolkit_spark.catalog import raw_file_documents
    from datalake_toolkit_spark.streaming.ingestion import (
        IngestionPipeline,
        RoutePlugin,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    work = tempfile.mkdtemp(prefix="dts_rawdocs_")
    try:
        src = os.path.join(work, "incoming")
        os.mkdir(src)

        def stage(df, name: str) -> None:
            d = os.path.join(work, "_" + name)
            df.coalesce(1).write.option("header", "false").csv(d)
            part = next(
                f for f in os.listdir(d)
                if f.startswith("part-") and f.endswith(".csv")
            )
            shutil.move(os.path.join(d, part), os.path.join(src, name))

        stage(docs.where(F.col("doc_id") % 2 == 0), "docs_even.csv")
        stage(docs.where(F.col("doc_id") % 2 == 1), "ignore_odd.csv")
        stage(docs.where(F.col("doc_id") < 5), "mystery.tsv")

        pipeline = IngestionPipeline(
            spark=spark,
            source_dir=src,
            schema="doc_id bigint, source string",
            output_path=os.path.join(work, "out"),
            ledger_path=os.path.join(work, "ledger"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            plugins=[
                RoutePlugin("skip_file", r"ignore_.*\.csv$", skip=True),
                RoutePlugin("docs", r"docs_.*\.csv$"),
            ],
        )
        pipeline.run_available_now()
        out = raw_file_documents(spark, os.path.join(work, "ledger")).select(
            "object_name", "data_source", "file_status", "n_rows"
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
