"""Metastore <-> catalog-document transforms (SURVEY.md §3.3).

Forward (``assemble_*``): normalized Hive-metastore tables (19-table
JDBC set) -> nested catalog documents. The reference does this with
RDD aggregateByKey + 12 Python UDFs + a 6-way left-join chain
(hive_metastore_migration.py:564-751); here it is the M2 operator
library composed declaratively:

- params tables -> map columns        (A1  kv_pairs_to_map)
- *_KEYS/_COLS with INTEGER_IDX ->
  idx-sorted struct arrays            (A2  collect_sorted_array)
- storageDescriptor assembly ->
  chained left joins of struct-packed
  sides                               (J2/J6 join_other_to_single_column)
- s3a/s3n normalization, time
  rendering                           (F6/F8 scalar pack)

Reverse (``explode_catalog_tables``): documents -> relational rows
with fresh consecutive ids (X5), posexplode for idx columns (X1),
map explode for params (X2).

Scale: every step is either narrow or a single keyed shuffle; the
dimension-sized sides (serdes, skew info) broadcast. Nothing collects
to the driver except the max-id seed (one row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_toolkit_spark.functions import normalize_s3_uri
from datalake_toolkit_spark.operators import (
    collect_sorted_array,
    explode_map_params,
    join_other_to_single_column,
    kv_pairs_to_map,
    posexplode_with_idx,
    with_consecutive_id,
)


def _params_map(params: DataFrame, id_col: str, out: str = "parameters") -> DataFrame:
    return kv_pairs_to_map(params, id_col, "PARAM_KEY", "PARAM_VALUE", out)


def assemble_catalog_databases(dbs: DataFrame, db_params: DataFrame) -> DataFrame:
    """DBS ⟕ DATABASE_PARAMS-map -> database documents
    (hive_metastore_migration.py:740-751 parity)."""
    params = _params_map(db_params, "DB_ID")
    return (
        dbs.join(params, "DB_ID", "left_outer")
        .select(
            F.col("NAME").alias("name"),
            F.col("DESC").alias("description"),
            F.coalesce(normalize_s3_uri("DB_LOCATION_URI"), F.lit("")).alias(
                "locationUri"
            ),
            F.coalesce("parameters", F.create_map()).alias("parameters"),
        )
    )


def assemble_storage_descriptors(
    sds: DataFrame,
    columns: DataFrame,
    sd_params: DataFrame,
    serdes: DataFrame,
    serde_params: DataFrame,
    bucketing_cols: DataFrame,
    sort_cols: DataFrame,
) -> DataFrame:
    """SDS + 6 satellites -> one row per SD_ID with nested columns /
    serdeInfo / parameters / bucketColumns / sortColumns
    (hive_metastore_migration.py:636-672 parity, J6)."""
    cols_arr = collect_sorted_array(
        columns,
        "CD_ID",
        F.struct("INTEGER_IDX", "COLUMN_NAME"),
        F.struct(
            F.col("COLUMN_NAME").alias("name"),
            F.col("TYPE_NAME").alias("type"),
            F.col("COMMENT").alias("comment"),
        ),
        "columns",
    )
    buckets_arr = collect_sorted_array(
        bucketing_cols,
        "SD_ID",
        F.struct("INTEGER_IDX", "BUCKET_COL_NAME"),
        F.col("BUCKET_COL_NAME"),
        "bucketColumns",
    )
    sorts_arr = collect_sorted_array(
        sort_cols,
        "SD_ID",
        F.struct("INTEGER_IDX", "COLUMN_NAME"),
        F.struct(F.col("COLUMN_NAME").alias("column"), F.col("ORDER").alias("order")),
        "sortColumns",
    )
    serde_full = serdes.join(
        _params_map(serde_params, "SERDE_ID"), "SERDE_ID", "left_outer"
    ).select(
        "SERDE_ID",
        F.col("NAME").alias("name"),
        F.col("SLIB").alias("serializationLibrary"),
        F.coalesce("parameters", F.create_map()).alias("parameters"),
    )
    out = (
        sds.join(cols_arr, "CD_ID", "left_outer")
        .join(_params_map(sd_params, "SD_ID"), "SD_ID", "left_outer")
        .join(buckets_arr, "SD_ID", "left_outer")
        .join(sorts_arr, "SD_ID", "left_outer")
    )
    out = join_other_to_single_column(
        out, serde_full, "SERDE_ID", "serdeInfo", broadcast_right=True
    )
    return out.select(
        "SD_ID",
        F.struct(
            F.coalesce(normalize_s3_uri("LOCATION"), F.lit("")).alias("location"),
            F.col("INPUT_FORMAT").alias("inputFormat"),
            F.col("OUTPUT_FORMAT").alias("outputFormat"),
            F.col("IS_COMPRESSED").alias("compressed"),
            F.col("NUM_BUCKETS").alias("numberOfBuckets"),
            F.coalesce("columns", F.array()).alias("columns"),
            F.coalesce("parameters", F.create_map()).alias("parameters"),
            F.col("serdeInfo"),
            F.coalesce("bucketColumns", F.array()).alias("bucketColumns"),
            F.coalesce("sortColumns", F.array()).alias("sortColumns"),
            F.col("IS_STOREDASSUBDIRECTORIES").alias("storedAsSubDirectories"),
        ).alias("storageDescriptor"),
    )


def assemble_catalog_tables(ms: dict[str, DataFrame]) -> DataFrame:
    """TBLS + params + partition keys + storage descriptors -> table
    documents (hive_metastore_migration.py:674-707 parity, J7)."""
    dbs = ms["DBS"].select("DB_ID", F.col("NAME").alias("database"))
    pkeys = collect_sorted_array(
        ms["PARTITION_KEYS"],
        "TBL_ID",
        F.struct("INTEGER_IDX", "PKEY_NAME"),
        F.struct(
            F.col("PKEY_NAME").alias("name"),
            F.col("PKEY_TYPE").alias("type"),
            F.col("PKEY_COMMENT").alias("comment"),
        ),
        "partitionKeys",
    )
    sds = assemble_storage_descriptors(
        ms["SDS"],
        ms["COLUMNS_V2"],
        ms["SD_PARAMS"],
        ms["SERDES"],
        ms["SERDE_PARAMS"],
        ms["BUCKETING_COLS"],
        ms["SORT_COLS"],
    )
    return (
        ms["TBLS"]
        .join(F.broadcast(dbs), "DB_ID")
        .join(_params_map(ms["TABLE_PARAMS"], "TBL_ID"), "TBL_ID", "left_outer")
        .join(pkeys, "TBL_ID", "left_outer")
        .join(sds, "SD_ID", "left_outer")
        .select(
            "database",
            F.col("TBL_NAME").alias("name"),
            F.col("OWNER").alias("owner"),
            F.date_format(F.from_unixtime("CREATE_TIME"), "MMM dd, yyyy hh:mm:ss a").alias(
                "createTime"
            ),
            F.col("TBL_TYPE").alias("tableType"),
            F.col("RETENTION").alias("retention"),
            F.coalesce("parameters", F.create_map()).alias("parameters"),
            F.coalesce("partitionKeys", F.array()).alias("partitionKeys"),
            "storageDescriptor",
        )
    )


def flatten_catalog_tables(docs: DataFrame) -> DataFrame:
    """Canonical flat rendering of table documents (for cross-engine
    verification and the search index): arrays joined in idx order,
    maps as sorted 'k=v' lists."""
    def map_str(col: str) -> F.Column:
        return F.concat_ws(
            ";",
            F.array_sort(
                F.transform(
                    F.map_entries(F.col(col)),
                    lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value")),
                )
            ),
        )

    return docs.select(
        "database",
        "name",
        "owner",
        "tableType",
        map_str("parameters").alias("params_str"),
        F.concat_ws(
            ",",
            F.transform(
                "partitionKeys", lambda s: F.concat(s.getField("name"), F.lit("("), s.getField("type"), F.lit(")"))
            ),
        ).alias("pkeys_str"),
        F.col("storageDescriptor.location").alias("location"),
        F.concat_ws(
            ",",
            F.transform(
                F.col("storageDescriptor.columns"),
                lambda c: F.concat(c.getField("name"), F.lit(":"), c.getField("type")),
            ),
        ).alias("columns_str"),
        F.size(F.col("storageDescriptor.columns")).alias("n_columns"),
    )


def explode_catalog_tables(
    docs: DataFrame, start_tbl_id: int = 1, start_sd_id: int = 1
) -> dict[str, DataFrame]:
    """Reverse direction (hive_metastore_migration.py:1227-1247
    parity): documents -> relational rows with fresh consecutive ids
    (X5 semantics: consecutive, offset-seeded, deterministic order by
    (database, name))."""
    seeded = with_consecutive_id(
        docs, ["database", "name"], "TBL_ID", start=start_tbl_id
    ).withColumn("SD_ID", F.col("TBL_ID") - start_tbl_id + start_sd_id)
    tbls = seeded.select(
        "TBL_ID",
        "SD_ID",
        F.col("database").alias("DB_NAME"),
        F.col("name").alias("TBL_NAME"),
        F.col("owner").alias("OWNER"),
        F.col("tableType").alias("TBL_TYPE"),
        F.col("retention").alias("RETENTION"),
    )
    table_params = explode_map_params(
        seeded.select("TBL_ID", "parameters"), "TBL_ID", "parameters"
    )
    partition_keys = posexplode_with_idx(
        seeded.select("TBL_ID", "partitionKeys"),
        "partitionKeys",
        "INTEGER_IDX",
        "pk",
        keep=["TBL_ID"],
    ).select(
        "TBL_ID",
        F.col("pk.name").alias("PKEY_NAME"),
        F.col("pk.type").alias("PKEY_TYPE"),
        F.col("pk.comment").alias("PKEY_COMMENT"),
        "INTEGER_IDX",
    )
    columns = posexplode_with_idx(
        seeded.select("SD_ID", F.col("storageDescriptor.columns").alias("cols")),
        "cols",
        "INTEGER_IDX",
        "c",
        keep=["SD_ID"],
    ).select(
        F.col("SD_ID").alias("CD_ID"),
        F.col("c.name").alias("COLUMN_NAME"),
        F.col("c.type").alias("TYPE_NAME"),
        F.col("c.comment").alias("COMMENT"),
        "INTEGER_IDX",
    )
    sds = seeded.select(
        "SD_ID",
        F.col("SD_ID").alias("CD_ID"),
        F.col("storageDescriptor.location").alias("LOCATION"),
        F.col("storageDescriptor.inputFormat").alias("INPUT_FORMAT"),
        F.col("storageDescriptor.outputFormat").alias("OUTPUT_FORMAT"),
        F.col("storageDescriptor.compressed").alias("IS_COMPRESSED"),
        F.col("storageDescriptor.numberOfBuckets").alias("NUM_BUCKETS"),
        F.col("storageDescriptor.storedAsSubDirectories").alias(
            "IS_STOREDASSUBDIRECTORIES"
        ),
    )
    return {
        "TBLS": tbls,
        "TABLE_PARAMS": table_params,
        "PARTITION_KEYS": partition_keys,
        "COLUMNS_V2": columns,
        "SDS": sds,
    }
