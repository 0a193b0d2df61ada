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

from pyspark.sql import SparkSession

from datalake_toolkit_spark.catalog.schemas import METASTORE_DDL
from datalake_toolkit_spark.functions import (
    normalize_s3_uri,
    partition_name,
    skewed_str_to_values,
    skewed_values_to_str,
)
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


def _empty(spark: SparkSession, table: str) -> DataFrame:
    return spark.createDataFrame([], METASTORE_DDL[table])


def assemble_skewed_info(
    skewed_col_names: DataFrame,
    skewed_string_list_values: DataFrame,
    skewed_col_value_loc_map: DataFrame,
) -> DataFrame:
    """SKEWED_* satellites -> one row per SD_ID with skewedColumnNames
    / skewedColumnValues / skewedColumnValueLocationMaps
    (hive_metastore_migration.py:568-615 parity: A2 idx-sorted names,
    F5 value-list encoding, J4 expression join on STRING_LIST_ID_KID,
    A1 value-str -> location map, J5 full-outer assembly).

    skewedColumnValues is sorted for determinism; the reference's
    aggregateByKey order was partition-dependent (undefined), so any
    fixed order is parity-compliant."""
    names = collect_sorted_array(
        skewed_col_names,
        "SD_ID",
        F.struct("INTEGER_IDX", "SKEWED_COL_NAME"),
        F.col("SKEWED_COL_NAME"),
        "skewedColumnNames",
    )
    vals_list = collect_sorted_array(
        skewed_string_list_values,
        "STRING_LIST_ID",
        F.struct("INTEGER_IDX", "STRING_LIST_VALUE"),
        F.col("STRING_LIST_VALUE"),
        "vals",
    )
    vals_str = vals_list.select(
        "STRING_LIST_ID", skewed_values_to_str("vals").alias("skewedColumnValuesStr")
    )
    with_loc = skewed_col_value_loc_map.join(
        vals_str,
        skewed_col_value_loc_map["STRING_LIST_ID_KID"] == vals_str["STRING_LIST_ID"],
        "inner",
    ).select("SD_ID", "skewedColumnValuesStr", "LOCATION")
    loc_maps = kv_pairs_to_map(
        with_loc,
        "SD_ID",
        "skewedColumnValuesStr",
        "LOCATION",
        "skewedColumnValueLocationMaps",
    )
    values = with_loc.groupBy("SD_ID").agg(
        F.array_sort(F.collect_list("skewedColumnValuesStr")).alias(
            "skewedColumnValues"
        )
    )
    return names.join(loc_maps, "SD_ID", "outer").join(values, "SD_ID", "outer")


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
    skewed_col_names: DataFrame | None = None,
    skewed_string_list_values: DataFrame | None = None,
    skewed_col_value_loc_map: DataFrame | None = None,
) -> DataFrame:
    """SDS + satellites -> one row per SD_ID with nested columns /
    serdeInfo / parameters / bucketColumns / sortColumns / skewedInfo
    (hive_metastore_migration.py:636-672 parity, J6)."""
    spark = sds.sparkSession
    skew = assemble_skewed_info(
        skewed_col_names
        if skewed_col_names is not None
        else _empty(spark, "SKEWED_COL_NAMES"),
        skewed_string_list_values
        if skewed_string_list_values is not None
        else _empty(spark, "SKEWED_STRING_LIST_VALUES"),
        skewed_col_value_loc_map
        if skewed_col_value_loc_map is not None
        else _empty(spark, "SKEWED_COL_VALUE_LOC_MAP"),
    )
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
        .join(skew, "SD_ID", "left_outer")
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
            F.struct(
                F.coalesce("skewedColumnNames", F.array()).alias("skewedColumnNames"),
                F.coalesce("skewedColumnValues", F.array()).alias(
                    "skewedColumnValues"
                ),
                F.coalesce(
                    "skewedColumnValueLocationMaps", F.create_map()
                ).alias("skewedColumnValueLocationMaps"),
            ).alias("skewedInfo"),
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
        ms.get("SKEWED_COL_NAMES"),
        ms.get("SKEWED_STRING_LIST_VALUES"),
        ms.get("SKEWED_COL_VALUE_LOC_MAP"),
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
    # SERDE_ID / CD_ID / STRING_LIST_ID are 1:1 with SD_ID on the way
    # back: the forward direction nested each satellite inside its
    # descriptor, so sharing structure (many SDs -> one serde row) is
    # not recoverable and the reference's to-metastore re-seeds fresh
    # ids the same way (hive_metastore_migration.py:1205-1225).
    sds = seeded.select(
        "SD_ID",
        F.col("SD_ID").alias("CD_ID"),
        F.col("SD_ID").alias("SERDE_ID"),
        F.col("storageDescriptor.location").alias("LOCATION"),
        F.col("storageDescriptor.inputFormat").alias("INPUT_FORMAT"),
        F.col("storageDescriptor.outputFormat").alias("OUTPUT_FORMAT"),
        F.col("storageDescriptor.compressed").alias("IS_COMPRESSED"),
        F.col("storageDescriptor.numberOfBuckets").alias("NUM_BUCKETS"),
        F.col("storageDescriptor.storedAsSubDirectories").alias(
            "IS_STOREDASSUBDIRECTORIES"
        ),
    )
    sd_params = explode_map_params(
        seeded.select(
            "SD_ID", F.col("storageDescriptor.parameters").alias("parameters")
        ),
        "SD_ID",
        "parameters",
    )
    serdes = seeded.select(
        F.col("SD_ID").alias("SERDE_ID"),
        F.col("storageDescriptor.serdeInfo.name").alias("NAME"),
        F.col("storageDescriptor.serdeInfo.serializationLibrary").alias("SLIB"),
    ).where(F.col("SLIB").isNotNull())
    serde_params = explode_map_params(
        seeded.select(
            F.col("SD_ID").alias("SERDE_ID"),
            F.col("storageDescriptor.serdeInfo.parameters").alias("parameters"),
        ),
        "SERDE_ID",
        "parameters",
    )
    bucketing_cols = posexplode_with_idx(
        seeded.select(
            "SD_ID", F.col("storageDescriptor.bucketColumns").alias("bc")
        ),
        "bc",
        "INTEGER_IDX",
        "b",
        keep=["SD_ID"],
    ).select("SD_ID", F.col("b").alias("BUCKET_COL_NAME"), "INTEGER_IDX")
    sort_cols = posexplode_with_idx(
        seeded.select("SD_ID", F.col("storageDescriptor.sortColumns").alias("sc")),
        "sc",
        "INTEGER_IDX",
        "s",
        keep=["SD_ID"],
    ).select(
        "SD_ID",
        F.col("s.column").alias("COLUMN_NAME"),
        F.col("s.order").alias("ORDER"),
        "INTEGER_IDX",
    )
    skewed_col_names = posexplode_with_idx(
        seeded.select(
            "SD_ID",
            F.col("storageDescriptor.skewedInfo.skewedColumnNames").alias("sk"),
        ),
        "sk",
        "INTEGER_IDX",
        "n",
        keep=["SD_ID"],
    ).select("SD_ID", F.col("n").alias("SKEWED_COL_NAME"), "INTEGER_IDX")
    # Skew value lists come back from the length-prefixed
    # '<len(v1)>%v1<len(v2)>%v2' map keys (F5's actual encoding). One
    # string list per map entry, STRING_LIST_ID 1:1 derived from
    # (SD_ID, entry rank). NOTE: the reference's own reverse parser
    # (F14) expects "<n>%['a', 'b']" — a format its forward encoder
    # (F5) never produces, so the original pipeline silently loses
    # skew values on the round trip; we parse the real F5 encoding
    # (skewed_str_to_values, a consuming fold) and keep them.
    loc_entries = seeded.select(
        "SD_ID",
        F.posexplode_outer(
            F.map_from_entries(
                F.array_sort(
                    F.map_entries(
                        F.col(
                            "storageDescriptor.skewedInfo.skewedColumnValueLocationMaps"
                        )
                    )
                )
            )
        ).alias("__rank", "vstr", "LOCATION"),
    ).where(F.col("vstr").isNotNull())
    # 1e6 stride: synthetic FK namespace per SD. The in-plan guard
    # turns an overflow (an SD with >= 1e6 skew map entries, which
    # would silently collide into the next SD's id range) into a hard
    # execution error instead of corrupt keys.
    _STRIDE = 1_000_000
    loc_entries = loc_entries.withColumn(
        "STRING_LIST_ID",
        F.when(
            F.col("__rank") < _STRIDE, F.col("SD_ID") * _STRIDE + F.col("__rank")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("skewed-map entries per SD exceed id stride: SD_ID="),
                    F.col("SD_ID").cast("string"),
                )
            )
        ),
    )
    skewed_loc_map = loc_entries.select(
        "SD_ID",
        F.col("STRING_LIST_ID").alias("STRING_LIST_ID_KID"),
        "LOCATION",
    )
    skewed_string_list = loc_entries.select("STRING_LIST_ID")
    skewed_string_list_values = posexplode_with_idx(
        loc_entries.select(
            "STRING_LIST_ID",
            skewed_str_to_values("vstr").alias("vals"),
        ),
        "vals",
        "INTEGER_IDX",
        "v",
        keep=["STRING_LIST_ID"],
    ).select("STRING_LIST_ID", F.col("v").alias("STRING_LIST_VALUE"), "INTEGER_IDX")
    return {
        "TBLS": tbls,
        "TABLE_PARAMS": table_params,
        "PARTITION_KEYS": partition_keys,
        "COLUMNS_V2": columns,
        "SDS": sds,
        "SD_PARAMS": sd_params,
        "SERDES": serdes,
        "SERDE_PARAMS": serde_params,
        "BUCKETING_COLS": bucketing_cols,
        "SORT_COLS": sort_cols,
        "SKEWED_COL_NAMES": skewed_col_names,
        "SKEWED_STRING_LIST": skewed_string_list,
        "SKEWED_STRING_LIST_VALUES": skewed_string_list_values,
        "SKEWED_COL_VALUE_LOC_MAP": skewed_loc_map,
    }


def assemble_catalog_partitions(ms: dict[str, DataFrame]) -> DataFrame:
    """PARTITIONS + params + key vals + storage descriptors ->
    partition documents (hive_metastore_migration.py:709-738 parity,
    J8: inner join to db/table names, left joins for the satellites;
    rows with null values/database/table dropped like the
    reference's na.drop)."""
    dbs = ms["DBS"].select("DB_ID", F.col("NAME").alias("database"))
    db_tbl = (
        ms["TBLS"]
        .select("TBL_ID", "DB_ID", F.col("TBL_NAME").alias("table"))
        .join(F.broadcast(dbs), "DB_ID")
        .select("TBL_ID", "database", "table")
    )
    vals = collect_sorted_array(
        ms["PARTITION_KEY_VALS"],
        "PART_ID",
        F.struct("INTEGER_IDX", "PART_KEY_VAL"),
        F.col("PART_KEY_VAL"),
        "values",
    )
    sds = assemble_storage_descriptors(
        ms["SDS"],
        ms["COLUMNS_V2"],
        ms["SD_PARAMS"],
        ms["SERDES"],
        ms["SERDE_PARAMS"],
        ms["BUCKETING_COLS"],
        ms["SORT_COLS"],
        ms.get("SKEWED_COL_NAMES"),
        ms.get("SKEWED_STRING_LIST_VALUES"),
        ms.get("SKEWED_COL_VALUE_LOC_MAP"),
    )
    return (
        ms["PARTITIONS"]
        .join(db_tbl, "TBL_ID")
        .join(_params_map(ms["PARTITION_PARAMS"], "PART_ID"), "PART_ID", "left_outer")
        .join(vals, "PART_ID", "left_outer")
        .join(sds, "SD_ID", "left_outer")
        .na.drop(how="any", subset=["values", "database", "table"])
        .select(
            "database",
            "table",
            "values",
            F.date_format(
                F.from_unixtime("CREATE_TIME"), "MMM dd, yyyy hh:mm:ss a"
            ).alias("createTime"),
            F.coalesce("parameters", F.create_map()).alias("parameters"),
            "storageDescriptor",
        )
    )


def explode_catalog_partitions(
    partition_docs: DataFrame,
    table_docs: DataFrame,
    start_part_id: int = 1,
) -> dict[str, DataFrame]:
    """Reverse direction for partitions
    (hive_metastore_migration.py:965-1105 parity): documents ->
    PARTITIONS / PARTITION_PARAMS / PARTITION_KEY_VALS rows with
    fresh consecutive PART_IDs and the reconstructed PART_NAME
    ('k1(t1),k2(t2)=v1,v2', F13) from the owning table's
    partitionKeys (J11)."""
    keys = table_docs.select(
        F.col("database"),
        F.col("name").alias("table"),
        F.col("partitionKeys"),
    )
    seeded = with_consecutive_id(
        partition_docs.withColumn("__vstr", F.concat_ws("", "values")),
        ["database", "table", "__vstr"],
        "PART_ID",
        start=start_part_id,
    ).drop("__vstr")
    named = seeded.join(F.broadcast(keys), ["database", "table"], "left_outer")
    partitions = named.select(
        "PART_ID",
        F.col("database").alias("DB_NAME"),
        F.col("table").alias("TBL_NAME"),
        partition_name(
            F.transform("partitionKeys", lambda k: k.getField("name")),
            F.transform("partitionKeys", lambda k: k.getField("type")),
            F.col("values"),
        ).alias("PART_NAME"),
    )
    partition_params = explode_map_params(
        seeded.select("PART_ID", "parameters"), "PART_ID", "parameters"
    )
    key_vals = posexplode_with_idx(
        seeded.select("PART_ID", "values"),
        "values",
        "INTEGER_IDX",
        "v",
        keep=["PART_ID"],
    ).select("PART_ID", F.col("v").alias("PART_KEY_VAL"), "INTEGER_IDX")
    return {
        "PARTITIONS": partitions,
        "PARTITION_PARAMS": partition_params,
        "PARTITION_KEY_VALS": key_vals,
    }
