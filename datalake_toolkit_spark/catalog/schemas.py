"""Schema declarations for the metastore <-> catalog migration.

The relational side is the Hive-metastore closed set the reference
migrates over JDBC (hive_metastore_migration.py:1289-1310; column set
per FIXTURES.md §5). The document side mirrors the reference's
DATACATALOG_* nested schemas (hive_metastore_migration.py:36-147):
3-deep structs, arrays of structs, string->string maps.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- relational (metastore) side: DDL strings ------------------------------

METASTORE_DDL: dict[str, str] = {
    "DBS": "DB_ID long, NAME string, `DESC` string, DB_LOCATION_URI string, OWNER_NAME string, OWNER_TYPE string",
    "DATABASE_PARAMS": "DB_ID long, PARAM_KEY string, PARAM_VALUE string",
    "TBLS": (
        "TBL_ID long, DB_ID long, SD_ID long, TBL_NAME string, TBL_TYPE string, "
        "CREATE_TIME int, LAST_ACCESS_TIME int, OWNER string, RETENTION int, "
        "VIEW_EXPANDED_TEXT string, VIEW_ORIGINAL_TEXT string, LINK_TARGET_ID long"
    ),
    "TABLE_PARAMS": "TBL_ID long, PARAM_KEY string, PARAM_VALUE string",
    "PARTITIONS": (
        "PART_ID long, TBL_ID long, SD_ID long, PART_NAME string, CREATE_TIME int, "
        "LAST_ACCESS_TIME int, LINK_TARGET_ID long"
    ),
    "PARTITION_PARAMS": "PART_ID long, PARAM_KEY string, PARAM_VALUE string",
    "PARTITION_KEYS": "TBL_ID long, PKEY_NAME string, PKEY_TYPE string, PKEY_COMMENT string, INTEGER_IDX int",
    "PARTITION_KEY_VALS": "PART_ID long, PART_KEY_VAL string, INTEGER_IDX int",
    "SDS": (
        "SD_ID long, CD_ID long, SERDE_ID long, INPUT_FORMAT string, OUTPUT_FORMAT string, "
        "LOCATION string, NUM_BUCKETS int, IS_COMPRESSED boolean, IS_STOREDASSUBDIRECTORIES boolean"
    ),
    "SD_PARAMS": "SD_ID long, PARAM_KEY string, PARAM_VALUE string",
    "COLUMNS_V2": "CD_ID long, COLUMN_NAME string, TYPE_NAME string, COMMENT string, INTEGER_IDX int",
    "BUCKETING_COLS": "SD_ID long, BUCKET_COL_NAME string, INTEGER_IDX int",
    "SORT_COLS": "SD_ID long, COLUMN_NAME string, `ORDER` int, INTEGER_IDX int",
    "SERDES": "SERDE_ID long, NAME string, SLIB string",
    "SERDE_PARAMS": "SERDE_ID long, PARAM_KEY string, PARAM_VALUE string",
    "SKEWED_COL_NAMES": "SD_ID long, SKEWED_COL_NAME string, INTEGER_IDX int",
    "SKEWED_STRING_LIST": "STRING_LIST_ID long",
    "SKEWED_STRING_LIST_VALUES": "STRING_LIST_ID long, STRING_LIST_VALUE string, INTEGER_IDX int",
    "SKEWED_COL_VALUE_LOC_MAP": "SD_ID long, STRING_LIST_ID_KID long, LOCATION string",
}

# --- document (catalog) side ----------------------------------------------

COLUMN_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("comment", T.StringType()),
    ]
)

SERDE_INFO_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("serializationLibrary", T.StringType()),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
    ]
)

ORDER_SCHEMA = T.StructType(
    [T.StructField("column", T.StringType()), T.StructField("order", T.IntegerType())]
)

SKEWED_INFO_SCHEMA = T.StructType(
    [
        T.StructField("skewedColumnNames", T.ArrayType(T.StringType())),
        T.StructField("skewedColumnValues", T.ArrayType(T.StringType())),
        T.StructField(
            "skewedColumnValueLocationMaps",
            T.MapType(T.StringType(), T.StringType()),
        ),
    ]
)

STORAGE_DESCRIPTOR_SCHEMA = T.StructType(
    [
        T.StructField("location", T.StringType()),
        T.StructField("inputFormat", T.StringType()),
        T.StructField("outputFormat", T.StringType()),
        T.StructField("compressed", T.BooleanType()),
        T.StructField("numberOfBuckets", T.IntegerType()),
        T.StructField("columns", T.ArrayType(COLUMN_SCHEMA)),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
        T.StructField("serdeInfo", SERDE_INFO_SCHEMA),
        T.StructField("bucketColumns", T.ArrayType(T.StringType())),
        T.StructField("sortColumns", T.ArrayType(ORDER_SCHEMA)),
        T.StructField("skewedInfo", SKEWED_INFO_SCHEMA),
        T.StructField("storedAsSubDirectories", T.BooleanType()),
    ]
)

PARTITION_DOC_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("values", T.ArrayType(T.StringType())),
        T.StructField("createTime", T.StringType()),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
        T.StructField("storageDescriptor", STORAGE_DESCRIPTOR_SCHEMA),
    ]
)

TABLE_DOC_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("owner", T.StringType()),
        T.StructField("createTime", T.StringType()),
        T.StructField("tableType", T.StringType()),
        T.StructField("retention", T.IntegerType()),
        T.StructField("parameters", T.MapType(T.StringType(), T.StringType())),
        T.StructField("partitionKeys", T.ArrayType(COLUMN_SCHEMA)),
        T.StructField("storageDescriptor", STORAGE_DESCRIPTOR_SCHEMA),
    ]
)
