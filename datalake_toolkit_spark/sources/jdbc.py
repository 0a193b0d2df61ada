"""JDBC endpoints (SURVEY.md §2.1 S8/S15/S17).

The reference extracts 19 Hive-metastore tables over JDBC
(hive_metastore_migration.py:1262-1310), writes them back in
FK-dependency order (:1313-1336), and imports arbitrary RDBMS tables
with a sqoop job chain — sqoop import to HDFS, hadoop getmerge, s3 cp
(artifacts/sqoop/jobs/job_sampledb.sh:33-50). Here each is one Spark
job:

- ``read_jdbc`` / ``write_jdbc`` — thin wrappers over the native
  datasource, with partitioned-read support (``partition_column`` +
  bounds splits the table scan across executors, the Spark-idiomatic
  version of sqoop's ``--num-mappers``).
- ``extract_metastore`` / ``load_metastore`` — the 19-table set, load
  ordered parents-before-children so FK constraints hold.
- ``jdbc_table_to_csv`` — the sqoop chain as a single distributed
  job: JDBC scan -> delimited write (default '\\x01' separator,
  matching ``--fields-terminated-by '\\001'``). No getmerge needed —
  a downstream CSV scan reads the directory.

Tests exercise these against the Derby embedded engine that ships in
Spark's classpath; in production the url/driver swap for
MySQL/Postgres with no code change.

Scale notes: an unpartitioned JDBC read is a single task — always
pass ``partition_column``/bounds for big tables; writes use
``batchsize`` so executors stream inserts instead of row-at-a-time
autocommit.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from datalake_toolkit_spark.catalog.schemas import METASTORE_DDL

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

# Parents before children (FK targets first), per the reference's
# write order (hive_metastore_migration.py:1313-1336).
METASTORE_WRITE_ORDER: tuple[str, ...] = (
    "DBS",
    "DATABASE_PARAMS",
    "SERDES",
    "SERDE_PARAMS",
    "SDS",
    "SD_PARAMS",
    "COLUMNS_V2",
    "BUCKETING_COLS",
    "SORT_COLS",
    "SKEWED_STRING_LIST",
    "SKEWED_STRING_LIST_VALUES",
    "SKEWED_COL_NAMES",
    "SKEWED_COL_VALUE_LOC_MAP",
    "TBLS",
    "TABLE_PARAMS",
    "PARTITION_KEYS",
    "PARTITIONS",
    "PARTITION_PARAMS",
    "PARTITION_KEY_VALS",
)


def _props(properties: Mapping[str, str] | None) -> dict[str, str]:
    props = {"driver": DERBY_DRIVER, "batchsize": "1000"}
    if properties:
        props.update(properties)
    return props


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: Mapping[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S8: JDBC table scan. With ``partition_column`` + bounds the
    scan is split into ``num_partitions`` range predicates executed
    in parallel; without, it is one executor task (fine for dimension
    tables only)."""
    if partition_column is not None:
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions or spark.sparkContext.defaultParallelism,
            properties=_props(properties),
        )
    return spark.read.jdbc(url, table, properties=_props(properties))


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: Mapping[str, str] | None = None,
) -> None:
    """S15: JDBC sink (executor-parallel batched inserts)."""
    df.write.jdbc(url, table, mode=mode, properties=_props(properties))


def extract_metastore(
    spark: SparkSession,
    url: str,
    properties: Mapping[str, str] | None = None,
    tables: Sequence[str] | None = None,
) -> dict[str, DataFrame]:
    """S8 parity: pull the metastore table set
    (hive_metastore_migration.py:1289-1310) into a name->DataFrame
    dict — the input shape ``assemble_catalog_tables`` consumes."""
    names = tuple(tables) if tables is not None else tuple(METASTORE_DDL)
    return {t: read_jdbc(spark, url, t, properties) for t in names}


def load_metastore(
    ms: Mapping[str, DataFrame],
    url: str,
    properties: Mapping[str, str] | None = None,
    mode: str = "append",
) -> list[str]:
    """S15 parity: write the metastore dict in FK-dependency order
    (hive_metastore_migration.py:1313-1336); returns the tables
    written, in order."""
    written: list[str] = []
    for t in METASTORE_WRITE_ORDER:
        if t in ms:
            write_jdbc(ms[t], url, t, mode=mode, properties=properties)
            written.append(t)
    # anything not in the canonical order list goes last
    for t, df in ms.items():
        if t not in METASTORE_WRITE_ORDER:
            write_jdbc(df, url, t, mode=mode, properties=properties)
            written.append(t)
    return written


def jdbc_table_to_csv(
    spark: SparkSession,
    url: str,
    table: str,
    out_path: str,
    sep: str = "\x01",
    properties: Mapping[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> None:
    """S17: the sqoop import chain (sqoop import + getmerge + s3 cp,
    artifacts/sqoop/jobs/job_sampledb.sh:33-50) as one job. The
    default separator matches sqoop's ``--fields-terminated-by
    '\\001'``."""
    df = read_jdbc(
        spark,
        url,
        table,
        properties,
        partition_column,
        lower_bound,
        upper_bound,
        num_partitions,
    )
    df.write.mode("overwrite").option("sep", sep).option("header", "false").csv(
        out_path
    )
