"""Batch ingestion: delimited files -> partitioned Parquet tables.

The reference's data plane (SURVEY.md §3.1): per-table EMR Spark jobs
reading raw CSV/TSV with a catalog-probed schema, applying date-parse
transforms, and writing dynamic-partitioned Parquet
(artifacts/spark_programs/spark_submit_tb_call_req_parquet.py:100-123,
spark_submit_tb_iba_laminacao_parquet.py:78-141). Re-expressed as one
parameterized pipeline.

Scale notes:
- schema is DECLARED (no inferSchema scan) — one pass over the data;
- the CSV scan parallelizes by ``maxPartitionBytes`` (512 MB splits,
  the reference's envelope);
- partitioned write uses dynamic partition overwrite so re-ingesting
  a day replaces only that day;
- ``target_file_partitions`` reproduces the reference's
  ``repartition(1, year)`` file-count control (Y1) — at cluster scale
  pick partitions ~= output_size / 512MB.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_toolkit_spark.functions import parse_date


def read_delimited(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: T.StructType | str | None = None,
    sep: str = ",",
    header: bool = False,
    encoding: str = "UTF-8",
    null_value: str | None = "null",
    quote: str | None = None,
    infer_schema: bool = False,
    corrupt_record_col: str | None = None,
) -> DataFrame:
    """S1-S4: delimited scan with declared schema (or S4-style
    inference when explicitly requested).

    ``corrupt_record_col`` opts into PERMISSIVE salvage: rows that
    fail the schema land whole in that column (other columns NULL)
    instead of failing the job — at 100 TB some malformed lines are a
    certainty, and the reference's ingest marks such files SKIPPED
    rather than dying (odl_datalake_ingestion plugins). Filter
    ``col IS NOT NULL`` to quarantine them."""
    reader = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .option("encoding", encoding)
    )
    if corrupt_record_col is not None:
        if schema is None:
            raise ValueError("corrupt_record_col requires a declared schema")
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        # copy before add(): StructType.add mutates in place and would
        # corrupt the caller's schema object for reuse
        schema = T.StructType(list(schema.fields)).add(
            corrupt_record_col, T.StringType()
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_record_col
        )
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    if quote is not None:
        reader = reader.option("quote", quote)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    paths = [paths] if isinstance(paths, str) else list(paths)
    return reader.csv(paths)


def with_parsed_dates(df: DataFrame, formats: dict[str, str]) -> DataFrame:
    """F1: parse string columns to timestamps (NULL on failure), Java
    datetime patterns."""
    for col, fmt in formats.items():
        df = df.withColumn(col, parse_date(col, fmt))
    return df


def with_partition_column(
    df: DataFrame, source_col: str, partition_col: str = "dt", kind: str = "date"
) -> DataFrame:
    """F2/F3: derive the partition column (date or year) from a
    timestamp column."""
    src = F.col(source_col)
    if kind == "date":
        value: Column = src.cast("date")
    elif kind == "year":
        value = F.year(src)
    else:
        raise ValueError(f"unknown partition kind: {kind}")
    return df.withColumn(partition_col, value)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    target_file_partitions: int | None = None,
) -> None:
    """S11-S13 partitioned Parquet sink with file-count control.

    Explicit ``target_file_partitions`` reproduces Y1
    ``repartition(n, cols)``. Otherwise a REBALANCE hint on the
    partition columns is applied by default: without it a partitioned
    write emits (input tasks x partition values) files — at 1000
    executors that is the small-file explosion the reference's
    compaction job exists to clean up. With AQE the rebalance yields
    ~one right-sized file per partition value and splits skewed
    (hot-date) partitions across tasks instead of bottlenecking on
    one."""
    if partition_by:
        if target_file_partitions is not None:
            df = df.repartition(
                target_file_partitions, *[F.col(c) for c in partition_by]
            )
        else:
            df = df.hint("rebalance", *partition_by)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def ingest_delimited(
    spark: SparkSession,
    paths: str | Sequence[str],
    output_path: str,
    schema: T.StructType | str | None = None,
    sep: str = ",",
    header: bool = False,
    date_formats: dict[str, str] | None = None,
    partition_source: str | None = None,
    partition_col: str = "dt",
    partition_kind: str = "date",
    transform: Callable[[DataFrame], DataFrame] | None = None,
    mode: str = "overwrite",
    target_file_partitions: int | None = None,
) -> DataFrame:
    """The end-to-end M1 slice: scan -> date-parse -> derive partition
    -> custom transform -> partitioned Parquet. Returns the written
    DataFrame (lazily re-readable from ``output_path``)."""
    df = read_delimited(spark, paths, schema=schema, sep=sep, header=header)
    if date_formats:
        df = with_parsed_dates(df, date_formats)
    partition_by: list[str] = []
    if partition_source is not None:
        df = with_partition_column(df, partition_source, partition_col, partition_kind)
        partition_by = [partition_col]
    if transform is not None:
        df = transform(df)
    write_partitioned(
        df,
        output_path,
        partition_by,
        mode=mode,
        target_file_partitions=target_file_partitions,
    )
    return spark.read.parquet(output_path)


def compact(
    spark: SparkSession, path: str, target_partitions: int, output_path: str | None = None
) -> None:
    """Y2 small-file compaction (glue/spark_repartition.py:53-55):
    read -> coalesce to target -> rewrite. ``coalesce`` avoids a
    shuffle when reducing partition count."""
    df = spark.read.parquet(path)
    out = output_path or path + "_compacted"
    df.coalesce(target_partitions).write.mode("overwrite").parquet(out)


def insert_into_table(df: DataFrame, table: str, overwrite: bool = False) -> None:
    """S12: dynamic-partition table insert with the Hive
    ``insertInto`` contract the reference's ETL jobs rely on
    (spark_submit_tb_impressions_parquet.py:98,
    spark_submit_tb_iba_laminacao_parquet.py:141; session conf
    ``hive.exec.dynamic.partition[.mode]``):

    - columns match the target table BY POSITION, not by name — the
      last column(s) feed the partition column(s);
    - every insert is a dynamic-partition insert: partition values
      come from the data;
    - with ``overwrite=True`` and
      ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
      the engine session factory), only the partitions present in
      ``df`` are replaced — the reference's nonstrict overwrite.

    The position contract silently mis-maps reordered columns
    (SURVEY.md §7 risk 1) — locked by tests, and callers should
    ``select`` columns in table order first.
    """
    df.write.insertInto(table, overwrite=overwrite)
