"""Format-generic file scan/sink: parquet | orc | json | csv.

The reference's data plane is parquet-only plus raw CSV/TSV ingest
(SURVEY.md §2.1); this widens the same pipeline to every columnar /
text format Spark ships natively — no extra jars — so a user can point
the M1 ingest at ORC warehouses or JSON event dumps unchanged.

Scale notes: parquet and ORC both get vectorized reads, predicate
pushdown, and column pruning from the native readers; JSON/CSV scans
are schema-declared (never inferred) so they stay single-pass. The
partitioned-write path reuses ``write_partitioned``'s REBALANCE
file-count control.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv")


def _check(fmt: str) -> str:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    return fmt


def read_files(
    spark: SparkSession,
    paths: str | Sequence[str],
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    options: dict[str, str] | None = None,
    ignore_corrupt_files: bool = False,
) -> DataFrame:
    """Scan files of any supported format with an optional declared
    schema (required for json/csv to stay single-pass).

    ``ignore_corrupt_files`` opts the SCAN (not the session) into
    skipping unreadable files instead of failing the job — at 100 TB a
    torn upload or truncated footer is routine, and one bad file must
    cost its own rows only. Uses the per-datasource option, so other
    reads in the same session keep fail-fast semantics."""
    reader = spark.read.format(_check(fmt))
    if schema is not None:
        reader = reader.schema(schema)
    if ignore_corrupt_files:
        reader = reader.option("ignoreCorruptFiles", "true")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    paths = [paths] if isinstance(paths, str) else list(paths)
    return reader.load(paths)


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    options: dict[str, str] | None = None,
) -> None:
    """Sink to any supported format, sharing the partitioned-write
    file-count control with the parquet path."""
    from datalake_toolkit_spark.sources.ingest import write_partitioned

    if _check(fmt) == "parquet" and not options:
        write_partitioned(df, path, partition_by, mode=mode)
        return
    if partition_by:
        df = df.hint("rebalance", *partition_by)
    writer = df.write.format(fmt).mode(mode)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
