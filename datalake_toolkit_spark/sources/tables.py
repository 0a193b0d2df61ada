"""Parquet table loading helpers for the test star schema.

Reference parity: S7 parquet scan (glue/spark_repartition.py:53) and
S5 catalog-table scan; here tables live as parquet files under a
scale-factor directory (TESTDATA.md).

Scale note: ``spark.read.parquet`` gives Catalyst full pushdown —
column pruning and predicate pushdown reach the parquet reader, and
partitioned layouts get static/dynamic partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table.

    Timestamp normalization: depending on generator version,
    ``events.ts`` arrives as parquet TIMESTAMP(NANOS) (which Spark's
    vectorized reader rejects — read nanos as long and rebuild micros,
    the same truncation DuckDB applies) or as TIMESTAMP(MICROS) with
    ``isAdjustedToUTC=false`` (which Spark 4 infers as TIMESTAMP_NTZ,
    breaking ``unix_micros``/long casts downstream). We pin NTZ
    inference off so naive parquet timestamps load as plain TIMESTAMP
    — the session TZ is UTC (session.py), so the values are identical
    to DuckDB's naive reading — and keep a defensive NTZ->LTZ cast for
    sessions that read before this conf applied.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
