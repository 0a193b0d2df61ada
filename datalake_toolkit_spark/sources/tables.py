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

    The generator writes ``events.ts`` as parquet TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects outright. We read nanos as
    long (legacy conf, runtime-settable) and rebuild a microsecond
    timestamp — the same truncation DuckDB applies when it reads NANOS
    into its microsecond TIMESTAMP.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
