"""SparkSession factory.

Translates the reference's performance envelope (see BASELINE.md) into
modern Spark conf:

- 512 MB input splits (reference: ``mapreduce.input.fileinputformat.
  split.{min,max}size=536870912`` in every ETL job, e.g.
  artifacts/spark_programs/spark_submit_tb_call_req_parquet.py:89-91)
  -> ``spark.sql.files.maxPartitionBytes=512m``.
- dynamic-partition insert, nonstrict (same file :84-85).
- output-committer v2 / no speculation (same file :83-84) -> speculation
  off is the default; committer settings kept for Hadoop FS sinks.
- AQE on (runtime re-plan, skew-join handling, partition coalescing) —
  the modern replacement for the reference's hand-tuned split sizes.

Scale notes (100 TB / 1000 executors): every knob here is cluster-size
independent. ``spark.sql.shuffle.partitions`` is only a *default* —
AQE coalesces small post-shuffle partitions and splits skewed ones, so
a large static value (cluster: 2000+) plus AQE is the intended setup;
locally we default to the core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "datalake-toolkit-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Parameters mirror the reference's per-job session construction
    (SparkSession.builder + conf tuning in every spark_submit_*.py run()),
    centralized once.
    """
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce the plan feeding persist()/cache too
        # (default false): the lifecycle paths persist batch-sized
        # frames whose post-shuffle partition count would otherwise be
        # pinned at spark.sql.shuffle.partitions — every downstream
        # job over the cache then schedules that many near-empty
        # tasks, which is pure per-task overhead that GROWS with the
        # core count (the r14 32-core q_index_sync regression).
        # Scale-adaptive, not local-tuned: AQE sizes the cached
        # partitions from the data (advisoryPartitionSizeInBytes), so
        # a 100 TB batch still caches wide.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.files.maxPartitionBytes", "536870912")
        .config("spark.sql.session.timeZone", "UTC")
        # naive parquet timestamps (isAdjustedToUTC=false) load as plain
        # TIMESTAMP, not TIMESTAMP_NTZ — with a UTC session TZ the values
        # match DuckDB's naive reading, and unix_* functions keep working
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # modern timestamp encoding: INT96 (Spark's legacy default) has
        # NO footer min/max statistics, so neither parquet row-group
        # skipping nor LakeTable manifest file stats can prune on
        # timestamp columns; TIMESTAMP_MICROS restores both
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batch rows so mapInPandas over MB-sized binary
        # payloads (multimodal decode/resize) can't blow executor
        # memory; narrow-row throughput impact is negligible
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # dynamic-partition insert semantics (reference S12)
        .config("hive.exec.dynamic.partition", "true")
        .config("hive.exec.dynamic.partition.mode", "nonstrict")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # S3-era committer tuning; harmless on local FS
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.speculation", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
