"""The reference's event-driven ingestion state machine, Spark-native.

Reference (SURVEY.md §3.1): S3 ObjectCreated -> Lambda regex plugin
dispatch -> DynamoDB ledger (INITIAL_LOAD) -> stage -> EMR
spark-submit per file -> ledger LOADED/FAILED, with six Lambdas, a
DDB stream, SNS and CloudWatch glueing it together
(lambda/odl_datalake_ingestion/odl_datalake_ingestion.py:55-96,
lambda/odl_spark_submit/odl_spark_submit.py:310-326,
lambda/odl_validate_job_submit/odl_validate_job_submit.py:164-254).

Here the whole chain is ONE Structured Streaming job:

- the file source with a checkpoint replaces S3 events + the
  delete-after-processing dedup guard (exactly-once file discovery);
- the regex plugin table (plugins/default.py:38 etc.) becomes
  first-match-wins routing on ``_metadata.file_path``;
- the DynamoDB control table becomes a MERGE-maintained LakeTable
  ledger with the same status machine INITIAL_LOAD -> PROCESSING ->
  LOADED/FAILED: each transition is an upsert keyed on
  s3_object_name (the put_item equivalent), partitioned by batch_id
  so a transition rewrites only its own batch's partition. A replayed
  batch is skipped only if its ledger rows reached a terminal SUCCESS
  state (LOADED/SKIPPED) — a batch that died mid-write leaves
  PROCESSING or FAILED rows and is reprocessed on restart, and the
  replayed upsert is idempotent by key. The data write itself is
  idempotent too: each batch lands under an ``ingest_batch=<id>``
  leaf partition via dynamic partition overwrite, so a replay
  overwrites exactly its own partitions and never duplicates earlier
  batches;
- CloudWatch-scheduled draining becomes ``Trigger.AvailableNow`` (or
  a processingTime trigger for continuous tailing);
- EMR-queue backpressure (256-step limit) becomes
  ``maxFilesPerTrigger``.

Scale: discovery is O(new files) per trigger; the transform/write is
ordinary partitioned-parquet ETL parallelized by file splits; ledger
appends are tiny (rows = files per batch).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATUS_INITIAL = "INITIAL_LOAD"
STATUS_PROCESSING = "PROCESSING"
STATUS_LOADED = "LOADED"
STATUS_FAILED = "FAILED"
STATUS_SKIPPED = "SKIPPED"
STATUS_UNMATCHED = "UNMATCHED"

# Route label for files no plugin regex matches. The reference raises
# an SNS-alerted error for these (odl_datalake_ingestion.py:87-96);
# here they are quarantined: ledger status UNMATCHED, rows never reach
# the output table. Terminal like SKIPPED — a replay re-upserts the
# same quarantine rows, it does not retry them.
UNMATCHED_PLUGIN = "__unmatched__"

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("s3_object_name", T.StringType()),
        T.StructField("plugin", T.StringType()),
        T.StructField("file_status", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("updated_at", T.DoubleType()),
    ]
)


@dataclass
class RoutePlugin:
    """One row of the reference's plugin table: first regex match on
    the file path wins (odl_datalake_ingestion.py:63-87). ``skip=True``
    mirrors the skip_file plugin; ``transform`` is the per-plugin
    DataFrame transform applied before the sink."""

    name: str
    pattern: str
    skip: bool = False
    transform: Callable[[DataFrame], DataFrame] | None = None


@dataclass
class IngestionPipeline:
    spark: SparkSession
    source_dir: str
    schema: T.StructType | str
    output_path: str
    ledger_path: str
    checkpoint_dir: str
    plugins: Sequence[RoutePlugin] = field(default_factory=list)
    partition_by: Sequence[str] = ()
    sep: str = ","
    header: bool = False
    max_files_per_trigger: int | None = None

    def _route_expr(self):
        expr = F.lit(UNMATCHED_PLUGIN)
        for plugin in reversed(list(self.plugins)):
            expr = F.when(
                F.col("_ingest_path").rlike(plugin.pattern), F.lit(plugin.name)
            ).otherwise(expr)
        return expr

    def _source(self) -> DataFrame:
        reader = (
            self.spark.readStream.format("csv")
            .schema(self.schema)
            .option("sep", self.sep)
            .option("header", str(self.header).lower())
        )
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return (
            reader.load(self.source_dir)
            .withColumn("_ingest_path", F.col("_metadata.file_path"))
            .withColumn("_plugin", self._route_expr())
        )

    # -- ledger -----------------------------------------------------------
    #
    # The ledger is a LakeTable MERGE-maintained on s3_object_name (the
    # DynamoDB put_item equivalent): one current row per file, status
    # transitions PROCESSING -> LOADED/SKIPPED/FAILED applied as
    # upserts. Partitioned by batch_id, so each transition rewrites
    # only its own batch's partition — O(batch files), not O(ledger).

    def _ledger_table(self):
        from datalake_toolkit_spark.lakehouse import LakeTable

        return LakeTable(self.spark, self.ledger_path, partition_by=("batch_id",))

    def _upsert_ledger(self, rows: list[tuple]) -> None:
        if not rows:
            return
        self._ledger_table().upsert(
            self.spark.createDataFrame(rows, LEDGER_SCHEMA),
            keys=["s3_object_name"],
        )

    def _batch_committed(self, batch_id: int) -> bool:
        """True iff this batch reached a terminal SUCCESS state. A
        mere ledger *presence* check would also skip batches whose
        attempt died after writing PROCESSING/FAILED rows — dropping
        their files forever on restart."""
        t = self._ledger_table()
        if t.current_version() is None:
            return False
        return bool(
            t.read()
            .where(
                (F.col("batch_id") == batch_id)
                & F.col("file_status").isin(
                    STATUS_LOADED, STATUS_SKIPPED, STATUS_UNMATCHED
                )
            )
            .limit(1)
            .count()
        )

    # -- the micro-batch body --------------------------------------------

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._batch_committed(batch_id):
            return  # replayed after restart: output+ledger already committed
        now = time.time()
        per_file = {
            (r["_ingest_path"], r["_plugin"]): r["n"]
            for r in batch.groupBy("_ingest_path", "_plugin")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        skip_names = {p.name for p in self.plugins if p.skip}
        # in-flight visibility, like the reference's DDB status writes:
        # files show PROCESSING while the batch job runs
        self._upsert_ledger(
            [
                (path, plugin, STATUS_PROCESSING, int(n), batch_id, now)
                for (path, plugin), n in per_file.items()
            ]
        )
        status: dict[tuple[str, str], str] = {}
        try:
            # skip-plugin rows and unmatched files never reach the sink;
            # unmatched quarantine mirrors the reference's no-plugin-match
            # error path (odl_datalake_ingestion.py:87-96)
            excluded = set(skip_names) | {UNMATCHED_PLUGIN}
            routed = batch.where(~F.col("_plugin").isin(*excluded))
            transformed = [
                p.name for p in self.plugins if not p.skip and p.transform is not None
            ]
            pieces = [
                p.transform(routed.where(F.col("_plugin") == p.name))
                for p in self.plugins
                if not p.skip and p.transform is not None
            ]
            rest = (
                routed.where(~F.col("_plugin").isin(*transformed))
                if transformed
                else routed
            )
            from functools import reduce

            out = (
                reduce(
                    lambda a, b: a.unionByName(b, allowMissingColumns=True),
                    pieces + [rest],
                )
                .drop("_ingest_path", "_plugin")
                .withColumn("ingest_batch", F.lit(batch_id))
            )
            # Idempotent batch commit: every batch owns the
            # (partition_by..., ingest_batch=<id>) leaf partitions, and
            # dynamic partition overwrite replaces exactly those on a
            # replay — no cross-batch append, no duplicate files. The
            # ingest_batch column doubles as the generation key for
            # snapshot retention.
            writer = (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*self.partition_by, "ingest_batch")
            )
            writer.parquet(self.output_path)
            status = {
                (p, pl): (
                    STATUS_SKIPPED
                    if pl in skip_names
                    else STATUS_UNMATCHED
                    if pl == UNMATCHED_PLUGIN
                    else STATUS_LOADED
                )
                for (p, pl) in per_file
            }
        except Exception:
            status = {key: STATUS_FAILED for key in per_file}
            raise
        finally:
            self._upsert_ledger(
                [
                    (
                        path,
                        plugin,
                        status.get((path, plugin), STATUS_FAILED),
                        int(n),
                        batch_id,
                        time.time(),
                    )
                    for (path, plugin), n in per_file.items()
                ]
            )

    # -- run --------------------------------------------------------------

    def run_available_now(self, timeout_sec: int = 300) -> None:
        """Drain everything currently in the source dir, then stop —
        the CloudWatch-schedule replacement."""
        query = (
            self._source()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)
        if query.isActive:
            query.stop()


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    """Current per-file status (the DDB get_item equivalent). The
    ledger is MERGE-maintained, so the table's current snapshot IS
    the latest status per file — no dedup window needed."""
    from datalake_toolkit_spark.lakehouse import LakeTable

    return LakeTable(spark, ledger_path, partition_by=("batch_id",)).read()
