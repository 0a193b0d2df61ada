"""Continuous windowed aggregate (hypertable-rollup style): a
partitioned Parquet rollup table maintained incrementally from a
stream.

The reference has no streaming aggregates (SURVEY.md §2.10); this is
the beyond-reference materialized-rollup operator a time-series /
training-telemetry pipeline needs: query the small rollup table, not
the raw event stream.

Mechanics: watermarked tumbling-window aggregation in ``update``
output mode — each micro-batch emits the *current totals* for every
window the batch touched (state carries the running aggregate, late
data within the watermark re-emits its window). ``foreachBatch``
merges by replacement: affected date partitions are rewritten as
(existing rows minus touched windows) ∪ (batch rows), via
dynamic-partition overwrite so untouched dates are never rewritten.

Exactly-once: the merge is a deterministic replacement keyed on
(window_start, groups), so a checkpoint replay of the last batch
rewrites the same partitions to the same content.

Scale: per-batch work is proportional to touched windows + affected
partitions, not table size; state is bounded by the watermark
horizon; the merge output is rebalanced by ``dt`` so each affected
date partition is written by its own task(s) — a multi-date batch
never serializes through one writer task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_rollup(
    events: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str = "1 day",
    timeout_sec: int = 300,
) -> None:
    """Drain the streaming ``events`` frame (availableNow) into the
    rollup table at ``rollup_path``: one row per (window_start,
    group) with n_events / sum_value, partitioned by dt."""
    keys = ["window_start", *group_cols]
    agg = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
        .withColumn("dt", F.to_date("window_start"))
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch = batch.persist()
        try:
            try:
                existing = spark.read.parquet(rollup_path)
            except Exception:
                existing = None
            if existing is not None:
                affected = [r.dt for r in batch.select("dt").distinct().collect()]
                kept = existing.where(F.col("dt").isin(affected)).join(
                    batch.select(*keys), keys, "left_anti"
                )
                out = kept.unionByName(batch)
            else:
                out = batch
            # dynamic overwrite touches only the affected dt partitions;
            # rebalance by dt (AQE coalesces tiny outputs) instead of
            # coalesce(1), which would funnel every affected partition
            # through a single writer task at scale
            out.hint("rebalance", "dt").write.mode("overwrite").partitionBy(
                "dt"
            ).parquet(rollup_path)
        finally:
            batch.unpersist()

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
