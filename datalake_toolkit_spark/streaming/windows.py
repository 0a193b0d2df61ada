"""Event-time windowing operators (SURVEY.md §2.10 — absent in the
reference, first-class here).

Both operators are stream/batch symmetric: pass a streaming DataFrame
(with ``watermark`` set) and they run incrementally with state
cleanup; pass a batch DataFrame and Catalyst executes them as plain
aggregations — which is how the DuckDB oracle verifies them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    group_cols: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) window counts + value sum per group.

    Streaming: one shuffle per micro-batch on (window, groups); the
    watermark bounds state. Batch: a plain groupBy on the bucketed
    timestamp."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        df.groupBy(win.alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key dedup, stream/batch symmetric.

    Streaming: ``dropDuplicatesWithinWatermark`` — the first row per
    key is emitted, later duplicates are dropped, and key state older
    than the watermark is evicted, so state stays bounded by the
    duplicate-arrival horizon rather than growing with the whole
    stream (plain ``dropDuplicates`` on an unbounded stream retains
    every key forever — the 100 TB failure mode). Batch: plain
    ``dropDuplicates`` on the keys, which is also the oracle path.
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def sessionized(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per key: a session extends while consecutive
    events arrive within ``gap``; closes otherwise.

    Streaming: ``session_window`` maintains per-key open sessions in
    state, emitting on watermark close. Batch: same expression,
    executed as sort-based session assembly. Output: key,
    session_start (= first event ts), n_events."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )
