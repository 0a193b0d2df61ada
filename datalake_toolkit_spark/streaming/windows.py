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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: pair each left row with
    right rows for the same key whose timestamp falls in
    ``[left_ts - within, left_ts]`` — the view→purchase attribution
    shape.

    Streaming: BOTH sides carry a watermark and the join condition
    bounds the time skew, so Spark can size and evict join state —
    an unbounded-condition stream-stream join would buffer both
    streams forever. State per side ~ watermark + within horizon.
    Batch: the same expression runs as an ordinary range-predicate
    join, which is how it is oracle-verified.

    Right columns are suffixed ``_r`` (the asof_join convention).
    ``how`` supports inner and leftOuter (outer results emit only
    once the watermark passes, per Spark semantics).
    """
    if how not in ("inner", "left", "leftOuter", "left_outer"):
        # right/full outer would need the right key kept post-join;
        # reject rather than silently dropping it
        raise ValueError(f"interval_join supports inner/left joins, got {how!r}")
    is_streaming = left.isStreaming or right.isStreaming
    l = left.withWatermark(left_ts, watermark) if is_streaming else left
    r = right.withWatermark(right_ts, watermark) if is_streaming else right
    # explicit aliases: both sides often derive from the same scan
    # (self-attribution), and lineage-ambiguous l[on] == r[on] would
    # resolve trivially true
    l = l.alias("_ij_l")
    r = r.select(
        F.col(on), *[F.col(c).alias(f"{c}_r") for c in right.columns if c != on]
    ).alias("_ij_r")
    rts = f"{right_ts}_r"
    cond = (
        (F.col(f"_ij_l.{on}") == F.col(f"_ij_r.{on}"))
        & (F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
        & (F.col(rts) <= F.col(left_ts))
    )
    return l.join(r, cond, how).drop(F.col(f"_ij_r.{on}"))
