"""Event-sequence analytics: funnel conversion and cohort retention.

The classic product-analytics operators an event-lake engine needs
over its events table. Both are deterministic to the microsecond
(``unix_micros`` == DuckDB's ``epoch_us``) and expressed as ONE
groupBy per operator plus pure array/integer expressions — no Python,
no window over unpartitioned data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    within_seconds: float | None = None,
) -> DataFrame:
    """Per-user furthest funnel step: scan the user's events in
    (time, order_col) order and greedily match ``steps`` in sequence
    (step k+1 must occur strictly after the event that matched step
    k). With ``within_seconds``, later steps must land within that
    horizon of the step-1 match. Returns ``(user_col, funnel_step)``
    with 0 = never did step 1.

    Scale: events are pre-filtered to the funnel's types BEFORE the
    per-user collect, so the in-memory array holds only relevant
    events (a heavy user's million clicks outside the funnel never
    materialize). One shuffle on the user key; the greedy scan is a
    codegen'd ``aggregate`` fold over the sorted array. Determinism:
    sort key is (unix_micros, order_col) — microsecond ties break on
    the unique event id.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.where(F.col(type_col).isin(steps)).select(
        F.col(user_col),
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("t"),
            F.col(order_col).alias("o"),
            F.col(type_col).alias("y"),
        ).alias("e"),
    )
    per_user = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list("e")).alias("es")
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    horizon = (
        F.lit(int(within_seconds * 1_000_000)) if within_seconds is not None else None
    )

    def fold(acc: Column, x: Column) -> Column:
        matches = (acc["step"] < F.lit(len(steps))) & (
            x["y"] == F.element_at(step_arr, (acc["step"] + 1).cast("int"))
        )
        if horizon is not None:
            matches = matches & (
                (acc["step"] == 0) | ((x["t"] - acc["t0"]) <= horizon)
            )
        advanced = F.struct(
            (acc["step"] + 1).alias("step"),
            F.when(acc["step"] == 0, x["t"]).otherwise(acc["t0"]).alias("t0"),
        )
        return F.when(matches, advanced).otherwise(acc)

    init = F.struct(
        F.lit(0).cast("int").alias("step"), F.lit(0).cast("long").alias("t0")
    )
    return per_user.select(
        F.col(user_col),
        F.aggregate("es", init, fold)["step"].cast("int").alias("funnel_step"),
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    within_seconds: float | None = None,
) -> DataFrame:
    """Funnel conversion table: one row per step with the number of
    users whose furthest step reached at least it —
    ``(step, step_name, n_users)``, monotonically non-increasing.
    Steps nobody reached still appear with ``n_users = 0`` (indicator
    sum over the full ladder, not a filtered count), so the ladder is
    complete whenever at least one user emitted a funnel-type event."""
    reached = funnel_steps(
        events, steps, user_col, type_col, ts_col, order_col, within_seconds
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(F.lit(i + 1).alias("step"), F.lit(s).alias("step_name"))
                for i, s in enumerate(steps)
            ]
        )
    )
    ladder = reached.select("funnel_step", rows.alias("s")).select(
        F.col("s.step").alias("step"),
        F.col("s.step_name").alias("step_name"),
        F.col("funnel_step"),
    )
    return ladder.groupBy("step", "step_name").agg(
        F.sum((F.col("funnel_step") >= F.col("step")).cast("long")).alias(
            "n_users"
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle: users cohort by the period of their
    FIRST event; each later active period counts toward
    ``(cohort_period, period_offset, n_users)`` with offset 0 = the
    cohort period itself (so offset-0 n_users is the cohort size).

    The period is ``floor(epoch_micros / period_micros)`` — a double
    quotient floored, the same IEEE operation DuckDB's
    ``floor(epoch_us / k)`` performs, so it oracles exactly and (unlike
    a truncating cast) stays correct for pre-1970 timestamps. Two
    shuffles: per-user min, then the (cohort, offset) count over
    distinct user-periods.
    """
    us = F.unix_micros(F.col(ts_col))
    period = F.floor(us / F.lit(float(86_400_000_000 * period_days))).cast(
        "long"
    )
    per_event = events.select(F.col(user_col), period.alias("p"))
    first = per_event.groupBy(user_col).agg(F.min("p").alias("cohort_p"))
    active = per_event.distinct().join(first, user_col)
    return (
        active.select(
            F.col("cohort_p").alias("cohort_period"),
            (F.col("p") - F.col("cohort_p")).cast("int").alias("period_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_period", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def event_paths(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    max_len: int = 5,
    sep: str = ">",
) -> DataFrame:
    """Common-path analysis: each user's first ``max_len`` event types
    in (time, order) sequence collapse to a path string
    (``view>click>purchase``); returns ``(path, n_users)`` — the
    "what do users actually do first" table.

    Same shuffle shape as the funnel: one groupBy on the user key; the
    per-user array is capped at ``max_len`` AFTER sorting, so state is
    bounded. Microsecond ordering, order_col tie-break."""
    ev = events.select(
        F.col(user_col),
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("t"),
            F.col(order_col).alias("o"),
            F.col(type_col).alias("y"),
        ).alias("e"),
    )
    per_user = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list("e")).alias("es")
    )
    path = F.concat_ws(
        sep, F.transform(F.slice("es", 1, max_len), lambda x: x["y"])
    )
    return (
        per_user.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
