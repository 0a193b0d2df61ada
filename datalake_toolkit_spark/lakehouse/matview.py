"""Incrementally-maintained aggregate views over LakeTables.

The streaming rollup (streaming/rollup.py) maintains aggregates from a
live stream; this is its batch/lakehouse twin: a count/sum groupBy view
refreshed from the base table's CHANGE DATA FEED, so each refresh costs
O(changed partitions) + O(touched groups) — never a rescan of the base.
Deletes subtract and inserts add (count and sum are self-inverting
under CDF's delete+insert encoding), groups whose count reaches zero
drop out, and the view's commit log records which base version each
refresh covered, making refresh idempotent and resumable.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datalake_toolkit_spark.lakehouse.table import LakeTable

_REFRESH_OP = re.compile(r"^refresh_base_v(\d+)$")


def _null_safe_cond(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> Column:
    """Null-safe equi-join condition over ``keys``.

    Plain ``join(..., keys)`` uses null-unsafe equality, so a NULL
    group key never matches itself: on the incremental paths a
    NULL-key group would enter the view on the full build but later
    deltas would neither recompute it (left_semi misses) nor carry it
    off (left_anti keeps the stale row), silently diverging from a
    recompute. ``eqNullSafe`` (`<=>`) still plans as a hash
    equi-join — NULLs hash like any other value under `<=>` — so
    this costs nothing at scale.
    """
    return reduce(
        lambda a, b: a & b, [left[k].eqNullSafe(right[k]) for k in keys]
    )


def last_refreshed_version(view: LakeTable) -> int | None:
    """Highest base version this view has incorporated, from the
    view's own commit history (None = never built)."""
    latest: int | None = None
    if view.current_version() is None:
        return None
    for h in view.history():
        m = _REFRESH_OP.match(h.get("op", ""))
        if m:
            v = int(m.group(1))
            latest = v if latest is None else max(latest, v)
    return latest


def refresh_aggregate_view(
    base: LakeTable,
    view: LakeTable,
    keys: Sequence[str],
    value_col: str,
    include_avg: bool = False,
) -> int | None:
    """Bring ``view`` (= SELECT keys, count(*) AS n_rows,
    sum(value_col) AS sum_value) up to date with ``base``.

    ``include_avg=True`` additionally maintains ``avg_value``: an
    average is not delta-invertible on its own, but it IS derivable
    from the (count, sum) pair this view already maintains — so both
    refresh paths emit ``sum_value / n_rows`` from the identical
    carried state and the incremental view can never drift from a
    recompute on the average either.

    First call builds the full aggregate; later calls apply only the
    change feed since the last refresh. Sums aggregate in DECIMAL so
    incremental (+delta) and from-scratch paths are bit-identical —
    double sums would drift by summation order and the maintained view
    would slowly diverge from a recompute. BOTH paths emit
    ``sum_value`` as DECIMAL(28,2) (Spark's widened sum-over-
    DECIMAL(18,2) type): the full build gets it from ``sum`` directly
    and the incremental merge casts back up to it, so the view's
    schema never flips between refresh paths. A group sum beyond 26
    integer digits overflows to NULL in non-ANSI mode — at 2 decimal
    places that is 10^24 currency units per group, unreachable before
    ``n_rows`` (a long) would itself overflow.
    Returns the base version refreshed to (None = already current).

    The refreshed view commits as a full snapshot write — views are
    group-cardinality-sized, orders of magnitude smaller than their
    base. If a view itself grows huge (billions of groups), partition
    it by a key prefix and swap the snapshot write for an upsert of
    the touched groups so a refresh rewrites only affected partitions.
    """
    keys = list(keys)
    cur = base.current_version()
    if cur is None:
        raise ValueError("base table has no committed version")
    val = F.col(value_col).cast("decimal(18,2)")

    def finish(df: DataFrame) -> DataFrame:
        if include_avg:
            # derived from the maintained (count, sum) pair with ONE
            # shared expression, so both refresh paths agree bit-for-bit
            df = df.withColumn(
                "avg_value",
                (F.col("sum_value") / F.col("n_rows")).cast("decimal(28,6)"),
            )
        return df

    last = last_refreshed_version(view)
    if last is None:
        full = base.read().groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(val).alias("sum_value"),
        )
        view.write(finish(full), op=f"refresh_base_v{cur}")
        return cur
    if last >= cur:
        return None
    delta = base.changes(last, cur)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    updates = delta.groupBy(*keys).agg(
        F.sum(sign).alias("_d_n"),
        F.sum(sign * val).alias("_d_s"),
    )
    zero_n = F.lit(0).cast("long")
    zero_s = F.lit(0).cast("decimal(28,2)")
    current = view.read()
    merged = (
        current
        .join(updates, _null_safe_cond(current, updates, keys), "full_outer")
        .select(
            # both-NULL keys matched null-safely, so coalesce to NULL is
            # the genuine key value, not a miss
            *[F.coalesce(current[k], updates[k]).alias(k) for k in keys],
            (F.coalesce(current["n_rows"], zero_n) + F.coalesce(updates["_d_n"], zero_n))
            .cast("long")
            .alias("n_rows"),
            (F.coalesce(current["sum_value"], zero_s) + F.coalesce(updates["_d_s"], zero_s))
            .cast("decimal(28,2)")
            .alias("sum_value"),
        )
        .where(F.col("n_rows") > 0)
    )
    view.write(finish(merged), op=f"refresh_base_v{cur}")
    return cur


def refresh_group_stats_view(
    base: LakeTable,
    view: LakeTable,
    keys: Sequence[str],
    value_col: str,
) -> int | None:
    """Bring ``view`` (= SELECT keys, count(*) AS n_rows, sum/min/max
    of ``value_col``) up to date with ``base`` — the maintenance
    strategy for aggregates a delta CANNOT invert (a delete may have
    removed the current min/max, so +/- arithmetic is unsound).

    First call builds the full aggregate. Later calls read the change
    feed ONLY to learn which groups were touched, recompute exactly
    those groups from the current base snapshot, and carry every
    untouched group's row forward by anti-join — so the cost is
    O(changed partitions) for the CDF + O(touched groups' rows) for
    the recompute, never a full rescan of untouched groups. When the
    group keys prefix the base's partition columns the recompute scan
    itself partition-prunes.

    Same type discipline as :func:`refresh_aggregate_view`: both
    paths emit sum_value as DECIMAL(28,2) and min/max as
    DECIMAL(18,2), so the view schema never flips between refresh
    paths. Returns the base version refreshed to (None = current).
    """
    keys = list(keys)
    cur = base.current_version()
    if cur is None:
        raise ValueError("base table has no committed version")
    val = F.col(value_col).cast("decimal(18,2)")

    def aggregate(df):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(val).alias("sum_value"),
            F.min(val).alias("min_value"),
            F.max(val).alias("max_value"),
        )

    last = last_refreshed_version(view)
    if last is None:
        view.write(aggregate(base.read()), op=f"refresh_base_v{cur}")
        return cur
    if last >= cur:
        return None
    # touched-group set is bounded by changed rows; AQE picks the
    # broadcast at runtime when it is small (no forced hint — a bulk
    # rewrite can touch every group)
    touched = base.changes(last, cur).select(*keys).distinct()
    snapshot = base.read()
    recomputed = aggregate(
        snapshot.join(touched, _null_safe_cond(snapshot, touched, keys), "left_semi")
    )
    current = view.read()
    carried = current.join(touched, _null_safe_cond(current, touched, keys), "left_anti")
    view.write(
        carried.unionByName(recomputed), op=f"refresh_base_v{cur}"
    )
    return cur
