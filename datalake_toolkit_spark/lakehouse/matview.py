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

from pyspark.sql import functions as F

from datalake_toolkit_spark.lakehouse.table import LakeTable

_REFRESH_OP = re.compile(r"^refresh_base_v(\d+)$")


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
) -> int | None:
    """Bring ``view`` (= SELECT keys, count(*) AS n_rows,
    sum(value_col) AS sum_value) up to date with ``base``.

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
    last = last_refreshed_version(view)
    if last is None:
        full = base.read().groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(val).alias("sum_value"),
        )
        view.write(full, op=f"refresh_base_v{cur}")
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
    merged = (
        view.read()
        .join(updates, keys, "full_outer")
        .select(
            *keys,
            (F.coalesce("n_rows", zero_n) + F.coalesce("_d_n", zero_n))
            .cast("long")
            .alias("n_rows"),
            (F.coalesce("sum_value", zero_s) + F.coalesce("_d_s", zero_s))
            .cast("decimal(28,2)")
            .alias("sum_value"),
        )
        .where(F.col("n_rows") > 0)
    )
    view.write(merged, op=f"refresh_base_v{cur}")
    return cur
