"""Data-quality layer: column profiling and constraint checks.

The reference polices data quality operationally (files marked
SKIPPED/FAILED in the ingestion ledger, FK-ordered metastore loads);
this is the analytical counterpart a lake toolkit needs: profile a
table's columns in ONE pass and assert declarative constraints with a
violations report, Deequ/Great-Expectations style but pure DataFrame.

Scale: ``profile_table`` computes every column's metrics in a single
aggregation job (one scan, map-side partials, a handful of result
rows); nothing per-row ever reaches the driver. ``check_constraints``
builds one filter per rule and counts violations in one pass over a
cached scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct,
    min_str, max_str, avg_len).

    All metrics for all columns come from a single aggregation (one
    scan). ``n_distinct`` uses HLL++ (`approx_count_distinct`, fixed
    memory, mergeable partials) by default — the 100 TB path; pass
    ``exact_distinct=True`` for the exact (count distinct) variant
    used by the oracle check. min/max render as strings so one schema
    covers every column type; ``avg_len`` is NULL for non-strings.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        distinct = (
            F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)
        )
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            distinct.alias(f"_dist_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
            (
                F.avg(F.length(col)) if dtypes.get(c) == "string" else F.lit(None)
            ).cast("double").alias(f"_len_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").cast("long").alias("n_null"),
            F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_str"),
            F.col(f"_max_{c}").alias("max_str"),
            F.col(f"_len_{c}").alias("avg_len"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def check_constraints(
    df: DataFrame, rules: dict[str, Column | str]
) -> DataFrame:
    """Evaluate named constraints; one row per rule:
    (rule, n_violations, passed).

    A rule is a boolean Column/SQL-string that must hold for EVERY row
    (violations = rows where it is false or NULL). All rules evaluate
    in one aggregation pass — constraint count is metadata-sized, row
    count is not, so nothing leaves the executors but the counts."""
    aggs = []
    for name, rule in rules.items():
        cond = F.expr(rule) if isinstance(rule, str) else rule
        aggs.append(
            F.sum(F.when(cond, 0).otherwise(1)).cast("long").alias(name)
        )
    row = df.agg(*aggs)
    per_rule = [
        F.struct(
            F.lit(name).alias("rule"),
            F.coalesce(F.col(name), F.lit(0)).alias("n_violations"),
            (F.coalesce(F.col(name), F.lit(0)) == 0).alias("passed"),
        )
        for name in rules
    ]
    return row.select(F.explode(F.array(*per_rule)).alias("r")).select("r.*")


def assert_unique_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Duplicate-key report: (key cols..., n_copies) for every key
    appearing more than once — empty means the key is unique. One
    hash-aggregate shuffle."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def profile_drift(
    baseline: DataFrame,
    current: DataFrame,
    null_rate_shift: float = 0.05,
    distinct_ratio_band: tuple[float, float] = (0.5, 2.0),
    avg_len_rel_shift: float = 0.25,
) -> DataFrame:
    """Compare two :func:`profile_table` outputs (e.g. yesterday's
    snapshot profile vs today's — pair with LakeTable time travel) and
    flag drifted columns. One row per column present in either side:

    - ``null_rate_base`` / ``null_rate_cur`` and ``null_drift`` when
      the absolute null-rate shift exceeds ``null_rate_shift``;
    - ``distinct_ratio`` (cur/base, row-count-normalized) and
      ``distinct_drift`` when outside ``distinct_ratio_band``;
    - ``len_drift`` when a string column's avg length moves by more
      than ``avg_len_rel_shift`` relative;
    - ``range_drift`` when min_str/max_str changed;
    - ``schema_drift`` when the column exists on only one side;
    - ``any_drift``: OR of the above.

    Profiles are a handful of rows per table, so this is a broadcast
    join of metadata — the heavy scan already happened in
    profile_table. Drift detection therefore costs two table scans
    total at ANY scale, never a re-read of history."""
    b = baseline.select(
        F.col("column"),
        (F.col("n_null") / F.greatest(F.col("n_rows"), F.lit(1))).alias("null_rate_base"),
        (F.col("n_distinct") / F.greatest(F.col("n_rows"), F.lit(1))).alias("_ddens_b"),
        F.col("min_str").alias("_min_b"),
        F.col("max_str").alias("_max_b"),
        F.col("avg_len").alias("_len_b"),
    )
    c = current.select(
        F.col("column"),
        (F.col("n_null") / F.greatest(F.col("n_rows"), F.lit(1))).alias("null_rate_cur"),
        (F.col("n_distinct") / F.greatest(F.col("n_rows"), F.lit(1))).alias("_ddens_c"),
        F.col("min_str").alias("_min_c"),
        F.col("max_str").alias("_max_c"),
        F.col("avg_len").alias("_len_c"),
    )
    j = b.join(c, ["column"], "full_outer")
    schema_drift = F.col("null_rate_base").isNull() | F.col("null_rate_cur").isNull()
    null_drift = (
        F.abs(F.col("null_rate_cur") - F.col("null_rate_base")) > F.lit(null_rate_shift)
    )
    distinct_ratio = F.col("_ddens_c") / F.nullif(F.col("_ddens_b"), F.lit(0.0))
    lo, hi = distinct_ratio_band
    distinct_drift = (distinct_ratio < F.lit(lo)) | (distinct_ratio > F.lit(hi))
    len_drift = (
        F.abs(F.col("_len_c") - F.col("_len_b"))
        / F.nullif(F.abs(F.col("_len_b")), F.lit(0.0))
    ) > F.lit(avg_len_rel_shift)
    range_drift = (
        F.col("_min_b").eqNullSafe(F.col("_min_c"))
        & F.col("_max_b").eqNullSafe(F.col("_max_c"))
    ) == F.lit(False)
    flags = {
        "schema_drift": schema_drift,
        "null_drift": F.coalesce(null_drift, F.lit(False)),
        "distinct_drift": F.coalesce(distinct_drift, F.lit(False)),
        "len_drift": F.coalesce(len_drift, F.lit(False)),
        "range_drift": F.coalesce(range_drift, F.lit(False)) & ~schema_drift,
    }
    out = j.select(
        "column",
        "null_rate_base",
        "null_rate_cur",
        distinct_ratio.alias("distinct_ratio"),
        *[expr.alias(name) for name, expr in flags.items()],
    )
    any_drift = None
    for name in flags:
        any_drift = F.col(name) if any_drift is None else (any_drift | F.col(name))
    return out.withColumn("any_drift", any_drift)
