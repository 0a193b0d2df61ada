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
