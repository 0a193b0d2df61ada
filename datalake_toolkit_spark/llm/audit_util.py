"""Shared scaffolding for the index integrity audits.

The row-level checks of one source table are computed as conditional
sums in ONE aggregation over ONE scan (Catalyst does not dedupe scans
across union branches, so per-check frames would re-read the table
once per check); join-shaped checks keep their own frames and union
into the same (check, n_violations) report shape.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def predicate_counts(df: DataFrame, preds: dict[str, Column]) -> DataFrame:
    """(check, n_violations) for every named predicate, in one pass.
    Predicates must be NULL-SAFE themselves (a NULL predicate counts
    as healthy — use ``eqNullSafe``/``isNull`` terms so corrupted NULL
    fields surface instead of vanishing)."""
    agg = df.agg(
        *[
            F.coalesce(
                F.sum(F.when(p, 1).otherwise(0)), F.lit(0)
            ).alias(name)
            for name, p in preds.items()
        ]
    )
    pairs: list[Column] = []
    for name in preds:
        pairs += [F.lit(name), F.col(name)]
    return agg.select(
        F.explode(F.create_map(*pairs)).alias("check", "n_violations")
    )


def row_count(name: str, df: DataFrame) -> DataFrame:
    """One (check, n_violations) row counting ``df``'s rows."""
    return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(name).alias("check"), "n_violations"
    )


def union_reports(parts: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), parts)
