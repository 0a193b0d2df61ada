"""Relational operator library (SURVEY.md §2)."""

from datalake_toolkit_spark.operators.relational import (
    asof_join,
    collect_sorted_array,
    dedup_latest,
    ensure_min_partitions,
    drop_columns,
    explode_map_params,
    group_within_partitions,
    join_other_to_single_column,
    join_with_params,
    kv_pairs_to_map,
    pack_struct,
    posexplode_with_idx,
    rename_columns,
    salted_join,
    unpack_struct,
    with_consecutive_id,
)

__all__ = [
    "asof_join",
    "collect_sorted_array",
    "dedup_latest",
    "ensure_min_partitions",
    "drop_columns",
    "explode_map_params",
    "group_within_partitions",
    "join_other_to_single_column",
    "join_with_params",
    "kv_pairs_to_map",
    "pack_struct",
    "posexplode_with_idx",
    "rename_columns",
    "salted_join",
    "unpack_struct",
    "with_consecutive_id",
]
