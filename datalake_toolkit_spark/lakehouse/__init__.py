"""Delta/Iceberg-style table layer: versioned Parquet with MERGE,
time travel, OPTIMIZE, snapshot retention, and a streaming MERGE sink."""

from datalake_toolkit_spark.lakehouse.streaming import merge_batch, stream_dedup_ingest, stream_index_ingest, stream_near_dedup_ingest, stream_sync_search_plane, stream_upsert
from datalake_toolkit_spark.lakehouse.table import (
    ConcurrentWriteError,
    ConstraintViolationError,
    LakeTable,
)

__all__ = ["ConcurrentWriteError", "ConstraintViolationError", "LakeTable", "merge_batch", "stream_dedup_ingest", "stream_index_ingest", "stream_near_dedup_ingest", "stream_sync_search_plane", "stream_upsert"]
from datalake_toolkit_spark.lakehouse.matview import (  # noqa: E402,F401
    last_refreshed_version,
    refresh_aggregate_view,
    refresh_group_stats_view,
)
