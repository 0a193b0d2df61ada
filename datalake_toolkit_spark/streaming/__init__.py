"""Structured-Streaming plane: file-ingestion state machine and
event-time windowing (SURVEY.md §2.10, §3.1)."""

from datalake_toolkit_spark.streaming.ingestion import (
    IngestionPipeline,
    RoutePlugin,
    read_ledger,
)
from datalake_toolkit_spark.streaming.rollup import (
    maintain_rollup,
)
from datalake_toolkit_spark.streaming.stateful import (
    running_status,
)
from datalake_toolkit_spark.streaming.windows import (
    sessionized,
    interval_join,
    streaming_dedup,
    windowed_counts,
)

__all__ = [
    "IngestionPipeline",
    "RoutePlugin",
    "maintain_rollup",
    "read_ledger",
    "running_status",
    "sessionized",
    "interval_join",
    "streaming_dedup",
    "windowed_counts",
]
