"""Delta/Iceberg-style table layer: versioned Parquet with MERGE,
time travel, OPTIMIZE and snapshot retention."""

from datalake_toolkit_spark.lakehouse.table import (
    ConcurrentWriteError,
    LakeTable,
)

__all__ = ["ConcurrentWriteError", "LakeTable"]
