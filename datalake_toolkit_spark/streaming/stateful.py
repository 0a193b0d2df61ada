"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10: the Spark primitive for operators whose state
outlives a micro-batch).

The reference's DynamoDB control table gave it cross-event state: a
conditional update per file key accumulated status transitions
(odl_validate_job_submit.py:174-254, odl_stage_control.py:48-90).
``running_status`` is that semantic as a first-class streaming
operator: per-key state (event count, latest value, first/last
timestamps) maintained by Spark's state store, updated once per
Arrow batch, emitted every micro-batch.

Scale: state is partitioned by key across executors (one shuffle per
micro-batch on the key), the state store is RocksDB-backed on a real
cluster, and ``GroupStateTimeout.NoTimeout`` keeps entries until the
key stops mattering — swap in event-time timeout for bounded state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("latest_status", T.StringType()),
        T.StructField("first_seen", T.DoubleType()),
        T.StructField("last_seen", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("latest_status", T.StringType()),
        T.StructField("first_seen", T.DoubleType()),
        T.StructField("last_seen", T.DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, latest, first, last = state.get
    else:
        n, latest, first, last = 0, None, None, None
    for pdf in pdfs:
        ordered = pdf.sort_values("ts")
        n += len(ordered)
        ts_min, ts_max = float(ordered["ts"].min()), float(ordered["ts"].max())
        # late-arrival guard: only a batch whose max event time reaches
        # the stored last_seen may advance latest_status — an all-late
        # batch updates counts/first_seen but must not clobber the
        # newest status already recorded
        if last is None or ts_max >= last:
            latest = str(ordered["status"].iloc[-1])
        first = ts_min if first is None else min(first, ts_min)
        last = ts_max if last is None else max(last, ts_max)
    state.update((n, latest, first, last))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_events": [n],
            "latest_status": [latest],
            "first_seen": [first],
            "last_seen": [last],
        }
    )


def running_status(
    stream: DataFrame,
    key_col: str = "key",
    status_col: str = "status",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key running status over a stream of (key, status, ts)
    rows: cumulative event count, latest status by event time within
    the batch, first/last seen. State persists across micro-batches
    in the state store; each batch emits the keys it touched.

    Works on a streaming DataFrame (update output mode). Input is
    renamed to the canonical (key, status, ts) so one compiled state
    function serves any source."""
    canon = stream.selectExpr(
        f"CAST({key_col} AS STRING) AS key",
        f"CAST({status_col} AS STRING) AS status",
        f"CAST({ts_col} AS DOUBLE) AS ts",
    )
    return canon.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=RUNNING_STATUS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
