"""Streaming MERGE sink: maintain a LakeTable from a stream.

The reference keeps its control/state tables current with per-event
DynamoDB ``put_item`` calls from Lambda handlers
(lambda/odl_register_raw/odl_register_raw.py ingestion status writes).
The Spark-native shape is Delta's streaming-merge pattern: a
``foreachBatch`` sink that MERGEs each micro-batch into the table, so
any stream — CDC feed, file tail, rollup delta — continuously
maintains a versioned table.

Semantics per micro-batch:

- rows are first collapsed to one per key (newest wins under
  ``order_by``, with the key itself as the final tiebreaker) — a
  micro-batch can carry several updates for one key and MERGE needs a
  deterministic winner;
- the collapsed batch is upserted copy-on-write: only partitions
  holding matched keys or new rows are rewritten;
- replays are safe twice over: the upsert is idempotent by key, and
  Structured Streaming replays whole micro-batches, so a batch that
  died mid-merge re-applies to the same end state.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datalake_toolkit_spark.lakehouse.table import LakeTable
from datalake_toolkit_spark.operators.relational import dedup_latest


def merge_batch(
    batch: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
    order_by: Sequence[Column] = (),
    schema_evolution: bool = False,
    on_violation: str = "reject",
    mode: str = "cow",
    auto_compact_after: dict | None = None,
) -> None:
    """MERGE one (micro-)batch into the LakeTable at ``path``.

    Usable directly for batch upserts or via ``stream_upsert`` as the
    ``foreachBatch`` body. The table's PERSISTED CHECK constraints
    bind automatically (the handle loads them from the manifest);
    ``on_violation`` picks the writer-side policy — ``'quarantine'``
    diverts violating rows instead of failing the micro-batch, the
    right default for unattended streams.

    ``mode='mor'`` appends each micro-batch under a fresh token
    instead of rewriting matched partitions — O(batch) per trigger,
    the natural fit for high-frequency small micro-batches. Pass
    ``auto_compact_after`` (see :class:`LakeTable`) so the stream
    drains its own pending appends every N micro-batches; without it,
    schedule an ``optimize()`` out-of-band."""
    if batch.isEmpty():
        return
    collapsed = dedup_latest(
        batch,
        partition_cols=list(keys),
        order_cols=[*order_by, *[F.col(k) for k in keys]],
    )
    LakeTable(
        batch.sparkSession, path, partition_by=partition_by,
        on_violation=on_violation, auto_compact_after=auto_compact_after,
    ).upsert(
        collapsed,
        keys=list(keys),
        schema_evolution=schema_evolution,
        mode=mode,
        # dedup_latest just collapsed to one row per key — skip the
        # merge-on-read uniqueness verification job per micro-batch
        assume_key_unique=True,
    )


def stream_upsert(
    stream_df: DataFrame,
    path: str,
    keys: Sequence[str],
    checkpoint: str,
    partition_by: Sequence[str] = (),
    order_by: Sequence[Column] = (),
    schema_evolution: bool = False,
    available_now: bool = True,
    on_violation: str = "reject",
    mode: str = "cow",
    auto_compact_after: dict | None = None,
):
    """Run a stream into a MERGE-maintained LakeTable; returns the
    started ``StreamingQuery`` (``availableNow`` drains and stops by
    default, processing-time tailing with ``available_now=False``).
    Persisted CHECK constraints on the target table gate every
    micro-batch; pass ``on_violation='quarantine'`` so bad rows divert
    instead of killing the stream. ``mode='mor'`` appends each
    micro-batch merge-on-read style, with ``auto_compact_after``
    bounding the pending-state read tax (see ``merge_batch``)."""

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        merge_batch(
            batch,
            path,
            keys=keys,
            partition_by=partition_by,
            order_by=order_by,
            schema_evolution=schema_evolution,
            on_violation=on_violation,
            mode=mode,
            auto_compact_after=auto_compact_after,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_ingest(
    stream_df: DataFrame,
    corpus_path: str,
    ledger_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_partition_by: Sequence[str] = (),
    available_now: bool = True,
    batch_filter: Callable[[DataFrame], DataFrame] | None = None,
    corpus_mode: str = "cow",
    corpus_auto_compact_after: dict | None = None,
    indexes: Sequence = (),
    index_mode: str = "mor",
):
    """The full continuous-ingestion dedup pipeline: a document stream
    is exact-deduped ACROSS micro-batches (fingerprint ledger
    LakeTable) and the surviving rows are merged into a corpus
    LakeTable. Returns the started ``StreamingQuery``.

    Per micro-batch: anti-join the batch against the ledger, dedup it
    internally (min-id survivor), upsert survivors into the corpus
    keyed on ``id_col``, and ONLY THEN commit the new fingerprints —
    corpus-first ordering is what makes a crash between the two writes
    recoverable: the replayed batch still anti-joins to the same
    survivors and re-applies the (idempotent-by-key) corpus merge.
    Fingerprints-first would make the replay see its own hashes and
    silently drop the documents.

    The ledger is partitioned by ``hash_prefix`` (256 uniform md5
    buckets) so a micro-batch rewrites only the buckets it touches;
    pass ``corpus_partition_by`` so corpus merges rewrite only
    affected partitions rather than the whole table per batch, and
    ``corpus_mode='mor'`` to land each batch's survivors as a
    merge-on-read APPEND — O(batch) per trigger against a 100 TB
    corpus, with compaction deferred to an out-of-band ``optimize()``
    or bounded in-stream via ``corpus_auto_compact_after`` (see
    :class:`LakeTable`).
    The replayed-batch corpus merge stays idempotent either way
    (keyed on ``id_col``; MoR replays re-append and newest-wins
    resolves to the same rows).

    ``batch_filter`` is the in-stream curation hook (quality gates,
    PII redaction, language filters — any deterministic
    DataFrame->DataFrame): it runs BEFORE dedup so rejected rows never
    commit fingerprints, keeping the door open for better duplicates
    later. Determinism matters: the filter re-runs on crash replay.

    ``indexes``: retrieval indexes (PostingsIndex / IVFIndex —
    anything with ``add(batch, mode=...)``) to maintain over the
    ADMITTED corpus: each micro-batch's survivors are added right
    after the corpus merge, still BEFORE the fingerprint commit — a
    crash replay re-runs the (idempotent) adds instead of losing
    them, and the indexes only ever hold documents the corpus
    holds."""
    from datalake_toolkit_spark.llm.dedup import incremental_dedup

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        # quality gate BEFORE dedup: rejected rows never reach the
        # fingerprint ledger, so a later higher-quality duplicate of a
        # rejected doc can still be admitted. Must be deterministic —
        # it re-runs on crash replay.
        if batch_filter is not None:
            batch = batch_filter(batch)
        if batch.isEmpty():
            return
        ledger = LakeTable(
            batch.sparkSession, ledger_path, partition_by=("hash_prefix",)
        )
        corpus = LakeTable(
            batch.sparkSession, corpus_path,
            partition_by=corpus_partition_by,
            auto_compact_after=corpus_auto_compact_after,
        )

        def _commit_corpus(survivors: DataFrame) -> None:
            if not survivors.isEmpty():
                corpus.upsert(survivors, keys=[id_col], mode=corpus_mode)
                for idx in indexes:
                    idx.add(survivors, mode=index_mode)

        incremental_dedup(
            batch,
            ledger,
            id_col=id_col,
            text_col=text_col,
            before_commit=_commit_corpus,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_near_dedup_ingest(
    stream_df: DataFrame,
    corpus_path: str,
    ledger_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_partition_by: Sequence[str] = (),
    available_now: bool = True,
    batch_filter: Callable[[DataFrame], DataFrame] | None = None,
    threshold: float = 0.8,
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    ledger_partition_by: Sequence[str] = ("key_prefix",),
    corpus_mode: str = "cow",
    corpus_auto_compact_after: dict | None = None,
    indexes: Sequence = (),
    index_mode: str = "mor",
):
    """:func:`stream_dedup_ingest` with NEAR-duplicate semantics: each
    micro-batch probes the persistent MinHash band ledger, drops docs
    near-duplicating the committed corpus (signature-estimated
    Jaccard), collapses internally with exact verification, merges
    survivors into the corpus, and commits band rows LAST (the same
    corpus-first crash-recovery order). k / num_hashes / bands are
    part of the ledger's identity — keep them constant for its
    lifetime. ``batch_filter`` runs before dedup, exactly like the
    exact-dedup pipeline.

    ``ledger_partition_by`` defaults to the production 256-bucket
    ``key_prefix`` layout (a micro-batch rewrites only touched
    buckets); pass ``()`` for small corpora where 256 tiny dirs per
    commit cost more than they prune. ``corpus_mode='mor'`` appends
    survivors merge-on-read (O(batch) corpus commits, bounded by
    ``corpus_auto_compact_after``), and ``indexes`` maintains
    retrieval indexes over the admitted survivors in the same
    crash-safe window — both per :func:`stream_dedup_ingest`."""
    from datalake_toolkit_spark.llm.dedup import incremental_minhash_dedup

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        if batch_filter is not None:
            batch = batch_filter(batch)
        if batch.isEmpty():
            return
        ledger = LakeTable(
            batch.sparkSession, ledger_path, partition_by=ledger_partition_by
        )
        corpus = LakeTable(
            batch.sparkSession, corpus_path,
            partition_by=corpus_partition_by,
            auto_compact_after=corpus_auto_compact_after,
        )

        def _commit_corpus(survivors: DataFrame) -> None:
            if not survivors.isEmpty():
                corpus.upsert(survivors, keys=[id_col], mode=corpus_mode)
                for idx in indexes:
                    idx.add(survivors, mode=index_mode)

        incremental_minhash_dedup(
            batch,
            ledger,
            id_col=id_col,
            text_col=text_col,
            k=k,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            before_commit=_commit_corpus,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_index_ingest(
    stream_df: DataFrame,
    index,
    checkpoint: str,
    mode: str = "mor",
    available_now: bool = True,
    batch_filter=None,
    ts_col: str | None = None,
    watermark: str = "1 hour",
):
    """Maintain a retrieval index from a stream: every micro-batch
    calls ``index.add(batch, mode=mode)``, where ``index`` is a
    :class:`~datalake_toolkit_spark.llm.search.PostingsIndex` or a
    :class:`~datalake_toolkit_spark.llm.ann_index.IVFIndex` (anything
    with that ``add`` contract). Replay safety comes from the indexes
    themselves — their adds are key-idempotent upserts, so a micro-
    batch retried after a crash converges instead of duplicating;
    no side ledger is needed. Construct the index with
    ``auto_compact_after`` so a steady stream drains its own pending
    merge-on-read state. ``batch_filter`` (batch -> batch) runs before
    indexing — quality gates, routing, PII redaction.

    ``ts_col`` adds the event-time story: the stream is watermarked on
    it and deduplicated per ``index.id_col`` with
    ``dropDuplicatesWithinWatermark`` — the same first-wins contract
    as :func:`~datalake_toolkit_spark.streaming.windows.
    streaming_dedup` — so a late replayed doc arriving within the
    ``watermark`` horizon is DROPPED before it costs an index commit,
    and the dedup state stays bounded by that horizon instead of
    growing with the stream (the 100 TB failure mode of a plain
    ``dropDuplicates``). A duplicate arriving PAST the horizon still
    reaches the index, where the key-idempotent upsert converges it —
    the watermark bounds cost, the add contract guards correctness.

    Returns the started ``StreamingQuery`` (``availableNow`` drains
    and stops by default)."""
    if ts_col is not None:
        stream_df = stream_df.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark([index.id_col])

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        if batch_filter is not None:
            batch = batch_filter(batch)
        if batch.isEmpty():
            return
        index.add(batch, mode=mode)

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sync_search_plane(
    stream_df: DataFrame,
    table_path: str,
    keys: Sequence[str],
    checkpoint: str,
    postings_index,
    ivf_index,
    partition_by: Sequence[str] = (),
    order_by: Sequence[Column] = (),
    mode: str = "cow",
    sync_mode: str = "mor",
    available_now: bool = True,
    on_violation: str = "reject",
    auto_compact_after: dict | None = None,
):
    """Continuous ingestion with a FOLLOWING search plane: each
    micro-batch MERGEs into the LakeTable (:func:`merge_batch`) and
    then advances BOTH retrieval indexes to the table's new head via
    CDF sync (:func:`~datalake_toolkit_spark.llm.sync.
    sync_search_plane`) — so the postings and IVF indexes track a
    streaming-upserted table end to end, and every micro-batch leaves
    a fresh mutually consistent combined pin on disk
    (``latest_plane_pin``) for version-stable hybrid serving during
    ingestion.

    This composes with :func:`stream_index_ingest` rather than
    replacing it: ingest-to-index is the right shape when the stream
    IS the corpus; this follower is the right shape when the corpus
    of record is a mutating TABLE (upserts can drop terms, rows can
    be deleted by other writers between triggers) — the CDF diff
    nets in-window churn and converts updates into replace-adds /
    key merges the plain add path can't express.

    Replay safety stacks three idempotent layers: Structured
    Streaming replays whole micro-batches, the MERGE is key-
    idempotent, and the sync window replays convergently from its
    crash-safe cursor — a batch that died anywhere re-applies to the
    same end state.

    ``ivf_index`` must be ``build``-initialized (its sync assigns
    against the stored centroids; train on a seed sample — or an
    empty frame for pure cold-start — before starting the stream).
    Returns the started ``StreamingQuery``."""
    from datalake_toolkit_spark.llm.sync import sync_search_plane

    spark = stream_df.sparkSession

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        merge_batch(
            batch,
            table_path,
            keys=keys,
            partition_by=partition_by,
            order_by=order_by,
            on_violation=on_violation,
            mode=mode,
            auto_compact_after=auto_compact_after,
        )
        t = LakeTable(spark, table_path, partition_by=partition_by)
        if t.current_version() is None:
            return  # empty first batch: nothing committed, nothing to sync
        sync_search_plane(
            postings_index, ivf_index, t, mode=sync_mode
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
