"""Index synchronization from a mutating LakeTable's change feed.

The lakehouse analogue of the reference's DynamoDB-stream ->
Elasticsearch propagation (dynamodb/lambda chain indexing every data
mutation into the search plane): here a table mutates through ordinary
versioned commits — upserts, deletes, merge-on-read appends — and the
derived indexes follow by consuming ``LakeTable.changes`` between the
last-synced version and the target one. Cost is O(mutation): the CDF
reads only partitions that changed hands between the two manifests,
the postings replace-add touches only the changed docs' term buckets,
and the IVF merge touches only the changed vectors' lists. The corpus
is never rescanned.

Net-change semantics: ``changes()`` diffs two SNAPSHOTS, so a row
inserted and deleted inside the sync window nets to nothing before it
ever reaches the index, and an update arrives as a delete+insert pair
on the same key — the insert side is the after-image, applied as a
replace-add (postings) / key merge (IVF); ids appearing ONLY on the
delete side are removed.

Every apply path is idempotent (replace-add re-deletes its own ids,
``remove`` of an absent id is a no-op, the IVF upsert merges on key),
so a crash between applying and advancing the cursor replays cleanly —
the same convergence contract the indexes' own write paths already
carry.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, functions as F

__all__ = ["sync_postings_from_table", "sync_ivf_from_table", "sync_cursor"]


def _cursor_path(index_path: str, table_path: str) -> str:
    key = hashlib.md5(os.path.abspath(table_path).encode()).hexdigest()
    return os.path.join(index_path, "_sync", f"{key}.json")


def sync_cursor(index, table) -> int | None:
    """The last table version this index synced to (None = never)."""
    p = _cursor_path(index.path, table.path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def _advance_cursor(index, table, version: int) -> None:
    # temp-write + rename so a crash never leaves a torn cursor; a
    # stale cursor only re-applies an idempotent window
    p = _cursor_path(index.path, table.path)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"table_path": table.path, "version": version}, f)
    os.replace(tmp, p)


def _net_changes(
    table, from_version: int, to_version: int, id_col: str
) -> tuple[DataFrame, list]:
    """(after-image rows of ids present in the target snapshot's
    change set, ids to delete). The removed-id collect is bounded by
    the mutation size — the sync window's deleted keys — the same
    update-sized contract the indexes' own ``remove`` documents; for
    corpus-scale rewrites, rebuild instead of syncing."""
    # pin the two-snapshot diff ONCE: it is mutation-sized, and both
    # the removed-ids collect and the caller's add would otherwise
    # each re-run the full diff (the dominant sync cost)
    ch = table.changes(from_version, to_version).localCheckpoint(eager=True)
    ins = ch.where(F.col("_change_type") == "insert").drop("_change_type")
    # one id can diff as several insert rows when the table holds
    # duplicate keys; the indexes treat id as a key, so keep one
    # deterministic winner and leave enforcing uniqueness to the
    # table's own merge discipline
    upserts = ins.dropDuplicates([id_col])
    removed = (
        ch.where(F.col("_change_type") == "delete")
        .select(id_col)
        .distinct()
        .join(ins.select(id_col).distinct(), id_col, "left_anti")
        .collect()
    )
    return upserts, [r[0] for r in removed]


def _window(index, table, from_version, to_version) -> tuple[int, int | None]:
    cur = table.current_version()
    if cur is None:
        raise ValueError(f"table at {table.path} has no commits to sync from")
    to_v = cur if to_version is None else to_version
    if from_version is None:
        from_version = sync_cursor(index, table)
    return from_version, to_v


def sync_postings_from_table(
    index,
    table,
    from_version: int | None = None,
    to_version: int | None = None,
    mode: str = "mor",
) -> dict:
    """Bring a :class:`~datalake_toolkit_spark.llm.search.PostingsIndex`
    up to date with a LakeTable holding ``(id_col, text_col)`` rows.

    ``from_version=None`` resumes from the persisted cursor; with no
    cursor the call BOOTSTRAPS — the whole table snapshot is indexed
    as one batch. Re-bootstrapping converges for every id IN the
    snapshot (replace-add semantics); index rows whose ids left the
    table before the bootstrap are NOT discovered — start from an
    empty index, or sync from a real version. Updates apply as
    replace-adds,
    so postings for terms a new text dropped die instead of serving
    stale; net deletes apply as merge-on-read predicate removes."""
    from_v, to_v = _window(index, table, from_version, to_version)
    out = {"from_version": from_v, "to_version": to_v,
           "upserts": 0, "removes": 0}
    if from_v is None:
        # deliberately NOT checkpointed: bootstrap is corpus-sized, so
        # pinning it would copy the whole corpus to executor storage —
        # the count's second parquet scan is the cheaper price
        snap = table.read(version=to_v).select(index.id_col, index.text_col)
        out["upserts"] = snap.count()
        # add unconditionally: an EMPTY snapshot must still CREATE the
        # index (committed, zero postings) so the serve path works —
        # the same contract add() itself has for an empty batch
        index.add(snap, mode=mode, replace=True)
        _advance_cursor(index, table, to_v)
        return out
    if from_v == to_v:
        return out
    upserts, removed = _net_changes(table, from_v, to_v, index.id_col)
    upserts = upserts.select(index.id_col, index.text_col)
    out["removes"] = len(removed)
    if removed:
        index.remove(removed)
    out["upserts"] = upserts.count()
    if out["upserts"]:
        index.add(upserts, mode=mode, replace=True)
    _advance_cursor(index, table, to_v)
    return out


def sync_ivf_from_table(
    index,
    table,
    from_version: int | None = None,
    to_version: int | None = None,
    mode: str = "mor",
) -> dict:
    """Bring an :class:`~datalake_toolkit_spark.llm.ann_index.IVFIndex`
    up to date with a LakeTable holding ``(id_col, vec_col)`` rows.
    Same cursor/bootstrap/netting contract as
    :func:`sync_postings_from_table`; the index must be ``build``-
    initialized (adds assign against the stored centroids — drift is
    ``rebuild``'s job, on its own schedule).

    An update that turns a vector NON-indexable (NULL / zero norm)
    becomes a remove: the IVF add path drops direction-free rows, so
    without the demotion the stale old vector would keep serving."""
    from_v, to_v = _window(index, table, from_version, to_version)
    out = {"from_version": from_v, "to_version": to_v,
           "upserts": 0, "removes": 0}
    if from_v is None:
        # NOT checkpointed — corpus-sized, same trade as the postings
        # bootstrap
        snap = table.read(version=to_v).select(index.id_col, index.vec_col)
        out["upserts"] = index._prep(snap).count()
        if out["upserts"]:
            index.add(snap, mode=mode)
        _advance_cursor(index, table, to_v)
        return out
    if from_v == to_v:
        return out
    upserts, removed = _net_changes(table, from_v, to_v, index.id_col)
    upserts = upserts.select(index.id_col, index.vec_col)
    indexable = index._prep(upserts)
    demoted = (
        upserts.select(F.col(index.id_col).alias("id"))
        .join(indexable.select("id"), "id", "left_anti")
        .collect()
    )
    removed = removed + [r[0] for r in demoted]
    out["removes"] = len(removed)
    if removed:
        index.remove(removed)
    out["upserts"] = upserts.count() - len(demoted)
    if out["upserts"]:
        index.add(upserts, mode=mode)
    _advance_cursor(index, table, to_v)
    return out
