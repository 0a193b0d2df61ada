"""Persistent IVF approximate-nearest-neighbor index.

:func:`~datalake_toolkit_spark.llm.similarity.ivf_topk` quantizes the
corpus per QUERY BATCH — right for one-shot analytics, wasteful for a
serving/repeated-query workload where the corpus is quantized once and
probed many times. :class:`IVFIndex` persists the quantization as two
``lakehouse.LakeTable``\\ s:

- ``<path>/centroids`` — one row per inverted list (list_id,
  centroid); n_lists x dim doubles, driver-sized by construction.
- ``<path>/assignments`` — one row per indexed vector (id, vec, norm,
  list_id), ``partition_by=("list_id",)`` so a probe of ``n_probe``
  lists LISTS only those directories — the read-side cost of a query
  is ``n_probe / n_lists`` of the corpus, enforced structurally by
  partition pruning rather than by a filter Spark might or might not
  push.

Incremental adds assign against the STORED centroids (no retrain, the
classic IVF contract) and land as merge-on-read appends by default —
O(batch) commits, with the table's ``auto_compact_after`` policy
bounding the read tax exactly like the dedup ledgers. Key re-adds
(a vector UPDATE) resolve globally, so a vector that moves lists
never leaves a stale twin behind.

Above ``two_level_from`` lists (default 10^4) a build additionally
persists the TWO-LEVEL layout — ``<path>/coarse`` (one row per
coarse cell, ~sqrt(k) rows) and ``<path>/cells`` (one row per cell
holding its fine-centroid block, ``partition_by=("cell_id",)``) —
paired to the centroids version through the ``cells/_built_for.json``
sidecar. Serves then probe coarse-first: the only broadcast is
O(sqrt(k) x dim) and a query batch LISTS only its probed cells'
directories; assignment probes every cell (bit-equal to the flat
argmax, distributed through the partitioned cell join instead of an
O(k x dim) broadcast row).

Everything stays in Catalyst expressions (literal centroid matrices,
``zip_with`` dot products, window top-k): no UDFs, no driver-side
scoring, collects bounded by n_lists.

The reference engine has no vector index; this is part of the
LLM-pipeline plane (SURVEY.md "beyond the reference"), sharing its
centroid/assign/probe expressions with ``llm.similarity`` so the
batch and persistent paths can never drift.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_toolkit_spark.lakehouse import LakeTable
from datalake_toolkit_spark.lakehouse.table import (
    live_partition_keys,
    resolve_pin,
)
from datalake_toolkit_spark.llm.similarity import (
    _as_double,
    _fold_sum,
    _l2_norm,
    centroid_matrix_frame,
    cosine_with_norms,
    ivf_assign_col,
    ivf_assign_lit_kernel,
    ivf_assign_with_frame,
    ivf_assignments,
    ivf_assignments_frames,
    ivf_assignments_two_level,
    ivf_probe_col,
    ivf_probe_with_frame,
    two_level_assign,
    two_level_probe,
)

# Above this many lists, centroids stop riding in plans as literal
# expressions (which strain Catalyst analysis/codegen well before
# n_lists reaches the ~sqrt(N) a 100 TB corpus wants) and switch to
# the matrix-as-data path: one broadcast row + O(1) expression nodes,
# with Lloyd refinement staying fully distributed. Both paths share
# the same expression trees, so results are bit-identical either way.
_FRAME_CENTROIDS_FROM = 512

# Above this many lists, even the one-row matrix broadcast stops
# scaling (O(n_lists x dim) doubles shipped to every task on EVERY
# serve/add — ~0.6 GB at 10^5 lists x 768 dims) and the index
# persists a TWO-LEVEL layout: a coarse table of ~sqrt(k) cell
# centroids (the only broadcast) plus a cells table partitioned by
# cell_id holding each cell's fine-centroid block as data — a probe
# LISTS only the probed cells' directories, so the probe cost is
# O(sqrt(k)) coarse dots + O(n_probe_cells * sqrt(k)) fine dots.
# Assignment probes EVERY cell (exact, bit-equal to the flat argmax
# — the audit contract), distributed through the partitioned cell
# join instead of one giant broadcast row.
_TWO_LEVEL_FROM = 10_000


class IVFIndex:
    """A persistent inverted-file index over an embedding column.

    ``build`` once (Lloyd-refined deterministic centroids), ``add``
    batches forever (stored-centroid assignment, merge-on-read
    appends), ``search`` any time (partition-pruned probes). All
    three are plain LakeTable commits/reads — time travel, vacuum,
    ``optimize`` and concurrency semantics come for free."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        auto_compact_after: dict | None = None,
        two_level_from: int = _TWO_LEVEL_FROM,
    ) -> None:
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col
        self.two_level_from = two_level_from
        self.centroids_t = LakeTable(spark, os.path.join(path, "centroids"))
        self.assignments_t = LakeTable(
            spark,
            os.path.join(path, "assignments"),
            partition_by=("list_id",),
            auto_compact_after=auto_compact_after,
        )
        # the persistent two-level layout (only written when a build
        # crosses two_level_from lists): coarse cell centroids
        # (snapshot-sized, ~sqrt(k) rows) + per-cell fine-centroid
        # blocks partitioned by cell_id (probed-cell reads list only
        # those directories)
        self.coarse_t = LakeTable(spark, os.path.join(path, "coarse"))
        self.cells_t = LakeTable(
            spark,
            os.path.join(path, "cells"),
            partition_by=("cell_id",),
        )
        # list-count per centroids VERSION (versions are immutable, so
        # the cache can never serve a stale count) — the literal-vs-
        # frame path selector, consulted on every serve
        self._nl_cache: dict[int | None, int] = {}

    # -- internals -----------------------------------------------------------

    def _prep(self, df: DataFrame) -> DataFrame:
        """(id, vec double[], norm) for indexable rows. NULL / zero-norm
        vectors are NOT indexable (cosine against them is 0/0) and are
        dropped here — an index answers "what is near x", and nothing
        is near a direction-free vector."""
        v = _as_double(self.vec_col)
        sq = _fold_sum(F.transform(v, lambda x: x * x))
        return (
            df.where(F.col(self.vec_col).isNotNull() & (sq > 0))
            .select(F.col(self.id_col).alias("id"), v.alias("vec"))
            .withColumn("norm", _l2_norm(F.col("vec")))
        )

    @staticmethod
    def _with_codes(rows: DataFrame) -> DataFrame:
        """Attach the int8 scalar quantization: per-vector
        ``scale = max|x| / 127`` (positive — zero-norm rows never get
        here) and ``code[i] = round(x_i / scale)`` as tinyint, so a
        dim-float vector stores as dim BYTES plus one double. The
        codes drive candidate SELECTION only; final ranking always
        rescores on the exact stored vector, so quantization can
        never change an answer, only (bounded by ``rescore_factor``)
        miss one."""
        scale = (
            F.array_max(F.transform(F.col("vec"), F.abs)) / F.lit(127.0)
        )
        return rows.withColumn("scale", scale).withColumn(
            "code",
            F.transform(
                F.col("vec"),
                lambda x: F.round(x / F.col("scale")).cast("tinyint"),
            ),
        )

    def _has_codes(self, at: dict | None = None) -> bool:
        """Whether the committed assignments schema carries the int8
        codes (indexes built before quantization existed don't — they
        keep working through the exact path; ``rebuild()`` migrates).
        With a pin, answers for the PINNED schema — a snapshot taken
        before the quantization migration refuses the fast path even
        after the live table migrated."""
        import json

        v = self._pin(at, "assignments")
        if v is None and self.assignments_t.current_version() is None:
            return True  # a fresh index will be written with codes
        man = self.assignments_t._manifest(v)
        names = {f["name"] for f in json.loads(man["schema"])["fields"]}
        return "code" in names and "scale" in names

    # the shared multi-table pin contract (lakehouse.table.resolve_pin)
    _pin = staticmethod(resolve_pin)

    def snapshot(self) -> dict:
        """Pin the CURRENT index state for version-stable serving:
        a dict of per-table versions to pass as ``at=`` to
        :meth:`search` / :meth:`search_quantized` / :meth:`centroids`.
        Later adds/removes/rebuilds don't disturb a pinned serve —
        the time-travel contract the underlying LakeTables already
        have, lifted to the multi-table index so centroids and
        assignments always come from ONE consistent commit point."""
        return {
            "assignments": self.assignments_t.current_version(),
            "centroids": self.centroids_t.current_version(),
        }

    def centroids(self, at: dict | None = None) -> list[list[float]]:
        """The stored centroid matrix, list_id order. Bounded by
        n_lists — the one collect in the serving path. ``at`` pins a
        :meth:`snapshot`."""
        rows = (
            self.centroids_t.read(version=self._pin(at, "centroids"))
            .orderBy("list_id")
            .collect()
        )
        if not rows:
            raise RuntimeError(f"IVF index at {self.path} is empty")
        return [list(r["centroid"]) for r in rows]

    def _n_lists(self, at: dict | None = None) -> int:
        """Committed list count WITHOUT collecting the matrix — the
        path selector between literal and matrix-as-data serving.
        Cached per centroids version (immutable)."""
        v = (
            self._pin(at, "centroids")
            if at is not None
            else self.centroids_t.current_version()
        )
        if v not in self._nl_cache:
            # footer metadata first (driver-side, zero jobs — the
            # centroids table is snapshot-written, so footer sums are
            # exact); a count() job only as the fallback
            n = self.centroids_t._row_count_from_footers(v)
            self._nl_cache[v] = (
                n
                if n is not None
                else self.centroids_t.read(version=v).count()
            )
        return self._nl_cache[v]

    def _cent_matrix(self, at: dict | None = None):
        """(mode, payload): the centroid matrix as a Python literal
        below ``_FRAME_CENTROIDS_FROM`` lists — one driver collect,
        one plan literal, the cheap path for serving-sized k — else
        as the ONE-row broadcast matrix frame
        (:func:`~datalake_toolkit_spark.llm.similarity.
        centroid_matrix_frame`): no k x dim literal ever enters the
        plan, the large-n_lists path."""
        if self._n_lists(at) < _FRAME_CENTROIDS_FROM:
            return "literal", self.centroids(at)
        df = self.centroids_t.read(
            version=self._pin(at, "centroids") if at is not None else None
        ).select("list_id", "centroid")
        return "frame", centroid_matrix_frame(df)

    # -- two-level layout ------------------------------------------------------

    def _tl_sidecar_path(self) -> str:
        return os.path.join(self.path, "cells", "_built_for.json")

    def _tl_record(self, at: dict | None = None) -> dict | None:
        """The two-level layout record PAIRED to the resolved
        centroids version, or None when the layout doesn't exist for
        it (flat-built index, rebuild below the threshold, crash
        between the build's table writes and the sidecar — the serve
        then falls back to the flat matrix path, always correct).
        The sidecar maps centroids version -> {coarse, cells,
        n_cells}, appended per two-level build, so PINNED serves of
        older two-level states resolve their own cell structure
        (subject to vacuum retention, like any pin)."""
        import json as json_mod

        v = (
            self._pin(at, "centroids")
            if at is not None
            else self.centroids_t.current_version()
        )
        if v is None:
            return None
        try:
            with open(self._tl_sidecar_path()) as f:
                rec = json_mod.load(f)
        except (OSError, ValueError):
            return None
        out = rec.get(str(v)) if isinstance(rec, dict) else None
        return out if isinstance(out, dict) else None

    def _tl_write_record(
        self, centroids_version: int, coarse_v: int, cells_v: int,
        n_cells: int,
    ) -> None:
        """Append/overwrite this centroids version's layout record —
        written AFTER both table commits, so a crash in between
        leaves the mode disengaged, never inconsistent."""
        import json as json_mod

        p = self._tl_sidecar_path()
        try:
            with open(p) as f:
                rec = json_mod.load(f)
            if not isinstance(rec, dict):
                rec = {}
        except (OSError, ValueError):
            rec = {}
        rec[str(centroids_version)] = {
            "coarse": coarse_v,
            "cells": cells_v,
            "n_cells": n_cells,
        }
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json_mod.dump(rec, f)
        os.replace(tmp, p)

    def _tl_frames(
        self,
        rec: dict,
        cell_partitions: "list[str] | None" = None,
    ) -> dict:
        """The serve-side two-level frames from the PERSISTED layout:
        coarse as the one-row O(sqrt(k) x dim) matrix frame, cells as
        the partitioned table read — restricted to ``cell_partitions``
        when the caller already knows which cells the batch probes
        (structural pruning; the join on cell_id downstream makes the
        restriction semantics-free)."""
        coarse_rows = self.coarse_t.read(version=rec["coarse"]).select(
            F.col("cell_id").alias("list_id"), "centroid"
        )
        cells = self.cells_t.read(
            version=rec["cells"], partitions=cell_partitions
        )
        return {
            "coarse": centroid_matrix_frame(coarse_rows),
            "cells": cells,
            "n_cells": int(rec["n_cells"]),
        }

    def _auto_probe_cells(
        self, n_probe: int, n_lists: int, n_cells: int
    ) -> int:
        """Default cell-probe width: every cell when the list probe
        is exact (n_probe >= n_lists must stay exact through the
        two-level path too), else enough average-sized cells to hold
        n_probe lists plus one for skew slack — the standard IMI
        knob, overridable per call."""
        import math

        if n_probe >= n_lists:
            return n_cells
        per_cell = max(1, n_lists // max(1, n_cells))
        return min(n_cells, math.ceil(n_probe / per_cell) + 1)

    def _tl_probed_cells(
        self, prep: DataFrame, frames_coarse: DataFrame, npc: int,
        rec: dict, vec_col: str = "qv",
    ) -> list[str]:
        """Which cell partitions a query batch probes — one bounded
        collect (<= n_cells ~ sqrt(k) keys), the cell-level analogue
        of the probed-list collect."""
        probed = {
            f"cell_id={r['cell_id']}"
            for r in ivf_probe_with_frame(
                prep, frames_coarse, npc, vec_col, "cells"
            )
            .select(F.explode("cells").alias("cell_id"))
            .distinct()
            .collect()
        }
        existing = live_partition_keys(
            self.cells_t._manifest(rec["cells"])
        )
        return sorted(probed & existing)

    # -- lifecycle -----------------------------------------------------------

    def build(
        self,
        corpus: DataFrame,
        n_lists: int = 16,
        lloyd_iters: int = 2,
        dim: int = 64,
    ) -> "IVFIndex":
        """(Re)build from scratch: deterministic seed directions +
        ``lloyd_iters`` bit-reproducible Lloyd passes (see
        :func:`~datalake_toolkit_spark.llm.similarity.ivf_assignments`),
        then snapshot-write both tables. Replaces any prior index
        state as two ordinary versioned commits — time travel still
        reaches the old index.

        ``n_lists >= _FRAME_CENTROIDS_FROM`` trains and writes through
        the matrix-as-data path (centroids stay a DataFrame end to
        end, Lloyd means never collect) — bit-identical results,
        no k x dim literal in any plan.

        ``n_lists >= two_level_from`` additionally persists the
        TWO-LEVEL layout (coarse + cells tables, see module header):
        training assigns through a full-cell probe — bit-equal to the
        flat argmax, so every downstream contract (deep audit,
        incremental adds, the flat path's results) is unchanged —
        and serves probe the coarse table first, never paying an
        O(n_lists x dim) broadcast."""
        src = self._prep(corpus)
        two_level = n_lists >= self.two_level_from
        if two_level:
            assigned, cents_df, _frames = ivf_assignments_two_level(
                src, n_lists=n_lists, id_col="id", vec_col="vec",
                dim=dim, lloyd_iters=lloyd_iters,
            )
            cents_rows = cents_df.select(
                F.col("list_id").cast("int").alias("list_id"),
                "centroid",
            )
        elif n_lists >= _FRAME_CENTROIDS_FROM:
            assigned, cents_df = ivf_assignments_frames(
                src, n_lists=n_lists, id_col="id", vec_col="vec",
                dim=dim, lloyd_iters=lloyd_iters,
            )
            cents_rows = cents_df.select(
                F.col("list_id").cast("int").alias("list_id"),
                "centroid",
            )
        else:
            assigned, cents = ivf_assignments(
                src, n_lists=n_lists, id_col="id", vec_col="vec",
                dim=dim, lloyd_iters=lloyd_iters,
            )
            cents_rows = self.spark.createDataFrame(
                [(i, c) for i, c in enumerate(cents)],
                "list_id int, centroid array<double>",
            )
        rows = self._with_codes(
            assigned.select(
                F.col("vid").alias(self.id_col),
                F.col("v").alias("vec"),
                _l2_norm(F.col("v")).alias("norm"),
                F.col("list_id").cast("int").alias("list_id"),
            )
        )
        # (the write pipeline evaluates its input exactly once now —
        # partition keys come from the written directories and stats
        # from footers — so the pre-write localCheckpoint that guarded
        # against re-evaluation became a pure extra materialization)
        self.assignments_t.write(rows, op="ivf_build")
        cv = self.centroids_t.write(cents_rows, op="ivf_build")
        self._nl_cache.clear()
        if two_level:
            # persist the SAME cell structure training used (its
            # localCheckpointed frames — identical to a deterministic
            # recompute from the committed centroid rows, without
            # paying that recompute) and pair it to this centroids
            # version via the sidecar, written LAST so a crash
            # between the commits just leaves the mode disengaged
            co_v = self.coarse_t.write(
                _frames["coarse_rows"], op="ivf_build"
            )
            ce_v = self.cells_t.write(_frames["cells"], op="ivf_build")
            self._tl_write_record(cv, co_v, ce_v, _frames["n_cells"])
        return self

    def add(self, batch: DataFrame, mode: str = "mor") -> int:
        """Incrementally index a batch: assign against the STORED
        centroids (the IVF contract — lists drift in balance, never in
        meaning, until ``rebuild``) and MERGE on the id — a re-added
        id is an update whose row moves lists if its vector did.
        ``mode='mor'`` (default) makes the commit O(batch); the
        table's ``auto_compact_after`` policy (constructor) bounds the
        accumulated read tax. Returns the committed version.

        On a two-level index the assignment runs through the
        persisted cells at a FULL cell probe — bit-equal to the flat
        argmax (every fine centroid lives in exactly one cell), with
        the fine matrices arriving as a partitioned join instead of
        one O(n_lists x dim) broadcast row."""
        rec = self._tl_record()
        prep = self._prep(batch).select(
            F.col("id").alias(self.id_col), "vec", "norm"
        )
        if rec is not None:
            frames = self._tl_frames(rec)
            rows = two_level_assign(
                prep.select(self.id_col, "vec"),
                frames,
                n_probe_cells=frames["n_cells"],
                vec_col="vec",
                id_col=self.id_col,
            ).select(
                self.id_col,
                "vec",
                _l2_norm(F.col("vec")).alias("norm"),
                F.col("list_id").cast("int").alias("list_id"),
            )  # single-evaluation write pipeline — no checkpoint needed
        else:
            mode_c, cents = self._cent_matrix()
            if mode_c == "literal":
                # batch assignment: the Arrow kernel computes the same
                # argmax bit-identically, vectorized (guide §4.2) —
                # the literal expression stays for per-row audit use
                rows = ivf_assign_lit_kernel(
                    prep, cents, "vec"
                ).withColumn("list_id", F.col("list_id").cast("int"))
            else:
                rows = ivf_assign_with_frame(
                    prep, cents, "vec"
                ).withColumn("list_id", F.col("list_id").cast("int"))
        if self._has_codes():
            rows = self._with_codes(rows)
        # the two-level assignment's cross-cell merge (groupBy id, one
        # max) structurally emits ONE row per id — the MoR uniqueness
        # verification job would re-prove an invariant the plan
        # already enforces, so skip it there (the flat paths keep it:
        # their kernels pass duplicate input rows through)
        return self.assignments_t.upsert(
            rows,
            keys=[self.id_col],
            mode=mode,
            assume_key_unique=(
                rec is not None and int(frames["n_cells"]) > 1
            ),
        )

    def remove(self, ids) -> int | None:
        """Delete vectors from the index by id: a merge-on-read KEY
        TOMBSTONE append — O(ids) metadata+data, no partition rewrite;
        reads resolve the tombstoned keys to nothing until
        ``maintain()``/``optimize`` materializes the deletion (the
        Hudi delete-record shape, and the same key set the add path
        merges on, so tombstones and appends stack cleanly). Removing
        an absent id is a no-op. Returns the committed version, or
        None when there was nothing to do."""
        import numbers

        ids = list(ids)
        if not ids or self.assignments_t.current_version() is None:
            return None
        # validate homogeneity up front — a mixed str/int list would
        # die inside createDataFrame with an opaque Spark type error.
        # Integral covers numpy/arrow integer scalars too (coerced to
        # plain int below — createDataFrame rejects np.int64 rows);
        # bool is excluded (it IS Integral, but a True id is a bug)
        if all(isinstance(i, str) for i in ids):
            id_type = "string"
        elif all(
            isinstance(i, numbers.Integral) and not isinstance(i, bool)
            for i in ids
        ):
            id_type = "bigint"
            ids = [int(i) for i in ids]
        else:
            raise ValueError(
                "remove() ids must be all-str or all-int, got types "
                f"{sorted({type(i).__name__ for i in ids})}"
            )
        keys = self.spark.createDataFrame(
            [(i,) for i in ids], f"{self.id_col} {id_type}"
        )
        return self.assignments_t.upsert(
            keys,
            keys=[self.id_col],
            when_matched="delete",
            mode="mor",
        )

    def rebuild(
        self, n_lists: int | None = None, lloyd_iters: int = 2
    ) -> "IVFIndex":
        """Retrain from the currently indexed vectors — the answer to
        centroid drift after many adds (``list_sizes`` shows the
        imbalance). A full O(index) pass by design, scheduled like
        ledger retention, not per batch."""
        cur = self.assignments_t.read().select(
            F.col(self.id_col), F.col("vec").alias(self.vec_col)
        )
        k = n_lists if n_lists is not None else self._n_lists()
        dim = int(
            self.centroids_t.read()
            .select(F.size("centroid").alias("d"))
            .first()["d"]
        )
        return self.build(cur, n_lists=k, lloyd_iters=lloyd_iters, dim=dim)

    # -- serving -------------------------------------------------------------

    def _probe_frames(
        self,
        queries: DataFrame,
        n_probe: int,
        at: dict | None = None,
        n_probe_cells: int | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """The shared serve front half: (probe-exploded query frame
        ``(qid, qv, qn, list_id)``, assignments restricted to the
        probed ``list_id`` partitions). One bounded collect (<= the
        batch's distinct probed lists, itself <= n_lists) decides
        which directories the read lists. ``at`` pins BOTH tables to
        a :meth:`snapshot` — centroids and assignments from one
        consistent commit point.

        On a two-level index the probe goes coarse-first: the only
        broadcast is the O(sqrt(k) x dim) coarse matrix; the probed
        cells' fine blocks are read from ONLY those cell directories
        (one more bounded collect, <= n_cells keys), and
        ``n_probe_cells`` (default: enough average cells to hold
        n_probe lists, every cell when the probe is exact) is the
        IMI recall knob stacked under n_probe."""
        v = self._pin(at, "assignments") if at is not None else None
        n_lists = self._n_lists(at)
        n_probe = min(n_probe, n_lists)
        prep = self._prep(queries).select(
            F.col("id").alias("qid"),
            F.col("vec").alias("qv"),
            F.col("norm").alias("qn"),
        )
        if n_probe >= n_lists:
            # EXACT serve: every list is probed, so computing per-query
            # probe lists (n_lists dot products + a full sort per
            # query, then an n_lists-per-query exploded broadcast) is
            # pure overhead — the downstream equi-join on list_id
            # keeps every candidate either way. Enumerate the lists
            # that actually HOLD data from the manifest instead
            # (driver-side, zero jobs; live_partition_keys includes
            # pending MoR append partitions), and pair each query with
            # exactly those. Every stored row's list_id comes from its
            # partition directory, so the join result is identical to
            # the probed path's — guide §2.4, remove work whose output
            # is statically known.
            existing = live_partition_keys(self.assignments_t._manifest(v))
            lids: list[int] = []
            for key in existing:
                try:
                    lids.append(int(key.split("=", 1)[1]))
                except ValueError:
                    continue  # non-int dirs can't match a probe either
            lid_df = self.spark.createDataFrame(
                [(i,) for i in sorted(lids)], "list_id int"
            )
            return prep.crossJoin(lid_df), self.assignments_t.read(version=v)
        rec = self._tl_record(at)
        if rec is not None:
            npc = n_probe_cells or self._auto_probe_cells(
                n_probe, self._n_lists(at), int(rec["n_cells"])
            )
            coarse_frames = self._tl_frames(rec)
            probed_cells = self._tl_probed_cells(
                prep.select("qid", "qv"), coarse_frames["coarse"],
                npc, rec,
            )
            frames = {
                "coarse": coarse_frames["coarse"],
                "cells": self.cells_t.read(
                    version=rec["cells"], partitions=probed_cells
                ),
                "n_cells": coarse_frames["n_cells"],
            }
            q = (
                prep.join(
                    two_level_probe(
                        prep.select("qid", "qv"), frames, n_probe, npc,
                        vec_col="qv", id_col="qid",
                    ),
                    "qid",
                )
                .withColumn("list_id", F.explode("probe_lists"))
                .drop("probe_lists")
                # serving-bounded (queries x n_probe rows); the probed
                # collect below and the serve join would otherwise
                # each re-run the coarse+cell probe
                .localCheckpoint(eager=True)
            )
        else:
            mode_c, cents = self._cent_matrix(at)
            if mode_c == "literal":
                q = prep.withColumn(
                    "list_id",
                    F.explode(ivf_probe_col(cents, n_probe, "qv")),
                )
            else:
                q = (
                    ivf_probe_with_frame(prep, cents, n_probe, "qv")
                    .withColumn("list_id", F.explode("probe_lists"))
                    .drop("probe_lists")
                )
        q = q.withColumn("list_id", F.col("list_id").cast("int"))
        probed = {
            f"list_id={r['list_id']}"
            for r in q.select("list_id").distinct().collect()
        }
        # include partitions that live ONLY in pending merge-on-read
        # appends (an added vector may open a list no rewrite has
        # localized yet) — owners-only pruning would skip it
        existing = live_partition_keys(self.assignments_t._manifest(v))
        known = sorted(probed & existing)
        if len(known) == len(existing):
            cand = self.assignments_t.read(version=v)
        else:
            cand = self.assignments_t.read(version=v, partitions=known)
        # pending MoR appends are read un-restricted; the equi-join on
        # list_id downstream keeps only probed lists, so correctness
        # never depends on the pruning
        return q, cand

    @staticmethod
    def _apply_id_filter(cand: DataFrame, id_filter, id_col: str) -> DataFrame:
        """Restrict candidates to an allow-list of ids (filtered
        vector search — 'nearest among docs matching X'). The filter
        frame's FIRST column is the id; it broadcasts, so it is meant
        for serving-bounded sets (a keyword result, a metadata
        selection) — corpus-scale filters belong upstream of the
        index."""
        if id_filter is None:
            return cand
        allow = id_filter.select(
            F.col(id_filter.columns[0]).alias(id_col)
        ).distinct()
        return cand.join(F.broadcast(allow), id_col, "left_semi")

    @staticmethod
    def _apply_pair_filter(
        joined: DataFrame, pair_filter, id_col: str
    ) -> DataFrame:
        """Restrict (query, candidate) PAIRS to a per-query allow
        frame — 'nearest among THIS query's allowed docs' (tenant,
        language, date filters that differ per query). The filter
        frame's first column is the query id, second the candidate
        id; it broadcasts, so it is meant for serving-bounded sets.
        Applied to the probe-joined frame BEFORE any top-k / candidate
        cutoff, so ranks are computed within each query's allowed
        set."""
        if pair_filter is None:
            return joined
        allow = pair_filter.select(
            F.col(pair_filter.columns[0]).alias("qid"),
            F.col(pair_filter.columns[1]).alias(id_col),
        ).distinct()
        return joined.join(F.broadcast(allow), ["qid", id_col], "left_semi")

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        exclude_self: bool = False,
        id_filter: DataFrame | None = None,
        pair_filter: DataFrame | None = None,
        at: dict | None = None,
        n_probe_cells: int | None = None,
    ) -> DataFrame:
        """Approximate top-k for each query row: (qid, cid, cosine,
        rank). Each query probes its ``n_probe`` nearest centroids'
        lists; the scan is restricted to the probed ``list_id``
        partitions STRUCTURALLY (only those directories are listed),
        so a small serving batch reads ~n_probe/n_lists of the index.
        ``n_probe >= n_lists`` is exact search. ``exclude_self`` drops
        candidates whose id equals the query id (corpus-as-queries
        evaluation). Queries are broadcast — this is the serving path,
        sized accordingly; for corpus-scale query sets use
        :func:`~datalake_toolkit_spark.llm.similarity.ivf_topk`.
        ``id_filter`` restricts candidates to a GLOBAL id allow-list;
        ``pair_filter`` is its per-query form — a (query_id, doc_id)
        allow frame, so each query ranks within its OWN allowed set
        (both may combine; top-k is computed WITHIN the filtered
        set). ``at`` pins a :meth:`snapshot` — the serve reads that
        version of centroids AND assignments, undisturbed by later
        adds/removes/rebuilds (index time travel). On a two-level
        index ``n_probe_cells`` stacks the coarse-cell recall knob
        under ``n_probe`` (default: auto — every cell when the probe
        is exact)."""
        q, cand = self._probe_frames(queries, n_probe, at, n_probe_cells)
        cand = self._apply_id_filter(cand, id_filter, self.id_col)
        joined = self._apply_pair_filter(
            cand.hint("shuffle_hash").join(F.broadcast(q), "list_id"),
            pair_filter,
            self.id_col,
        )
        scored = (
            joined.where(
                F.lit(True)
                if not exclude_self
                else F.col("qid") != F.col(self.id_col)
            )
            .select(
                "qid",
                F.col(self.id_col).alias("cid"),
                cosine_with_norms(
                    F.col("qv"), F.col("vec"), F.col("qn"), F.col("norm")
                ).alias("cosine"),
            )
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "cid", "cosine", "rank")
        )

    def search_quantized(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        rescore_factor: int = 4,
        exclude_self: bool = False,
        id_filter: DataFrame | None = None,
        pair_filter: DataFrame | None = None,
        at: dict | None = None,
        n_probe_cells: int | None = None,
    ) -> DataFrame:
        """Top-k with the int8 fast path: candidate selection scores
        the probed lists on the stored codes — the scan column-prunes
        the exact vectors away, reading ~1/8 of the probe bytes (see
        ``plan_probe(quantized=True)`` for the measured split) — keeps
        ``k * rescore_factor`` per query by quantized cosine, then
        RESCORES exactly those candidates against the stored exact
        vectors. The final (cosine, rank) values are computed by the
        same expression as :meth:`search`, so answers are
        bit-identical whenever the true top-k survives candidate
        selection (int8 keeps relative cosine error ~1e-2; a default
        4x rescore margin covers it except under adversarially dense
        near-ties — raise ``rescore_factor`` there). The rescore scan
        re-reads only the probed partitions' (id, vec) columns and
        semi-joins the candidate ids, so serving stays bounded by the
        probe."""
        if k < 1 or rescore_factor < 1:
            raise ValueError(
                f"k and rescore_factor must be >= 1, got k={k}, "
                f"rescore_factor={rescore_factor} (a 0 cutoff would "
                "silently return no rows)"
            )
        if not self._has_codes(at):
            raise RuntimeError(
                "assignments table predates int8 quantization — run "
                "rebuild() once to store codes (search() still works)"
            )
        q, cand = self._probe_frames(queries, n_probe, at)
        # filter BEFORE candidate selection so the rescore margin is
        # spent inside the allowed set (filtered-ANN semantics: top-k
        # among allowed, not allowed among top-k); the per-query
        # pair_filter applies the same way, after the probe join
        cand = self._apply_id_filter(cand, id_filter, self.id_col)
        approx = (
            self._apply_pair_filter(
                cand.select(self.id_col, "list_id", "code", "scale", "norm")
                .hint("shuffle_hash")
                .join(F.broadcast(q.drop("qn")), "list_id"),
                pair_filter,
                self.id_col,
            )
            .where(
                F.lit(True)
                if not exclude_self
                else F.col("qid") != F.col(self.id_col)
            )
            .select(
                "qid",
                F.col(self.id_col).alias("cid"),
                (
                    F.col("scale")
                    * _fold_sum(
                        F.zip_with(
                            F.col("qv"), F.col("code"), lambda x, c: x * c
                        )
                    )
                    / F.col("norm")
                ).alias("qdot"),
            )
        )
        wa = Window.partitionBy("qid").orderBy(F.desc("qdot"), F.asc("cid"))
        picked = (
            approx.withColumn("arank", F.row_number().over(wa))
            .where(F.col("arank") <= int(k) * int(rescore_factor))
            .select("qid", "cid")
        )
        # rescore: exact vectors for the candidate rows only — the
        # candidate set is serving-bounded (queries * k * factor), so
        # it broadcasts; the vec column is read just for probed lists
        # (same restricted frame — Catalyst prunes it to (id, vec,
        # norm) for this branch)
        exact = (
            cand.select(
                F.col(self.id_col).alias("cid"),
                F.col("vec").alias("cvec"),
                F.col("norm").alias("cnorm"),
            )
            .join(F.broadcast(picked), "cid")
            .join(
                F.broadcast(q.drop("list_id").dropDuplicates(["qid"])),
                "qid",
            )
            .select(
                "qid",
                "cid",
                cosine_with_norms(
                    F.col("qv"), F.col("cvec"), F.col("qn"), F.col("cnorm")
                ).alias("cosine"),
            )
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
        return (
            exact.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "cid", "cosine", "rank")
        )

    # -- observability -------------------------------------------------------

    def plan_probe(
        self,
        queries: DataFrame,
        n_probe: int = 4,
        quantized: bool = False,
        at: dict | None = None,
        n_probe_cells: int | None = None,
    ) -> dict:
        """What a search would OPEN, without scoring anything — the
        serving analogue of ``LakeTable.plan_scan``: list and file
        counts before/after the probe restriction, plus the probe
        fraction. Capacity observability (n_probe/n_lists IS the
        read fraction; pending MoR appends show up as extra files).
        ``quantized=True`` additionally sums the probed files'
        COMPRESSED column-chunk bytes from their parquet footers,
        splitting the exact-vector column from the int8 code columns —
        the measured byte saving ``search_quantized``'s candidate
        phase realizes through column pruning. ``at`` plans the probe
        against a pinned :meth:`snapshot` — what a version-pinned
        serve would open, not the live state."""
        v = self._pin(at, "assignments") if at is not None else None
        nl = self._n_lists(at)
        n_probe = min(n_probe, nl)
        prep = self._prep(queries)
        rec = self._tl_record(at)
        tl_extra = {}
        if rec is not None:
            npc = n_probe_cells or self._auto_probe_cells(
                n_probe, nl, int(rec["n_cells"])
            )
            coarse_frames = self._tl_frames(rec)
            probed_cells = self._tl_probed_cells(
                prep.select(
                    F.col("id").alias("qid"), F.col("vec").alias("qv")
                ),
                coarse_frames["coarse"],
                npc,
                rec,
                vec_col="qv",
            )
            frames = {
                "coarse": coarse_frames["coarse"],
                "cells": self.cells_t.read(
                    version=rec["cells"], partitions=probed_cells
                ),
                "n_cells": coarse_frames["n_cells"],
            }
            q = (
                two_level_probe(
                    prep.select(
                        F.col("id").alias("qid"), F.col("vec").alias("qv")
                    ),
                    frames, n_probe, npc, vec_col="qv", id_col="qid",
                )
                .select(F.explode("probe_lists").alias("list_id"))
            )
            tl_extra = dict(
                cells_total=len(
                    live_partition_keys(
                        self.cells_t._manifest(rec["cells"])
                    )
                ),
                cells_probed=len(probed_cells),
                n_probe_cells=npc,
            )
        else:
            mode_c, cents = self._cent_matrix(at)
            if mode_c == "literal":
                q = prep.select(
                    F.explode(
                        ivf_probe_col(cents, n_probe, F.col("vec"))
                    ).alias("list_id")
                )
            else:
                q = (
                    ivf_probe_with_frame(
                        prep, cents, n_probe, F.col("vec")
                    )
                    .select(F.explode("probe_lists").alias("list_id"))
                )
        probed = {
            f"list_id={r['list_id']}"
            for r in q.select(F.col("list_id").cast("int").alias("list_id"))
            .distinct()
            .collect()
        }
        existing = live_partition_keys(self.assignments_t._manifest(v))
        known = sorted(probed & existing)
        rep = self.assignments_t.plan_scan(version=v, partitions=known)
        rep.update(
            lists_total=nl,
            lists_probed=len(known),
            n_probe=n_probe,
            **tl_extra,
        )
        if quantized:
            has_codes = self._has_codes(at)
            by_col = (
                self._probed_column_bytes(known, v) if has_codes else {}
            )
            vec_b = by_col.get("vec", 0)
            code_b = by_col.get("code", 0) + by_col.get("scale", 0)
            rep.update(
                has_codes=has_codes,
                bytes_vec_column=vec_b,
                bytes_code_columns=code_b,
                # None (not 0.0) when the split is meaningless — a
                # legacy code-less index would otherwise advertise a
                # free quantized path that search_quantized refuses
                code_vs_vec_ratio=(
                    (code_b / vec_b) if has_codes and vec_b else None
                ),
            )
        return rep

    def _probed_column_bytes(
        self, known: list[str], version: int | None = None
    ) -> dict[str, int]:
        """Compressed column-chunk bytes of the probed partitions'
        parquet files, by top-level column — footer metadata only, no
        Spark job. Covers owned directories AND pending merge-on-read
        appends (their probed subdirectories)."""
        import pyarrow.parquet as pq

        man = self.assignments_t._manifest(version)
        known_set = set(known)
        dirs = []
        for key in known:
            tok = man["owners"].get(key)
            if tok:
                dirs.append(
                    os.path.join(self.assignments_t._vdir(tok), key)
                )
        for e in man.get("merges") or []:
            for key in e.get("parts") or []:
                if key in known_set:
                    dirs.append(
                        os.path.join(
                            self.assignments_t._vdir(e["token"]), key
                        )
                    )
        out: dict[str, int] = {}
        for d in dirs:
            if not os.path.isdir(d):
                continue
            for f in os.listdir(d):
                if not f.endswith(".parquet") or f.startswith(("_", ".")):
                    continue
                md = pq.ParquetFile(os.path.join(d, f)).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        name = col.path_in_schema.split(".")[0]
                        out[name] = (
                            out.get(name, 0) + col.total_compressed_size
                        )
        return out

    def probe_report(
        self,
        queries: DataFrame,
        n_probe: int = 4,
        at: dict | None = None,
        n_probe_cells: int | None = None,
    ) -> DataFrame:
        """Per-QUERY probe observability (the vector twin of
        ``PostingsIndex.skip_report``, the r13 verdict's #7 ask): one
        row per query — (qid, lists_total, lists_live, lists_probed,
        vectors_probed, vectors_total, pending_appends). The
        lists/vectors columns are LAYOUT-INDEPENDENT (pure functions
        of the deterministic centroids, the indexed corpus and the
        probe knobs — a relational oracle recomputes them);
        pending_appends counts merge-on-read entries the scan must
        resolve, the physical read tax ``maintain()`` drains. Runs
        one probe pass plus one grouped size pass over the
        assignments — a report, not a serve."""
        v = self._pin(at, "assignments") if at is not None else None
        q, _cand = self._probe_frames(queries, n_probe, at, n_probe_cells)
        nl = self._n_lists(at)
        pending = len(
            self.assignments_t._manifest(v).get("merges") or []
        )
        sizes = (
            self.assignments_t.read(version=v)
            .groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        totals = sizes.agg(
            F.count(F.lit(1)).alias("lists_live"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("vectors_total"),
        )
        return (
            q.select("qid", "list_id")
            .distinct()
            .join(sizes, "list_id", "inner")  # probed-but-empty lists
            .groupBy("qid")                   # hold no vectors: live only
            .agg(
                F.count(F.lit(1)).cast("long").alias("lists_probed"),
                F.sum("n").cast("long").alias("vectors_probed"),
            )
            .crossJoin(F.broadcast(totals))
            .select(
                "qid",
                F.lit(nl).cast("long").alias("lists_total"),
                F.col("lists_live").cast("long").alias("lists_live"),
                "lists_probed",
                "vectors_probed",
                F.col("vectors_total").cast("long").alias("vectors_total"),
                F.lit(pending).cast("long").alias("pending_appends"),
            )
        )

    def maintain(self, keep_last: int = 5) -> None:
        """Scheduled maintenance: drain pending merge-on-read adds
        (scoped rewrite) and vacuum old versions on the assignments
        table; centroids rewrite wholesale on ``rebuild`` and only
        need the vacuum."""
        if self.assignments_t.current_version() is not None:
            self.assignments_t.optimize()
            self.assignments_t.vacuum(keep_last=keep_last)
        if self.centroids_t.current_version() is not None:
            self.centroids_t.vacuum(keep_last=keep_last)
        # two-level tables rewrite wholesale per two-level build; like
        # centroids they only need retention (vacuum can age out the
        # cell structure of OLD pinned two-level states — the standard
        # pin-vs-retention trade)
        if self.coarse_t.current_version() is not None:
            self.coarse_t.vacuum(keep_last=keep_last)
        if self.cells_t.current_version() is not None:
            self.cells_t.vacuum(keep_last=keep_last)

    def list_sizes(self) -> DataFrame:
        """(list_id, n_vectors) — the imbalance monitor that decides
        when ``rebuild`` is due (a hot list degrades probed-search
        toward brute force over that list)."""
        return (
            self.assignments_t.read()
            .groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
        )

    def audit(self, deep: bool = False) -> DataFrame:
        """Integrity audit: (check, n_violations) rows, all zeros on a
        healthy index. The post-migration / post-incident validation
        pass — the row-level checks share ONE scan of the assignments
        (conditional sums), plus one grouped pass for the duplicate
        check; nothing is mutated. Every predicate is NULL-safe: a
        NULLed list_id / vec / scale counts as the violation it is
        instead of vanishing from the report. Checks: ``orphan_list``
        (assignment to a list no centroid defines, NULL included),
        ``duplicate_id`` (key resolution must yield one row per id),
        ``bad_norm`` (null/non-positive, or not null-safely equal to
        the recomputed L2 of the stored vector — same expression, so
        equality is bit-exact), ``code_drift`` (stored int8 codes
        differ from re-quantizing the stored vector, compared in
        DOUBLE so a corrupt scale reports instead of raising ANSI
        CAST_OVERFLOW; only when the schema carries codes).
        ``deep=True`` adds ``misassigned`` — list_id not null-safely
        equal to the argmax against the STORED centroids, which also
        catches vectors whose dimension disagrees with the centroids
        (O(index x n_lists): schedule it, don't serve it).

        Both tables are read from ONE :meth:`snapshot` taken at entry,
        so a concurrent add/rebuild between the two reads can't
        manufacture spurious violations; and the centroids table is
        validated FIRST (``centroid_bad_id`` — NULL or out-of-range
        list_id; ``centroid_duplicate_id``; ``centroid_missing_id`` —
        a gap in 0..n-1), because the assignment checks index into
        the centroid set and a broken set would misattribute their
        violations."""
        from datalake_toolkit_spark.llm.audit_util import (
            predicate_counts,
            row_count,
            union_reports,
        )

        if (
            self.assignments_t.current_version() is None
            or self.centroids_t.current_version() is None
        ):
            raise RuntimeError(
                f"IVF index at {self.path} is empty — nothing to audit"
            )
        snap = self.snapshot()
        rows = self.assignments_t.read(version=snap["assignments"])
        mode_c, cents = self._cent_matrix(snap)
        nl = self._n_lists(snap)
        cent_rows = self.centroids_t.read(version=snap["centroids"])
        cent_preds = {
            "centroid_bad_id": F.col("list_id").isNull()
            | ~F.col("list_id").between(0, nl - 1),
        }
        cent_dups = (
            cent_rows.groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
        )
        cent_missing = self.spark.range(nl).select(
            F.col("id").cast("int").alias("list_id")
        ).join(
            cent_rows.where(F.col("list_id").isNotNull()),
            "list_id",
            "left_anti",
        )
        if deep and mode_c == "frame":
            # matrix-as-data: attach the expected assignment as a
            # column (one broadcast row) instead of a k x dim literal
            rows = ivf_assign_with_frame(
                rows, cents, "vec", out_col="_expected"
            )
        preds = {
            "orphan_list": F.col("list_id").isNull()
            | ~F.col("list_id").between(0, nl - 1),
            "bad_norm": F.col("norm").isNull()
            | (F.col("norm") <= 0)
            | ~F.col("norm").eqNullSafe(_l2_norm(F.col("vec"))),
        }
        if self._has_codes(snap):
            requant = F.transform(
                F.col("vec"), lambda x: F.round(x / F.col("scale"))
            )
            preds["code_drift"] = (
                F.col("scale").isNull()
                | F.col("code").isNull()
                | (F.col("scale") <= 0)
                | ~F.size("code").eqNullSafe(F.size("vec"))
                | ~F.transform(
                    F.col("code"), lambda c: c.cast("double")
                ).eqNullSafe(requant)
                | ~F.col("scale").eqNullSafe(
                    F.array_max(F.transform(F.col("vec"), F.abs))
                    / F.lit(127.0)
                )
            )
        if deep:
            preds["misassigned"] = ~F.col("list_id").eqNullSafe(
                F.col("_expected").cast("int")
                if mode_c == "frame"
                else ivf_assign_col(cents, "vec").cast("int")
            )
        dups = (
            rows.groupBy(self.id_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
        )
        reports = [
            predicate_counts(rows, preds),
            row_count("duplicate_id", dups),
            predicate_counts(cent_rows, cent_preds),
            row_count("centroid_duplicate_id", cent_dups),
            row_count("centroid_missing_id", cent_missing),
        ]
        rec = self._tl_record(snap)
        if rec is not None:
            # the persisted cells must PARTITION the fine centroid
            # set — a fine id in no cell would silently vanish from
            # two-level assignment/probing; one in two cells would
            # double its candidate rows (k exploded rows, tiny)
            cell_fids = self.cells_t.read(version=rec["cells"]).select(
                F.explode("fids").alias("list_id")
            )
            fid_missing = self.spark.range(nl).select(
                F.col("id").cast("int").alias("list_id")
            ).join(cell_fids, "list_id", "left_anti")
            fid_dups = (
                cell_fids.groupBy("list_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") > 1)
            )
            reports.append(row_count("cell_missing_fine_id", fid_missing))
            reports.append(row_count("cell_duplicate_fine_id", fid_dups))
        return union_reports(reports)

    def recall(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        exclude_self: bool = False,
        at: dict | None = None,
        n_probe_cells: int | None = None,
    ) -> DataFrame:
        """Measured recall@k of the probed serve against the exact
        answer over the SAME index state: (qid, n_hits, n_exact,
        recall) where ``n_exact = min(k, candidates)`` and
        ``recall = n_hits / n_exact``. The n_probe tuning loop in one
        call — run it on a sampled query batch before widening or
        narrowing probes, instead of guessing. Cost: one probed serve
        plus one full-probe serve over the probed queries (exact by
        construction — ``n_probe >= n_lists`` probes every list), so
        size the query sample, not the corpus."""
        n_lists = self._n_lists(at)
        approx = self.search(
            queries, k=k, n_probe=n_probe,
            exclude_self=exclude_self, at=at,
            n_probe_cells=n_probe_cells,
        ).select("qid", "cid")
        exact = self.search(
            queries, k=k, n_probe=n_lists,
            exclude_self=exclude_self, at=at,
        ).select("qid", "cid")
        n_exact = exact.groupBy("qid").agg(
            F.count(F.lit(1)).alias("n_exact")
        )
        hits = (
            exact.join(approx, ["qid", "cid"])
            .groupBy("qid")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        # left-join FROM the query frame: a query whose exact
        # candidate set is empty (e.g. the only indexed vector with
        # exclude_self) must still report a row — n_exact 0, recall
        # NULL (undefined, not 1.0) — so a tuning run over N sampled
        # queries always returns N rows
        base = self._prep(queries).select(
            F.col("id").alias("qid")
        ).distinct()
        return (
            base.join(n_exact, "qid", "left")
            .join(hits, "qid", "left")
            .select(
                "qid",
                F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
                F.when(
                    F.coalesce("n_exact", F.lit(0)) > 0,
                    F.coalesce("n_hits", F.lit(0)) / F.col("n_exact"),
                ).alias("recall"),
            )
        )
