"""Versioned Parquet table with Delta/Iceberg-style semantics.

The reference's ingestion ledger and snapshot lambdas hand-roll table
maintenance against DynamoDB + Redshift
(lambda/odl_snapshot_redshift/odl_snapshot_redshift.py:104-141 keeps
snapshots by age with a look-back floor; the DDB control table is a
last-writer-wins upsert store). ``delta-spark`` is not installable in
this environment, so the same contract is provided engine-side:

- **Commit log**: ``<path>/_dtk_log/v{n}.json`` manifests, one per
  table version, created with ``O_EXCL`` so two concurrent writers
  cannot claim the same version (optimistic concurrency, the Delta
  protocol's txn semantics at file granularity).
- **Copy-on-write MERGE**: ``upsert()`` rewrites only the partitions
  that contain matched keys or source rows; untouched partitions are
  carried forward by pointer, never rewritten. Cost is proportional
  to affected partitions, not table size — the property that matters
  at 100 TB.
- **Time travel**: ``read(version=n)`` resolves any retained
  manifest; each manifest maps partition -> owning data version, so a
  snapshot is a set of directory pointers, never a data copy.
- **OPTIMIZE**: ``optimize()`` compacts the current snapshot into a
  single new version with rebalanced file sizes.
- **Retention**: ``vacuum()`` mirrors the reference lambda's
  semantics — drop manifests older than the retention horizon but
  NEVER those past the look-back floor — plus a keep-latest-N mode;
  data versions no longer referenced by any retained manifest are
  deleted.

Scale notes: all data movement is ordinary partitioned-parquet jobs
(rebalanced by partition key before write). The only driver-side
materialization is the distinct partition-value list (bounded by
partition count — the same planning collect Delta itself performs).
Reads list only the directories a manifest owns, so partition pruning
is structural rather than filter-dependent.
"""

from __future__ import annotations

import datetime
import json
import math
import os
import re
import uuid
import shutil
import time
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


class ConstraintViolationError(ValueError):
    """A write was rejected because rows violate the table's declared
    constraints; carries the per-rule violation counts."""

    def __init__(self, table_path: str, report: list[tuple[str, int]]) -> None:
        self.report = report
        detail = ", ".join(f"{name}: {n} rows" for name, n in report)
        super().__init__(
            f"write to {table_path} violates constraints ({detail}); "
            "fix the data, drop the rule, or use on_violation='quarantine'"
        )


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


# Characters Hive/Spark escape in partition directory names
# (ExternalCatalogUtils.escapePathName): anything path- or shell-hostile
# becomes %XX uppercase hex.
_HIVE_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^') | {chr(i) for i in range(0x20)}


def _escape_partition_value(v) -> str:
    """Render one partition value exactly as Spark names the directory:
    NULL and '' -> __HIVE_DEFAULT_PARTITION__, booleans lowercase, and
    Hive path escaping for special characters — the owners map keys
    MUST match the directories Spark writes or reads hit PATH_NOT_FOUND."""
    if v is None or v == "":
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(v, bool):
        return "true" if v else "false"
    return "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_ESCAPE else ch for ch in str(v)
    )


def _fmt_key(partition_by: Sequence[str], row) -> str:
    return "/".join(f"{c}={_escape_partition_value(row[c])}" for c in partition_by)


def _key_spec(key: str) -> tuple[str, ...]:
    """The partition layout a stored owners-map key was written under,
    parsed back from the key itself: ``"dt=2024-01-01/seg=a"`` ->
    ``("dt", "seg")``, ``""`` (unpartitioned blob) -> ``()``. Safe to
    split textually because ``/`` and ``=`` inside VALUES are
    Hive-escaped to %XX at format time. This is what lets one manifest
    own directories written under different partition schemes
    (Iceberg-style partition-spec evolution) without a spec registry."""
    if not key:
        return ()
    return tuple(seg.split("=", 1)[0] for seg in key.split("/"))


# -- file statistics / data skipping ----------------------------------------
#
# Iceberg-style manifest column stats: each commit records per-FILE
# min/max/null_count for the table's prunable columns, collected from
# parquet FOOTERS only (never a data re-read — a few KB per file, so
# stats collection on a 100 TB load costs footer-reads, not a second
# scan). ``read(where=...)`` then skips whole files the predicate
# provably excludes BEFORE Spark ever lists them — the planning-time
# complement to parquet's own row-group skipping, which still needs
# every footer opened per query.

_STATS_MAX_COLS = 16

_PCT_RE = re.compile("%([0-9A-Fa-f]{2})")


def _unescape_partition_value(s: str) -> str:
    return _PCT_RE.sub(lambda m: chr(int(m.group(1), 16)), s)


def live_partition_keys(manifest: dict) -> set[str]:
    """Partition keys with live data under ``manifest``: the owners
    map plus partitions that exist ONLY in pending merge-on-read
    appends (no rewrite has localized them into owners yet) — pruning
    or bucket enumeration against owners alone silently misses
    freshly appended keys. The single source of truth for every
    index/serve path that enumerates a table's live partitions."""
    return set(manifest.get("owners") or {}) | {
        k
        for e in (manifest.get("merges") or [])
        for k in (e.get("parts") or [])
    }


def resolve_pin(at: dict | None, table: str) -> int | None:
    """Resolve one table's version from a multi-table snapshot pin
    (the dict an index's ``snapshot()`` returns). ``at=None`` means
    serve live state (returns None, i.e. read latest). A pin that is
    MISSING the table, or that pins it to None (the table had never
    committed when the snapshot was taken), errors loudly — passing
    None through to ``read(version=None)`` would silently serve the
    live state instead of the snapshot. Shared by every multi-table
    index (PostingsIndex, IVFIndex) so the pin contract can't
    diverge between them."""
    if at is None:
        return None
    if table not in at:
        raise ValueError(f"snapshot pin is missing {table!r}: {at}")
    v = at[table]
    if v is None:
        raise ValueError(
            f"snapshot pins {table}=None (table had never committed "
            "when the snapshot was taken) — nothing to serve"
        )
    return int(v)


def _stats_eligible(schema: T.StructType) -> list[str]:
    """Top-level columns file stats can be kept for: orderable
    primitives whose parquet footer min/max round-trip to JSON-safe
    values (decimals, binaries, and nested types are excluded)."""
    ok = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.StringType, T.DateType,
        T.TimestampType, T.TimestampNTZType,
    )
    return [f.name for f in schema.fields if isinstance(f.dataType, ok)][
        :_STATS_MAX_COLS
    ]


def _json_safe_stat(v):
    """A footer min/max value as a JSON-storable, ORDER-PRESERVING
    scalar: timestamps/dates become fixed-width ISO strings (lexical
    order == chronological order), everything unrepresentable (bytes,
    NaN/Inf, decimals) returns None and drops the stat."""
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, str)):
        return v
    if isinstance(v, float):
        return v if math.isfinite(v) else None
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return None


def _read_footers(paths: list[str], cols: list[str]) -> dict[str, dict]:
    """Per-file column stats from parquet footers: {abs_path: {col:
    [min, max, null_count]}}. Module-level so Spark can ship it to
    executors for large file counts. A file whose footer lacks usable
    min/max for a column simply omits that column (the file is then
    never pruned on it)."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for p in paths:
        st: dict[str, list] = {}
        try:
            md = pq.ParquetFile(p).metadata
            idx = {}
            for i in range(md.num_columns):
                idx.setdefault(md.schema.column(i).path, i)
            for c in cols:
                i = idx.get(c)
                if i is None:
                    continue
                mn = mx = None
                nulls = 0
                usable = True
                for rg in range(md.num_row_groups):
                    s = md.row_group(rg).column(i).statistics
                    if s is None or not s.has_min_max:
                        usable = False
                        break
                    lo, hi = _json_safe_stat(s.min), _json_safe_stat(s.max)
                    if lo is None or hi is None:
                        usable = False
                        break
                    mn = lo if mn is None or lo < mn else mn
                    mx = hi if mx is None or hi > mx else mx
                    nulls += s.null_count or 0
                if usable and mn is not None:
                    st[c] = [mn, mx, nulls]
        except Exception:  # unreadable footer: keep the file unpruned
            st = {}
        out[p] = st
    return out


_WHERE_CMP_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\s*(<=|>=|==|=|<|>)\s*('(?:[^']|'')*'|-?\d+(?:\.\d+)?)\s*$"
)
_WHERE_AND_RE = re.compile(r"\bAND\b", re.IGNORECASE)


def _parse_conjuncts(where: str) -> list[tuple[str, str, object]]:
    """Best-effort decomposition of a WHERE string into prunable
    ``(col, op, literal)`` conjuncts. Anything beyond a top-level AND
    of simple comparisons (OR, NOT, parens, functions, quoted ANDs)
    yields [] — pruning silently degrades to a full scan and the
    filter itself is ALWAYS applied to the result, so parsing can
    never affect correctness, only skipping."""
    # IN-list conjuncts carry the only parens/IN we prune on: extract
    # `col IN (lit, ...)` clauses FIRST (op "in", value = tuple), then
    # hold the remainder to the simple-comparison grammar. Any IN list
    # that doesn't parse cleanly (unbalanced quotes from a ')' inside
    # a string, commas inside values, non-literals) bails the WHOLE
    # parse — pruning degrades, the filter still applies.
    in_out: list[tuple[str, str, object]] = []
    def _in_repl(m: "re.Match[str]") -> str:
        if where.count("'", 0, m.start()) % 2:
            # the "IN (...)" text sits INSIDE a string literal (odd
            # number of quotes before it): it is literal data, not a
            # conjunct — extracting it would prune on a phantom
            # predicate and silently skip matching files. Poison the
            # whole parse; the filter still applies unpruned.
            return "\0"
        vals = []
        for item in m.group(2).split(","):
            item = item.strip()
            if "\\" in item:
                # Spark unescapes backslash sequences in string
                # literals; this parser doesn't — a mismatch between
                # filter and pruning semantics could WRONGLY skip a
                # file, so backslash-bearing values poison the parse
                return "\0"
            if re.fullmatch(r"'(?:[^']|'')*'", item):
                vals.append(item[1:-1].replace("''", "'"))
            elif re.fullmatch(r"-?\d+\.\d+", item):
                vals.append(float(item))
            elif re.fullmatch(r"-?\d+", item):
                vals.append(int(item))
            else:
                return "\0"  # poison: unparsable IN list
        if not vals:
            return "\0"
        in_out.append((m.group(1), "in", tuple(vals)))
        return " 1=1 "  # neutral placeholder keeps the AND structure

    if "\\" in where:
        # Spark unescapes backslash sequences in string literals; this
        # parser doesn't — quote-parity checks and value extraction
        # both become unreliable, so degrade to an unpruned scan
        return []
    stripped = re.sub(
        r"\b([A-Za-z_][A-Za-z_0-9]*)\s+IN\s+\(([^()]*)\)",
        _in_repl,
        where,
        flags=re.IGNORECASE,
    )
    if "\0" in stripped:
        return []
    if "(" in stripped or ")" in stripped:
        return []
    if re.search(r"\b(OR|NOT|IN|BETWEEN|LIKE|IS)\b", stripped, re.IGNORECASE):
        return []
    out: list[tuple[str, str, object]] = list(in_out)
    for part in _WHERE_AND_RE.split(stripped):
        if part.count("'") % 2:
            return []  # AND split inside a quoted string
        if part.strip() == "1=1":
            continue  # an extracted IN clause's placeholder
        m = _WHERE_CMP_RE.match(part)
        if not m:
            continue  # unparsable conjunct: no pruning on it
        col, op, lit = m.groups()
        if lit.startswith("'"):
            val: object = lit[1:-1].replace("''", "'")
        elif "." in lit:
            val = float(lit)
        else:
            val = int(lit)
        out.append((col, "=" if op == "==" else op, val))
    return out


_DATE_LIT_RE = re.compile(r"^\s*(\d{4})-(\d{1,2})-(\d{1,2})\s*$")
_TS_LIT_RE = re.compile(
    r"^\s*(\d{4})-(\d{1,2})-(\d{1,2})"
    r"(?:[T ](\d{1,2}):(\d{1,2})(?::(\d{1,2})(\.\d+)?)?)?"
    r"(Z|[+-]\d{2}:?\d{2})?\s*$"
)


def _normalize_date_literal(val) -> str | None:
    """Re-encode a date literal exactly as ``_json_safe_stat`` encodes
    DATE stats (zero-padded ISO), or None if it doesn't parse as a
    plain date. Spark compares ``date_col > '1997-1-1'`` semantically
    (the cast pads it), but stats comparisons are lexical — an
    unpadded month/day sorts ABOVE every padded stat and would prune
    files that hold matching rows."""
    if not isinstance(val, str):
        return None
    m = _DATE_LIT_RE.match(val)
    if not m:
        return None
    try:
        return datetime.date(*map(int, m.groups())).isoformat()
    except ValueError:
        return None


def _normalize_ts_literal(val, allow_offset: bool) -> str | None:
    """Re-encode a timestamp literal exactly as ``_json_safe_stat``
    encodes TIMESTAMP stats (``isoformat(sep=' ')``: space separator,
    zero-padded, microseconds omitted when zero, UTC-normalized), or
    None if it doesn't parse canonically. Covers 'T'-separated
    literals, unpadded fields, missing time/seconds (midnight / :00),
    and — for the local-TZ type only — explicit UTC offsets.
    Sub-microsecond fractions return None (truncation could flip a
    strict comparison at the cut)."""
    if not isinstance(val, str):
        return None
    m = _TS_LIT_RE.match(val)
    if not m:
        return None
    y, mo, d, hh, mm, ss, frac, off = m.groups()
    if off is not None and not allow_offset:
        return None
    micro = 0
    if frac is not None:
        digits = frac[1:]
        if len(digits) > 6:
            return None
        micro = int(digits.ljust(6, "0"))
    try:
        dt = datetime.datetime(
            int(y), int(mo), int(d),
            int(hh or 0), int(mm or 0), int(ss or 0), micro,
        )
    except ValueError:
        return None
    if off is not None and off != "Z":
        sign = 1 if off[0] == "+" else -1
        oh, om = int(off[1:3]), int(off.replace(":", "")[3:5])
        dt -= sign * datetime.timedelta(hours=oh, minutes=om)
    return dt.isoformat(sep=" ")


def _normalize_temporal_conjuncts(
    conjuncts: Sequence[tuple], types: dict
) -> list[tuple]:
    """Pruning-side literal normalization for date/timestamp columns:
    stats and partition-directory values are canonical ISO strings,
    so the literal must be re-encoded to the SAME form before any
    lexical comparison. A literal that doesn't normalize drops out of
    pruning entirely (the filter still applies) — parsing can reduce
    skipping, never correctness."""
    out = []
    for col, op, val in conjuncts:
        t = types.get(col)
        temporal = isinstance(
            t, (T.DateType, T.TimestampType, T.TimestampNTZType)
        )
        if op == "in" and temporal:
            # IN lists over temporal columns stay filter-only — each
            # member would need its own normalization; conservative
            continue
        if isinstance(t, T.DateType):
            val = _normalize_date_literal(val)
        elif isinstance(t, (T.TimestampType, T.TimestampNTZType)):
            val = _normalize_ts_literal(
                val, allow_offset=isinstance(t, T.TimestampType)
            )
        if val is None:
            continue
        out.append((col, op, val))
    return out


def _cmp_compatible(a, b) -> bool:
    num = (int, float)
    return (isinstance(a, num) and isinstance(b, num)) or (
        isinstance(a, str) and isinstance(b, str)
    )


def _range_excludes(mn, mx, op: str, val) -> bool:
    """True iff NO value in [mn, mx] can satisfy ``x op val``."""
    if op == "in":
        # an IN conjunct excludes the file only when EVERY listed
        # value falls outside [mn, mx]
        return all(_range_excludes(mn, mx, "=", v) for v in val)
    if not (_cmp_compatible(mn, val) and _cmp_compatible(mx, val)):
        return False
    if op == "=":
        return val < mn or val > mx
    if op == "<":
        return mn >= val
    if op == "<=":
        return mn > val
    if op == ">":
        return mx <= val
    if op == ">=":
        return mx < val
    return False


def _point_excludes(pv, op: str, val) -> bool:
    """True iff the single partition value ``pv`` fails ``pv op val``."""
    if op == "in":
        return all(_point_excludes(pv, "=", v) for v in val)
    if not _cmp_compatible(pv, val):
        return False
    if op == "=":
        return pv != val
    if op == "<":
        return not pv < val
    if op == "<=":
        return not pv <= val
    if op == ">":
        return not pv > val
    if op == ">=":
        return not pv >= val
    return False


class LakeTable:
    """A versioned Parquet table rooted at ``path``.

    Layout::

        path/
          _dtk_log/v00000000.json ...   # manifests (commit log)
          data/d-3fa09c.../             # immutable dir per write attempt
            [dt=2024-01-01/]part-*.parquet

    Data dirs are uniquely-named staging tokens, never version
    numbers: data lands BEFORE the manifest commit claims a version,
    so concurrent writers must never share a dir. A manifest's owners
    map points each partition at the token that holds it. Mutations
    commit at exactly ``read_version + 1``; losing that O_EXCL race
    means another writer committed first — the operation recomputes
    from the fresh manifest and the orphaned token dir is reaped by
    ``vacuum`` after a grace period.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_by: Sequence[str] | None = None,
        constraints: dict[str, str] | None = None,
        on_violation: str = "reject",
        stats_columns: Sequence[str] | None = None,
        bloom_filter_columns: Sequence[str] | dict[str, int] | None = None,
        auto_compact_after: dict | None = None,
    ) -> None:
        """``partition_by``: the table's partition scheme. ``None``
        (default) adopts the existing table's current scheme from its
        latest manifest (``()`` for a new table), so readers never
        have to restate the layout. An explicit value on an EXISTING
        table must match the committed scheme — changing it is a
        versioned operation (``evolve_partitioning``), not a
        constructor side effect; a silent mismatch would let mutations
        interpret the owners map under the wrong layout.

        ``constraints``: named boolean SQL expressions every row of
        every write/upsert must satisfy (Delta CHECK-constraint
        semantics; false OR NULL = violation). Persisted in the commit
        manifest, so a later ``LakeTable(spark, path)`` — no
        constraints argument — enforces the table's declared rules.
        ``on_violation``: ``'reject'`` fails the whole write with
        per-rule counts; ``'quarantine'`` diverts violating rows to
        ``<path>/_quarantine/<token>`` and commits only passing rows
        (the streaming UNMATCHED pattern applied to batch writes).

        ``stats_columns``: columns to keep per-file min/max manifest
        stats for (data skipping via ``read(where=...)``). ``None``
        (default) auto-selects the first 16 orderable primitive
        columns; ``()`` disables stats collection for commits made
        through this instance.

        ``bloom_filter_columns``: columns to write parquet BLOOM
        FILTERS for (a dict maps column -> expected distinct count,
        parquet's sizing knob; a plain sequence uses parquet's
        default NDV). Two effects: Spark's own parquet reader skips
        row groups on pushed-down equality predicates natively, and
        ``read(where="col = '...'")`` / ``plan_scan`` additionally
        skip WHOLE FILES whose bloom filter proves the value absent —
        the point-lookup complement to min/max stats, which high-
        cardinality identifier columns defeat (every file spans the
        alphabet). Planning-side probing covers STRING equality (the
        case min/max loses); numeric equality already prunes via
        min/max and Spark's row-group blooms.

        ``auto_compact_after``: commit-time compaction policy for
        merge-on-read state (Delta auto-compaction / Hudi inline-
        compaction spirit). A dict with any of:

        - ``'merges': N`` — after a MoR commit leaves >= N pending
          merge entries, run a SCOPED ``optimize()`` over the
          partitions they touch, draining them;
        - ``'deletes': N`` — >= N pending predicate-delete entries
          triggers a FULL ``optimize()`` (their token coverage spans
          the table, so only a full rewrite drains every entry);
        - ``'append_ratio': r`` — pending append files / base files
          (from the manifest stats map) >= r triggers the scoped
          drain; needs per-file stats (on by default).

        Without a policy (default), compaction stays out-of-band and
        every read pays the documented MoR resolution tax until
        someone calls ``optimize()``. The policy bounds that tax: a
        steady MoR stream compacts itself every N micro-batches."""
        if on_violation not in ("reject", "quarantine"):
            raise ValueError(f"on_violation must be reject|quarantine, got {on_violation!r}")
        self.spark = spark
        self.path = path
        self.constraints = dict(constraints) if constraints is not None else None
        self.on_violation = on_violation
        self.auto_compact_after = (
            dict(auto_compact_after) if auto_compact_after else None
        )
        if self.auto_compact_after:
            unknown = set(self.auto_compact_after) - {
                "merges", "deletes", "append_ratio",
            }
            if unknown:
                raise ValueError(
                    f"auto_compact_after keys {sorted(unknown)} unknown; "
                    "expected merges|deletes|append_ratio"
                )
        self.stats_columns = (
            tuple(stats_columns) if stats_columns is not None else None
        )
        self.log_dir = os.path.join(path, "_dtk_log")
        self.data_dir = os.path.join(path, "data")
        self.quarantine_dir = os.path.join(path, "_quarantine")
        committed: tuple[str, ...] | None = None
        if self.current_version() is not None:
            committed = tuple(self._manifest()["partition_by"])
        # an EXPLICIT config (even empty) is authoritative: commits set
        # the manifest hint to exactly these columns, letting
        # bloom_filter_columns=() retire a stale hint whose files long
        # since lost their filters (r8 ADVICE). None = adopt + carry.
        self._bloom_explicit = bloom_filter_columns is not None
        if bloom_filter_columns is None:
            # adopt the table's committed bloom config (mirroring the
            # partition_by adoption below): a maintenance handle opened
            # without the option must keep writing filters, or its
            # rewrites would silently strip point-lookup skipping
            self.bloom_filter_columns: dict[str, int | None] = {}
            if committed is not None:
                self.bloom_filter_columns = {
                    c: None
                    for c in self._manifest().get("bloom_columns") or []
                }
        elif isinstance(bloom_filter_columns, dict):
            self.bloom_filter_columns = dict(bloom_filter_columns)
        else:
            self.bloom_filter_columns = {c: None for c in bloom_filter_columns}
        if partition_by is None:
            self.partition_by = committed if committed is not None else ()
        else:
            self.partition_by = tuple(partition_by)
            if committed is not None and self.partition_by != committed:
                raise ValueError(
                    f"table at {path} is partitioned by {committed}, not "
                    f"{self.partition_by}; open it without partition_by (or "
                    "with the committed scheme) and call "
                    "evolve_partitioning() to change the layout"
                )

    # -- log ---------------------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f[1:9])
            for f in os.listdir(self.log_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def current_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"v{version:08d}.json")

    def _manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.current_version()
        if version is None or not os.path.exists(self._manifest_path(version)):
            raise FileNotFoundError(
                f"no manifest for version {version} at {self.log_dir} "
                "(never written, or vacuumed past the retention horizon)"
            )
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _vdir(self, token: int | str) -> str:
        # int: legacy version-numbered dirs; str: unique staging
        # tokens; absolute path: an external dir referenced by a
        # shallow clone — resolved as-is, never under our data_dir
        if isinstance(token, str) and os.path.isabs(token):
            return token
        name = f"v{token:08d}" if isinstance(token, int) else token
        return os.path.join(self.data_dir, name)

    def _new_token(self) -> str:
        """Unique data-dir name, minted per write attempt. Data lands
        here BEFORE the manifest commit claims a version, so the name
        must never collide across concurrent writers — a
        version-numbered dir would let two writers interleave files."""
        return f"d-{uuid.uuid4().hex[:12]}"

    def _next_version(self) -> int:
        cur = self.current_version()
        return 0 if cur is None else cur + 1

    def _carried_deletes(
        self,
        version: int,
        owners: dict[str, str],
        merges: Sequence[dict] = (),
    ) -> list[dict]:
        """Previous manifest's merge-on-read delete entries, pruned to
        tokens still referenced (owners or pending merge appends): a
        rewrite gives its partitions a fresh token, so entries over
        fully-rewritten tokens fall away — the rewrite materialized
        them through ``_read_owned``."""
        if version <= 0:
            return []
        try:
            prev = self._manifest(version - 1).get("deletes") or []
        except FileNotFoundError:
            return []
        live = set(owners.values()) | {e["token"] for e in merges}
        out = []
        for e in prev:
            toks = [t for t in e["tokens"] if t in live]
            if toks:
                out.append({"pred": e["pred"], "tokens": toks})
        return out

    def _carried_merges(self, version: int) -> list[dict]:
        if version <= 0:
            return []
        try:
            return list(self._manifest(version - 1).get("merges") or [])
        except FileNotFoundError:
            return []

    def _commit(
        self,
        version: int,
        owners: dict[str, int],
        op: str,
        schema_json: str,
        deletes: list[dict] | None = None,
        merges: list[dict] | None = None,
        stats: dict | None = None,
    ) -> int:
        os.makedirs(self.log_dir, exist_ok=True)
        # bloom hint: which columns MAY carry file bloom filters —
        # union with the previous manifest's hint because carried
        # partitions keep their bloomed files. Purely advisory: the
        # probe keeps any file whose footer lacks the filter. A handle
        # built with an EXPLICIT config writes exactly that column set
        # instead, so passing () retires a hint whose footer probes
        # stopped paying off (dropped columns lose skipping on any
        # still-bloomed carried files — correctness is unaffected, the
        # probe is evidence-based).
        bloom_hint = set(self.bloom_filter_columns)
        if version > 0 and not self._bloom_explicit:
            try:
                bloom_hint |= set(
                    self._manifest(version - 1).get("bloom_columns") or []
                )
            except FileNotFoundError:
                pass
        manifest = {
            "version": version,
            "op": op,
            "ts": time.time(),
            "partition_by": list(self.partition_by),
            "owners": owners,
            "schema": schema_json,
            "bloom_columns": sorted(bloom_hint),
            "constraints": self._active_constraints(),
            "stats": (
                stats
                if stats is not None
                else self._build_stats(version, owners, schema_json)
            ),
        }
        # pending merge-on-read appends carry by default (they are
        # data — dropping them silently would lose rows); full-rewrite
        # ops pass merges=[] because their read already resolved them
        manifest["merges"] = (
            merges if merges is not None else self._carried_merges(version)
        )
        manifest["deletes"] = (
            deletes
            if deletes is not None
            else self._carried_deletes(version, owners, manifest["merges"])
        )
        try:
            fd = os.open(
                self._manifest_path(version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError as exc:  # pragma: no cover - race window
            raise ConcurrentWriteError(
                f"version {version} was committed concurrently"
            ) from exc
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
        return version

    # -- file statistics -----------------------------------------------------

    def _build_stats(
        self, version: int, owners: dict[str, str], schema_json: str
    ) -> dict[str, dict]:
        """The manifest's cumulative per-file stats map ``{relpath:
        {col: [min, max, null_count]}}``: stats for still-owned files
        carry forward from the previous manifest by pointer; files of
        (token, key) pairs with no carried entry — fresh writes, or
        owners restored from pre-stats history — are footer-read. A
        collection failure degrades to an empty map (reads simply
        don't prune), never a failed commit."""
        if self.stats_columns is not None and not self.stats_columns:
            return {}
        try:
            schema = T.StructType.fromJson(json.loads(schema_json))
            cols = (
                [c for c in self.stats_columns if c in schema.fieldNames()]
                if self.stats_columns is not None
                else _stats_eligible(schema)
            )
            if not cols:
                return {}
            known: dict[str, dict] = {}
            if version > 0:
                try:
                    known = self._manifest(version - 1).get("stats") or {}
                except FileNotFoundError:
                    known = {}
            out: dict[str, dict] = {}
            need: list[tuple[str, str]] = []
            for key, tok in owners.items():
                prefix = f"{tok}/{key}/" if key else f"{tok}/"
                hit = {
                    p: s for p, s in known.items() if p.startswith(prefix)
                }
                if hit:
                    out.update(hit)
                else:
                    need.append((tok, key))
            for tok, key in need:
                out.update(self._collect_token_stats(tok, key, cols))
            return out
        except Exception:  # pragma: no cover - defensive
            return {}

    def _collect_token_stats(
        self, token: str, key: str, cols: list[str]
    ) -> dict[str, dict]:
        d = os.path.join(self._vdir(token), key) if key else self._vdir(token)
        if not os.path.isdir(d):
            return {}
        paths = [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        if not paths:
            return {}
        # Footer reads only. Driver-side below a modest file count (a
        # Spark job has fixed overhead); distributed via an RDD of
        # paths beyond it — per-partition imperative I/O is the one
        # legitimate RDD use, and a 100 TB initial load's stats pass
        # is exactly that case.
        if len(paths) > 64:
            rdd = self.spark.sparkContext.parallelize(
                paths, max(1, len(paths) // 64)
            )
            pieces = rdd.mapPartitions(
                lambda it, c=tuple(cols): [_read_footers(list(it), list(c))]
            ).collect()
            by_abs = {p: s for piece in pieces for p, s in piece.items()}
        else:
            by_abs = _read_footers(paths, cols)
        rel = f"{token}/{key}/" if key else f"{token}/"
        return {
            rel + os.path.basename(p): s for p, s in by_abs.items() if s
        }

    # -- constraints ---------------------------------------------------------

    def _active_constraints(self) -> dict[str, str]:
        """This instance's rules if given, else the table's persisted
        rules from the latest manifest (empty for a fresh table)."""
        if self.constraints is not None:
            return self.constraints
        if self.current_version() is None:
            return {}
        return self._manifest().get("constraints", {})

    def _enforce(self, df: DataFrame) -> DataFrame:
        """Apply the table's CHECK constraints to rows about to land.
        ``reject``: one aggregate pass counts violations per rule and
        the whole write fails if any (counts travel in the exception).
        ``quarantine``: violating rows land under _quarantine/<token>
        as parquet (with a ``_violated`` rule-list column) and only
        passing rows continue to the commit."""
        rules = self._active_constraints()
        if not rules:
            return df
        conds = {
            name: F.coalesce(F.expr(rule), F.lit(False))
            for name, rule in rules.items()
        }
        if self.on_violation == "reject":
            counts = df.agg(
                *[
                    F.sum(F.when(c, 0).otherwise(1)).cast("long").alias(n)
                    for n, c in conds.items()
                ]
            ).collect()[0]
            report = [(n, counts[n] or 0) for n in conds if (counts[n] or 0) > 0]
            if report:
                raise ConstraintViolationError(self.path, report)
            return df
        violated = F.filter(
            F.array(
                *[
                    F.when(~c, F.lit(n)).otherwise(F.lit(None))
                    for n, c in conds.items()
                ]
            ),
            lambda x: x.isNotNull(),
        )
        # Evaluate the source EXACTLY ONCE: without pinning, the
        # bad-probe, the quarantine write, and the commit write each
        # re-run the source plan, and a non-deterministic source could
        # commit a row without quarantining it (or both). The flags are
        # computed once and localCheckpoint materializes them; both
        # splits below read the pinned blocks. Cost: one batch-sized
        # materialization, paid only by constrained quarantine-mode
        # tables.
        annotated = df.withColumn(
            "_violated", F.concat_ws(",", violated)
        ).localCheckpoint(eager=True)
        bad = annotated.where(F.col("_violated") != "")
        if bad.limit(1).count() > 0:
            # quarantine dirs are an audit sink with their own token:
            # they survive even if the subsequent commit loses every
            # version race (a diverted row should stay inspectable
            # regardless of what happened to the rest of the batch)
            qdir = os.path.join(self.quarantine_dir, self._new_token())
            bad.write.mode("overwrite").parquet(qdir)
        return annotated.where(F.col("_violated") == "").drop("_violated")

    # -- data io -----------------------------------------------------------

    def _partition_keys(self, df: DataFrame) -> list[str]:
        """Distinct partition tuples, driver-side (bounded by partition
        count — this is commit planning, not data movement)."""
        rows = df.select(*self.partition_by).distinct().collect()
        return [_fmt_key(self.partition_by, r) for r in rows]

    def _written_keys(self, vdir: str) -> list[str]:
        """The partition keys a finished ``partitionBy`` write produced,
        read from the directory tree itself — the directories ARE the
        owners-map keys (``_escape_partition_value`` mirrors Spark's
        naming exactly), so listing them replaces the pre-write
        ``_partition_keys`` job: one fewer full evaluation of the
        input lineage per partitioned write, zero Spark jobs."""
        depth = len(self.partition_by)
        keys: list[str] = []
        stack: list[tuple[str, int, str]] = [(vdir, 0, "")]
        while stack:
            d, lvl, rel = stack.pop()
            try:
                names = os.listdir(d)
            except OSError:
                continue
            for name in names:
                if name.startswith(("_", ".")) or "=" not in name:
                    continue
                p = os.path.join(d, name)
                if not os.path.isdir(p):
                    continue
                r = f"{rel}/{name}" if rel else name
                if lvl + 1 == depth:
                    keys.append(r)
                else:
                    stack.append((p, lvl + 1, r))
        return sorted(keys)

    def _zvalue(self, df: DataFrame, cols: Sequence[str], bits: int = 4):
        """Z-order curve value: per column an equi-depth bucket id in
        [0, 2^bits) from approxQuantile boundaries (driver payload =
        (2^bits - 1) doubles per column), bit-interleaved across
        columns so EVERY z-ordered column gets tight per-file min/max
        spans — lexicographic sort only tightens the leading one."""
        if not cols:
            raise ValueError("zorder_by needs at least one column")
        # approxQuantile only accepts numeric columns; fail fast with a
        # clear message instead of its opaque analysis error. (Date /
        # timestamp columns: cast to long/epoch first, or use cluster_by.)
        numeric = (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType,
        )
        schema = {f.name: f.dataType for f in df.schema.fields}
        for c in cols:
            if c not in schema:
                raise ValueError(f"zorder_by column {c!r} not in table schema")
            if not isinstance(schema[c], numeric):
                raise ValueError(
                    f"zorder_by column {c!r} has type {schema[c].simpleString()};"
                    " z-ordering needs numeric columns (approxQuantile"
                    " bucketing). Cast dates/timestamps to epoch numbers, or"
                    " use cluster_by for lexicographic clustering. NULLs in a"
                    " z-column collapse into bucket 0 (documented behavior)."
                )
        n = len(cols)
        probs = [i / (1 << bits) for i in range(1, 1 << bits)]
        # ONE multi-column approxQuantile pass: the per-column form
        # would scan the whole snapshot len(cols) times per attempt
        all_bnds = df.approxQuantile(list(cols), probs, 0.001)
        z = F.lit(0).cast("long")
        for i, c in enumerate(cols):
            bnds = all_bnds[i]
            arr = F.lit(bnds) if bnds else F.array().cast("array<double>")
            bucket = F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc + F.when(F.col(c).cast("double") >= b, 1).otherwise(0),
            )
            for b in range(bits):
                z = z + F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1)).cast("long"),
                    b * n + i,
                )
        return z

    def _write_data(
        self,
        df: DataFrame,
        data_version: int,
        cluster_by: Sequence[str] = (),
        zorder_by: Sequence[str] = (),
    ) -> list[str]:
        vdir = self._vdir(data_version)
        # INT96 (Spark's legacy parquet default) carries no footer
        # min/max, which would silently disable timestamp data
        # skipping for tables written from sessions that don't set the
        # modern encoding — pin TIMESTAMP_MICROS for the write and
        # restore the caller's conf after.
        conf = df.sparkSession.conf
        prev_ts = conf.get("spark.sql.parquet.outputTimestampType", None)
        conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        try:
            return self._write_data_inner(df, vdir, cluster_by, zorder_by)
        finally:
            if prev_ts is None:
                conf.unset("spark.sql.parquet.outputTimestampType")
            else:
                conf.set("spark.sql.parquet.outputTimestampType", prev_ts)

    def _write_data_inner(
        self,
        df: DataFrame,
        vdir: str,
        cluster_by: Sequence[str] = (),
        zorder_by: Sequence[str] = (),
    ) -> list[str]:
        clustered = bool(cluster_by or zorder_by)
        if zorder_by:
            # interleaved-bit clustering: range-partition + sort on the
            # z-value, then drop it (projection keeps the ordering)
            df = (
                df.withColumn("_z", self._zvalue(df, zorder_by))
                .repartitionByRange(*[F.col(c) for c in self.partition_by], F.col("_z"))
                .sortWithinPartitions(*self.partition_by, "_z")
                .drop("_z")
            )
        if cluster_by:
            # Range-cluster on (partition cols, sort cols): each task
            # holds a contiguous key range, so files land under few
            # partition dirs and parquet row-group min/max stats are
            # tight on the sort key — the data-skipping property
            # OPTIMIZE ZORDER buys. Skip the rebalance hint: it would
            # re-shuffle away the clustering. A "-col" entry sorts
            # that column DESCENDING (impact-ordered layouts: e.g.
            # postings clustered by (term, -tf) give later files of a
            # term run a small tf max, which block-max skipping can
            # then prune on the manifest stats).
            cluster = [
                *[F.col(c) for c in self.partition_by],
                *[
                    F.col(c[1:]).desc() if c.startswith("-") else F.col(c)
                    for c in cluster_by
                ],
            ]
            df = df.repartitionByRange(*cluster).sortWithinPartitions(*cluster)
        if self.partition_by:
            out = df if clustered else df.hint("rebalance", *self.partition_by)
            (
                self._bloom_writer(out.write.mode("overwrite"))
                .partitionBy(*self.partition_by)
                .parquet(vdir)
            )
            # keys from the written directory tree — one fewer job and
            # one fewer evaluation of the input lineage than the
            # pre-write distinct-collect (guide §2.4: don't compute
            # things the write itself already materializes)
            return self._written_keys(vdir)
        self._bloom_writer(df.write.mode("overwrite")).parquet(vdir)
        return [""]

    def _bloom_writer(self, writer):
        """Enable parquet bloom filters on the configured columns for
        this write (per-column writer options — parquet-mr sizes the
        filter from the expected NDV when given). Dictionary encoding
        is DISABLED on those columns: parquet-mr deliberately skips
        the bloom for a fully-dictionary-encoded chunk (readers are
        expected to probe the dictionary page instead), but our
        planning-side probe reads blooms only — so a bloom column
        trades its dictionary for a filter that is actually there.
        Columns that would stay dictionary-encoded are low-NDV chunks
        where the dictionary is small; plain + page compression
        recovers most of the difference."""
        for c, ndv in self.bloom_filter_columns.items():
            writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
            writer = writer.option(f"parquet.enable.dictionary#{c}", "false")
            if ndv is not None:
                writer = writer.option(
                    f"parquet.bloom.filter.expected.ndv#{c}", str(int(ndv))
                )
        return writer

    def _partition_excluded(
        self, key: str, types: dict, conjuncts: Sequence[tuple]
    ) -> bool:
        """True iff the partition values encoded in ``key`` provably
        fail a conjunct (so no row under the directory can pass the
        filter). A NULL partition value is excluded by ANY comparison
        conjunct — SQL comparisons with NULL never hold."""
        if not key:
            return False
        vals = {}
        for seg in key.split("/"):
            c, _, raw = seg.partition("=")
            vals[c] = raw
        for col, op, val in conjuncts:
            raw = vals.get(col)
            if raw is None:
                continue
            if raw == "__HIVE_DEFAULT_PARTITION__":
                return True
            txt = _unescape_partition_value(raw)
            t = types.get(col)
            try:
                if isinstance(
                    t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
                ):
                    pv: object = int(txt)
                elif isinstance(t, (T.FloatType, T.DoubleType)):
                    pv = float(txt)
                else:
                    pv = txt
            except ValueError:
                continue
            if _point_excludes(pv, op, val):
                return True
        return False

    _BLOOM_PROBE_MAX_FILES = 256

    def _bloom_excludes(self, path: str, col: str, val: str) -> bool:
        """True iff the file's parquet bloom filters PROVE ``col``
        never equals ``val`` in any row group. Strictly evidence-
        based: a missing filter (file written before blooms were
        enabled, carried partition, unreadable footer) keeps the file.
        Reads through the JVM's ParquetFileReader — pyarrow exposes no
        bloom API — one footer + filter-page seek per probe."""
        try:
            jvm = self.spark._jvm
            conf = self.spark._jsc.hadoopConfiguration()
            infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                jvm.org.apache.hadoop.fs.Path(path), conf
            )
            reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
            try:
                blocks = reader.getFooter().getBlocks()
                binary = jvm.org.apache.parquet.io.api.Binary.fromString(val)
                for b in range(blocks.size()):
                    rg = blocks.get(b)
                    cols = rg.getColumns()
                    cc = None
                    for i in range(cols.size()):
                        if cols.get(i).getPath().toDotString() == col:
                            cc = cols.get(i)
                            break
                    if cc is None:
                        return False
                    bf = reader.getBloomFilterDataReader(rg).readBloomFilter(cc)
                    if bf is None or bf.findHash(bf.hash(binary)):
                        return False  # no evidence / possibly present
                return blocks.size() > 0
            finally:
                reader.close()
        except Exception:  # pragma: no cover - defensive
            return False

    def _select_files(
        self,
        manifest: dict,
        keys: Sequence[str] | None,
        conjuncts: Sequence[tuple],
        exclude_files: "set[str] | None" = None,
    ) -> tuple[dict, dict]:
        """File-level scan selection under predicate pruning: for each
        owned partition, drop the whole directory if its key values
        exclude a conjunct, then drop individual files whose manifest
        min/max stats exclude one. Files without stats are always
        kept — skipping is strictly evidence-based.

        ``exclude_files`` (absolute paths) drops named OWNED files in
        addition — CALLER-OWNED correctness, for callers that computed
        their own evidence from the manifest stats (e.g. the postings
        index's block-max candidate skip). Pending merge-on-read
        appends are outside any selection and always read, so an
        exclusion can never hide unresolved MoR state."""
        owners: dict[str, str] = manifest["owners"]
        if keys is not None:
            owners = {k: v for k, v in owners.items() if k in set(keys)}
        schema = T.StructType.fromJson(json.loads(manifest["schema"]))
        types = {f.name: f.dataType for f in schema.fields}
        # TIMESTAMP (local-TZ) stats are UTC-normalized ISO strings,
        # but the FILTER interprets string literals in the session
        # timezone — under a non-UTC session the two disagree and a
        # stats comparison could prune files that hold matching rows.
        # Drop those conjuncts from pruning (the filter still applies)
        # unless the session runs UTC. DATE and TIMESTAMP_NTZ have no
        # timezone and always prune.
        tz = self.spark.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            conjuncts = [
                c
                for c in conjuncts
                if not isinstance(types.get(c[0]), T.TimestampType)
            ]
        # date/timestamp literals must be re-encoded to the stat
        # encoding before any lexical comparison — '1997-1-1' sorts
        # above every '1997-0x-..' stat and would wrongly prune
        conjuncts = _normalize_temporal_conjuncts(conjuncts, types)
        stats = manifest.get("stats") or {}
        # bloom probing: STRING equality conjuncts on columns the
        # manifest hints may carry file bloom filters — the point-
        # lookup case min/max stats structurally lose (every file of a
        # high-cardinality identifier column spans the alphabet).
        # Driver-side footer seeks, so a shared budget caps the probe
        # count; past it, files are simply kept (evidence-based).
        bloom_cols = set(manifest.get("bloom_columns") or [])
        # each entry is (col, candidate values): a conjunct excludes a
        # file only when EVERY candidate is bloom-absent — one value
        # for "=", the whole list for "in"
        bloom_eq = [
            (c, (val,) if op == "=" else tuple(val))
            for c, op, val in conjuncts
            if op in ("=", "in")
            and c in bloom_cols
            and isinstance(types.get(c), T.StringType)
            and all(
                isinstance(v, str)
                for v in ((val,) if op == "=" else val)
            )
        ]
        bloom_budget = self._BLOOM_PROBE_MAX_FILES if bloom_eq else 0
        report = {
            "partitions_total": len(owners),
            "partitions_scanned": 0,
            "files_total": 0,
            "files_scanned": 0,
            "files_bloom_skipped": 0,
            "files_stats_skipped": 0,
            "files_excluded": 0,
        }
        by_group: dict[tuple, list[str]] = {}
        for key, tok in owners.items():
            d = os.path.join(self._vdir(tok), key) if key else self._vdir(tok)
            files = (
                sorted(
                    f
                    for f in os.listdir(d)
                    if f.endswith(".parquet") and not f.startswith(("_", "."))
                )
                if os.path.isdir(d)
                else []
            )
            report["files_total"] += len(files)
            if conjuncts and self._partition_excluded(key, types, conjuncts):
                continue
            prefix = f"{tok}/{key}/" if key else f"{tok}/"
            kept = []
            for f in files:
                st = stats.get(prefix + f)
                if st and any(
                    c in st and _range_excludes(st[c][0], st[c][1], op, val)
                    for c, op, val in conjuncts
                ):
                    report["files_stats_skipped"] += 1
                    continue
                full = os.path.join(d, f)
                if exclude_files and full in exclude_files:
                    report["files_excluded"] += 1
                    continue
                if bloom_budget > 0:
                    bloom_budget -= 1
                    if any(
                        all(
                            self._bloom_excludes(full, c, v) for v in vals
                        )
                        for c, vals in bloom_eq
                    ):
                        report["files_bloom_skipped"] += 1
                        continue
                kept.append(full)
            if not kept:
                continue
            report["partitions_scanned"] += 1
            report["files_scanned"] += len(kept)
            by_group.setdefault((tok, _key_spec(key)), []).extend(kept)
        return by_group, report

    def _keys_predicate(self, keys: Sequence[str], types: dict):
        """Row-level predicate equivalent of the structural partition
        restriction: a row matches a stored owners-map key iff every
        column the key encodes equals the key's (typed) value —
        ``__HIVE_DEFAULT_PARTITION__`` matches NULL/''. Needed to scope
        RESOLVED merge-on-read append rows to a partition-restricted
        read: appends resolve globally (a key may have moved partitions),
        so directories alone can't scope them.

        The disjunction folds BALANCED (pairwise), not left-deep: a
        wide probe (hundreds of partitions — e.g. a near-full IVF
        probe over a 16384-list index) would otherwise build an
        O(n)-deep Or chain that overflows the JVM stack in Spark's
        column-tree conversion; the balanced tree is O(log n) deep."""
        terms = []
        for key in keys:
            conj = F.lit(True)
            for seg in key.split("/") if key else []:
                c, _, raw = seg.partition("=")
                if raw == "__HIVE_DEFAULT_PARTITION__":
                    cond = F.col(c).isNull() | (
                        F.col(c).cast("string") == F.lit("")
                    )
                else:
                    txt = _unescape_partition_value(raw)
                    t = types.get(c)
                    cond = (
                        F.col(c) == F.lit(txt).cast(t)
                        if t is not None
                        else F.col(c).cast("string") == F.lit(txt)
                    )
                conj = conj & cond
            terms.append(conj)
        if not terms:
            return F.lit(False)
        while len(terms) > 1:
            paired = [a | b for a, b in zip(terms[::2], terms[1::2])]
            if len(terms) % 2:
                paired.append(terms[-1])
            terms = paired
        return terms[0]

    def _read_owned(
        self,
        manifest: dict,
        keys: Sequence[str] | None = None,
        conjuncts: Sequence[tuple] | None = None,
        merge_scope: str = "restrict",
        exclude_files: "set[str] | None" = None,
    ) -> DataFrame:
        """Assemble a snapshot (optionally restricted to ``keys``) by
        listing exactly the directories each owning version holds for
        it — structural partition pruning, no filter needed. With
        ``conjuncts`` (from ``read(where=...)``), selection drops to
        FILE granularity: manifest min/max stats skip files the
        predicate provably excludes before Spark lists anything."""
        schema = T.StructType.fromJson(json.loads(manifest["schema"]))
        types = {f.name: f.dataType for f in schema.fields}
        # Group by (owning token, key layout): one manifest may own
        # directories written under DIFFERENT partition schemes
        # (partition-spec evolution) — each group reads with its own
        # basePath so dir-derived columns resolve under its own layout,
        # and unionByName merges the mixed shapes.
        by_group: dict[tuple, list[str]] = {}
        if conjuncts is not None or exclude_files:
            by_group, _ = self._select_files(
                manifest, keys, conjuncts or [], exclude_files
            )
        else:
            owners: dict[str, str] = manifest["owners"]
            if keys is not None:
                owners = {k: v for k, v in owners.items() if k in set(keys)}
            for key, v in owners.items():
                spec = _key_spec(key)
                path = (
                    os.path.join(self._vdir(v), key) if spec else self._vdir(v)
                )
                by_group.setdefault((v, spec), []).append(path)
        if not by_group and not (manifest.get("merges") or []):
            return self.spark.createDataFrame([], schema)
        # an all-pruned (or empty) base still resolves pending
        # merge-on-read appends below — seed an empty piece ONLY then
        # (an unconditional seed measurably slows every snapshot read:
        # ~1.6s/query at sf0.1 on the MERGE gate queries)
        pieces = (
            [self.spark.createDataFrame([], schema)] if not by_group else []
        )
        for (v, spec), paths in by_group.items():
            # the EXPLICIT schema does two jobs: dir-derived partition
            # values parse straight from the raw directory string to
            # their manifest type (never through partition-type
            # inference, which corrupts Java-float-literal-shaped
            # values like '8f' -> 8.0 — see _token_frame), and files
            # written before a schema evolution read their missing
            # columns as NULL
            if not spec:
                piece = self.spark.read.schema(schema).parquet(
                    *sorted(set(paths))
                )
            else:
                piece = (
                    self.spark.read.schema(schema)
                    .option("basePath", self._vdir(v))
                    .parquet(*sorted(set(paths)))
                )
            # merge-on-read deletes: a delete entry applies to exactly
            # the tokens that existed when it committed — rows written
            # AFTER it (fresh tokens) are immune, and a rewrite of a
            # partition drops its token from the entry, having
            # materialized the delete. NULL predicate results keep the
            # row (SQL DELETE semantics).
            for e in manifest.get("deletes") or []:
                if v in e["tokens"]:
                    piece = piece.where(
                        ~F.coalesce(F.expr(e["pred"]), F.lit(False))
                    )
            pieces.append(piece)
        # allowMissingColumns: partitions written before a schema
        # evolution lack the later columns — they read as NULL, same
        # as Delta's mergeSchema reads
        out = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), pieces
        )
        # merge-on-read appends: newest append per key wins; base rows
        # for appended keys lose by anti-join (matching the CoW MERGE
        # contract exactly, including tables whose base has duplicate
        # keys — those survive untouched unless appended over). The
        # per-key window runs over APPEND data only (small); the base
        # pays one anti-join shuffle — the MoR read tax that drains at
        # the next rewrite.
        pending = manifest.get("merges") or []
        if pending:
            mkeys = list(pending[0]["keys"])
            parts = []
            for e in pending:
                # a partitioned append wrote its partition columns into
                # directory names — reading the token ROOT recovers
                # them under the manifest's DECLARED types (explicit
                # schema, no inference), tombstone marker included
                p = self._token_frame(e["token"], manifest)
                parts.append(p.withColumn("_seq", F.lit(e["seq"])))
            appended = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True),
                parts,
            )
            w = Window.partitionBy(*mkeys).orderBy(F.col("_seq").desc())
            latest = (
                appended.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            # merge-on-read deletes apply to the RESOLVED winner, never
            # to raw append rows: a delete matching the winning append
            # must kill the key outright — filtering pre-resolution
            # would resurrect the shadowed base/older-append row the
            # delete's snapshot never showed. A delete covers exactly
            # the appends that existed when it committed (their tokens
            # are in its token list).
            for d in manifest.get("deletes") or []:
                toks = set(d["tokens"])
                seqs = [e["seq"] for e in pending if e["token"] in toks]
                if seqs:
                    latest = latest.where(
                        ~(
                            F.col("_seq").isin(seqs)
                            & F.coalesce(F.expr(d["pred"]), F.lit(False))
                        )
                    )
            latest = latest.drop("_seq")
            # key-tombstone appends (merge-on-read DELETE by key): a
            # key whose newest append is a tombstone resolves to
            # nothing — but its base rows still lose the anti-join
            # below (appended keys include tombstoned keys)
            if self._TOMBSTONE in latest.columns:
                latest = latest.where(
                    ~F.coalesce(F.col(self._TOMBSTONE), F.lit(False))
                ).drop(self._TOMBSTONE)
            if keys is not None and merge_scope == "restrict":
                latest = latest.where(self._keys_predicate(keys, types))
            # base rows for EVERY appended key lose — even when the
            # winning append row was itself deleted above, the delete
            # acted on the appended state, so the shadowed base row
            # must not resurface
            anti = appended.select(*mkeys).distinct()
            out = out.join(anti, mkeys, "left_anti").unionByName(
                latest, allowMissingColumns=True
            )
        names = [f.name for f in schema.fields]
        if set(names) == set(out.columns):
            out = out.select(*names)  # pin manifest column order
        return out

    def _token_frame(
        self, token: str, man: dict, columns: Sequence[str] | None = None
    ) -> DataFrame:
        """Read one append/staging token dir with an EXPLICIT schema,
        never partition-type inference: inference parses hex bucket
        values like '8f' as the Java float literal 8.0
        (``Double.parseDouble`` accepts type suffixes) whenever a
        token's directory set happens to be all double-parseable —
        e.g. a one-bucket merge-on-read append — silently corrupting
        the partition key. With a declared schema the raw directory
        string casts straight to the manifest type, losslessly.

        ``columns`` narrows the read (key extraction wants keys +
        partition columns only); partition-layout columns are always
        kept so their dir values parse under the declared type, and
        the tombstone marker field rides along so tombstone tokens
        keep theirs (absent in ordinary files -> NULL -> kept by the
        coalesce filter, same as before)."""
        all_fields = T.StructType.fromJson(json.loads(man["schema"])).fields
        dir_cols = set(man.get("partition_by") or ()) | set(self.partition_by)
        for key in man.get("owners") or {}:
            dir_cols.update(_key_spec(key))
        keep = None if columns is None else set(columns) | dir_cols
        fields = [
            f for f in all_fields if keep is None or f.name in keep
        ]
        fields.append(T.StructField(self._TOMBSTONE, T.BooleanType(), True))
        return self.spark.read.schema(T.StructType(fields)).parquet(
            self._vdir(token)
        )

    def _affected_keys(self, man: dict, touched: DataFrame) -> set[str]:
        """Partition keys a mutation rewriting the ``touched`` rows must
        carry through, under EVERY layout present in the manifest's
        owners map plus the current scheme. During a partition-spec
        migration window a matched row may live in a directory keyed
        under the old layout — formatting the touched rows under each
        stored layout (one bounded distinct+collect per layout; exactly
        one layout outside a migration window) finds it. A touched row
        stored under layout A can mint a spurious key under layout B;
        that only marks an extra partition for rewrite (its survivors
        are carried verbatim), never a correctness loss."""
        specs = {_key_spec(k) for k in man["owners"]}
        specs.add(self.partition_by)
        out: set[str] = set()
        for s in specs:
            # select(*()) yields a zero-column frame: one distinct row
            # iff ``touched`` is non-empty — exactly when a legacy
            # unpartitioned blob ("" key) must be rewritten
            out |= {
                _fmt_key(s, r) for r in touched.select(*s).distinct().collect()
            }
        return out

    def _merge_affected_keys(self, man: dict) -> set[str]:
        """Partition keys a scoped rewrite must ALSO carry through to
        fully materialize every pending merge-on-read append (so the
        commit may clear the entries): the partitions the append rows
        themselves land in (recorded in each entry at append time),
        plus the partitions of base rows their keys shadow — a
        cross-partition key move leaves a stale row behind in the OLD
        partition, and only rewriting that partition materializes its
        disappearance. Costs one base-probe (left-semi against the
        small append key set) per mutation, paid only while appends
        are pending."""
        pending = man.get("merges") or []
        if not pending:
            return set()
        mkeys = list(pending[0]["keys"])
        out: set[str] = set()
        app_parts = []
        for e in pending:
            p = self._token_frame(e["token"], man, columns=mkeys)
            if e.get("parts"):
                out.update(k for k in e["parts"] if k)
            else:
                out |= self._affected_keys(man, p)
            app_parts.append(p)
        appended_keys = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), app_parts
        ).select(*mkeys).distinct()
        base_man = dict(man)
        base_man["merges"] = []
        shadowed = self._read_owned(base_man).join(
            appended_keys, mkeys, "leftsemi"
        )
        out |= self._affected_keys(man, shadowed)
        return out

    def _check_merge_schema(
        self, manifest: dict, source: DataFrame, schema_evolution: bool
    ) -> None:
        if schema_evolution:
            return
        target_cols = {
            f.name for f in T.StructType.fromJson(json.loads(manifest["schema"]))
        }
        if set(source.columns) != target_cols:
            extra = sorted(set(source.columns) - target_cols)
            missing = sorted(target_cols - set(source.columns))
            raise ValueError(
                f"merge source schema differs from table (extra={extra}, "
                f"missing={missing}); pass schema_evolution=True to widen"
            )

    # -- public surface ----------------------------------------------------

    _MAX_COMMIT_RETRIES = 10

    def write(self, df: DataFrame, op: str = "write") -> int:
        """Full-snapshot write: the new version owns every partition.
        Data lands once under a fresh token; a commit conflict only
        re-claims the next version number (replace-table semantics
        don't depend on the manifest we lost to)."""
        df = self._enforce(df)
        token = self._new_token()
        keys = self._write_data(df, token)
        for _ in range(self._MAX_COMMIT_RETRIES):
            try:
                return self._commit(
                    self._next_version(),
                    {k: token for k in keys},
                    op,
                    df.schema.json(),
                    merges=[],
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"write lost {self._MAX_COMMIT_RETRIES} version races at {self.path}"
        )

    def _row_count_from_footers(self, version: int | None = None) -> int | None:
        """Exact committed row count summed from parquet footer
        metadata — driver-side, zero Spark jobs. Returns None (caller
        falls back to a count() job) when pending merge-on-read state
        (appends or deletes) makes footer sums wrong, or any footer
        is unreadable. The cheap path for small metadata tables whose
        row count gates a plan-shape decision (e.g. the IVF
        literal-vs-frame centroid switch)."""
        import pyarrow.parquet as pq

        man = self._manifest(version)
        if man.get("merges") or man.get("deletes"):
            return None
        total = 0
        for key, tok in man["owners"].items():
            d = os.path.join(self._vdir(tok), key) if key else self._vdir(tok)
            if not os.path.isdir(d):
                return None
            for f in os.listdir(d):
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    try:
                        total += pq.read_metadata(
                            os.path.join(d, f)
                        ).num_rows
                    except Exception:
                        return None
        return total

    @staticmethod
    def row_group_stats(
        paths: "Sequence[str]", columns: "Sequence[str]"
    ) -> "dict[str, list[dict]]":
        """Per-ROW-GROUP footer stats for named data files —
        driver-side, zero Spark jobs (the row-group-granularity
        sibling of the manifest's per-file stats). Returns
        ``{path: [{col: (min, max), "rows": n}, ...]}`` with one dict
        per row group in file order; a column whose statistics are
        absent for a group is omitted from that group's dict
        (evidence-based callers must then keep the group).
        Unreadable files are omitted entirely — same keep-on-no-
        evidence contract."""
        import pyarrow.parquet as pq

        out: dict[str, list[dict]] = {}
        for path in paths:
            try:
                md = pq.ParquetFile(path).metadata
            except Exception:
                continue
            names = {
                md.schema.column(i).name: i
                for i in range(md.num_columns)
            }
            groups = []
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                entry: dict = {"rows": g.num_rows}
                for c in columns:
                    ci = names.get(c)
                    if ci is None:
                        continue
                    st = g.column(ci).statistics
                    if (
                        st is None
                        or not st.has_min_max
                        or st.min is None
                        or st.max is None
                    ):
                        continue
                    mn, mx = st.min, st.max
                    if isinstance(mn, bytes):
                        try:
                            mn = mn.decode("utf-8")
                            mx = mx.decode("utf-8")
                        except UnicodeDecodeError:
                            continue
                    entry[c] = (mn, mx)
                groups.append(entry)
            out[path] = groups
        return out

    def read(
        self,
        version: int | None = None,
        partitions: Sequence[str] | None = None,
        where: str | None = None,
        exclude_files: "set[str] | None" = None,
    ) -> DataFrame:
        """Snapshot read, optionally restricted to named partition keys
        (``"dt=2024-01-01"`` form): structural pruning — only the
        owner dirs of the named partitions are even LISTED, so a
        one-partition read of a 100 TB table touches one directory.
        Unknown keys fail loudly (a silent empty read hides typos).

        ``where`` (a Spark SQL boolean expression) is ALWAYS applied
        as a filter; additionally, when it decomposes into an AND of
        simple comparisons, partition values and manifest file stats
        prune whole directories and files before Spark lists them
        (data skipping — see ``plan_scan`` for what a predicate
        saves). Complex predicates silently degrade to filter-only.

        ``exclude_files`` drops named OWNED data files from the scan —
        CALLER-OWNED correctness for callers holding their own
        manifest-stats evidence (the block-max candidate skip); rows
        living only in those files silently vanish from the result,
        so never pass paths you can't prove irrelevant. Pending MoR
        appends are always resolved regardless."""
        man = self._manifest(version)
        if partitions is not None:
            # a partition may exist ONLY in pending merge-on-read
            # appends (its first rows landed MoR and no rewrite has
            # localized them yet) — it is readable (the resolved
            # appends are keys-predicate-scoped below), so it must be
            # addressable too, or bucket-pruned readers would silently
            # miss freshly appended buckets
            pending_parts = {
                k
                for e in (man.get("merges") or [])
                for k in (e.get("parts") or [])
            }
            missing = set(partitions) - set(man["owners"]) - pending_parts
            if missing:
                raise ValueError(
                    f"unknown partitions {sorted(missing)}; "
                    f"table has {sorted(man['owners'])}"
                )
        conjs = _parse_conjuncts(where) if where else []
        df = self._read_owned(
            man,
            keys=partitions,
            conjuncts=conjs or None,
            exclude_files=exclude_files,
        )
        if where:
            df = df.where(F.expr(where))
        return df

    def plan_scan(
        self,
        where: str | None = None,
        version: int | None = None,
        partitions: Sequence[str] | None = None,
    ) -> dict:
        """What ``read(where=...)`` would actually open: partition and
        file counts before/after predicate pruning, plus whether the
        predicate was prunable at all. Planning-time observability —
        no Spark job runs."""
        man = self._manifest(version)
        conjs = _parse_conjuncts(where) if where else []
        _, report = self._select_files(man, partitions, conjs)
        # pending merge-on-read appends are always read in full (no
        # stats are kept for them until a rewrite localizes) — count
        # them so the report reflects what the scan actually opens.
        # The walk covers PARTITIONED pending appends too (their files
        # live in key subdirectories, not the token root)
        for e in man.get("merges") or []:
            d = self._vdir(e["token"])
            n = 0
            if os.path.isdir(d):
                for root, _dirs, files in os.walk(d):
                    n += sum(
                        1
                        for f in files
                        if f.endswith(".parquet")
                        and not f.startswith(("_", "."))
                    )
            report["files_total"] += n
            report["files_scanned"] += n
        report["prunable"] = bool(conjs)
        return report

    def restore(self, version: int) -> int:
        """Zero-copy rollback (Delta RESTORE semantics): commit a NEW
        version whose owners map is the target version's — no data is
        copied or rewritten, the old immutable token dirs are simply
        re-referenced, and history keeps both the bad versions and the
        restore itself (an audit trail, not an erasure). Keep-last-N
        vacuum naturally retains the re-referenced dirs because the
        restore manifest owns them.

        The target manifest must still exist (not vacuumed past the
        retention horizon) — _manifest raises otherwise."""
        target = self._manifest(version)
        for _ in range(self._MAX_COMMIT_RETRIES):
            try:
                return self._commit(
                    self._next_version(),
                    dict(target["owners"]),
                    f"restore(v{version})",
                    target["schema"],
                    # the restored snapshot includes the target's
                    # merge-on-read delete and merge sets, not the
                    # latest's
                    deletes=list(target.get("deletes") or []),
                    merges=list(target.get("merges") or []),
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"restore lost {self._MAX_COMMIT_RETRIES} version races at {self.path}"
        )

    def clone(
        self,
        target_path: str,
        version: int | None = None,
        shallow: bool = True,
    ) -> "LakeTable":
        """Delta-style CLONE: an independent table at ``target_path``
        seeded from this table's snapshot.

        ``shallow=True`` (default) commits a v0 manifest whose owners
        point at THIS table's immutable token dirs by absolute path —
        zero bytes move, O(metadata) even for a 100 TB table, and the
        snapshot's file stats, pending merge-on-read appends, delete
        predicates, and CHECK constraints all carry over (stats by key
        translation, not a re-read). The clone's own writes land under
        its OWN data dir; every rewrite localizes the partitions it
        touches (copy-on-write), so the clone diverges incrementally.
        The clone's ``vacuum`` never touches the source's dirs (they
        live outside its data dir); the SOURCE vacuuming referenced
        dirs away breaks the clone — the same retention caveat Delta
        shallow clones carry. The dev/test-fork primitive.

        ``shallow=False`` materializes the RESOLVED snapshot (deletes
        applied, appends merged) into a fully self-contained table —
        one data copy."""
        man = self._manifest(version)
        dst = LakeTable(
            self.spark,
            target_path,
            constraints=dict(man.get("constraints") or {}) or None,
        )
        if dst.current_version() is not None:
            raise ValueError(f"clone target {target_path} already has commits")
        dst.partition_by = tuple(man["partition_by"])
        # the snapshot's files keep their bloom filters — carry the
        # probe hint so the clone's point lookups still skip on them
        dst.bloom_filter_columns = {
            c: None for c in man.get("bloom_columns") or []
        }
        if not shallow:
            dst.write(
                self._read_owned(man), op=f"clone({self.path}@v{man['version']})"
            )
            return dst

        def absolutize(tok: str) -> str:
            return tok if os.path.isabs(tok) else self._vdir(tok)

        owners = {k: absolutize(t) for k, t in man["owners"].items()}
        # stats keys are "<token>/<key>/<file>" — re-root the token
        # segment so the clone's lookups match its absolute owners
        stats = {}
        for pth, st in (man.get("stats") or {}).items():
            for k, t in man["owners"].items():
                prefix = f"{t}/{k}/" if k else f"{t}/"
                if pth.startswith(prefix):
                    stats[absolutize(t) + pth[len(t):]] = st
                    break
        merges = [
            {**e, "token": absolutize(e["token"])}
            for e in man.get("merges") or []
        ]
        deletes = [
            {"pred": e["pred"], "tokens": [absolutize(t) for t in e["tokens"]]}
            for e in man.get("deletes") or []
        ]
        dst._commit(
            0,
            owners,
            f"clone({self.path}@v{man['version']})",
            man["schema"],
            deletes=deletes,
            merges=merges,
            stats=stats,
        )
        return dst

    def evolve_partitioning(
        self, partition_by: Sequence[str], migrate: str = "metadata"
    ) -> int:
        """Change the table's partition scheme as a versioned commit
        (Iceberg partition-spec evolution; Delta has no counterpart —
        it makes you rewrite the table).

        ``migrate='metadata'`` (default, the 100 TB path): commits a
        manifest with the new scheme and the UNCHANGED owners map — no
        data moves. Existing directories keep their old layout (each
        owners key encodes the layout it was written under); new
        writes land under the new scheme; snapshot reads union both
        layouts transparently; mutations carry legacy partitions off
        as they touch them, so the table migrates incrementally. A
        full ``optimize()`` finishes the migration in one pass when
        wanted.

        ``migrate='rewrite'``: rewrites the current snapshot under the
        new scheme immediately — bounded tables, or when structural
        partition pruning on the new keys must hold for every existing
        row right away.

        Either way, every EARLIER version stays readable under the
        layout it was committed with (``read(version=...)`` is
        manifest-faithful), and ``history()`` shows the scheme per
        version. New-scheme columns must already exist in the table
        schema — evolve partitioning and schema in separate commits."""
        if migrate not in ("metadata", "rewrite"):
            raise ValueError(f"migrate must be metadata|rewrite, got {migrate!r}")
        new = tuple(partition_by)
        for _ in range(self._MAX_COMMIT_RETRIES):
            man = self._manifest()
            cols = {f.name for f in T.StructType.fromJson(json.loads(man["schema"]))}
            missing = [c for c in new if c not in cols]
            if missing:
                raise ValueError(
                    f"partition columns {missing} not in table schema; "
                    "evolve the schema first (write/upsert with "
                    "schema_evolution), then the partitioning"
                )
            if man.get("merges"):
                raise ValueError(
                    "table has pending merge-on-read appends; resolve "
                    "them (optimize()) before evolving partitioning"
                )
            if tuple(man["partition_by"]) == new:
                self.partition_by = new
                return man["version"]  # already the current scheme
            self.partition_by = new
            if migrate == "rewrite":
                df = self._read_owned(man)
                token = self._new_token()
                owners = {k: token for k in self._write_data(df, token)}
            else:
                owners = dict(man["owners"])
            try:
                return self._commit(
                    man["version"] + 1,
                    owners,
                    f"evolve_partitioning({','.join(new) or '-'},{migrate})",
                    man["schema"],
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"evolve_partitioning lost {self._MAX_COMMIT_RETRIES} version "
            f"races at {self.path}"
        )

    def upsert(
        self,
        source: DataFrame,
        keys: Sequence[str],
        when_matched: str = "update",
        schema_evolution: bool = False,
        mode: str = "cow",
        assume_key_unique: bool = False,
        partition_scoped: bool = False,
    ) -> int:
        """MERGE: match target rows to ``target`` on ``keys``; matched
        rows are replaced by their source row (``update``) or removed
        (``delete``); unmatched source rows are inserted (ignored for
        ``delete``). Only affected partitions are rewritten.

        ``schema_evolution=True`` is Delta's ``mergeSchema``: source
        columns absent from the target are added (NULL for carried
        rows), target columns absent from the source survive (NULL for
        inserted rows). Off by default so a malformed source fails
        loudly instead of silently widening the table.

        ``mode='mor'`` (merge-on-read, Hudi MOR spirit;
        ``when_matched='update'``): the source lands as an APPEND
        under a fresh token plus a manifest merge entry — write cost
        is O(source), never O(matched partitions). Reads resolve
        newest-append-wins per key (anti-join base + per-key window
        over appends only); any rewrite (CoW upsert, ``delete_where``,
        ``optimize``) materializes and clears pending entries. The
        high-frequency small-upsert path: a 1000-row merge into a
        100 TB table moves 1000 rows. Partitioned tables append under
        the table's layout, and resolution is GLOBAL on ``keys`` — an
        update may move a key across partitions; the old partition's
        stale row stays shadowed until a rewrite carries it off. The
        source must hold one row per key (no ordering column means no
        deterministic within-batch winner) — violations raise;
        ``assume_key_unique=True`` skips that verification job when
        uniqueness is guaranteed upstream (e.g. ``merge_batch``
        collapses first). ``when_matched='delete'`` appends KEY
        TOMBSTONES instead (Hudi delete-record spirit): O(keys)
        metadata+append where a predicate string can't scale to a
        large key set; the source may be a bare key frame, and a later
        append for the same key re-inserts it.

        ``partition_scoped=True`` declares that a matched target row
        can only live in the partitions the SOURCE rows name — true
        exactly when the partition columns are a pure function of the
        merge keys (hash-prefix-bucketed ledgers, date extracted from
        a keyed event time). The copy-on-write match probe then skips
        the full-table scan that otherwise finds which partitions hold
        matched keys: a 1000-row merge into a 100 TB bucketed ledger
        reads only the touched buckets. The caller OWNS the invariant
        — a matched row outside the source's partitions would silently
        survive as a stale duplicate. Layout-safe across partition-spec
        evolution (the source rows are keyed under every stored
        layout).

        Concurrency: the merge is computed against a manifest read,
        and the commit targets exactly ``read_version + 1`` — if any
        writer committed in between, the O_EXCL claim fails and the
        WHOLE merge recomputes from the fresh manifest (optimistic
        concurrency; the orphaned attempt dir is reaped by vacuum)."""
        if when_matched not in ("update", "delete"):
            raise ValueError(f"when_matched must be update|delete: {when_matched}")
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be cow|mor, got {mode!r}")
        keys = list(keys)
        if mode == "mor":
            return self._upsert_mor(
                source, keys, when_matched, schema_evolution,
                assume_key_unique=assume_key_unique,
            )
        if when_matched == "update":
            # incoming rows face the table's CHECK constraints; carried
            # rows were validated when they landed
            source = self._enforce(source)
        for _ in range(self._MAX_COMMIT_RETRIES):
            if self.current_version() is None:
                # first merge into an empty table: everything inserts
                if when_matched == "delete":
                    raise FileNotFoundError(
                        f"no table to delete from at {self.path}"
                    )
                token = self._new_token()
                written = self._write_data(source, token)
                try:
                    return self._commit(
                        0,
                        {k: token for k in written},
                        "merge_update",
                        source.schema.json(),
                        merges=[],
                    )
                except ConcurrentWriteError:
                    continue  # table appeared: re-enter as a real merge
            man = self._manifest()
            self._check_merge_schema(man, source, schema_evolution)
            if not self.partition_by:
                target = self._read_owned(man)
                survivors = target.join(
                    source.select(*keys).distinct(), keys, "left_anti"
                )
                new = (
                    survivors
                    if when_matched == "delete"
                    else survivors.unionByName(
                        source, allowMissingColumns=schema_evolution
                    )
                )
                token = self._new_token()
                written = self._write_data(new, token)
                try:
                    return self._commit(
                        man["version"] + 1,
                        {k: token for k in written},
                        f"merge_{when_matched}",
                        new.schema.json(),
                        merges=[],  # the rewrite read resolved them
                    )
                except ConcurrentWriteError:
                    continue
            else:
                src_keys = source.select(*keys).distinct()
                if partition_scoped:
                    # caller-declared: matched rows live only in the
                    # source's partitions (partition cols derive from
                    # the merge keys) — no target scan; keyed under
                    # every stored layout so pre-evolution directories
                    # are still carried off
                    affected = self._affected_keys(man, source)
                else:
                    target_all = self._read_owned(man)
                    # partitions holding matched rows (an update may
                    # move a key across partitions, so this is NOT
                    # just the source's partitions) — keyed under
                    # every layout in the owners map, so rows still
                    # stored under a pre-evolution layout are carried
                    # off too
                    matched = target_all.join(src_keys, keys, "leftsemi")
                    affected = self._affected_keys(man, matched) | {
                        _fmt_key(self.partition_by, r)
                        for r in source.select(*self.partition_by)
                        .distinct()
                        .collect()
                    }
                # pending merge-on-read appends materialize through
                # this rewrite (it commits merges=[]), so every
                # partition they touch — including old homes of moved
                # keys — must be carried through the rewrite too
                affected |= self._merge_affected_keys(man)
                affected_existing = [k for k in affected if k in man["owners"]]
                # merge_scope='all': resolved append rows must ALL flow
                # into the rewrite, even ones landing in partitions that
                # have no owner directory yet
                target_affected = self._read_owned(
                    man, affected_existing, merge_scope="all"
                )
                survivors = target_affected.join(src_keys, keys, "left_anti")
                new = (
                    survivors
                    if when_matched == "delete"
                    else survivors.unionByName(
                        source, allowMissingColumns=schema_evolution
                    )
                )
                token = self._new_token()
                written = set(self._write_data(new, token))
                owners = {
                    k: v for k, v in man["owners"].items() if k not in affected
                }
                owners.update({k: token for k in written})
                try:
                    return self._commit(
                        man["version"] + 1,
                        owners,
                        f"merge_{when_matched}",
                        new.schema.json(),
                        merges=[],  # the scoped rewrite resolved them
                    )
                except ConcurrentWriteError:
                    continue
        raise ConcurrentWriteError(
            f"merge lost {self._MAX_COMMIT_RETRIES} version races at {self.path}"
        )

    def _assert_key_unique(
        self, token: str, keys: list[str], schema: T.StructType
    ) -> None:
        """Fail loudly when a merge-on-read batch holds multiple rows
        per key: newest-wins WITHIN a batch has no ordering column, so
        any silent winner choice is partition-layout-dependent and two
        replays could commit different values (Delta MERGE raises the
        same way on multiple matching source rows). Checked on the
        already-WRITTEN token so a non-deterministic source is
        evaluated exactly once; an abort strands the staging dir for
        vacuum to reap. ``schema`` is the SOURCE schema the token was
        staged from (there may be no manifest yet on a first commit) —
        reading with it keeps dir-derived key values off the
        partition-type-inference path (see ``_token_frame``)."""
        keep = set(keys) | set(self.partition_by)
        fields = T.StructType([f for f in schema.fields if f.name in keep])
        dup = (
            self.spark.read.schema(fields)
            .parquet(self._vdir(token))
            .groupBy(*keys)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "merge-on-read source has multiple rows per key "
                f"{keys}: within-batch newest-wins would be "
                "non-deterministic. Collapse the batch to one row per "
                "key first (dedup_latest with an explicit ordering), "
                "or pass assume_key_unique=True if uniqueness is "
                "guaranteed upstream."
            )

    _TOMBSTONE = "__dtk_tombstone"

    def _upsert_mor(
        self,
        source: DataFrame,
        keys: list[str],
        when_matched: str,
        schema_evolution: bool,
        assume_key_unique: bool = False,
    ) -> int:
        if schema_evolution:
            raise ValueError(
                "merge-on-read upsert does not support schema_evolution; "
                "use mode='cow' to widen the table"
            )
        delete = when_matched == "delete"
        if not delete:
            source = self._enforce(source)
        for _ in range(self._MAX_COMMIT_RETRIES):
            if self.current_version() is None:
                if delete:
                    raise FileNotFoundError(
                        f"no table to delete from at {self.path}"
                    )
                token = self._new_token()
                written = self._write_data(source, token)
                if written and not assume_key_unique:
                    self._assert_key_unique(token, keys, source.schema)
                try:
                    return self._commit(
                        0,
                        {k: token for k in written},
                        "merge_update",
                        source.schema.json(),
                        merges=[],
                    )
                except ConcurrentWriteError:
                    continue
            man = self._manifest()
            missing = [k for k in keys if k not in source.columns]
            if missing:
                raise ValueError(f"merge keys {missing} not in source")
            if delete:
                # O(keys) tombstone delete (Hudi delete-record spirit):
                # append rows carrying ONLY the key values plus a
                # tombstone flag; resolution drops any key whose
                # newest append is a tombstone. The source may be a
                # bare key frame — non-key columns are nulled to the
                # table schema (a key-valued partition column still
                # places the tombstone in the victim's partition).
                schema = T.StructType.fromJson(json.loads(man["schema"]))
                unknown = [k for k in keys if k not in schema.fieldNames()]
                if unknown:
                    raise ValueError(
                        f"merge keys {unknown} not in table schema"
                    )
                src = source.select(
                    *[
                        (
                            F.col(f.name).cast(f.dataType)
                            if f.name in keys
                            else F.lit(None).cast(f.dataType)
                        ).alias(f.name)
                        for f in schema.fields
                    ]
                ).withColumn(self._TOMBSTONE, F.lit(True))
                # duplicate tombstones for one key are identical rows —
                # collapsing them is deterministic by construction
                src = src.dropDuplicates(keys)
            else:
                self._check_merge_schema(man, source, False)
                src = source
            prior = list(man.get("merges") or [])
            if prior and list(prior[0]["keys"]) != keys:
                raise ValueError(
                    f"pending merge-on-read entries use keys "
                    f"{prior[0]['keys']}; resolve them (optimize()) "
                    f"before merging on {keys}"
                )
            token = self._new_token()
            # partitioned tables append under the SAME layout as the
            # base (partition dirs under the token); the entry records
            # the touched partition keys so rewrites can scope their
            # materialization without re-deriving them
            written = self._write_data(src, token)
            if self.partition_by and not written:
                # zero-row source: an empty partitioned write leaves no
                # readable files — a merge entry pointing at it would
                # wedge every snapshot read. No-op instead.
                shutil.rmtree(self._vdir(token), ignore_errors=True)
                return man["version"]
            if not delete and not assume_key_unique:
                self._assert_key_unique(token, keys, src.schema)
            seq = max((e["seq"] for e in prior), default=0) + 1
            entry = {"token": token, "keys": keys, "seq": seq}
            if self.partition_by:
                entry["parts"] = sorted(written)
            if delete:
                entry["delete"] = True
            try:
                v = self._commit(
                    man["version"] + 1,
                    dict(man["owners"]),
                    "merge_mor_delete" if delete else "merge_mor",
                    man["schema"],
                    merges=prior + [entry],
                )
            except ConcurrentWriteError:
                continue
            return self._maybe_auto_compact(v)
        raise ConcurrentWriteError(
            f"merge lost {self._MAX_COMMIT_RETRIES} version races at {self.path}"
        )

    def _maybe_auto_compact(self, version: int) -> int:
        """Post-commit compaction trigger: evaluate the
        ``auto_compact_after`` policy against the just-committed
        manifest and, when a threshold is crossed, drain pending
        merge-on-read state — a scoped ``optimize()`` over the
        merge-touched partitions for the merges/append_ratio
        triggers, a full one for the deletes trigger (predicate
        entries' token coverage spans the table). Returns the
        (possibly advanced) current version; readers on the prior
        version stay consistent — compaction is just another commit."""
        pol = self.auto_compact_after
        if not pol:
            return version
        man = self._manifest(version)
        merges = man.get("merges") or []
        deletes = man.get("deletes") or []
        full = (
            pol.get("deletes") is not None
            and len(deletes) >= pol["deletes"]
        )
        scoped = (
            pol.get("merges") is not None
            and len(merges) >= pol["merges"]
        )
        ratio = pol.get("append_ratio")
        if not full and not scoped and ratio is not None and merges:
            # appended files per pending token (cheap: bounded by the
            # merges threshold) vs base files from the stats map (free:
            # already in memory). No stats -> the ratio never fires.
            base = len(man.get("stats") or {})
            if base:
                appended = 0
                for e in merges:
                    for _root, _dirs, files in os.walk(
                        self._vdir(e["token"])
                    ):
                        appended += sum(
                            1
                            for f in files
                            if f.endswith(".parquet")
                            and not f.startswith(("_", "."))
                        )
                scoped = appended / base >= ratio
        if full:
            return self.optimize()
        if scoped:
            if self.partition_by and man["owners"]:
                # partitions=[] scopes to nothing and lets optimize()
                # widen to exactly the merge-affected partitions
                return self.optimize(partitions=[])
            return self.optimize()
        return version

    def delete_where(self, condition, mode: str = "cow") -> int:
        """Row delete. ``mode='cow'`` (default) rewrites affected
        partitions without the matching rows — read cost stays flat,
        write cost is O(affected partition data).

        ``mode='mor'`` (merge-on-read, Iceberg delete-file spirit):
        commits ONLY a predicate entry scoped to the tokens existing
        right now — zero data movement, O(metadata), the path for
        point deletes on a 100 TB table. Every read anti-applies the
        predicate to those tokens; rows inserted later are immune
        (they land under fresh tokens); any rewrite of a partition
        (upsert touching it, ``optimize``) materializes the delete and
        drops its token from the entry, so entries drain as the table
        churns and a full ``optimize()`` clears them. Requires a SQL
        string condition (it is re-evaluated at read time, so it must
        be deterministic over row values); predicates stack until
        compaction, trading a per-read filter for the rewrite."""
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be cow|mor, got {mode!r}")
        # a string condition must become an EXPRESSION before it meets
        # F.coalesce below — a bare string there is read as a column
        # NAME and fails analysis on any real predicate
        cond = F.expr(condition) if isinstance(condition, str) else condition
        if mode == "mor":
            if not isinstance(condition, str):
                raise TypeError(
                    "merge-on-read delete needs a SQL string condition "
                    "(it is stored in the manifest and re-evaluated at "
                    "read time)"
                )
            for _ in range(self._MAX_COMMIT_RETRIES):
                man = self._manifest()
                # parse AND resolve the predicate against the table
                # schema now — F.expr alone is lazy, and a predicate
                # that only fails at read time would wedge every
                # future snapshot read
                self.spark.createDataFrame(
                    [], T.StructType.fromJson(json.loads(man["schema"]))
                ).where(condition)
                entry = {
                    "pred": condition,
                    "tokens": sorted(
                        set(man["owners"].values())
                        | {e["token"] for e in man.get("merges") or []}
                    ),
                }
                # pending merge tokens are live too: a prior delete
                # whose only coverage is an un-compacted MoR append
                # must carry, or its rows resurrect on the next read
                carried = self._carried_deletes(
                    man["version"] + 1,
                    man["owners"],
                    man.get("merges") or [],
                )
                try:
                    v = self._commit(
                        man["version"] + 1,
                        dict(man["owners"]),
                        "delete_mor",
                        man["schema"],
                        deletes=carried + [entry],
                    )
                except ConcurrentWriteError:
                    continue
                return self._maybe_auto_compact(v)
            raise ConcurrentWriteError(
                f"delete lost {self._MAX_COMMIT_RETRIES} version races "
                f"at {self.path}"
            )
        for _ in range(self._MAX_COMMIT_RETRIES):
            man = self._manifest()
            target_all = self._read_owned(man)
            if not self.partition_by:
                new = target_all.where(~F.coalesce(cond, F.lit(False)))
                token = self._new_token()
                written = self._write_data(new, token)
                owners = {k: token for k in written}
            else:
                affected = self._affected_keys(
                    man, target_all.where(cond)
                )
                # pending merge-on-read appends materialize through this
                # rewrite (merges=[]): carry every partition they touch
                affected |= self._merge_affected_keys(man)
                affected_existing = [k for k in affected if k in man["owners"]]
                new = self._read_owned(
                    man, affected_existing, merge_scope="all"
                ).where(~F.coalesce(cond, F.lit(False)))
                token = self._new_token()
                written = set(self._write_data(new, token))
                owners = {
                    k: v for k, v in man["owners"].items() if k not in affected
                }
                owners.update({k: token for k in written})
            try:
                return self._commit(
                    man["version"] + 1,
                    owners,
                    "delete",
                    new.schema.json(),
                    merges=[],  # the rewrite read resolved them
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"delete lost {self._MAX_COMMIT_RETRIES} version races at {self.path}"
        )

    def optimize(
        self,
        sort_by: Sequence[str] = (),
        zorder_by: Sequence[str] = (),
        partitions: Sequence[str] | None = None,
    ) -> int:
        """Compact the current snapshot into one fresh version (file
        sizing via the rebalance hint; stale versions become vacuum
        candidates).

        With ``sort_by``, files are range-clustered lexicographically —
        tight min/max on the LEADING column. With ``zorder_by`` (2+
        numeric columns), files cluster on an interleaved-bit Z-value
        so every listed column gets bounded per-file spans — Delta's
        OPTIMIZE ZORDER: scans with predicates on ANY z-column skip
        files on parquet min/max stats. Mutually exclusive.

        ``partitions`` scopes the rewrite to the named partition keys
        (``"dt=2024-01-01"`` form, as in the manifest owners map) —
        Delta's ``OPTIMIZE ... WHERE``: at 100 TB you compact the hot
        recent partitions, never the whole table; untouched partitions
        keep their current owner dirs in the new manifest."""
        if sort_by and zorder_by:
            raise ValueError("sort_by and zorder_by are mutually exclusive")
        for _ in range(self._MAX_COMMIT_RETRIES):
            man = self._manifest()
            if partitions is not None:
                missing = set(partitions) - set(man["owners"])
                if missing:
                    raise ValueError(
                        f"unknown partitions {sorted(missing)}; "
                        f"table has {sorted(man['owners'])}"
                    )
            scope = partitions
            if partitions is not None and man.get("merges"):
                # a scoped compaction still clears ALL pending appends
                # (merges=[]) — widen the scope to the partitions they
                # touch so their rows (and moved keys' old homes)
                # materialize instead of vanishing
                extra = self._merge_affected_keys(man)
                scope = sorted(
                    set(partitions) | {k for k in extra if k in man["owners"]}
                )
            df = self._read_owned(man, keys=scope, merge_scope="all")
            token = self._new_token()
            keys = self._write_data(df, token, cluster_by=sort_by, zorder_by=zorder_by)
            # carry only UNSCOPED partitions: a scoped partition whose
            # resolved content is now empty (rows moved away by a
            # pending append, or fully MoR-deleted) must drop out, not
            # keep pointing at its stale pre-resolution files
            owners = (
                {
                    k: v
                    for k, v in man["owners"].items()
                    if k not in set(scope)
                }
                if partitions is not None
                else {}
            )
            owners.update({k: token for k in keys})
            try:
                return self._commit(
                    man["version"] + 1,
                    owners,
                    "optimize",
                    df.schema.json(),
                    merges=[],  # compaction materialized pending appends
                )
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"optimize lost {self._MAX_COMMIT_RETRIES} version races at {self.path}"
        )

    def _key_range_conjuncts(
        self, app_keys: DataFrame, ekeys: Sequence[str]
    ) -> list[tuple] | None:
        """Min/max range conjuncts over a delta's append keys, used to
        stat-prune the shadowed-old-home base probe in ``changes()``
        down to files whose key ranges overlap the appends. Returns
        None when no base row can possibly match — empty delta, or an
        all-NULL key column (the equality semijoin matches nothing).
        A key whose bounds don't encode JSON-safely (decimal, binary)
        contributes no conjunct; the probe still runs, just unpruned
        on that column."""
        aggs = []
        for k in ekeys:
            aggs += [F.min(k).alias(f"__mn_{k}"), F.max(k).alias(f"__mx_{k}")]
        row = app_keys.agg(*aggs).first()
        out: list[tuple] = []
        for k in ekeys:
            mn, mx = row[f"__mn_{k}"], row[f"__mx_{k}"]
            if mn is None:
                return None
            lo, hi = _json_safe_stat(mn), _json_safe_stat(mx)
            if lo is not None and hi is not None:
                out += [(k, ">=", lo), (k, "<=", hi)]
        return out

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Change data feed between two versions: each changed row
        tagged ``_change_type`` ('insert' | 'delete'; an update is a
        delete+insert pair, Delta CDF's minimal encoding).

        Scale: the owners maps tell exactly which partitions changed
        hands between the manifests — only those are read and diffed.
        Untouched partitions (same owning data version) contribute
        nothing and are never scanned, so cost is O(changed
        partitions), not two snapshot scans."""
        m_from = self._manifest(from_version)
        m_to = self._manifest(to_version)
        own_f, own_t = m_from["owners"], m_to["owners"]

        # a merge-on-read delete changes no owner, but it changes which
        # predicates apply to a partition's token — keys whose
        # applicable delete set differs between the manifests changed
        # logically and must be diffed too
        def applicable(man, key):
            tok = man["owners"].get(key)
            return [
                e["pred"]
                for e in man.get("deletes") or []
                if tok is not None and tok in e["tokens"]
            ]

        # pending merge-on-read entries that differ between the
        # manifests change rows WITHOUT changing owners — but only in
        # (a) the partitions the delta entries' append rows land in
        # (inserts/updates, possibly partitions with no owner dir yet)
        # and (b) the partitions of base rows those appends' keys
        # shadow on either side (a moved key's old home sees a delete
        # event). Scoping to that set keeps CDF after a small MoR
        # append O(touched partitions), not a two-snapshot diff —
        # matview refresh rides this path on every increment.
        merges_f = m_from.get("merges") or []
        merges_t = m_to.get("merges") or []
        merge_changed: set[str] = set()
        if merges_f != merges_t:
            all_keys = set(own_f) | set(own_t)
            if all(not _key_spec(k) for k in all_keys):
                merge_changed = all_keys | {""}  # unpartitioned blob
            else:
                delta = [e for e in merges_t if e not in merges_f] + [
                    e for e in merges_f if e not in merges_t
                ]
                # each entry names its OWN key set: across a rewrite
                # boundary the delta can mix merges committed on
                # different keys (and a key-tombstone token holds only
                # its own key columns), so selection must be per entry
                key_parts: dict[tuple, list[DataFrame]] = {}
                for e in delta:
                    p = self._token_frame(e["token"], m_to, columns=e["keys"])
                    if e.get("parts"):
                        merge_changed |= {k for k in e["parts"] if k}
                    else:
                        merge_changed |= self._affected_keys(m_to, p)
                    ekeys = tuple(e["keys"])
                    key_parts.setdefault(ekeys, []).append(p.select(*ekeys))
                # shadowed old homes: only possible when a key can MOVE
                # partitions — with every partition column inside the
                # merge keys, the shadowed row shares the append row's
                # partition and the probe (a stat-pruned base read +
                # semijoin against the small append-key set) is
                # skipped entirely
                specs = {_key_spec(k) for k in all_keys if k}
                specs.add(tuple(self.partition_by))
                for ekeys, parts in key_parts.items():
                    if all(set(s) <= set(ekeys) for s in specs):
                        continue
                    app_keys = reduce(
                        lambda a, b: a.unionByName(b), parts
                    ).distinct()
                    # prune the base probe with the appends' key
                    # ranges: only files whose manifest min/max stats
                    # overlap the delta keys are listed — a small MoR
                    # append on a large table probes O(overlapping
                    # files), not the whole base
                    conjs = self._key_range_conjuncts(app_keys, ekeys)
                    if conjs is None:
                        continue  # nothing the semijoin could match
                    for man in (m_from, m_to):
                        base_man = dict(man)
                        base_man["merges"] = []
                        shadowed = self._read_owned(
                            base_man, conjuncts=conjs
                        ).join(app_keys, list(ekeys), "leftsemi")
                        merge_changed |= self._affected_keys(man, shadowed)
        changed = [
            k
            for k in set(own_f) | set(own_t)
            if k in merge_changed
            or own_f.get(k) != own_t.get(k)
            or applicable(m_from, k) != applicable(m_to, k)
        ] + sorted(merge_changed - set(own_f) - set(own_t))
        # BOTH sides read the full changed set: a key with no owner dir
        # in one manifest can still surface rows there through pending
        # appends (the key predicate on the resolved winners is what
        # scopes them, not the directory listing)
        before = self._read_owned(m_from, changed)
        after = self._read_owned(m_to, changed)
        # conform both sides to the union of columns so evolved
        # schemas diff cleanly (missing columns read as NULL)
        empty = self.spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(m_to["schema"]))
        )
        before = before.unionByName(empty, allowMissingColumns=True)
        after = after.unionByName(empty, allowMissingColumns=True)
        cols = after.columns
        before = before.select(*cols)
        # Pure merge-on-read window (owners unchanged, the from-side
        # merge/delete entries carried verbatim, only NEW entries
        # appended — the CDF-sync hot path): a row can differ between
        # the snapshots ONLY if its key appears in a delta append
        # token (insert/update/tombstone) or it matches a delta delete
        # predicate; every other row resolves from the identical
        # base + identical carried entries on both sides and nets to
        # nothing in the diff. Restricting both sides to those
        # candidates (broadcast semi-join on the mutation-sized key
        # set) keeps the exceptAll shuffles O(mutation) instead of
        # two full-snapshot shuffles of whole rows — guide §8: decide
        # with small rows, never move the payload twice. Gated on the
        # delta tokens being broadcast-small (driver-side file-size
        # check); corpus-scale deltas keep the full diff.
        before, after = self._scope_mor_delta(
            m_from, m_to, merges_f, merges_t, before, after
        )
        deletes = before.exceptAll(after).withColumn(
            "_change_type", F.lit("delete")
        )
        inserts = after.exceptAll(before).withColumn(
            "_change_type", F.lit("insert")
        )
        return deletes.unionByName(inserts)

    def _scope_mor_delta(
        self,
        m_from: dict,
        m_to: dict,
        merges_f: list,
        merges_t: list,
        before: DataFrame,
        after: DataFrame,
    ) -> tuple[DataFrame, DataFrame]:
        """Restrict a pure-MoR change window's diff inputs to the
        candidate rows the delta entries can touch (see changes()).
        Returns the inputs unchanged whenever the window is not
        provably pure-MoR or the delta is not broadcast-small."""
        dels_f = m_from.get("deletes") or []
        dels_t = m_to.get("deletes") or []
        if not (
            m_from["owners"] == m_to["owners"]
            and merges_f == merges_t[: len(merges_f)]
            and dels_f == dels_t[: len(dels_f)]
        ):
            return before, after
        delta_m = merges_t[len(merges_f):]
        delta_d = dels_t[len(dels_f):]
        if not delta_m and not delta_d:
            return before, after
        key_sets = {tuple(e["keys"]) for e in delta_m}
        if len(key_sets) > 1:
            return before, after
        mkeys = list(next(iter(key_sets))) if key_sets else []
        if any(k not in after.columns for k in mkeys):
            return before, after
        # broadcast gate: total bytes of the delta append tokens (the
        # key projection is strictly smaller than the files)
        total = 0
        for e in delta_m:
            d = self._vdir(e["token"])
            for root, _dirs, files in os.walk(d):
                for f in files:
                    if f.endswith(".parquet"):
                        try:
                            total += os.path.getsize(os.path.join(root, f))
                        except OSError:
                            return before, after
        if total > 64 * 1024 * 1024:
            return before, after
        del_cond = None
        for e in delta_d:
            c = F.coalesce(F.expr(e["pred"]), F.lit(False))
            del_cond = c if del_cond is None else (del_cond | c)

        marker = "__dtk_cdf_hit"
        ck = None
        if delta_m:
            ck = F.broadcast(
                reduce(
                    lambda a, b: a.unionByName(b),
                    [
                        self._token_frame(
                            e["token"], m_to, columns=mkeys
                        ).select(*mkeys)
                        for e in delta_m
                    ],
                )
                .distinct()
                .withColumn(marker, F.lit(True))
            )

        def restrict(df: DataFrame) -> DataFrame:
            # ONE pass over the snapshot read: a broadcast left join
            # against the distinct delta keys (at most one match per
            # row — no fan-out) marks candidates; a semi/anti split
            # would evaluate the whole snapshot-resolution subtree
            # twice per side, which costs more than the exceptAll it
            # saves (measured)
            if ck is None:
                return df.where(del_cond)
            out = df.join(ck, mkeys, "left")
            cond = F.coalesce(F.col(marker), F.lit(False))
            # NULL-keyed rows never equi-join, but the per-key window
            # resolution groups nulls together, so a delta append with
            # a null key CAN change which null-keyed row wins — keep
            # every null-keyed row a candidate on both sides
            for k in mkeys:
                cond = cond | F.col(k).isNull()
            if del_cond is not None:
                cond = cond | del_cond
            return out.where(cond).drop(marker)

        return restrict(before), restrict(after)

    def history(self) -> list[dict]:
        out = []
        for v in self._versions():
            m = self._manifest(v)
            out.append(
                {
                    "version": m["version"],
                    "op": m["op"],
                    "ts": m["ts"],
                    "n_partitions": len(m["owners"]),
                    "partition_by": list(m["partition_by"]),
                    "pending_merges": len(m.get("merges") or []),
                    "pending_deletes": len(m.get("deletes") or []),
                }
            )
        return out

    def vacuum(
        self,
        keep_last: int | None = None,
        max_age_sec: float | None = None,
        look_back_sec: float | None = None,
        now: float | None = None,
        staging_grace_sec: float = 3600.0,
        quarantine_max_age_sec: float | None = None,
    ) -> list[int]:
        """Drop old manifests and any data version no retained
        manifest references; returns the dropped manifest versions.

        Age mode mirrors the reference snapshot remover
        (odl_snapshot_redshift.py:119-135): a manifest is dropped iff
        it is older than ``max_age_sec`` AND (when ``look_back_sec``
        is given) younger than the look-back floor — manifests past
        the floor are never touched. ``keep_last`` retains the N
        newest manifests regardless; the current version is always
        kept.

        Unreferenced staging dirs (orphans from lost commit races)
        are reaped only once older than ``staging_grace_sec`` — a
        concurrent writer's not-yet-committed data must survive its
        own vacuum (Delta's retention-window rule).

        ``quarantine_max_age_sec``: also reap ``_quarantine/<token>``
        audit dirs older than the given age. Quarantined rows are an
        inspection sink with no manifest references, so they would
        otherwise accumulate forever; age-gated so a diverted batch
        stays inspectable through its triage window. ``None``
        (default) never touches quarantine."""
        if quarantine_max_age_sec is not None and os.path.isdir(
            self.quarantine_dir
        ):
            qnow = time.time() if now is None else now
            for d in os.listdir(self.quarantine_dir):
                full = os.path.join(self.quarantine_dir, d)
                if qnow - os.path.getmtime(full) > quarantine_max_age_sec:
                    shutil.rmtree(full, ignore_errors=True)
        versions = self._versions()
        if not versions:
            return []
        now = time.time() if now is None else now
        keep: set[int] = {versions[-1]}
        if keep_last is not None:
            keep.update(versions[-keep_last:])
        for v in versions:
            ts = self._manifest(v)["ts"]
            age = now - ts
            if max_age_sec is not None:
                old_enough = age > max_age_sec
                within_look_back = (
                    look_back_sec is None or age < look_back_sec
                )
                if not (old_enough and within_look_back):
                    keep.add(v)
            elif keep_last is None:
                keep.add(v)  # no criteria: vacuum nothing
        dropped = [v for v in versions if v not in keep]

        def owned_dirs(vs) -> set[str]:
            out = set()
            for v in vs:
                man = self._manifest(v)
                for owner in man["owners"].values():
                    out.add(os.path.basename(self._vdir(owner)))
                for e in man.get("merges") or []:
                    out.add(os.path.basename(self._vdir(e["token"])))
            return out

        referenced = owned_dirs(keep)
        # dirs only dropped manifests referenced were committed once —
        # definitely not an in-flight writer's staging; reap eagerly
        retired = owned_dirs(dropped) - referenced
        for v in dropped:
            os.remove(self._manifest_path(v))
        if os.path.isdir(self.data_dir):
            for d in os.listdir(self.data_dir):
                if d in referenced:
                    continue
                full = os.path.join(self.data_dir, d)
                if d not in retired:
                    # never committed: possibly a concurrent writer's
                    # in-flight staging — only reap past the grace age
                    if not d.startswith(("d-", "v")):
                        continue
                    if now - os.path.getmtime(full) < staging_grace_sec:
                        continue
                shutil.rmtree(full)
        return dropped
