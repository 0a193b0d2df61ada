"""Relational operators re-expressed as native DataFrame transforms.

Each function re-creates one inventory row from SURVEY.md §2 using
built-in Catalyst expressions — no RDDs, no Python row UDFs. The
reference implemented these with RDD map/reduceByKey/aggregateByKey
(hive_metastore_migration.py); here they are single shuffles with
map-side partial aggregation, whole-stage codegen, and AQE-managed
partitioning — the shape that survives a 100 TB input.

Citations are ``path:line`` in /root/reference (behavioral parity
anchors, not code provenance).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Aggregations (§2.4)
# ---------------------------------------------------------------------------


def kv_pairs_to_map(
    df: DataFrame,
    id_col: str,
    key_col: str,
    value_col: str,
    map_col: str = "params",
) -> DataFrame:
    """(id, k, v) rows -> (id, map{k: v}), dropping NULL keys.

    Parity: A1 ``kv_pair_to_map`` (hive_metastore_migration.py:320-337).
    Duplicate-key semantics: the reference merges dicts with
    ``dict.update`` in reduceByKey order — i.e. *some* value wins,
    nondeterministically. We make it deterministic: the *max* value per
    key wins (documented divergence; any single-winner policy satisfies
    the reference's contract since its winner was partition-order luck).

    One shuffle (groupBy id+key with partial agg) + one shuffle
    (groupBy id); both combine map-side, so skewed ids degrade
    gracefully under AQE skew handling.
    """
    deduped = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(id_col, key_col)
        .agg(F.max(value_col).alias(value_col))
    )
    return deduped.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct(key_col, value_col))).alias(map_col)
    )


def collect_sorted_array(
    df: DataFrame,
    id_col: str,
    idx_col: str | Column,
    payload_col: str | Column,
    out_col: str = "items",
) -> DataFrame:
    """Group by id, collect payloads sorted by an integer index.

    Parity: A2 ``transform_df_with_idx``
    (hive_metastore_migration.py:344-388) — the reference used RDD
    aggregateByKey + a Python sort per group; here:
    ``array_sort(collect_list(struct(idx, payload)))`` sorts on the
    struct's leading field JVM-side, then drops the index.

    Single shuffle; the per-group sort happens post-aggregation on
    arrays already local to their reducer — no second shuffle and no
    Python boundary.
    """
    payload = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    idx = F.col(idx_col) if isinstance(idx_col, str) else idx_col
    pair = F.struct(idx.alias("_idx"), payload.alias("_payload"))
    return df.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(pair)), lambda s: s.getField("_payload")
        ).alias(out_col)
    )


def max_id(df: DataFrame, id_col: str) -> int:
    """Current max id (0 when empty) — parity A5
    (hive_metastore_migration.py:1219-1225) without the RDD round-trip."""
    row = df.agg(F.max(id_col).alias("m")).first()
    return int(row["m"]) if row and row["m"] is not None else 0


# ---------------------------------------------------------------------------
# Explode family (§2.8)
# ---------------------------------------------------------------------------


def posexplode_with_idx(
    df: DataFrame,
    array_col: str,
    idx_name: str = "INTEGER_IDX",
    elem_name: str = "col",
    keep: Sequence[str] | None = None,
) -> DataFrame:
    """Array column -> one row per element with its 0-based index.

    Parity: X1 ``generate_idx_for_df``
    (hive_metastore_migration.py:854-870) — the reference built a
    Map[idx, elem] with a Python UDF then exploded the map;
    ``posexplode`` is the exact native operator (narrow, no shuffle).
    """
    keep_cols = [F.col(c) for c in (keep or [c for c in df.columns if c != array_col])]
    return df.select(*keep_cols, F.posexplode(array_col).alias(idx_name, elem_name))


def explode_map_params(
    df: DataFrame,
    id_col: str,
    map_col: str,
    key_name: str = "PARAM_KEY",
    value_name: str = "PARAM_VALUE",
) -> DataFrame:
    """Map column -> (id, key, value) rows.

    Parity: X2 ``params_to_df`` (hive_metastore_migration.py:881-884).
    Narrow transform (no shuffle).
    """
    return df.select(id_col, F.explode(map_col).alias(key_name, value_name))


def with_consecutive_id(
    df: DataFrame,
    order_cols: Sequence[str],
    id_col: str = "id",
    start: int = 1,
) -> DataFrame:
    """Assign *consecutive* ids ``start, start+1, ...`` in a
    deterministic total order.

    Parity: X5 ``generate_id_df`` (hive_metastore_migration.py:886-911)
    — the reference used ``rdd.zipWithIndex`` + max-id offset and noted
    (comment :898-901) that ``monotonically_increasing_id`` is unusable
    because ids must be consecutive (they become metastore FK values).

    Scale shape: a global ``row_number`` over a single unbounded window
    would serialize through ONE partition. Instead we range-partition by
    the order keys, number rows *within* each partition, and add
    per-partition cumulative offsets — the classic scalable
    zipWithIndex, expressed on DataFrames. The offsets stay in the
    plan: a window over the <= #partitions count rows plus a broadcast
    join back on partition id, so the range exchange is computed once
    and reused (a driver-side collect of the counts would execute the
    whole upstream plan an extra time per call).

    The numbered frame feeds BOTH the offset aggregate and the final
    join, and ``spark_partition_id()`` is only consistent between the
    two if they read the same materialized partitioning — relying on
    Catalyst emitting a ReusedExchange is not a correctness guarantee
    (AQE may re-plan either branch independently). A local checkpoint
    pins one materialization that both branches read; it is cleaned
    up by the ContextCleaner when the frame is released."""
    order_exprs = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(*order_exprs).sortWithinPartitions(*order_exprs)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*order_exprs)
    numbered = with_pid.withColumn("_rn", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    counts = numbered.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        numbered.join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, (F.col("_rn") + F.col("_off") + F.lit(start - 1)).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


# ---------------------------------------------------------------------------
# Projection helpers (§2.2)
# ---------------------------------------------------------------------------


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Parity: P2 ``drop_columns`` (hive_metastore_migration.py:189-192)."""
    return df.drop(*cols)


def rename_columns(df: DataFrame, mapping: Sequence[tuple[str, str]]) -> DataFrame:
    """Parity: P3 ``rename_columns`` (hive_metastore_migration.py:195-204),
    via the single-pass ``withColumnsRenamed``."""
    return df.withColumnsRenamed(dict(mapping))


def pack_struct(
    df: DataFrame, key_cols: Sequence[str], struct_col: str = "item"
) -> DataFrame:
    """Nest all non-key columns into one struct column.

    Parity: P6 (hive_metastore_migration.py:704-706,733-737)."""
    others = [c for c in df.columns if c not in key_cols]
    return df.select(*key_cols, F.struct(*others).alias(struct_col))


def unpack_struct(df: DataFrame, struct_col: str) -> DataFrame:
    """Inverse of :func:`pack_struct` — parity: P7 ``select('item.*')``
    (hive_metastore_migration.py:914,941,987)."""
    others = [c for c in df.columns if c != struct_col]
    return df.select(*others, f"{struct_col}.*")


# ---------------------------------------------------------------------------
# Join assemblers (§2.3)
# ---------------------------------------------------------------------------


def join_with_params(
    entity: DataFrame, params_map: DataFrame, id_col: str
) -> DataFrame:
    """Entity ⟕ params-map on id — parity: J1
    (hive_metastore_migration.py:339-342)."""
    return entity.join(params_map, on=id_col, how="left_outer")


def join_other_to_single_column(
    left: DataFrame,
    right: DataFrame,
    on: str,
    struct_col: str,
    how: str = "left_outer",
    broadcast_right: bool = False,
) -> DataFrame:
    """Join, collapsing every non-key column of ``right`` into one
    struct column.

    Parity: J2 (hive_metastore_migration.py:211-225) — used for
    serdeInfo / skewedInfo / storageDescriptor assembly.

    ``broadcast_right=True`` hints a broadcast join for dimension-sized
    right sides (the catalog-entity case) — no shuffle of the big side.
    """
    packed = pack_struct(right, [on], struct_col)
    if broadcast_right:
        packed = F.broadcast(packed)
    return left.join(packed, on=on, how=how)


# ---------------------------------------------------------------------------
# Window / dedup (§2.5, Y5)
# ---------------------------------------------------------------------------


def dedup_latest(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """Keep the first row per group under the given ordering.

    Parity: Y5 — newest Redshift snapshot per cluster
    (odl_snapshot_redshift.py:67-92, a driver-side Python sort there);
    here a window ``row_number() == 1``, one shuffle on the partition
    keys. Pass explicit tiebreakers in ``order_cols`` for determinism.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time (as-of) left join: for each left row attach the
    payload of the single right row in the same key group with the
    largest ``right_ts <= left_ts`` (backward, inclusive) or smallest
    ``right_ts >= left_ts`` (forward), optionally only when within
    ``tolerance_seconds``. Unmatched left rows keep nulls. Right
    columns come back suffixed; the matched right timestamp is
    ``{right_ts}{suffix}``.

    Beyond-reference operator (the reference has no temporal joins);
    the semantics follow the common as-of contract of pandas
    merge_asof / DuckDB ASOF JOIN, which is also the oracle.

    Scale: NOT a range join (quadratic in events per key) — the two
    sides are unioned and the match is a running last-non-null window
    over (key, time): ONE shuffle of left+right rows on the key, one
    ordered pass per partition, linear in rows. Ties on the timestamp
    admit the right row (right sorts before left at equal time).
    Duplicate (key, right_ts) rows: the last under the union's sort is
    kept — pre-deduplicate the right side (dedup_latest) for
    determinism.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    key_cols = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    payload_cols = [c for c in right.columns if c not in key_cols and c != right_ts]
    reserved = {"_t", "_side", "_rrec"}
    if reserved & set(left.columns):
        raise ValueError(f"left columns collide with reserved names {reserved}")

    rrec = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload_cols]
    )
    r2 = right.select(
        *key_cols,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        rrec.alias("_rrec"),
    )
    l2 = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    u = l2.unionByName(r2, allowMissingColumns=True)

    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(t_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_rrec", F.last("_rrec", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )
    if tolerance_seconds is not None:
        lag = F.col("_t").cast("double") - F.col("_rrec._rts").cast("double")
        if direction == "forward":
            lag = -lag
        matched = matched.withColumn(
            "_rrec", F.when(lag <= tolerance_seconds, F.col("_rrec"))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("_rrec._rts").alias(f"{right_ts}{suffix}"))
    out_cols.extend(F.col(f"_rrec.{c}").alias(f"{c}{suffix}") for c in payload_cols)
    return matched.select(*out_cols)


def with_running_total(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    value_col: str,
    out_col: str = "running_total",
) -> DataFrame:
    """Global running total of ``value_col`` under a deterministic
    total order — without the single-partition window a naive
    ``Window.orderBy(...)`` cumulative sum serializes through.

    Same scale shape as :func:`with_consecutive_id`: range-partition
    by the order keys, running-sum within each partition, then add
    per-partition offsets that stay in the plan (a window over the
    <= #partitions totals plus a broadcast join), so the range
    exchange is computed once and reused. Use for budgeted selection
    ("take documents by descending quality until N tokens"): filter
    on the output column afterwards.
    """
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(*order_exprs).sortWithinPartitions(*order_exprs)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = with_pid.withColumn("_run", F.sum(value_col).over(w))
    totals = with_pid.groupBy("_pid").agg(F.sum(value_col).alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        run.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_run") + F.col("_off"))
        .drop("_pid", "_run", "_off")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band_width: float,
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval range join: rows of ``points`` matched to
    every ``intervals`` row with ``lo_col <= point < = hi_col``
    (inclusive both ends), optionally also equi-matched on
    ``extra_keys``.

    Beyond-reference operator. Spark plans a raw non-equi join as a
    broadcast nested loop — quadratic work and a broadcast of one
    whole side. Here both sides get integer band keys
    (``floor(x / band_width)``): each interval replicates to the bands
    it spans (narrow explode), each point lands in exactly one band,
    and the join becomes an equi-join on band (+ extra keys) with a
    residual BETWEEN filter. Every matching pair appears exactly once
    (via the band containing the point), so no dedup pass is needed.

    Scale: candidate volume ~ |points| + |intervals| * span/W, one
    hash shuffle on the band key; pick ``band_width`` near the median
    interval span so replication stays O(1) per interval. Skewed
    bands (many points in one value range) ride on AQE skew-join
    splitting.
    """
    if band_width <= 0:
        raise ValueError("band_width must be positive")
    pts = points.withColumn("_band", F.floor(F.col(point_col) / band_width))
    iv = intervals.withColumn(
        "_band",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / band_width),
                F.floor(F.col(hi_col) / band_width),
            )
        ),
    )
    on = ["_band", *extra_keys]
    return (
        pts.join(iv, on)
        .where(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_band")
    )


# ---------------------------------------------------------------------------
# Physical utilities (§2.9)
# ---------------------------------------------------------------------------


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: identical results to
    ``left.join(right, on, how)``, but a hot key's rows spread over
    ``salt`` reducers instead of one.

    The left side gets a deterministic salt in [0, salt) hashed from
    its whole row; the right side is replicated ``salt`` times
    (explode of a sequence — a narrow fan-out, no shuffle of its
    own); the join key becomes (key, salt). Use when a handful of
    keys dominate the distribution and AQE's skew-join splitting
    isn't available or isn't enough; the cost is ``salt``x the
    right-side shuffle volume, so keep the smaller side right.

    ``how`` variants and their mechanics:

    - inner / left / left_outer: salt the left row (deterministic
      row-hash), replicate the right side ``salt``× — cost is
      ``salt``× the RIGHT shuffle volume, so keep the smaller side
      right.
    - right / right_outer: the mirror image — the right row keeps ONE
      salt (so unmatched right rows surface exactly once) and the
      LEFT side replicates, flipping the cost to ``salt``× the left
      shuffle volume.
    - full / outer / full_outer: salted left_outer plus an anti-join
      that appends the right rows whose key never occurs on the left
      (typed-NULL left columns). The anti-join shuffles one key
      column of the right side; a hot key that exists on the left is
      eliminated by the semi structure, so the residual skew is only
      on keys absent from the left entirely.
    """
    if how in ("right", "right_outer"):
        rsalt = right.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in right.columns]), salt).cast("int"),
        )
        lrep = left.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
        )
        return lrep.join(rsalt, [on, "__salt"], "right").drop("__salt")
    if how in ("full", "outer", "full_outer"):
        lo = salted_join(left, right, on, salt=salt, how="left_outer")
        anti = right.join(left.select(on).distinct(), [on], "left_anti")
        for f in left.schema.fields:
            if f.name != on:
                anti = anti.withColumn(f.name, F.lit(None).cast(f.dataType))
        return lo.unionByName(anti.select(*lo.columns))
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left/right/full joins, got {how!r}"
        )
    lsalt = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), salt).cast("int"),
    )
    rsalt = right.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    )
    return lsalt.join(rsalt, [on, "__salt"], how).drop("__salt")


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan has fewer partitions than
    ``n`` (default: the cluster's default parallelism).

    Compute-heavy narrow pipelines (shingling, signatures, vector
    scoring) inherit the scan's partitioning; a small file count —
    one file at test scale, or a few giant row groups at 100 TB with
    512 MB splits — serializes them on a handful of cores. The
    repartition shuffles only the raw input rows, which is far
    cheaper than losing the parallelism downstream. No-op (no
    shuffle) when the scan is already wide enough.
    """
    spark = df.sparkSession
    target = n or spark.sparkContext.defaultParallelism
    # Estimate scan width from file metadata instead of df.rdd, which
    # compiles the physical plan a second time (and, under AQE, a
    # different one than the real action will run). The file count is
    # a lower bound on splits: >= target files is provably wide
    # enough; fewer, possibly-large files fall through to the rdd
    # check, which these narrow scan-projections compile cheaply.
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass  # non-file source: fall through
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def group_within_partitions(
    df: DataFrame, key_col: str, value_col: str, out_col: str = "items"
) -> DataFrame:
    """A4: partition-local grouping — (key, value) rows collapse to
    (key, array-of-values) *within each input partition only*, so the
    same key can appear once per partition in the output. The
    reference used this to batch catalog writes without a global
    shuffle (hive_metastore_migration.py:228-275,
    import_into_datacatalog.py:30-57).

    Implemented as groupBy(spark_partition_id(), key): map-side
    partial collect_list builds each partition's lists locally, and
    the shuffle moves only the one finished row per (partition, key)
    — the distributed cost profile of the reference's
    ``rdd.mapPartitions(group_by_key)``, but codegen'd and
    AQE-planned. Deliberately NOT globally grouped; no SQL oracle
    exists (output depends on physical partitioning), so the driver
    records a rows-only check.
    """
    return (
        df.groupBy(
            F.spark_partition_id().alias("__pid"), F.col(key_col)
        )
        .agg(F.collect_list(value_col).alias(out_col))
        .drop("__pid")
    )


def auto_skew_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    hot_key_threshold: int = 100_000,
    max_hot_keys: int = 1000,
    salt: int = 8,
) -> DataFrame:
    """Skew join that salts ONLY the hot keys: result-identical to
    ``left.join(right, on, how)``.

    One narrow pre-pass counts left-side keys (single-column shuffle
    with map-side partial aggregation — tiny next to the join itself)
    and collects at most ``max_hot_keys`` keys whose row count exceeds
    ``hot_key_threshold`` (driver payload bounded by max_hot_keys, not
    data). Hot rows take the salted path (right-side rows for those
    keys replicate ``salt``×); everything else joins plainly — so the
    replication cost scales with the skew, not the table.

    Compared with blanket :func:`salted_join`, the right-side shuffle
    inflates by ``salt × hot_fraction`` instead of ``salt``×. Prefer
    AQE's runtime skew splitting when it fires; this is the explicit
    fallback for distributions AQE can't fix (e.g. one key > a whole
    executor's memory in a single post-split partition).

    Supported ``how``: every equi-join mode :func:`salted_join`
    supports — inner / left / right / full and their _outer aliases.
    Hot detection always counts the LEFT side (one narrow pre-pass);
    for right/full joins pass the probe-heavy side as ``left`` so the
    count measures the skew that matters.

    For outer modes the key space is PARTITIONED between the two
    branches — the right side splits hot/cold too — so an unmatched
    outer row surfaces in exactly one branch (joining the cold left
    against the full right under ``how='right'`` would re-emit every
    hot-key right row as a spurious NULL-left unmatched row).
    """
    inner_left = ("inner", "left", "left_outer")
    outer = ("right", "right_outer", "full", "outer", "full_outer")
    if how not in inner_left + outer:
        raise ValueError(f"auto_skew_join does not support how={how!r}")
    # null keys never join anyway, and a None inside isin() poisons the
    # cold-side filter (three-valued IN: NULL, not false) — exclude them
    # from hot detection so they always ride the plain-join path
    hot_rows = (
        left.where(F.col(on).isNotNull())
        .groupBy(on)
        .count()
        .where(F.col("count") >= hot_key_threshold)
        .orderBy(F.desc("count"))
        .limit(max_hot_keys)
        .select(on)
        .collect()
    )
    if not hot_rows:
        return left.join(right, on, how)
    hot_keys = [r[0] for r in hot_rows]
    l_hot = left.where(F.col(on).isin(hot_keys))
    l_cold = left.where(~F.col(on).isin(hot_keys) | F.col(on).isNull())
    r_hot = right.where(F.col(on).isin(hot_keys))
    if how in inner_left:
        # the cold branch may keep the FULL right side: cold left rows
        # can't match hot right rows, and inner/left never emit
        # unmatched right rows
        cold = l_cold.join(right, on, how)
    else:
        r_cold = right.where(~F.col(on).isin(hot_keys) | F.col(on).isNull())
        cold = l_cold.join(r_cold, on, how)
    hot = salted_join(l_hot, r_hot, on, salt=salt, how=how)
    return cold.unionByName(hot)
