"""Gate queries for the lakehouse layer: MERGE/upsert, time travel,
snapshot retention. Each builds a throwaway LakeTable from the star
schema, applies the table op, and returns a deterministic aggregate
the DuckDB oracle reproduces with plain anti-join + union SQL."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_toolkit_spark.lakehouse import LakeTable
from datalake_toolkit_spark.plans.queries import _t, query

_SRC_SQL = """
  SELECT c_custkey,
         CASE WHEN c_custkey % 21 = 0 THEN 'MACHINERY'
              ELSE c_mktsegment END AS c_mktsegment,
         c_acctbal + 1000 AS c_acctbal
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 10000000 AS c_custkey,
         'SYNTH' AS c_mktsegment,
         0.0 AS c_acctbal
  FROM customer WHERE c_custkey % 500 = 0
"""

_MERGED_SQL = f"""
  WITH src AS ({_SRC_SQL}),
  merged AS (
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
    FROM customer c
    WHERE c.c_custkey NOT IN (SELECT c_custkey FROM src)
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal FROM src
  )
"""


def _customer_source(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    updates = cust.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 21 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        (F.col("c_acctbal") + 1000).alias("c_acctbal"),
    )
    inserts = cust.where(F.col("c_custkey") % 500 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
        F.lit("SYNTH").alias("c_mktsegment"),
        F.lit(0.0).alias("c_acctbal"),
    )
    return cust, updates.unionByName(inserts)


@query(
    "q_merge_upsert",
    _MERGED_SQL
    + """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM merged GROUP BY c_mktsegment
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE (lakehouse.LakeTable.upsert): updates that
    bump balances and move keys across the partition column, plus
    inserts into existing and brand-new partitions; only affected
    partitions are rewritten. Oracle is the equivalent
    anti-join ∪ source SQL over ``customer``."""
    import shutil

    cust, src = _customer_source(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="q_merge_upsert_")
    try:
        t = LakeTable(spark, work, partition_by=("c_mktsegment",))
        t.write(cust)
        t.upsert(src, keys=["c_custkey"])
        # pin before the temp dir goes away (driver collects after return)
        return (
            t.read()
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_bal"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q_mor_upsert_partitioned",
    _MERGED_SQL
    + """
    SELECT c_mktsegment AS part,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM merged GROUP BY c_mktsegment
    UNION ALL
    SELECT '__mor__' AS part, 1 AS n_customers, 0.0 AS sum_bal
    """,
)
def q_mor_upsert_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read MERGE on a PARTITIONED table (r8): the source —
    cross-partition key moves (%21 keys -> MACHINERY), in-place
    updates, and inserts into a brand-new partition (SYNTH) — lands as
    one partitioned APPEND token; the base is never rewritten. The
    '__mor__' flag row pins the protocol invariants: owners unchanged,
    one pending entry recording its touched partition keys, and a read
    restricted to a moved key's OLD partition no longer serving the
    stale shadowed row (resolution is global on the merge keys, not
    per-directory). The per-segment aggregates only match the
    anti-join ∪ source oracle if every move/update/insert resolved."""
    import shutil

    cust, src = _customer_source(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="q_mor_up_part_")
    try:
        t = LakeTable(spark, work, partition_by=("c_mktsegment",))
        t.write(cust)  # v0: partitioned base
        v0_owners = t._manifest()["owners"]
        t.upsert(src, keys=["c_custkey"], mode="mor")  # v1: append only
        man = t._manifest()
        entry = (man["merges"] or [{}])[0]
        # every %21 key is now MACHINERY — any surfacing in another
        # partition's restricted read is a stale shadowed row
        # (empty-input runs own no BUILDING partition: vacuously clean)
        stale = (
            t.read(partitions=["c_mktsegment=BUILDING"])
            .where(F.col("c_custkey") % 21 == 0)
            .count()
            if "c_mktsegment=BUILDING" in v0_owners
            else 0
        )
        mor_ok = int(
            man["owners"] == v0_owners
            and len(man["merges"]) <= 1
            and (
                not man["merges"]
                or "c_mktsegment=SYNTH" in (entry.get("parts") or [])
            )
            and stale == 0
        )
        agg = (
            t.read()
            .groupBy(F.col("c_mktsegment").alias("part"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_bal"),
            )
        )
        flag = spark.createDataFrame(
            [("__mor__", mor_ok, 0.0)],
            "part string, n_customers bigint, sum_bal double",
        )
        # pin before the temp dir goes away (driver collects after return)
        return agg.unionByName(flag).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q_mor_delete_by_key",
    """
    WITH survivors AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT c_mktsegment AS part,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM survivors GROUP BY c_mktsegment
    UNION ALL
    SELECT '__mor__' AS part, 1 AS n_customers, 0.0 AS sum_bal
    """,
)
def q_mor_delete_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read KEY-TOMBSTONE delete (r8,
    ``upsert(when_matched='delete', mode='mor')``): a bare key frame
    (every %13 custkey) appends tombstones — O(keys), the path a
    predicate string can't take for a large key set — and the resolved
    read drops exactly those keys. The '__mor__' flag pins the
    protocol: owners unchanged (no base rewrite), one pending entry
    marked delete=True."""
    import shutil

    cust, _ = _customer_source(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="q_mor_del_key_")
    try:
        t = LakeTable(spark, work, partition_by=("c_mktsegment",))
        t.write(cust)  # v0: partitioned base
        v0_owners = t._manifest()["owners"]
        doomed = cust.where(F.col("c_custkey") % 13 == 0).select("c_custkey")
        t.upsert(
            doomed, keys=["c_custkey"], mode="mor", when_matched="delete"
        )  # v1: tombstone append only
        man = t._manifest()
        entry = (man["merges"] or [{}])[0]
        mor_ok = int(
            man["owners"] == v0_owners
            and man["op"] in ("merge_mor_delete", "write")
            and (not man["merges"] or entry.get("delete") is True)
        )
        agg = (
            t.read()
            .groupBy(F.col("c_mktsegment").alias("part"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_bal"),
            )
        )
        flag = spark.createDataFrame(
            [("__mor__", mor_ok, 0.0)],
            "part string, n_customers bigint, sum_bal double",
        )
        # pin before the temp dir goes away (driver collects after return)
        return agg.unionByName(flag).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q_time_travel",
    f"""
    {_MERGED_SQL}
    SELECT CAST(0 AS INT) AS version,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer
    UNION ALL
    SELECT CAST(1 AS INT) AS version,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM merged
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: version 0 must still read the pre-merge snapshot
    after the merge commits (manifests are immutable pointer sets)."""
    import shutil

    cust, src = _customer_source(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="q_time_travel_")
    try:
        t = LakeTable(spark, work, partition_by=("c_mktsegment",))
        t.write(cust)
        t.upsert(src, keys=["c_custkey"])

        def _summary(df: DataFrame, version: int) -> DataFrame:
            return df.agg(
                F.lit(version).cast("int").alias("version"),
                F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_bal"),
            )

        # pin before the temp dir goes away (driver collects after return)
        return (
            _summary(t.read(version=0), 0)
            .unionByName(_summary(t.read(), 1))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q_shallow_clone",
    _MERGED_SQL
    + """
    SELECT 'src' AS part, c_mktsegment AS grp,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 'clone' AS part, c_mktsegment AS grp,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM merged GROUP BY c_mktsegment
    UNION ALL
    SELECT '__zero_copy__' AS part, 'flag' AS grp,
           1 AS n_customers, 0.0 AS sum_bal
    """,
)
def q_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy shallow clone end to end (LakeTable.clone): the clone
    commits only absolute-path pointers at the source's immutable
    token dirs — the '__zero_copy__' flag row pins that NO data dir
    exists under the clone at clone time and every owner is external —
    then a MERGE diverges the clone (copy-on-write localization) while
    the source must aggregate unchanged. Both snapshots hash-checked
    against base vs relational-merge replays."""
    import os as _os
    import shutil

    cust, src = _customer_source(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="q_clone_")
    try:
        s = LakeTable(
            spark,
            _os.path.join(work, "src"),
            partition_by=("c_mktsegment",),
        )
        s.write(cust)
        target = _os.path.join(work, "dst")
        c = s.clone(target)
        man = c._manifest()
        zero_copy = int(
            not _os.path.isdir(_os.path.join(target, "data"))
            and all(_os.path.isabs(t) for t in man["owners"].values())
        )
        c.upsert(src, keys=["c_custkey"])  # diverge the clone only

        def agg(t: LakeTable, tag: str) -> DataFrame:
            return (
                t.read()
                .groupBy(F.col("c_mktsegment").alias("grp"))
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                    F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                    .cast("double")
                    .alias("sum_bal"),
                )
                .select(F.lit(tag).alias("part"), "*")
            )

        flag = spark.createDataFrame(
            [("__zero_copy__", "flag", zero_copy, 0.0)],
            "part string, grp string, n_customers bigint, sum_bal double",
        )
        return (
            agg(s, "src")
            .unionByName(agg(c, "clone"))
            .unionByName(flag)
            # pin before the temp dirs go away (driver collects after return)
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q_mor_upsert",
    f"""
    WITH src AS ({_SRC_SQL}),
    b2 AS (
      SELECT c_custkey, 'MACHINERY' AS c_mktsegment,
             c_acctbal + 5000 AS c_acctbal
      FROM customer WHERE c_custkey % 21 = 0
    ),
    resolved AS (
      SELECT * FROM b2
      UNION ALL
      SELECT * FROM src
      WHERE c_custkey NOT IN (SELECT c_custkey FROM b2)
      UNION ALL
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM src)
        AND c_custkey NOT IN (SELECT c_custkey FROM b2)
    )
    SELECT c_mktsegment AS part,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM resolved GROUP BY c_mktsegment
    UNION ALL
    SELECT '__mor__' AS part, 1 AS n_customers, 0.0 AS sum_bal
    """,
)
def q_mor_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read MERGE end to end (LakeTable
    ``upsert(mode='mor')``): two overlapping source batches land as
    APPENDS — the '__mor__' flag row pins that the base was never
    rewritten (owners unchanged across both merges, two pending
    entries) — and the snapshot read resolves newest-append-wins per
    key over base ∪ both appends. The per-segment aggregates only
    match the three-way relational resolution if precedence
    (batch2 > batch1 > base) holds for every key."""
    import shutil

    cust, src = _customer_source(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="q_mor_upsert_")
    try:
        t = LakeTable(spark, work)
        t.write(cust)  # v0: unpartitioned base
        v0_owners = t._manifest()["owners"]
        t.upsert(src, keys=["c_custkey"], mode="mor")  # v1: append batch 1
        b2 = cust.where(F.col("c_custkey") % 21 == 0).select(
            "c_custkey",
            F.lit("MACHINERY").alias("c_mktsegment"),
            (F.col("c_acctbal") + 5000).alias("c_acctbal"),
        )
        t.upsert(b2, keys=["c_custkey"], mode="mor")  # v2: append batch 2
        man = t._manifest()
        mor_ok = int(man["owners"] == v0_owners and len(man["merges"]) == 2)
        agg = (
            t.read()
            .groupBy(F.col("c_mktsegment").alias("part"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_bal"),
            )
        )
        flag = spark.createDataFrame(
            [("__mor__", mor_ok, 0.0)],
            "part string, n_customers bigint, sum_bal double",
        )
        # pin before the temp dir goes away (driver collects after return)
        return agg.unionByName(flag).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q_mor_delete",
    """
    WITH survivors AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders WHERE NOT (o_totalprice < 50000.0)
    ),
    inserted AS (
      SELECT o_orderkey + 10000000 AS o_orderkey,
             'X-NEW' AS o_orderpriority,
             1000.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 100 = 0
    ),
    final AS (
      SELECT * FROM survivors UNION ALL SELECT * FROM inserted
    )
    SELECT o_orderpriority AS part,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM final GROUP BY o_orderpriority
    UNION ALL
    SELECT '__mor__' AS part, 1 AS n_orders, 0.0 AS sum_price
    """,
)
def q_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read delete end to end (LakeTable
    ``delete_where(mode='mor')``): the delete commits ONLY a predicate
    entry — the '__mor__' flag row pins that zero partitions changed
    owner — and a subsequent MERGE lands inserts (some BELOW the
    deleted threshold) into a fresh partition, so the final snapshot
    is survivors-under-predicate ∪ inserts: reading it exercises the
    predicate applied to legacy tokens while fresh-token rows stay
    immune. The per-priority aggregates hash-pin both halves."""
    import shutil

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="q_mor_delete_")
    try:
        t = LakeTable(spark, work, partition_by=("o_orderpriority",))
        t.write(orders)  # v0
        v0_owners = t._manifest()["owners"]
        t.delete_where("o_totalprice < 50000.0", mode="mor")  # v1: metadata
        v1 = t._manifest()
        inserts = orders.where(F.col("o_orderkey") % 100 == 0).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            F.lit("X-NEW").alias("o_orderpriority"),
            F.lit(1000.0).alias("o_totalprice"),
        )
        t.upsert(inserts, keys=["o_orderkey"])  # v2: fresh partition only
        mor_ok = int(
            v1["owners"] == v0_owners and len(t._manifest()["deletes"]) == 1
        )
        agg = (
            t.read()
            .groupBy(F.col("o_orderpriority").alias("part"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
        flag = spark.createDataFrame(
            [("__mor__", mor_ok, 0.0)],
            "part string, n_orders bigint, sum_price double",
        )
        # pin before the temp dir goes away (driver collects after return)
        return agg.unionByName(flag).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q_file_skipping",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS part,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01'
    GROUP BY 1
    UNION ALL
    SELECT '__pruned__' AS part, 1 AS n_orders, 0.0 AS sum_price
    """,
)
def q_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats data skipping end to end (LakeTable file
    statistics + ``read(where=...)``): orders lands range-clustered on
    o_orderdate so each parquet file covers a disjoint date range, the
    commit footer-reads per-file min/max into the manifest, and the
    predicate read opens ONLY the files whose range can intersect
    [1997-01-01, inf). The '__pruned__' row pins that skipping really
    happened (files_scanned < files_total — it flips to 0 and fails
    the hash if pruning degrades), while the month aggregates pin that
    no qualifying row was dropped."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    import shutil

    work = tempfile.mkdtemp(prefix="q_file_skipping_")
    try:
        t = LakeTable(spark, work)
        t.write(
            orders.repartitionByRange(8, "o_orderdate").sortWithinPartitions(
                "o_orderdate"
            )
        )
        pred = "o_orderdate >= '1997-01-01'"
        rep = t.plan_scan(where=pred)
        agg = (
            t.read(where=pred)
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("part"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
        pruned = int(
            rep["prunable"] and rep["files_scanned"] < rep["files_total"]
        )
        flag = spark.createDataFrame(
            [("__pruned__", pruned, 0.0)],
            "part string, n_orders bigint, sum_price double",
        )
        # pin before the temp dir goes away (driver collects after return)
        return agg.unionByName(flag).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q_partition_evolution",
    _MERGED_SQL
    + """
    SELECT 'v0_by_segment' AS part, c_mktsegment AS grp,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 'final_by_bucket' AS part, CAST(c_custkey % 4 AS VARCHAR) AS grp,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM merged GROUP BY c_custkey % 4
    """,
)
def q_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution end to end
    (lakehouse.LakeTable.evolve_partitioning, metadata-only mode): the
    table is written partitioned by segment, the scheme evolves to a
    key-derived bucket WITHOUT moving any data, and a MERGE then lands
    under the new layout while carrying off the legacy partitions it
    touches — so the final snapshot is a genuinely MIXED-layout read
    (untouched segment dirs ∪ new bucket dirs). The output pins both
    sides of the contract: version 0 still reads under the original
    layout after the evolution, and the final per-bucket aggregate
    only matches the relational merge replay if the mixed-layout union
    neither drops nor double-counts a single row."""
    cust, src = _customer_source(spark, sf_dir)

    def bucketed(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bal_bucket", (F.col("c_custkey") % 4).cast("int")
        )

    import shutil

    work = tempfile.mkdtemp(prefix="q_partition_evolution_")
    try:
        t = LakeTable(spark, work, partition_by=("c_mktsegment",))
        t.write(bucketed(cust))  # v0: segment layout
        t.evolve_partitioning(("bal_bucket",))  # v1: metadata-only
        t.upsert(bucketed(src), keys=["c_custkey"])  # v2: mixed layouts

        v0 = (
            t.read(version=0)
            .groupBy(F.col("c_mktsegment").alias("grp"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_bal"),
            )
            .select(F.lit("v0_by_segment").alias("part"), "*")
        )
        fin = (
            t.read()
            .groupBy(F.col("bal_bucket").cast("string").alias("grp"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_bal"),
            )
            .select(F.lit("final_by_bucket").alias("part"), "*")
        )
        # pin before the temp dir goes away (driver collects after return)
        return v0.unionByName(fin).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q_snapshot_retention",
    """
    WITH src AS (
      SELECT n_nationkey, n_name, n_regionkey + 100 AS n_regionkey
      FROM nation WHERE n_nationkey < 5),
    merged AS (
      SELECT n_nationkey, n_name, n_regionkey FROM nation
      WHERE n_nationkey NOT IN (SELECT n_nationkey FROM src)
      UNION ALL
      SELECT n_nationkey, n_name, n_regionkey FROM src)
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey,
           CAST(2 AS INT) AS n_versions_retained
    FROM merged
    """,
)
def q_snapshot_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot retention (lakehouse.LakeTable.vacuum, the Spark-side
    port of odl_snapshot_redshift.py:104-141): after write → optimize
    → merge, keep-latest-2 drops the oldest manifest and its
    unreferenced data files while the surviving snapshots stay
    readable and correct."""
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("bigint").alias("n_regionkey"),
    )
    import shutil

    work = tempfile.mkdtemp(prefix="q_snapshot_retention_")
    try:
        t = LakeTable(spark, work)
        t.write(nation)  # v0
        t.optimize()  # v1: rewrites everything; v0's data is garbage
        src = nation.where(F.col("n_nationkey") < 5).withColumn(
            "n_regionkey", F.col("n_regionkey") + 100
        )
        t.upsert(src, keys=["n_nationkey"])  # v2
        t.vacuum(keep_last=2)
        # pin before the temp dir goes away (driver collects after return)
        return (
            t.read()
            .withColumn(
                "n_versions_retained", F.lit(len(t.history())).cast("int")
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
