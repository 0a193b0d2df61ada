"""Endpoint queries: JDBC round trip, SQL passthrough, F16/F17
scalar functions, A4 partition-local grouping — each oracle-checked
where SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_toolkit_spark.catalog import catalog_sql, register_star_schema
from datalake_toolkit_spark.functions import (
    ddb_json_to_plain_map,
    plain_map_to_ddb_json,
    sanitize_csv_header,
)
from datalake_toolkit_spark.operators import group_within_partitions
from datalake_toolkit_spark.plans.queries import query, _t
from datalake_toolkit_spark.sources.jdbc import read_jdbc, write_jdbc
from datalake_toolkit_spark.sources.tables import TABLES


@query(
    "q_jdbc_roundtrip",
    """
    SELECT p_brand, count(*) AS n_parts,
           CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM part GROUP BY p_brand
    """,
)
def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8+S15: part -> Derby-embedded JDBC table -> read back ->
    aggregate. The same url/driver pair swaps for MySQL/Postgres in
    production; Derby lives in Spark's own classpath so the round
    trip is testable anywhere."""
    url = "jdbc:derby:memory:q_jdbc;create=true"
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    write_jdbc(part, url, "PART_Q", mode="overwrite")
    back = read_jdbc(spark, url, "PART_Q")
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        # decimal-exact sum, DOUBLE output: cent-sums are << 2^53 so the
        # cast is exact, and a double column hashes identically across the
        # driver's Spark/DuckDB materializations (DECIMAL output does not —
        # both r3 hash-fails were the only DECIMAL-typed result columns)
        F.sum(F.col("p_retailprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@query(
    "q_show_tables",
    """
    SELECT table_name FROM information_schema.tables
    WHERE table_name IN ('region','nation','customer','supplier','part',
                         'orders','lineitem','events','documents','embeddings')
    """,
)
def q_show_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18: SHOW TABLES through the SQL passthrough, restricted to
    the star schema (the driver session may hold other temp views)."""
    register_star_schema(spark, sf_dir)
    return catalog_sql(spark, "SHOW TABLES").where(F.col("table_name").isin(*TABLES))


@query(
    "q_sanitize_headers",
    """
    SELECT doc_id,
           regexp_replace(substring(text, 1, 40),
                          '[^-_ .&'',$a-zA-Z0-9]', '', 'g') AS clean_header
    FROM documents
    """,
)
def q_sanitize_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: header sanitization (lambda/common.py:238-247) as a
    JVM-side regexp over the first 40 chars of every document."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        sanitize_csv_header(F.substring("text", 1, 40)).alias("clean_header"),
    )


@query(
    "q_ddb_json_roundtrip",
    """
    WITH entries AS (
      SELECT o_orderkey,
             '"priority":{"S":"' || o_orderpriority || '"}' AS e1,
             '"cust":{"N":"' || CAST(o_custkey AS VARCHAR) || '"}' AS e2
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_orderkey,
           '{' || CASE WHEN e1 < e2 THEN e1 || ',' || e2
                       ELSE e2 || ',' || e1 END || '}' AS ddb_doc,
           o_orderpriority AS priority_back,
           CAST(o_custkey AS VARCHAR) AS cust_back
    FROM entries JOIN orders USING (o_orderkey)
    """,
)
def q_ddb_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17: plain map -> DynamoDB-typed JSON -> plain map round trip
    (lambda/odl_ddb_update_es/json_util.py:11-45), all expression-side."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    ddb = orders.select(
        "o_orderkey",
        plain_map_to_ddb_json(
            F.create_map(
                F.lit("priority"), F.col("o_orderpriority"),
                F.lit("cust"), F.col("o_custkey").cast("string"),
            ),
            F.array(F.lit("cust")),
        ).alias("ddb_doc"),
    )
    back = ddb.withColumn("attrs", ddb_json_to_plain_map("ddb_doc"))
    return back.select(
        "o_orderkey",
        "ddb_doc",
        F.element_at("attrs", "priority").alias("priority_back"),
        F.element_at("attrs", "cust").alias("cust_back"),
    )


@query(
    "q_skewed_list_parse",
    r"""
    WITH src AS (
      SELECT n_nationkey, '1%[''' || n_name || ''']' AS s FROM nation
    )
    SELECT n_nationkey, s,
           CASE WHEN regexp_matches(s, '^\d%\[(''\w+'',?\s?)+\]')
                THEN array_to_string(
                  list_transform(
                    string_split(substring(split_part(s, '%', 2), 2,
                                           length(split_part(s, '%', 2)) - 2), ','),
                    t -> trim(t)[2:-2]),
                  '|')
                ELSE '' END AS vals
    FROM src
    """,
)
def q_skewed_list_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: parse the '<n>%[values]' skewed-list rendering back to an
    array, reference quirks included (single-digit guard; names with
    non-word chars fail the guard and yield empty)."""
    from datalake_toolkit_spark.functions import string_list_str_to_array

    nation = _t(spark, sf_dir, "nation")
    src = nation.select(
        "n_nationkey",
        F.concat(F.lit("1%['"), F.col("n_name"), F.lit("']")).alias("s"),
    )
    return src.select(
        "n_nationkey",
        "s",
        F.concat_ws("|", string_list_str_to_array("s")).alias("vals"),
    )


@query(
    "q_stateful_running_status",
    """
    SELECT CAST(user_id AS VARCHAR) AS key,
           CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS matches_batch
    FROM events WHERE user_id < 50 GROUP BY 1
    """,
)
def q_stateful_running_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running event count / latest type over the events table
    replayed as a 2-file stream. The raw state-store emissions are
    non-SQL-expressible (latest_status is order-dependent on ts
    ties), so the DRIVER-CHECKABLE projection is (key, n_events,
    matches_batch): n_events hash-verifies against a relational
    count, and matches_batch encodes the batch-recompute invariant —
    a broken state update flips it to false and hash-fails."""
    import tempfile
    import uuid

    from datalake_toolkit_spark.streaming import running_status

    events = _t(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.col("event_type"),
        F.unix_timestamp("ts").cast("double").alias("ts_sec"),
    ).where(F.col("user_id") < 50)
    work = tempfile.mkdtemp(prefix="dts_stateful_")
    src = f"{work}/src"
    # two json files -> two micro-batches (maxFilesPerTrigger=1)
    events.where(F.col("user_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).json(f"{src}/even")
    events.where(F.col("user_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).json(f"{src}/odd")
    stream = (
        spark.readStream.schema("user_id bigint, event_type string, ts_sec double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .json(src)
    )
    sink = f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        running_status(stream, "user_id", "event_type", "ts_sec")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final = spark.table(sink).groupBy("key").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("latest_status", "n_events").alias("latest_status"),
    )
    # Embedded invariant, emitted as a column so the oracle can check
    # it: every emitted key must agree with a from-scratch batch
    # recomputation — same event count, and a latest_status drawn from
    # the statuses at that key's max event time (set-membership, not
    # equality: ts ties make the within-batch winner order-dependent).
    # The oracle expects matches_batch = TRUE for every key; a broken
    # state update flips it (or skews n_events) and hash-fails.
    per_key = events.groupBy(
        F.col("user_id").cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("b_n"), F.max("ts_sec").alias("b_max_ts"))
    cands = (
        events.select(F.col("user_id").cast("string").alias("key"), "event_type", "ts_sec")
        .join(per_key, "key")
        .where(F.col("ts_sec") == F.col("b_max_ts"))
        .groupBy("key")
        .agg(F.collect_set("event_type").alias("b_latest_set"))
    )
    return (
        final.join(per_key, "key")
        .join(cands, "key")
        .select(
            "key",
            "n_events",
            (
                (F.col("n_events") == F.col("b_n"))
                & F.array_contains("b_latest_set", F.col("latest_status"))
            ).alias("matches_batch"),
        )
    )


@query(
    "q_partition_local_groups",
    """
    SELECT l_returnflag, count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_partition_local_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: partition-local grouping, verified by re-aggregation. The
    partial (partition, key) groups are intermediate state by design
    (their shape depends on physical partitioning), but re-summing
    their batch sizes must reproduce the global per-key counts
    exactly — which IS SQL-expressible, so this previously rows-only
    check now hash-verifies that the partition-local pass partitions
    the rows (nothing lost, nothing duplicated)."""
    lineitem = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")
    out = group_within_partitions(lineitem, "l_returnflag", "l_orderkey")
    return out.groupBy("l_returnflag").agg(
        F.sum(F.size("items")).alias("n_rows")
    )


@query(
    "q_salted_join",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join: result-identical to the plain join (the
    oracle IS the plain join), with hot keys spread over salt
    reducers. The manual fallback when AQE skew splitting isn't
    available."""
    from datalake_toolkit_spark.operators import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    return (
        salted_join(li, orders, "l_orderkey", salt=8)
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "q_profile_orders",
    """
    WITH base AS (SELECT count(*) AS n FROM orders)
    SELECT * FROM (
      SELECT 'o_orderkey' AS "column", (SELECT n FROM base) AS n_rows,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
             CAST(min(o_orderkey) AS VARCHAR) AS min_str,
             CAST(max(o_orderkey) AS VARCHAR) AS max_str,
             CAST(NULL AS DOUBLE) AS avg_len
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', (SELECT n FROM base),
             CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT o_orderpriority) AS BIGINT),
             CAST(min(o_orderpriority) AS VARCHAR),
             CAST(max(o_orderpriority) AS VARCHAR),
             avg(CAST(length(o_orderpriority) AS DOUBLE))
      FROM orders
    )
    """,
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiling (quality.profile_table,
    exact-distinct mode for the oracle; production uses HLL++)."""
    from datalake_toolkit_spark.quality import profile_table

    return profile_table(
        _t(spark, sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority"],
        exact_distinct=True,
    )


@query(
    "q_funnel_conversion",
    """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS t, event_id AS o, event_type AS y
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    lists AS (
      SELECT user_id,
             list({'step': CAST(NULL AS INTEGER), 't0': CAST(NULL AS BIGINT),
                   't': t, 'y': y} ORDER BY t, o, y) AS es
      FROM ev GROUP BY user_id
    ),
    folded AS (
      SELECT user_id,
             list_reduce(
               list_prepend({'step': 0, 't0': CAST(0 AS BIGINT),
                             't': CAST(NULL AS BIGINT), 'y': CAST(NULL AS VARCHAR)}, es),
               (acc, x) -> CASE WHEN acc.step < 3
                                AND x.y = (['view', 'click', 'purchase'])[acc.step + 1]
                                AND (acc.step = 0 OR x.t - acc.t0 <= 604800000000)
                   THEN {'step': acc.step + 1,
                         't0': CASE WHEN acc.step = 0 THEN x.t ELSE acc.t0 END,
                         't': CAST(NULL AS BIGINT), 'y': CAST(NULL AS VARCHAR)}
                   ELSE acc END) AS st
      FROM lists
    ),
    steps(step, step_name) AS (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
    SELECT s.step, s.step_name,
           CAST(sum(CASE WHEN f.st.step >= s.step THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users
    FROM folded f CROSS JOIN steps s
    GROUP BY 1, 2
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion (view -> click -> purchase within 7 days):
    per-user greedy sequence match as a codegen'd array fold over
    events pre-filtered to the funnel's types, then the reached-step
    ladder counts. Microsecond-exact ordering with event_id
    tie-break."""
    from datalake_toolkit_spark.operators.analytics import funnel_counts

    return funnel_counts(
        _t(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        within_seconds=7 * 86400,
    )


@query(
    "q_cohort_retention",
    """
    WITH pe AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT) AS p
      FROM events
    ),
    f AS (SELECT user_id, min(p) AS cohort_p FROM pe GROUP BY 1)
    SELECT cohort_p AS cohort_period,
           CAST(p - cohort_p AS INTEGER) AS period_offset,
           count(*) AS n_users
    FROM pe JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: cohort by first-event week,
    count active users per (cohort, week offset). Integer epoch-day
    arithmetic only — oracles exactly."""
    from datalake_toolkit_spark.operators.analytics import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"), period_days=7)


@query(
    "q_event_paths",
    """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS t, event_id AS o, event_type AS y
      FROM events
    ),
    per_user AS (
      SELECT user_id, list(y ORDER BY t, o, y) AS ys
      FROM ev GROUP BY user_id
    )
    SELECT array_to_string(ys[1:5], '>') AS path, count(*) AS n_users
    FROM per_user GROUP BY 1
    """,
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common first-5-event paths per user: sorted per-user type
    sequence, capped after sorting, grouped into a path histogram."""
    from datalake_toolkit_spark.operators.analytics import event_paths

    return event_paths(_t(spark, sf_dir, "events"), max_len=5)
