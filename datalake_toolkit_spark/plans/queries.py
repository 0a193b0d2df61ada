"""Verifiable query surface: every operator family from SURVEY.md §2
expressed as a (Spark plan, DuckDB oracle SQL) pair.

Conventions that make the driver's order-insensitive value-hash match:

- every computed column is aliased identically on both sides;
- floating aggregates are ``round(x, 2)`` (or 4 for small ratios) —
  double summation order differs between engines, raw sums never hash
  equal;
- money sums aggregate in DECIMAL (exact, order-independent) and the
  FINAL output column is cast to DOUBLE on both sides — raw DECIMAL
  outputs hash-fail on rendering skew ('321.00' vs '321.0'), and
  DuckDB's integer sums are HUGEINT, so count-like sums cast BIGINT;
- doubles destined for string concatenation go through
  ``DECIMAL(18,2)`` so both engines render '87.50';
- top-k queries carry a unique tiebreaker column in the ORDER BY.

Scale notes are inline per query: which side is broadcast, where the
shuffles are, what AQE is expected to do at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_toolkit_spark.operators import (
    asof_join,
    collect_sorted_array,
    dedup_latest,
    kv_pairs_to_map,
    pack_struct,
    posexplode_with_idx,
    unpack_struct,
    with_consecutive_id,
)
from datalake_toolkit_spark.functions import (
    escape_special_chars,
    millis_str_to_seconds,
    normalize_s3_uri,
    unix_seconds_to_gson,
    with_prefix,
)
from datalake_toolkit_spark.sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(c: str, p: int = 12, sc: int = 2):
    return F.col(c).cast(f"decimal({p},{sc})")


def _rev():
    """Exact-decimal revenue term: decimal arithmetic is associative,
    so the sum is independent of partition/reduction order — unlike
    doubles, whose summation order differs run-to-run and
    engine-to-engine (this is what the DuckDB correctness gate hashes
    against)."""
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))


REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


# ---------------------------------------------------------------------------
# Aggregation core (TPC-H-shaped; SURVEY §2.4, data-plane parity)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)                        AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)
                                                                       AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)      AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*)       AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan->filter->agg. Filter + the 3 used columns push down
    to the parquet reader; one shuffle on (returnflag, linestatus) with
    map-side partial agg — the minimal plan at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(_rev()), 2).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(_rev() * (F.lit(1) + _dec("l_tax", 4, 2))), 2
            ).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (
                F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))
            ).alias("avg_price"),
            (
                F.sum(_dec("l_discount", 4, 2)).cast("double") / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k. customer is dimension-sized next to lineitem
    -> broadcast it; orders⋈lineitem stays a shuffle join on orderkey
    (both huge at 100 TB; AQE picks SMJ/SHJ). Top-k is a global sort of
    the *aggregated* (small) side only."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    """
    SELECT n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join. region/nation/supplier/customer are dims ->
    broadcast; only orders⋈lineitem shuffles. Catalyst reorders the
    broadcasts; the c_nationkey = s_nationkey residual rides on the
    join output."""
    cust, orders, li, supp, nat, reg = (
        _t(spark, sf_dir, n)
        for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    orders = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(
            F.broadcast(reg.where(F.col("r_name") == "ASIA")),
            nat.n_regionkey == reg.r_regionkey,
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, nat = (
        _t(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "nation")
    )
    orders = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = li.where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_year_orders",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
)
def q_year_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 year() extraction + agg."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total"),
        )
    )


@query(
    "q_rollup_supplier_balance",
    """
    SELECT r_name, n_name,
           CAST(round(sum(CAST(s_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_bal,
           count(*) AS n_suppliers
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_rollup_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation (engine capability beyond the
    reference's flat aggs — SURVEY §2.4 'absent' row)."""
    supp, nat, reg = (
        _t(spark, sf_dir, n) for n in ("supplier", "nation", "region")
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum(_dec("s_acctbal")), 2).cast("double").alias("total_bal"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@query(
    "q_pivot_order_priority",
    """
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS high,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS medium,
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS low
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_pivot_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — explicit values keep the
    plan a single pass (no extra distinct-values job at scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
        .withColumnsRenamed(
            {
                "1-URGENT": "urgent",
                "2-HIGH": "high",
                "3-MEDIUM": "medium",
                "4-NOT SPECIFIED": "not_specified",
                "5-LOW": "low",
            }
        )
        .na.fill(0, ["urgent", "high", "medium", "not_specified", "low"])
    )


# ---------------------------------------------------------------------------
# Map / ordered-array aggregation (A1 / A2)
# ---------------------------------------------------------------------------


@query(
    "q_user_event_map",
    """
    WITH kv AS (
      SELECT user_id, event_type,
             CAST(CAST(max(value) AS DECIMAL(18,2)) AS VARCHAR) AS v
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           string_agg(event_type || '=' || v, ';' ORDER BY event_type) AS event_map
    FROM kv GROUP BY user_id
    """,
)
def q_user_event_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 kv_pair_to_map: (id, k, v) -> map, rendered as a sorted
    'k=v;k=v' string for engine-neutral comparison."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("value").alias("value")
    )
    mapped = kv_pairs_to_map(ev, "user_id", "event_type", "value", "m")
    entries = F.transform(
        F.array_sort(F.map_entries(F.col("m"))),
        lambda e: F.concat(
            e.getField("key"),
            F.lit("="),
            e.getField("value").cast("decimal(18,2)").cast("string"),
        ),
    )
    return mapped.select("user_id", F.concat_ws(";", entries).alias("event_map"))


@query(
    "q_order_parts_sorted",
    """
    SELECT l_orderkey,
           string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey)
             AS parts_in_order
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_order_parts_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 transform_df_with_idx: per-group collect ordered by an integer
    index. Single shuffle; sort happens on reducer-local arrays."""
    li = _t(spark, sf_dir, "lineitem")
    collected = collect_sorted_array(
        li,
        "l_orderkey",
        F.struct("l_linenumber", "l_partkey"),
        F.col("l_partkey").cast("string"),
        "parts",
    )
    return collected.select(
        "l_orderkey", F.concat_ws(",", "parts").alias("parts_in_order")
    )


# ---------------------------------------------------------------------------
# Window / dedup / ids (W2, Y5, X5)
# ---------------------------------------------------------------------------


@query(
    "q_latest_event_per_user",
    """
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y5 newest-per-key dedup as a window; one shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    return dedup_latest(
        ev, ["user_id"], [F.desc("ts"), F.desc("event_id")]
    ).select("user_id", "event_id", "event_type", "value")


@query(
    "q12_priority_by_returnflag",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact equi-join with conditional
    aggregation. Both sides are fact-sized, so the join carries a
    shuffle_hash hint — at scale neither side can broadcast and
    Spark's default sort-merge pays two sorts this aggregation never
    needs."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .select("l_orderkey", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o.hint("shuffle_hash"), li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q4_priority_with_returns",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS -> left-semi join): orders having at
    least one returned lineitem, counted by priority. The semi join
    never materializes lineitem columns and short-circuits per key."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4))
             AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 11 AND 25
           AND l_quantity BETWEEN 10 AND 35)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join
    sides. Catalyst extracts the common l_quantity/p_size bounds as
    scan-level filters before the broadcast join evaluates the full
    disjunction."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).where(
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(11, 25)
            & F.col("l_quantity").between(10, 35)
        )
    )
    return joined.agg(F.sum(_rev()).cast("decimal(18,4)").alias("revenue"))


@query(
    "q2_cheapest_per_type",
    """
    SELECT p.p_type, p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (SELECT min(p2.p_retailprice)
                             FROM part p2 WHERE p2.p_type = p.p_type)
    """,
)
def q2_cheapest_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated scalar subquery): cheapest part(s)
    per type, written as the correlated SQL itself — Catalyst
    decorrelates it into an aggregate + join rather than a per-row
    subplan."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p.p_type, p.p_partkey, p.p_retailprice
        FROM part p
        WHERE p.p_retailprice = (SELECT min(p2.p_retailprice)
                                 FROM part p2 WHERE p2.p_type = p.p_type)
        """
    )


@query(
    "q_approx_aggregates",
    """
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS exact_distinct,
           true AS approx_distinct_within_5pct,
           true AS approx_median_within_1
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates (HLL++ approx_count_distinct, KLL-style
    percentile_approx): the scale path for distinct counts and
    quantiles — no exact-distinct shuffle of the full key set, fixed
    sketch memory per group, mergeable across partitions (map-side
    partial aggregation). Cross-engine check: the exact figures
    hash-match the oracle and the approximations are asserted inside
    their published error bounds, which the oracle states as
    literals."""
    li = _t(spark, sf_dir, "lineitem")
    # Two aggregations joined on the 3-row group key, NOT one agg with
    # all four functions: mixing count_distinct's expand rewrite with
    # the TypedImperativeAggregate percentiles forces a sort-aggregate
    # fallback over the expanded rows (measured 19s -> 1.8s at sf0.1).
    # The exact distinct is the manual two-phase form (group on
    # (key, value), then count) — pure hash aggregates, map-side
    # partials at both levels.
    exact = (
        li.groupBy("l_returnflag", "l_orderkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_distinct"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("approx_median"),
        F.expr("percentile(l_quantity, 0.5)").alias("exact_median"),
    )
    agg = exact.join(approx, "l_returnflag")
    return agg.select(
        "l_returnflag",
        "exact_distinct",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.05
        ).alias("approx_distinct_within_5pct"),
        (F.abs(F.col("approx_median") - F.col("exact_median")) <= 1.0).alias(
            "approx_median_within_1"
        ),
    )


@query(
    "q_retained_customers",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    """,
)
def q_retained_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op INTERSECT (U-family; absent in the reference, free from
    Spark): customers ordering in both 1994 and 1995. Catalyst plans
    it as a left-semi aggregate join — one shuffle per side."""
    o = _t(spark, sf_dir, "orders")
    y94 = o.where(F.year("o_orderdate") == 1994).select("o_custkey")
    y95 = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    return y94.intersect(y95)


@query(
    "q_churned_customers",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    """,
)
def q_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op EXCEPT: customers ordering in 1994 but not 1995 —
    planned as a left-anti aggregate join."""
    o = _t(spark, sf_dir, "orders")
    y94 = o.where(F.year("o_orderdate") == 1994).select("o_custkey")
    y95 = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    return y94.subtract(y95)


@query(
    "q_range_join",
    """
    WITH tiers AS (
      SELECT n_nationkey AS tier_id,
             n_nationkey * 8000.0 AS lo,
             n_nationkey * 8000.0 + 20000.0 AS hi
      FROM nation)
    SELECT tier_id, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders JOIN tiers ON o_totalprice BETWEEN lo AND hi
    GROUP BY tier_id
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (operators.relational.range_join):
    orders priced into overlapping tier intervals via band-bucketed
    equi-join + residual filter — not the broadcast nested loop Spark
    would plan for the raw non-equi condition."""
    from datalake_toolkit_spark.operators import range_join

    nation = _t(spark, sf_dir, "nation")
    tiers = nation.select(
        F.col("n_nationkey").alias("tier_id"),
        (F.col("n_nationkey") * 8000.0).alias("lo"),
        (F.col("n_nationkey") * 8000.0 + 20000.0).alias("hi"),
    )
    pts = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = range_join(pts, tiers, "o_totalprice", "lo", "hi", band_width=10000.0)
    return joined.groupBy("tier_id").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@query(
    "q_asof_join",
    """
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    r0 AS (
      SELECT user_id, ts, max(event_id) AS view_event_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
    SELECT l.event_id, l.user_id,
           r0.view_event_id AS view_event_id_r,
           epoch_us(l.ts) - epoch_us(r0.ts) AS lag_us
    FROM l ASOF LEFT JOIN r0 ON l.user_id = r0.user_id AND l.ts >= r0.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase matched to the user's latest
    view at-or-before it (operators.relational.asof_join — union +
    running last-known-value window, one key shuffle, linear; the
    oracle is DuckDB's native ASOF JOIN)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    joined = asof_join(purchases, views, on="user_id", left_ts="ts", right_ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        "view_event_id_r",
        (F.unix_micros("ts") - F.unix_micros("ts_r")).alias("lag_us"),
    )


@query(
    "q_asof_forward_tolerance",
    """
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    r0 AS (
      SELECT user_id, ts, max(event_id) AS next_view_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
    m AS (
      SELECT l.event_id, l.user_id, l.ts, r0.ts AS rts, r0.next_view_id
      FROM l ASOF LEFT JOIN r0 ON l.user_id = r0.user_id AND l.ts <= r0.ts)
    SELECT event_id, user_id,
           CASE WHEN epoch_us(rts) - epoch_us(ts) <= 1800 * 1000000
                THEN next_view_id END AS next_view_id_r,
           CASE WHEN epoch_us(rts) - epoch_us(ts) <= 1800 * 1000000
                THEN epoch_us(rts) - epoch_us(ts) END AS lead_us
    FROM m
    """,
)
def q_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forward + tolerance path of asof_join: each purchase takes
    the user's NEXT view at-or-after it, but only within 30 minutes —
    matches beyond tolerance null out (row survives; DuckDB oracle =
    forward ASOF LEFT JOIN + CASE on the tolerance)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("next_view_id"))
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        direction="forward",
        tolerance_seconds=1800,
    )
    return joined.select(
        "event_id",
        "user_id",
        "next_view_id_r",
        (F.unix_micros("ts_r") - F.unix_micros("ts")).alias("lead_us"),
    )


@query(
    "q_consecutive_part_ids",
    """
    SELECT CAST(row_number() OVER (ORDER BY p_partkey) + 1000 AS BIGINT) AS new_id,
           p_partkey
    FROM part
    """,
)
def q_consecutive_part_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 generate_id_df: consecutive, seeded ids in a deterministic
    total order — range-partitioned two-phase numbering, not a global
    single-partition window (see operators.relational)."""
    return with_consecutive_id(
        _t(spark, sf_dir, "part"), ["p_partkey"], "new_id", start=1001
    ).select("new_id", "p_partkey")


# ---------------------------------------------------------------------------
# Joins beyond the assembled chains (semi / anti / broadcast dims)
# ---------------------------------------------------------------------------


@query(
    "q_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    cust, orders = (_t(spark, sf_dir, n) for n in ("customer", "orders"))
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q_big_spenders",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) with a pushed-down filter on the probe side."""
    cust, orders = (_t(spark, sf_dir, n) for n in ("customer", "orders"))
    return cust.join(
        orders.where(F.col("o_totalprice") > 400000),
        cust.c_custkey == orders.o_custkey,
        "left_semi",
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q_nation_region",
    """
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim⋈dim join."""
    nat, reg = (_t(spark, sf_dir, n) for n in ("nation", "region"))
    return nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@query(
    "q_all_parties",
    """
    SELECT 'customer' AS party_type, c_name AS name, CAST(c_nationkey AS INTEGER) AS nationkey
    FROM customer
    UNION ALL
    SELECT 'supplier' AS party_type, s_name AS name, CAST(s_nationkey AS INTEGER) AS nationkey
    FROM supplier
    """,
)
def q_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2 union-by-name across heterogeneous sources."""
    cust = (
        _t(spark, sf_dir, "customer")
        .select(
            F.lit("customer").alias("party_type"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").cast("int").alias("nationkey"),
        )
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .select(
            F.lit("supplier").alias("party_type"),
            F.col("s_name").alias("name"),
            F.col("s_nationkey").cast("int").alias("nationkey"),
        )
    )
    return cust.unionByName(supp)


@query(
    "q_top_parts_by_revenue",
    """
    SELECT p_partkey, p_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey, p_name
    ORDER BY revenue DESC, p_partkey
    LIMIT 10
    """,
)
def q_top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregate the fact side on the join key BEFORE the broadcast
    join — at 100 TB this collapses the join input from |lineitem| to
    |part| rows and keeps the dim broadcast."""
    li, part = (_t(spark, sf_dir, n) for n in ("lineitem", "part"))
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("_rev"))
    return (
        per_part.join(F.broadcast(part), per_part.l_partkey == part.p_partkey)
        .select(
            "p_partkey", "p_name", F.round(F.col("_rev"), 2).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Structural operators: explode / struct pack-unpack (X1, P6/P7)
# ---------------------------------------------------------------------------


@query(
    "q_doc_words_indexed",
    """
    SELECT doc_id, u['idx'] AS idx, u['word'] AS word FROM (
      SELECT doc_id,
             unnest(list_transform(string_split(text, ' '),
                    (x, i) -> {'idx': CAST(i - 1 AS INTEGER), 'word': x})) AS u
      FROM documents) t
    """,
)
def q_doc_words_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 generate_idx_for_df -> posexplode: one row per array element
    with its 0-based index. Narrow (no shuffle)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    return posexplode_with_idx(docs, "words", "idx", "word", keep=["doc_id"])


@query(
    "q_customer_struct_roundtrip",
    """
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
    """,
)
def q_customer_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7 struct pack -> unpack is lossless (Catalyst collapses the
    pair into a plain projection — zero runtime cost)."""
    packed = pack_struct(_t(spark, sf_dir, "customer"), ["c_custkey"], "item")
    return unpack_struct(packed, "item")


# ---------------------------------------------------------------------------
# Scalar-function surface (F-series) and regex routing (P9)
# ---------------------------------------------------------------------------


@query(
    "q_source_route",
    """
    SELECT doc_id, source,
           CASE WHEN regexp_matches(source, '^src1[0-9]$') THEN 'plugin_teens'
                WHEN regexp_matches(source, '^src[0-9]$')  THEN 'plugin_single'
                ELSE 'default_plugin' END AS plugin
    FROM documents
    """,
)
def q_source_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 first-match-wins regex plugin router
    (odl_datalake_ingestion.py:63-87) as when/otherwise dispatch."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.when(F.col("source").rlike("^src1[0-9]$"), "plugin_teens")
        .when(F.col("source").rlike("^src[0-9]$"), "plugin_single")
        .otherwise("default_plugin")
        .alias("plugin"),
    )


@query(
    "q_uri_normalize",
    """
    SELECT doc_id,
           regexp_replace('s3a://datalake-raw/' || source, '^s3[an]://', 's3://') AS uri
    FROM documents
    """,
)
def q_uri_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 s3a/s3n->s3 normalization + F7 prefixing."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        normalize_s3_uri(with_prefix("s3a://datalake-raw/", F.col("source"))).alias(
            "uri"
        ),
    )


@query(
    "q_escape_props",
    r"""
    SELECT event_id, regexp_replace(props, '([\\|"{:}])', '\\\1', 'g') AS esc
    FROM events
    """,
)
def q_escape_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 special-char escaping for the downstream parser."""
    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id", escape_special_chars("props").alias("esc"))


@query(
    "q_time_functions",
    """
    SELECT event_id,
           strftime(make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000),
                    '%b %d, %Y %I:%M:%S %p') AS gson_ts,
           CAST(CAST(CAST(floor(epoch(ts)) AS BIGINT) * 1000 AS VARCHAR) AS BIGINT)
             // 1000 AS ts_seconds
    FROM events
    """,
)
def q_time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 unix-seconds -> Gson-format string; F9 millis-string ->
    seconds."""
    ev = _t(spark, sf_dir, "events")
    # unix_timestamp, not cast("long"): works for every timestamp flavor
    # (a TIMESTAMP_NTZ column rejects the long cast outright)
    secs = F.unix_timestamp(F.col("ts"))
    return ev.select(
        "event_id",
        unix_seconds_to_gson(secs).alias("gson_ts"),
        millis_str_to_seconds((secs * 1000).cast("string")).alias("ts_seconds"),
    )


# ---------------------------------------------------------------------------
# Event-time windowing (streaming/batch-symmetric; SURVEY §2.10)
# ---------------------------------------------------------------------------


@query(
    "q_windowed_event_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def q_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window counts. Same expression runs
    incrementally on a stream with a watermark (see streaming.windows);
    here the batch execution is oracle-verified."""
    from datalake_toolkit_spark.streaming.windows import windowed_counts

    return windowed_counts(_t(spark, sf_dir, "events"), window="1 hour")


@query(
    "q_interval_join",
    """
    SELECT p.event_id, p.user_id, v.event_id AS event_id_r,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS lag_s
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join (view->purchase attribution within
    1 hour). The SAME streaming.windows.interval_join expression runs
    as a watermarked stream-stream join with bounded state (runtime
    test); here the batch execution is oracle-verified."""
    from datalake_toolkit_spark.streaming.windows import interval_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    return interval_join(
        purchases, views, on="user_id", within="1 hour"
    ).select(
        "event_id",
        "user_id",
        "event_id_r",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_r")).alias("lag_s"),
    )


@query(
    "q_interval_join_left",
    """
    SELECT p.event_id, p.user_id, v.event_id AS event_id_r,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS lag_s
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
    """,
)
def q_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer interval join: purchases with no view in the hour
    window survive with NULL attribution (the how='left' path of
    streaming.windows.interval_join; in streaming the outer rows emit
    once the watermark passes)."""
    from datalake_toolkit_spark.streaming.windows import interval_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    return interval_join(
        purchases, views, on="user_id", within="1 hour", how="left"
    ).select(
        "event_id",
        "user_id",
        "event_id_r",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_r")).alias("lag_s"),
    )


@query(
    "q_sessionized_users",
    """
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    y AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM x)
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM y GROUP BY user_id, sid
    """,
)
def q_sessionized_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user — `session_window` in
    Spark, verified against a gaps-and-islands SQL oracle."""
    from datalake_toolkit_spark.streaming.windows import sessionized

    return sessionized(_t(spark, sf_dir, "events"), gap="30 minutes")


@query(
    "q_stream_dedup",
    """
    WITH doubled AS (
      SELECT * FROM events UNION ALL SELECT * FROM events),
    d AS (
      SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY event_id) AS rn
      FROM doubled)
    SELECT event_type, count(*) AS n_events
    FROM d WHERE rn = 1 GROUP BY event_type
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once-per-key dedup (streaming.windows.streaming_dedup):
    the batch-symmetric path over a deliberately doubled event feed.
    The streaming path (dropDuplicatesWithinWatermark, bounded state)
    is exercised by the runtime test in tests/test_ingestion.py."""
    from datalake_toolkit_spark.streaming.windows import streaming_dedup

    ev = _t(spark, sf_dir, "events")
    deduped = streaming_dedup(ev.unionByName(ev), keys=("event_id",))
    return deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + agg — the predicate-pushdown
    showcase (all three predicates reach the parquet scan; only four
    columns read)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 4, 2))
            .cast("decimal(18,4)")
            .alias("revenue")
        )
    )


@query(
    "q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) >= 300)
    SELECT c.c_name, o.o_orderkey,
           CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price, b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg -> having -> join fact-to-dim -> global
    top-k. The HAVING side shrinks to O(big orders) before the joins,
    so both joins broadcast the small side; top-k is a TakeOrdered,
    not a full sort."""
    li, orders, cust = (
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .where(F.col("sum_qty") >= 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            _dec("o_totalprice").cast("double").alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q14_promo_share",
    """
    WITH m AS (
      SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
             CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                       (1 - CAST(l_discount AS DECIMAL(4,2))) ELSE 0 END)
                  AS DECIMAL(18,4)) AS promo_rev,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS total_rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1)
    SELECT ship_month,
           CAST(promo_rev AS DOUBLE) AS promo_rev,
           CAST(total_rev AS DOUBLE) AS total_rev,
           round(100.0 * CAST(promo_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 4)
             AS promo_pct
    FROM m
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast
    fact-dim join, monthly promo revenue share."""
    li, part = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    rev = _rev()
    joined = li.where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    m = joined.groupBy(
        F.month("l_shipdate").cast("int").alias("ship_month")
    ).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
        .cast("decimal(18,4)")
        .alias("promo_rev"),
        F.sum(rev).cast("decimal(18,4)").alias("total_rev"),
    )
    return m.select(
        "ship_month",
        F.col("promo_rev").cast("double").alias("promo_rev"),
        F.col("total_rev").cast("double").alias("total_rev"),
        F.round(
            F.lit(100.0)
            * F.col("promo_rev").cast("double")
            / F.col("total_rev").cast("double"),
            4,
        ).alias("promo_pct"),
    )


# ---------------------------------------------------------------------------
# TPC-H breadth, round 5: the remaining shapes expressible without a
# partsupp table (q9/q11/q16/q20 need ps_supplycost/ps_availqty, which
# the testdata set lacks). Columns the reduced schemas miss are
# substituted with an equivalent-shape predicate, noted per query.
# ---------------------------------------------------------------------------


@query(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum({REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair shipping volume.
    One fact-fact shuffle join (lineitem x orders); customer,
    supplier, and both nation legs broadcast. The nation-pair
    disjunction lands post-join (it spans both legs)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair | rpair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    f"""
    WITH all_rev AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             {REV_SQL} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1998-01-01'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM all_rev GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share within a region-filtered
    market — conditional share of exact-decimal sums (the ratio is a
    double over two order-independent decimals). All dims broadcast;
    the only shuffles are lineitem x orders and the final group."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
    )
    zero = F.lit(0).cast("decimal(12,2)")
    agg = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(zero))
        .alias("nat_rev"),
        F.sum(_rev()).alias("tot_rev"),
    )
    return agg.select(
        "o_year",
        F.round(
            F.col("nat_rev").cast("double") / F.col("tot_rev").cast("double"), 4
        ).alias("mkt_share"),
    )


@query(
    "q13_order_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two stacked aggregations over a left outer
    join — orders-per-customer histogram, zero-order customers
    included. (The spec's o_comment NOT LIKE filter is dropped: the
    reduced orders schema has no comment column.)"""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, sum({REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier by quarterly revenue via a
    scalar-max self-reference. The max is a one-row broadcast join,
    and the revenue equality is safe because the sums are exact
    DECIMAL (doubles would tie-break nondeterministically)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@query(
    "q17_small_qty_revenue",
    """
    WITH target AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#12' AND p_size < 15
    ),
    qty AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
      FROM lineitem JOIN target ON p_partkey = l_partkey
      GROUP BY l_partkey
    )
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN qty ON qty.l_partkey = lineitem.l_partkey
    WHERE l_quantity < qty_cut
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average decorrelated into
    an aggregate + re-join. (p_container doesn't exist in the reduced
    schema; p_size < 15 stands in.) The 0.2*avg threshold is
    engine-stable: quantities are integer-valued doubles, so the avg
    is an exact-sum division both engines compute identically."""
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#12") & (F.col("p_size") < 15)
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    target = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    qty = target.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.withColumnRenamed("l_partkey", "lp")
        .join(qty, F.col("lp") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (
                F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)
            ).cast("double").alias("avg_yearly")
        )
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_1'
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS -> left-semi plus NOT EXISTS ->
    left-anti, both fact-fact self-joins on the order key. (The
    reduced lineitem has no commit/receipt dates, so "kept the order
    waiting" is re-keyed on shipdate: this supplier shipped strictly
    last among a multi-supplier 'F' order.) Top-10 with the unique
    s_name as tiebreaker."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    f_orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = li.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey")).drop("o_orderkey")
    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_suppkey").alias("r_suppkey"),
        F.col("l_shipdate").alias("r_shipdate"),
    )
    waited = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("r_orderkey"))
        & (F.col("l_suppkey") != F.col("r_suppkey")),
        "leftsemi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("r_orderkey"))
        & (F.col("l_suppkey") != F.col("r_suppkey"))
        & (F.col("r_shipdate") > F.col("l_shipdate")),
        "leftanti",
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    return (
        waited.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@query(
    "q22_sales_opportunity",
    """
    WITH coded AS (
      SELECT c_custkey, c_custkey % 7 AS cntrycode,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents,
             CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer
    ),
    cut AS (
      SELECT CAST(sum(cents) AS DOUBLE) / count(*) AS avg_cents
      FROM coded WHERE cents > 0 AND cntrycode IN (1, 3, 5)
    )
    SELECT cntrycode, count(*) AS numcust,
           CAST(sum(bal) AS DOUBLE) AS totacctbal
    FROM coded, cut
    WHERE cntrycode IN (1, 3, 5) AND cents > avg_cents
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = coded.c_custkey)
    GROUP BY cntrycode
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar above-average subquery + NOT EXISTS
    anti-join. (No c_phone column: country code is c_custkey % 7.)
    The average is taken over integer cents (round(bal*100)) so the
    exact sum divides identically in both engines — an avg over raw
    doubles would be summation-order-dependent at the last ULP and
    could flip the boundary comparison.

    This query OWNS a BroadcastNestedLoopJoin by design: the build
    side is the one-row scalar average (IdentityBroadcastMode), so
    the "nested loop" is a streaming O(n) filter against a single
    broadcast row — Spark's canonical physical plan for a scalar
    subquery, not a quadratic join."""
    coded = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 7).alias("cntrycode"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
    ).where(F.col("cntrycode").isin(1, 3, 5))
    cut = coded.where(F.col("cents") > 0).agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("avg_cents")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        coded.join(F.broadcast(cut))
        .where(F.col("cents") > F.col("avg_cents"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "leftanti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q9/q11/q16/q20: the four shapes that need a partsupp table.
# The testdata set has none, so partsupp is DERIVED deterministically
# from the distinct (l_partkey, l_suppkey) pairs actually used, with
# integer-arithmetic supplycost/availqty both engines compute
# identically — the oracle reproduces the same derivation in SQL.
# ---------------------------------------------------------------------------

_PARTSUPP_CTE = """
ps AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         (l_partkey * 31 + l_suppkey * 17) % 900 + 100 AS ps_cost_cents,
         (l_partkey * 37 + l_suppkey * 11) % 9999 + 1 AS ps_availqty
  FROM lineitem
)
"""

# supplycost as an exact DECIMAL: cents * 0.01 by decimal MULTIPLY
# (division would hit engine-specific scale rules)
_PS_COST_SQL = "CAST(ps_cost_cents AS DECIMAL(12,2)) * CAST(0.01 AS DECIMAL(3,2))"


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp table (see _PARTSUPP_CTE)."""
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    cents = (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 900 + 100
    avail = (F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 11) % 9999 + 1
    return (
        pairs.withColumn("ps_cost_cents", cents.cast("long"))
        .withColumn("ps_availqty", avail.cast("long"))
        .withColumn(
            "ps_supplycost",
            F.col("ps_cost_cents").cast("decimal(12,2)")
            * F.lit("0.01").cast("decimal(3,2)"),
        )
    )


@query(
    "q9_product_profit",
    f"""
    WITH {_PARTSUPP_CTE},
    profit AS (
      SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             {REV_SQL} - {_PS_COST_SQL} * CAST(l.l_quantity AS DECIMAL(12,2)) AS amount
      FROM lineitem l
      JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM profit GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by nation and year over the
    derived partsupp. Profit stays in exact DECIMAL end to end
    (revenue minus cents-based supplycost x integer quantity), so the
    sum is order-independent. Two fact-fact shuffle joins (lineitem x
    partsupp on the compound key, then x orders); part/supplier/nation
    broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = _rev() - F.col("ps_supplycost") * _dec("l_quantity")
    return (
        li.join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    f"""
    WITH {_PARTSUPP_CTE},
    v AS (
      SELECT ps_partkey, sum(ps_cost_cents * ps_availqty) AS val_cents
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_2'
      GROUP BY 1
    ),
    tot AS (SELECT sum(val_cents) AS total_cents FROM v)
    SELECT ps_partkey, CAST(val_cents AS BIGINT) AS value_cents
    FROM v, tot WHERE 10000 * val_cents > total_cents
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: stock value per part vs a scalar fraction of
    the national total. All value arithmetic is INTEGER cents — the
    `val > 0.0001 * total` predicate is re-stated as
    `10000 * val > total`, an exact integer comparison (a decimal
    ratio would hit Spark's precision-loss scale truncation and could
    flip the boundary vs DuckDB).

    OWNS a BroadcastNestedLoopJoin by design: the build side is the
    one-row grand total, so the join is a streaming O(n) filter
    against a single broadcast row — the canonical scalar-subquery
    plan, not a quadratic join."""
    ps = _partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    v = (
        ps.join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).alias("val_cents"))
    )
    tot = v.agg(F.sum("val_cents").alias("total_cents"))
    return (
        v.join(F.broadcast(tot))
        .where(F.lit(10000) * F.col("val_cents") > F.col("total_cents"))
        .select("ps_partkey", F.col("val_cents").cast("long").alias("value_cents"))
    )


@query(
    "q16_supplier_count",
    f"""
    WITH {_PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier count per part attribute with a
    NOT-IN exclusion set -> broadcast anti-join. (No s_comment column
    for the spec's complaints filter; negative account balance is the
    stand-in exclusion set.)"""
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp), F.col("ps_suppkey") == F.col("s_suppkey"), "leftanti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_stock",
    f"""
    WITH {_PARTSUPP_CTE},
    shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE '%blue%'
    JOIN shipped sh ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_0'
    WHERE ps.ps_availqty > 0.5 * sh.qty
    """,
)
def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the correlated half-of-shipped-quantity
    threshold decorrelated into an aggregate + compound-key join.
    Quantities are integer-valued doubles, so sum and 0.5x are exact
    and the comparison is engine-stable. partsupp x shipped is the one
    fact-fact shuffle; part/supplier/nation broadcast."""
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%blue%")).select("p_partkey")
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_0")
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .where(F.col("ps_availqty") > F.lit(0.5) * F.col("qty"))
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "q_grouping_sets_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
             AS sum_revenue,
           count(*) AS count_order,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                AS INTEGER) AS gid
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS in one pass: detail (flag, status), per-flag
    subtotals, and the grand total from a single scan — Spark expands
    the sets and still runs ONE shuffle with map-side partial
    aggregation, exactly what a 100 TB reporting rollup wants instead
    of three scans unioned. ``gid`` (from ``grouping()``) separates a
    real NULL group value from a subtotal row, and money sums ride the
    exact DECIMAL path so every engine agrees bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    gid = (
        F.grouping("l_returnflag") * F.lit(2) + F.grouping("l_linestatus")
    ).cast("int")
    return (
        li.where(
            F.col("l_shipdate")
            <= F.lit("1998-09-02 00:00:00").cast("timestamp")
        )
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.round(F.sum(_rev()), 2).cast("double").alias("sum_revenue"),
            F.count(F.lit(1)).alias("count_order"),
            gid.alias("gid"),
        )
    )


@query(
    "q_multi_window_prices",
    """
    WITH w AS (
      SELECT o_orderkey, o_custkey,
             CAST(lag(CAST(o_totalprice AS DECIMAL(12,2)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
               AS prev_price,
             lead(o_orderdate)
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS next_order_date,
             CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS running_spend,
             CAST(rank() OVER (PARTITION BY o_custkey
                               ORDER BY CAST(o_totalprice AS DECIMAL(12,2))
                                 DESC, o_orderkey) AS INTEGER) AS spend_rank
      FROM orders)
    SELECT o_orderkey, o_custkey, prev_price, next_order_date,
           running_spend, spend_rank
    FROM w WHERE spend_rank <= 3
    """,
)
def q_multi_window_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several window frames stacked in ONE plan over orders: lag +
    lead + a running decimal sum share a single (custkey, orderdate)
    sort — Spark computes all three in one Window operator after one
    shuffle — and the differently-ordered rank adds exactly one more
    sort WITHIN the same partitioning, not another exchange. The
    filter on rank keeps each customer's top-3 orders with their
    sequence context. Running money sums are exact decimals; ties
    break on o_orderkey, so the output is engine-exact."""
    o = _t(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    by_spend = Window.partitionBy("o_custkey").orderBy(
        _dec("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.lag(_dec("o_totalprice")).over(seq).cast("double")
            .alias("prev_price"),
            F.lead("o_orderdate").over(seq).alias("next_order_date"),
            F.sum(_dec("o_totalprice"))
            .over(seq.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            .alias("running_spend"),
            F.rank().over(by_spend).alias("spend_rank"),
        )
        .where(F.col("spend_rank") <= 3)
    )
