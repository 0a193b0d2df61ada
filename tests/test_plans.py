"""Physical-plan assertions: the scale properties the engine claims
(scan pushdown, column pruning, broadcast dimension joins, whole-stage
codegen, single-shuffle operators) pinned against the actual Catalyst
output so a regression shows up as a test failure, not a slow cluster.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from datalake_toolkit_spark.operators import asof_join
from datalake_toolkit_spark.plans import QUERIES


def _plan(df, mode: str = "simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q6_filter_pushdown_and_column_pruning(spark, sf_dir):
    """Filters must reach the parquet reader (PushedFilters) and the
    scan must read only the four referenced columns (ReadSchema)."""
    plan = _plan(QUERIES["q6_forecast_revenue"](spark, sf_dir), "formatted")
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "l_discount" in pushed and "l_quantity" in pushed
    schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in schema
    assert schema.split("struct<")[1].count(":") == 4  # exactly 4 columns scanned
    assert "l_comment" not in schema


def test_q5_dimension_joins_broadcast(spark, sf_dir):
    """The 6-table q5 join tree must broadcast every dimension side —
    no sort-merge or shuffled-hash join of lineitem against dims."""
    plan = _plan(QUERIES["q5_region_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q1_wholestage_codegen(spark, sf_dir):
    """The q1 aggregate pipeline must run inside whole-stage codegen.
    AQE materializes codegen subtrees per query stage at runtime, so
    explain('codegen') only surfaces them with AQE off — toggled here
    purely for plan inspection."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(QUERIES["q1_pricing_summary"](spark, sf_dir), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "Found 0 WholeStageCodegen" not in plan
    assert "WholeStageCodegen subtrees" in plan


def test_asof_join_single_shuffle(spark):
    """asof_join adds exactly ONE hash-partitioning exchange (the key
    shuffle for the window) — the union and projections stay narrow."""
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.timestamp_seconds(F.col("id")).alias("ts")
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 2).alias("ts"),
        (F.col("id") * 1.0).alias("val"),
    )
    plan = _plan(asof_join(left, right, on="k"))
    assert plan.count("Exchange hashpartitioning") == 1


def test_exact_dedup_partial_aggregation(spark, sf_dir):
    """Exact dedup's groupBy must show map-side partial aggregation
    (two HashAggregate levels around one exchange), not a raw-row
    shuffle of the full corpus."""
    plan = _plan(QUERIES["q_dedup_exact"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") >= 1


def test_gate_window_covers_undemoted_queries():
    """Every query not explicitly demoted must land inside the driver's
    50-entry correctness window; demoted names must all still exist."""
    from datalake_toolkit_spark.plans import DEMOTED, GATE_WINDOW, ORACLE

    names = list(QUERIES)
    undemoted = [n for n in names if n not in DEMOTED]
    assert len(undemoted) <= GATE_WINDOW, (
        f"{len(undemoted)} undemoted queries exceed the {GATE_WINDOW}-entry "
        "driver window — demote more twice-green shapes in plans/__init__.py"
    )
    assert names[: len(undemoted)] == undemoted
    missing = [n for n in DEMOTED if n not in QUERIES]
    assert not missing, f"DEMOTED names not registered: {missing}"
    # demoted queries stay locally verified: all have oracles
    assert all(n in ORACLE for n in DEMOTED)


# Queries where a nested-loop/cartesian shape IS the documented design:
# exact all-pairs validation baselines (quadratic by construction) and
# the brute-force ANN ground truth whose only join predicate is !=.
_NESTED_LOOP_BY_DESIGN = {
    "q_cosine_near_dups",   # exact all-pairs validation mode
    "q_ann_cosine_topk",    # brute-force baseline: join on qid != cid
    "q_jaccard_near_dups",  # exact-Jaccard baseline (inverted-index pruned)
    "q22_sales_opportunity",  # one-row scalar-average broadcast: O(n), see docstring
    "q11_important_stock",  # one-row grand-total broadcast: O(n), see docstring
    # one-row corpus-mean broadcast (dimension_means composed via
    # crossJoin(broadcast(...))): O(n) by design, the candidate join
    # itself is a bucket equi-join — see cosine_near_dup_pairs center=
    "q_centered_cosine_near_dups",
    # the vector side is cosine_topk's brute-force exact ranking
    # (join on qid != cid against a 3-query broadcast): O(n_docs x
    # n_queries) by design with the query batch bounded — the same
    # owned shape as q_ann_cosine_topk; the lexical side and the RRF
    # fusion are equi-joins/aggregates
    "q_hybrid_search",
}

# Streaming-harness queries execute eagerly (start a stream) inside the
# builder; plan inspection would re-run the stream for no signal.
_SKIP_PLAN_SWEEP = {"q_stateful_running_status"}


@pytest.mark.slow
def test_no_unplanned_nested_loop_or_cartesian_anywhere(spark, sf_dir):
    """Scale guard across the ENTIRE query surface: no query may plan a
    CartesianProduct or BroadcastNestedLoopJoin unless its docstring
    owns that shape as an explicit validation baseline. Catching a
    stray cross join here costs one test; catching it at 100 TB costs
    a cluster."""
    offenders = {}
    for name, fn in QUERIES.items():
        if name in _NESTED_LOOP_BY_DESIGN or name in _SKIP_PLAN_SWEEP:
            continue
        plan = _plan(fn(spark, sf_dir))
        hits = [
            tok
            for tok in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if tok in plan
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, f"unplanned quadratic joins: {offenders}"


def test_curate_corpus_single_lazy_plan(spark, sf_dir):
    """The flagship curation pipeline's one-plan claim, pinned: building
    curate_corpus launches ZERO jobs (fully lazy — no mid-pipeline
    count/collect), and its physical plan's only leaves are parquet
    file scans (no InMemoryTableScan / Scan ExistingRDD that would
    betray a materialized intermediate)."""
    from datalake_toolkit_spark.llm import curate_corpus
    from datalake_toolkit_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")  # footer reads land outside the probe group
    sc = spark.sparkContext
    sc.setJobGroup("curate_build_probe", "laziness probe")
    try:
        out = curate_corpus(
            docs.where(F.col("doc_id") % 97 != 0),
            eval_df=docs.where(F.col("doc_id") % 97 == 0),
            mixture_weights={"src0": 2.5, "src1": 0.25},
        )
        jobs = sc.statusTracker().getJobIdsForGroup("curate_build_probe")
    finally:
        sc.setJobGroup(None, None)
    assert jobs == [], f"curate_corpus construction launched jobs: {jobs}"
    plan = _plan(out)
    for marker in ("InMemoryTableScan", "Scan ExistingRDD", "LogicalRDD"):
        assert marker not in plan, f"materialized intermediate in plan: {marker}"
    assert "FileScan parquet" in plan or "Scan parquet" in plan


def _sweep_all_queries(spark, sf_dir, out_dir, transform):
    """Write each star-schema table through ``transform`` to out_dir,
    then execute EVERY registered query against it, collecting crashes."""
    from datalake_toolkit_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        transform(load_table(spark, sf_dir, t)).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    failures = {}
    for name, fn in QUERIES.items():
        try:
            fn(spark, out_dir).count()
        except Exception as exc:  # noqa: BLE001
            failures[name] = f"{type(exc).__name__}: {exc}"
    return failures


@pytest.mark.slow
def test_every_query_survives_empty_tables(spark, sf_dir, tmp_path):
    """At 100 TB, empty partitions / fresh tables are routine: every
    registered query must execute (0 rows is fine, a crash is not)
    against schema-only empty inputs."""
    failures = _sweep_all_queries(
        spark, sf_dir, str(tmp_path / "empty_sf"), lambda df: df.limit(0)
    )
    assert not failures, f"queries crashing on empty inputs: {failures}"


@pytest.mark.slow
def test_every_query_survives_null_payloads(spark, sf_dir, tmp_path):
    """All-NULL payload columns (keys intact) must not crash any query:
    NULL text/content/props are routine in real corpora. Catches
    mapInPandas None-handling and null-partition-value bugs."""
    from pyspark.sql import functions as F

    keys = {
        "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey",
        "c_nationkey", "s_suppkey", "s_nationkey", "p_partkey",
        "o_orderkey", "o_custkey", "l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "event_id", "user_id", "doc_id", "vec_id",
    }
    def nullify(df):
        out = df.limit(50)
        for c, ty in out.dtypes:
            if c not in keys:
                out = out.withColumn(c, F.lit(None).cast(ty))
        return out

    failures = _sweep_all_queries(spark, sf_dir, str(tmp_path / "null_sf"), nullify)
    assert not failures, f"queries crashing on null payloads: {failures}"


def test_dynamic_partition_pruning_through_engine_write(spark, sf_dir, tmp_path):
    """Scale guard: a fact table written through write_partitioned must
    be DPP-prunable — joining it to a filtered dimension on the
    partition column has to inject a dynamicpruning subquery into the
    fact scan's PartitionFilters, so at 100 TB the join reads only the
    partitions the dimension selects, not the whole table."""
    from datalake_toolkit_spark.sources import load_table
    from datalake_toolkit_spark.sources.ingest import write_partitioned

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_partitioned(orders, str(tmp_path / "orders_part"), ["o_year"])
    spark.createDataFrame(
        [(y, "keep" if y == 1996 else "drop") for y in range(1994, 2003)],
        "o_year int, tag string",
    ).write.mode("overwrite").parquet(str(tmp_path / "dim"))

    fact = spark.read.parquet(str(tmp_path / "orders_part"))
    dim = spark.read.parquet(str(tmp_path / "dim")).where(F.col("tag") == "keep")
    joined = fact.join(dim, "o_year").groupBy("o_year").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruning reaches the scan's partition filters (the fact
    # table is the only partitioned input, so the filter is its scan's)
    pruned = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "dynamicpruning" in ln
    ]
    assert pruned, plan
    # semantics unchanged: only 1996 partitions read
    rows = joined.collect()
    assert len(rows) == 1 and rows[0]["o_year"] == 1996


def test_runtime_bloom_filter_injects_on_fact_fact_join(spark, sf_dir):
    """Scale guard: the engine's fact-fact shuffle-join shape must be
    ELIGIBLE for Spark's runtime bloom-filter injection (a selective
    filter on one side becomes a might_contain pre-filter on the
    other, cutting shuffle volume before the exchange). The size
    thresholds are production-scale (10 GB application side), so the
    test scales them down to the fixture data — what's pinned is that
    nothing in our plan shape (hints, casts, subqueries) blocks the
    InjectRuntimeFilter rule at 100 TB."""
    from datalake_toolkit_spark.sources import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_setsim_and_dup_ngram_stay_off_broadcast_path(spark, sf_dir):
    """The prefix index, token-frequency table, and per-doc shingle
    arrays are all corpus-sized: Spark's size estimates at test SF
    would happily broadcast them, which OOMs at 100 TB — the
    shuffle_hash hints must hold everywhere in both operators."""
    from datalake_toolkit_spark.llm import dup_ngram_stats, set_similarity_join
    from datalake_toolkit_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    for df in (
        set_similarity_join(docs, "doc_id", "text", k=3, threshold=0.8),
        dup_ngram_stats(docs, "doc_id", "text", k=5),
    ):
        plan = _plan(df)
        assert "BroadcastHashJoin" not in plan, plan
        assert "ShuffledHashJoin" in plan
