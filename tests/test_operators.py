"""Operator unit tests for semantics the SQL oracle can't cover
(as-of join directions/tolerance; the backward path is oracle-checked
by q_asof_join against DuckDB's native ASOF JOIN)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_toolkit_spark.operators import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 35, "c"), (2, 5, "d"), (3, 9, "e")],
        "k int, sec int, tag string",
    ).withColumn("ts", F.timestamp_seconds("sec"))
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 18, 200.0), (1, 40, 300.0), (2, 50, 400.0)],
        "k int, sec int, val double",
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    return left, right


def test_asof_backward_inclusive_ties(spark):
    left, right = _frames(spark)
    out = {
        r.tag: (r.val_r, r.ts_r)
        for r in asof_join(left, right, on="k").collect()
    }
    # equal timestamp matches (inclusive): left@10 takes right@10
    assert out["a"][0] == 100.0
    # latest at-or-before: left@20 -> right@18, left@35 -> right@18
    assert out["b"][0] == 200.0
    assert out["c"][0] == 200.0
    # right rows only in the future (k=2: right@50 > left@5) -> null
    assert out["d"] == (None, None)
    # key with no right rows at all -> null
    assert out["e"] == (None, None)


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        r.tag: r.val_r
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    # earliest at-or-after: left@10 -> right@10 (inclusive tie)
    assert out["a"] == 100.0
    assert out["b"] == 300.0  # left@20 -> right@40
    assert out["c"] == 300.0  # left@35 -> right@40
    assert out["d"] == 400.0  # left@5  -> right@50
    assert out["e"] is None


def test_range_join_matches_naive_and_avoids_nested_loop(spark):
    """Band-bucketed range join must equal the naive non-equi join
    exactly (inclusive bounds, overlapping intervals, multi-band
    spans) and must not plan a broadcast nested loop."""
    import contextlib
    import io

    from datalake_toolkit_spark.operators import range_join

    points = spark.range(200).select(
        F.col("id").alias("pid"), (F.col("id") * 1.7).alias("v")
    )
    intervals = spark.range(20).select(
        F.col("id").alias("iid"),
        (F.col("id") * 15.0).alias("lo"),
        (F.col("id") * 15.0 + 40.0).alias("hi"),
    )
    banded = range_join(points, intervals, "v", "lo", "hi", band_width=10.0)
    naive = points.join(
        intervals, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
    )
    got = {(r.pid, r.iid) for r in banded.collect()}
    want = {(r.pid, r.iid) for r in naive.collect()}
    assert got == want and len(want) > 200

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        banded.explain()
    assert "BroadcastNestedLoopJoin" not in buf.getvalue()


def test_with_running_total_matches_global_window(spark):
    """Range-partitioned running total must equal the naive
    single-partition global-window cumulative sum, including under a
    descending order with duplicate sort keys broken by a second
    column."""
    from pyspark.sql import Window

    from datalake_toolkit_spark.operators import with_running_total

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("double").alias("score"),
        (F.col("id") % 13 + 1).alias("tokens"),
    )
    order = [F.desc("score"), F.asc("doc_id")]
    got = {
        r.doc_id: r.cum
        for r in with_running_total(df, order, "tokens", "cum").collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.doc_id: r.cum
        for r in df.withColumn("cum", F.sum("tokens").over(w)).collect()
    }
    assert got == want


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r.tag: r.val_r
        for r in asof_join(left, right, on="k", tolerance_seconds=5).collect()
    }
    # lag 0 and 2 pass the 5s tolerance; lag 17 does not
    assert out["a"] == 100.0
    assert out["b"] == 200.0
    assert out["c"] is None
    assert out["d"] is None


def test_auto_skew_join_equals_plain_join(spark):
    """Hot keys take the salted path, cold keys the plain path; the
    union must equal the plain inner join exactly — including a key
    appearing only on one side and null-key rows."""
    from datalake_toolkit_spark.operators import auto_skew_join

    left = spark.createDataFrame(
        [(1, i) for i in range(500)]  # hot key
        + [(2, 1), (3, 5), (None, 9)],
        "k bigint, lv bigint",
    )
    right = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 300), (4, 400)], "k bigint, rv bigint"
    )
    plain = sorted((r.k, r.lv, r.rv) for r in left.join(right, "k").collect())
    auto = sorted(
        (r.k, r.lv, r.rv)
        for r in auto_skew_join(
            left, right, "k", hot_key_threshold=100, salt=4
        ).collect()
    )
    assert auto == plain and len(plain) == 1001
    # below threshold: pure passthrough, still identical
    no_hot = sorted(
        (r.k, r.lv, r.rv)
        for r in auto_skew_join(
            left, right, "k", hot_key_threshold=10_000
        ).collect()
    )
    assert no_hot == plain


def test_quality_constraints_and_unique_key(spark):
    from datalake_toolkit_spark.quality import (
        assert_unique_key,
        check_constraints,
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (2, None, 3.0), (4, "d", None)],
        "id bigint, name string, score double",
    )
    report = {
        r.rule: (r.n_violations, r.passed)
        for r in check_constraints(
            df,
            {
                "id_positive": "id > 0",
                "name_not_null": "name IS NOT NULL",
                "score_non_negative": "score >= 0",  # NULL counts as violation
            },
        ).collect()
    }
    assert report == {
        "id_positive": (0, True),
        "name_not_null": (1, False),
        "score_non_negative": (2, False),
    }
    dups = assert_unique_key(df, ["id"]).collect()
    assert [(r.id, r.n_copies) for r in dups] == [(2, 2)]

    prof = {r.column: r for r in profile_table(df, exact_distinct=True).collect()}
    assert prof["id"].n_rows == 4 and prof["id"].n_distinct == 3
    assert prof["name"].n_null == 1 and prof["name"].avg_len == 1.0
    assert prof["score"].min_str == "-1.0" and prof["id"].avg_len is None


def test_funnel_steps_greedy_order_and_horizon(spark):
    from datalake_toolkit_spark.operators.analytics import (
        cohort_retention,
        funnel_counts,
        funnel_steps,
    )

    rows = [
        # u1: full funnel in order
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 01:00:00", "click"),
        (3, 1, "2024-01-01 02:00:00", "purchase"),
        # u2: purchase BEFORE view/click -> only reaches step 1
        (4, 2, "2024-01-01 00:00:00", "purchase"),
        (5, 2, "2024-01-01 01:00:00", "view"),
        # u3: view then click, purchase outside the 1h horizon
        (6, 3, "2024-01-01 00:00:00", "view"),
        (7, 3, "2024-01-01 00:30:00", "click"),
        (8, 3, "2024-01-01 02:00:00", "purchase"),
        # u4: irrelevant events only
        (9, 4, "2024-01-01 00:00:00", "error"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    steps = ["view", "click", "purchase"]
    got = {
        r["user_id"]: r["funnel_step"]
        for r in funnel_steps(ev, steps, within_seconds=3600).collect()
    }
    assert got == {1: 2, 2: 1, 3: 2}  # u1 purchase at +2h > 1h horizon too
    got_wide = {
        r["user_id"]: r["funnel_step"] for r in funnel_steps(ev, steps).collect()
    }
    assert got_wide == {1: 3, 2: 1, 3: 3}
    counts = {
        (r["step"], r["step_name"]): r["n_users"]
        for r in funnel_counts(ev, steps).collect()
    }
    assert counts == {(1, "view"): 3, (2, "click"): 2, (3, "purchase"): 2}

    # cohort: u1-u3 first-seen same week; a week-2 event retains u1
    ev2 = ev.union(
        spark.createDataFrame(
            [(10, 1, "2024-01-09 00:00:00", "view")],
            "event_id long, user_id long, ts string, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))
    )
    ret = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in cohort_retention(ev2).collect()
    }
    cohort = next(k[0] for k in ret)
    assert ret[(cohort, 0)] == 4  # all four users in the base week
    assert ret[(cohort, 1)] == 1  # only u1 came back next week


def test_salted_and_auto_skew_join_outer_modes_equal_plain(spark):
    """right/full-outer variants: the salted decomposition (mirror
    salting for right; left_outer + key-anti for full) must reproduce
    the plain join exactly — matched pairs once, each unmatched outer
    row exactly once, NULL keys unmatched on their own side."""
    from datalake_toolkit_spark.operators import auto_skew_join, salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(500)]  # hot key
        + [(2, 1), (3, 5), (None, 9)],
        "k bigint, lv bigint",
    )
    right = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 300), (4, 400), (None, 500)],
        "k bigint, rv bigint",
    )

    def rows(df):
        return sorted(
            ((r.k, r.lv, r.rv) for r in df.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    for how in ("right", "full"):
        plain = rows(left.join(right, "k", how))
        assert rows(salted_join(left, right, "k", salt=4, how=how)) == plain
        assert (
            rows(
                auto_skew_join(
                    left, right, "k", how=how, hot_key_threshold=100, salt=4
                )
            )
            == plain
        ), how
        # below threshold: passthrough path, still identical
        assert (
            rows(auto_skew_join(left, right, "k", how=how, hot_key_threshold=10_000))
            == plain
        ), how
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="cross")
