

def test_profile_drift_flags_each_dimension(spark):
    from datalake_toolkit_spark.quality import profile_drift, profile_table

    base_df = spark.createDataFrame(
        [(i, f"name{i}", float(i)) for i in range(100)],
        "id long, name string, score double",
    )
    # current: nulls injected into name, score range shifted, id halved
    # distinct density, plus a brand-new column
    cur_df = spark.createDataFrame(
        [
            (i // 3, None if i % 3 == 0 else f"name{i}", float(i) + 1000.0, "x" * 50)
            for i in range(100)
        ],
        "id long, name string, score double, extra string",
    )
    drift = {
        r["column"]: r.asDict()
        for r in profile_drift(
            profile_table(base_df, exact_distinct=True),
            profile_table(cur_df, exact_distinct=True),
        ).collect()
    }
    assert drift["extra"]["schema_drift"] and drift["extra"]["any_drift"]
    assert drift["name"]["null_drift"]  # 0% -> ~33% nulls
    assert drift["id"]["distinct_drift"]  # density halved
    assert drift["score"]["range_drift"]  # min/max moved
    assert not drift["score"]["null_drift"]

    # self-comparison is drift-free
    prof = profile_table(base_df, exact_distinct=True)
    clean = profile_drift(prof, prof)
    assert clean.where("any_drift").count() == 0
