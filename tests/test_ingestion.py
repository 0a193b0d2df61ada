"""End-to-end tests for the M1 batch ingest pipeline and the M4
Structured-Streaming ingestion state machine."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_toolkit_spark.sources import load_table
from datalake_toolkit_spark.sources.ingest import (
    compact,
    ingest_delimited,
)
from datalake_toolkit_spark.streaming import (
    IngestionPipeline,
    RoutePlugin,
    read_ledger,
)
from datalake_toolkit_spark.streaming.ingestion import (
    STATUS_LOADED,
    STATUS_SKIPPED,
    STATUS_UNMATCHED,
)

LINEITEM_DDL = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate string"
)

EVENTS_DDL = "event_id bigint, user_id bigint, event_type string, value double"


def test_batch_ingest_roundtrip(spark, sf_dir, tmp_path):
    """Flagship data-plane slice: parquet -> CSV (raw zone stand-in)
    -> schema-applied ingest with date parse + year partitioning ->
    partitioned parquet -> query."""
    li = load_table(spark, sf_dir, "lineitem")
    raw_dir = str(tmp_path / "raw")
    (
        li.withColumn("l_shipdate", F.date_format("l_shipdate", "dd.MM.yyyy HH:mm:ss"))
        .write.option("sep", ";")
        .option("header", "false")
        .mode("overwrite")
        .csv(raw_dir)
    )
    out_dir = str(tmp_path / "analytics")
    result = ingest_delimited(
        spark,
        raw_dir,
        out_dir,
        schema=LINEITEM_DDL,
        sep=";",
        date_formats={"l_shipdate": "dd.MM.yyyy HH:mm:ss"},
        partition_source="l_shipdate",
        partition_col="ship_year",
        partition_kind="year",
        target_file_partitions=4,
    )
    assert result.count() == li.count()
    # partition pruning surface exists
    years = [d for d in os.listdir(out_dir) if d.startswith("ship_year=")]
    assert len(years) >= 2
    # values survived the round trip (spot-check an aggregate)
    src = li.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).first()[0]
    dst = result.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).first()[0]
    assert src == dst
    # bad date strings -> NULL, not crash (F1 parity)
    assert result.where(F.col("l_shipdate").isNull()).count() == 0


def test_compact(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").limit(1000)
    frag = str(tmp_path / "frag")
    li.repartition(16).write.mode("overwrite").parquet(frag)
    compact(spark, frag, 2)
    files = [f for f in os.listdir(frag + "_compacted") if f.endswith(".parquet")]
    assert len(files) == 2


@pytest.fixture()
def events_csv_writer(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )
    rows = ev.limit(300).collect()

    def write(path: str, rows_slice):
        with open(path, "w") as fh:
            for r in rows_slice:
                fh.write(f"{r.event_id},{r.user_id},{r.event_type},{r.value}\n")

    return rows, write


def test_streaming_ingestion_state_machine(spark, tmp_path, events_csv_writer):
    rows, write = events_csv_writer
    src = tmp_path / "incoming"
    src.mkdir()
    write(str(src / "events_a.csv"), rows[:100])
    write(str(src / "ignore_b.csv"), rows[100:200])
    write(str(src / "mystery_d.dat"), rows[250:300])  # no plugin matches

    pipeline = IngestionPipeline(
        spark=spark,
        source_dir=str(src),
        schema=EVENTS_DDL,
        output_path=str(tmp_path / "out"),
        ledger_path=str(tmp_path / "ledger"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        plugins=[
            RoutePlugin("skip_file", r"ignore_.*\.csv$", skip=True),
            RoutePlugin(
                "events",
                r"events_.*\.csv$",
                transform=lambda df: df.withColumn(
                    "value_rounded", F.round("value", 0)
                ),
            ),
        ],
    )
    pipeline.run_available_now()

    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 100  # skipped + unmatched files never land
    assert "value_rounded" in out.columns  # plugin transform applied

    ledger = read_ledger(spark, str(tmp_path / "ledger"))
    statuses = {
        os.path.basename(r.s3_object_name): r.file_status for r in ledger.collect()
    }
    assert statuses["events_a.csv"] == STATUS_LOADED
    assert statuses["ignore_b.csv"] == STATUS_SKIPPED
    # no-plugin-match quarantine (the reference's SNS-error path):
    # ledger row, no output rows
    assert statuses["mystery_d.dat"] == STATUS_UNMATCHED

    # drain again with no new files: nothing duplicates (checkpoint)
    pipeline.run_available_now()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 100

    # incremental: a third file arrives, only it is processed
    write(str(src / "events_c.csv"), rows[200:300])
    pipeline.run_available_now()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 200


def test_ingestion_replay_after_failure_no_data_loss(
    spark, tmp_path, events_csv_writer
):
    """A batch whose write job dies mid-flight must be REPROCESSED on
    restart (the ledger has only PROCESSING/FAILED rows for it), and
    the replay must not duplicate rows (dynamic partition overwrite of
    the batch's own ingest_batch partition)."""
    rows, write = events_csv_writer
    src = tmp_path / "incoming"
    src.mkdir()
    write(str(src / "events_a.csv"), rows[:100])
    write(str(src / "events_b.csv"), rows[100:200])
    flag = str(tmp_path / "ok.flag")

    @F.udf("double")
    def guarded(v):
        if not os.path.exists(flag):
            raise RuntimeError("injected mid-write failure")
        return v

    def make_pipeline():
        return IngestionPipeline(
            spark=spark,
            source_dir=str(src),
            schema=EVENTS_DDL,
            output_path=str(tmp_path / "out"),
            ledger_path=str(tmp_path / "ledger"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            plugins=[
                RoutePlugin(
                    "events",
                    r"events_.*\.csv$",
                    transform=lambda df: df.withColumn("value", guarded("value")),
                )
            ],
        )

    with pytest.raises(Exception):
        make_pipeline().run_available_now()

    # no terminal success recorded: every file is PROCESSING/FAILED
    ledger = read_ledger(spark, str(tmp_path / "ledger"))
    assert not {
        r.file_status for r in ledger.collect()
    } & {STATUS_LOADED, STATUS_SKIPPED}

    # "fix the environment" and restart from the same checkpoint
    open(flag, "w").close()
    make_pipeline().run_available_now()

    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 200  # nothing dropped
    assert out.select("event_id").distinct().count() == 200  # nothing duplicated
    ledger = read_ledger(spark, str(tmp_path / "ledger"))
    statuses = {
        os.path.basename(r.s3_object_name): r.file_status for r in ledger.collect()
    }
    assert statuses == {
        "events_a.csv": STATUS_LOADED,
        "events_b.csv": STATUS_LOADED,
    }

    # a second restart with nothing new is a no-op
    make_pipeline().run_available_now()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 200


def test_stream_batch_symmetric_windows(spark, sf_dir, tmp_path):
    """The windowing operators produce identical results on a stream
    (file source, availableNow, memory sink) and in batch."""
    from datalake_toolkit_spark.streaming.windows import windowed_counts

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    src = str(tmp_path / "stream_src")
    ev.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .parquet(src)
    )
    q = (
        windowed_counts(stream, window="1 hour", watermark="1 day")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.table("win_counts").collect()
    }
    batch = {
        (r.window_start, r.event_type): r.n_events
        for r in windowed_counts(ev, window="1 hour").collect()
    }
    assert streamed == batch


def test_streaming_dedup_bounded_state(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark drops re-arrivals of a key on a
    live stream: two source files with fully overlapping event_ids
    yield each id exactly once at the sink."""
    from datalake_toolkit_spark.streaming import streaming_dedup

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts").limit(200)
    src = str(tmp_path / "dedup_src")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # second copy of every id

    stream = spark.readStream.schema("event_id bigint, ts timestamp").parquet(src)
    q = (
        streaming_dedup(stream, keys=("event_id",), watermark="2 days")
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = [r.event_id for r in spark.table("dedup_sink").collect()]
    assert len(ids) == len(set(ids)) == 200


def test_rollup_maintainer_incremental_equals_batch(spark, sf_dir, tmp_path):
    """The continuously-maintained rollup, fed one file per
    micro-batch, must equal the one-shot batch aggregation of all
    data; re-draining with no new input must change nothing; and a
    late-arriving file must fold into already-written windows."""
    from datalake_toolkit_spark.streaming import maintain_rollup

    ev_all = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    first = ev_all.where("event_id % 2 = 0").drop("event_id")
    second = ev_all.where("event_id % 2 = 1").drop("event_id")
    ev = ev_all.drop("event_id")
    src = str(tmp_path / "roll_src")
    first.coalesce(1).write.mode("overwrite").parquet(src)

    def drain():
        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        maintain_rollup(
            stream,
            rollup_path=str(tmp_path / "rollup"),
            checkpoint_dir=str(tmp_path / "roll_ckpt"),
            watermark="90 days",
        )

    drain()
    r1 = spark.read.parquet(str(tmp_path / "rollup"))
    n_windows_first = r1.count()
    # the batch spans many dates: the merge must fan out per-dt (the
    # rebalance-by-dt write), not serialize through one coalesced task
    assert r1.select("dt").distinct().count() > 1
    drain()  # no new files: checkpoint makes this a no-op
    assert spark.read.parquet(str(tmp_path / "rollup")).count() == n_windows_first

    # late file arrives (same time range -> updates existing windows)
    second.coalesce(1).write.mode("append").parquet(src)
    drain()
    rolled = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(str(tmp_path / "rollup")).collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .collect()
    }
    assert set(rolled) == set(batch)
    for k in batch:
        assert rolled[k][0] == batch[k][0]
        assert abs(rolled[k][1] - batch[k][1]) < 1e-6


def test_stateful_running_status(spark, tmp_path):
    """applyInPandasWithState carries per-key state across
    micro-batches: two files drained one per trigger must produce
    cumulative counts, not per-batch counts."""
    import json as _json

    from datalake_toolkit_spark.streaming import running_status

    src = tmp_path / "status_stream"
    src.mkdir()
    f1 = [
        {"file": "a.csv", "status": "INITIAL_LOAD", "ts": 1.0},
        {"file": "b.csv", "status": "INITIAL_LOAD", "ts": 2.0},
        {"file": "a.csv", "status": "PROCESSING", "ts": 3.0},
    ]
    f2 = [
        {"file": "a.csv", "status": "LOADED", "ts": 4.0},
        {"file": "c.csv", "status": "INITIAL_LOAD", "ts": 5.0},
    ]
    for name, rows in [("batch1.json", f1), ("batch2.json", f2)]:
        (src / name).write_text("\n".join(_json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("file string, status string, ts double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = running_status(stream, key_col="file", status_col="status", ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("running_status_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM running_status_sink").collect()
    # last emitted row per key wins (update mode re-emits touched keys)
    latest = {}
    for r in rows:
        latest[r.key] = r
    assert latest["a.csv"].n_events == 3          # state carried across batches
    assert latest["a.csv"].latest_status == "LOADED"
    assert latest["a.csv"].first_seen == 1.0
    assert latest["a.csv"].last_seen == 4.0
    assert latest["b.csv"].n_events == 1
    assert latest["c.csv"].latest_status == "INITIAL_LOAD"


def test_stateful_late_batch_does_not_clobber_latest_status(spark, tmp_path):
    """An all-late micro-batch (every event older than the stored
    last_seen) must fold into counts and first_seen but must NOT
    overwrite latest_status with stale data."""
    import json as _json

    from datalake_toolkit_spark.streaming import running_status

    src = tmp_path / "late_stream"
    src.mkdir()

    (src / "fresh.json").write_text(
        _json.dumps({"file": "a.csv", "status": "LOADED", "ts": 10.0})
    )
    # late replay lands in a LATER micro-batch (file source orders by
    # modification time; maxFilesPerTrigger=1 gives one batch per file)
    (src / "late.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"file": "a.csv", "status": "INITIAL_LOAD", "ts": 1.0},
                {"file": "a.csv", "status": "PROCESSING", "ts": 2.0},
            ]
        )
    )
    os.utime(src / "fresh.json", (1_000_000, 1_000_000))
    os.utime(src / "late.json", (2_000_000, 2_000_000))

    stream = (
        spark.readStream.schema("file string, status string, ts double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = running_status(stream, key_col="file", status_col="status", ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("late_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM late_sink").collect()
    latest = {r.key: r for r in rows}
    assert latest["a.csv"].n_events == 3
    assert latest["a.csv"].latest_status == "LOADED"  # not clobbered by late data
    assert latest["a.csv"].first_seen == 1.0  # late data folded in
    assert latest["a.csv"].last_seen == 10.0


def test_insert_into_position_based(spark, tmp_path):
    """S12 contract: insertInto matches columns by POSITION (names
    ignored, partition column last), and dynamic overwrite replaces
    only the partitions present in the inserted frame."""
    from datalake_toolkit_spark.sources.ingest import insert_into_table

    spark.sql("DROP TABLE IF EXISTS ins_t")
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")],
        "id int, payload string, dt string",
    )
    base.write.partitionBy("dt").option("path", str(tmp_path / "ins_t")).mode(
        "overwrite"
    ).saveAsTable("ins_t")

    # deliberately wrong NAMES, correct positions -> must still land
    more = spark.createDataFrame([(3, "c", "2024-01-02")], "x int, y string, z string")
    insert_into_table(more, "ins_t")
    got = spark.table("ins_t")
    assert got.count() == 3
    assert got.where("dt = '2024-01-02'").count() == 2
    assert {r.payload for r in got.collect()} == {"a", "b", "c"}

    # dynamic partition overwrite: only the touched partition replaced
    repl = spark.createDataFrame([(9, "r", "2024-01-02")], "a int, b string, c string")
    insert_into_table(repl, "ins_t", overwrite=True)
    got = spark.table("ins_t")
    assert got.where("dt = '2024-01-02'").count() == 1
    assert got.where("dt = '2024-01-01'").count() == 1  # untouched survives
    spark.sql("DROP TABLE ins_t")


def test_dynamicframe_catalog_roundtrip(spark, tmp_path):
    """S10/S16: the reference Glue scripts' exact call shape —
    fromDF -> write_dynamic_frame(catalog) -> create_dynamic_frame
    (catalog) -> toDF -> filter by entity type — over the JSON
    document catalog, no AWS context."""
    import json as _json

    from datalake_toolkit_spark.sources import (
        DynamicFrame,
        create_dynamic_frame_from_options,
        write_dynamic_frame_from_options,
    )

    cat_dir = str(tmp_path / "catalog_docs")
    dbs = spark.createDataFrame(
        [("database", "sales", None), ("database", "ops", None)],
        "type string, name string, tbl string",
    )
    tbls = spark.createDataFrame(
        [("table", "sales", "orders"), ("table", "ops", "jobs")],
        "type string, name string, tbl string",
    )
    for frame_name, df in [("dyf_databases", dbs), ("dyf_tables", tbls)]:
        dyf = DynamicFrame.fromDF(df, glue_ctx=None, name=frame_name)
        write_dynamic_frame_from_options(
            dyf, connection_type="catalog",
            connection_options={"catalog.path": cat_dir},
        )

    back = create_dynamic_frame_from_options(
        spark, connection_type="catalog",
        connection_options={"catalog.path": cat_dir},
    ).toDF()
    assert back.count() == 4
    assert back.where('type = "database"').count() == 2  # reference filter shape
    assert {r.tbl for r in back.where('type = "table"').collect()} == {
        "orders",
        "jobs",
    }

    # apply_mapping / resolve_choice compile to one projection
    mapped = (
        DynamicFrame.fromDF(back, name="m")
        .apply_mapping([("type", "string", "entity_type", "string"),
                        ("name", "string", "db_name", "string")])
        .resolve_choice([("db_name", "cast:string")])
        .toDF()
    )
    assert mapped.columns == ["entity_type", "db_name"]


def test_format_generic_roundtrip_all_formats(spark, sf_dir, tmp_path):
    """read_files/write_files: every natively-supported format round
    trips values exactly (ORC/JSON/CSV alongside parquet), including a
    partitioned ORC write with the shared file-count control."""
    from datalake_toolkit_spark.sources import read_files, write_files

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    expected = sorted(orders.collect())
    ddl = (
        "o_orderkey bigint, o_custkey bigint, o_totalprice double, "
        "o_orderpriority string"
    )
    for fmt in ("parquet", "orc", "json", "csv"):
        d = str(tmp_path / fmt)
        write_files(orders, d, fmt=fmt, options=(
            {"header": "true"} if fmt == "csv" else None
        ))
        back = read_files(spark, d, fmt=fmt, schema=ddl, options=(
            {"header": "true"} if fmt == "csv" else None
        )).select(*orders.columns)
        assert sorted(back.collect()) == expected, fmt

    part_dir = str(tmp_path / "orc_part")
    write_files(orders, part_dir, fmt="orc", partition_by=["o_orderpriority"])
    back = read_files(spark, part_dir, fmt="orc")
    assert back.count() == len(expected)
    # partition pruning works on the directory layout
    one = back.where(F.col("o_orderpriority") == expected[0].o_orderpriority)
    assert one.count() > 0

    with pytest.raises(ValueError):
        write_files(orders, str(tmp_path / "x"), fmt="avro")


def test_interval_join_stream_matches_batch(spark, sf_dir, tmp_path):
    """The watermarked stream-stream interval join over a live stream
    must emit exactly the batch execution's inner-join pairs."""
    from datalake_toolkit_spark.streaming import interval_join

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type")
        .where(F.col("user_id") < 40)
    )
    purchases = ev.where("event_type = 'purchase'").drop("event_type")
    views = ev.where("event_type = 'view'").drop("event_type")
    expected = {
        (r.event_id, r.event_id_r)
        for r in interval_join(purchases, views, on="user_id", within="2 hours").collect()
    }

    psrc, vsrc = str(tmp_path / "p"), str(tmp_path / "v")
    purchases.coalesce(1).write.mode("overwrite").parquet(psrc)
    views.coalesce(1).write.mode("overwrite").parquet(vsrc)
    ddl = "event_id bigint, user_id bigint, ts timestamp"
    ps = spark.readStream.schema(ddl).parquet(psrc)
    vs = spark.readStream.schema(ddl).parquet(vsrc)
    q = (
        interval_join(ps, vs, on="user_id", within="2 hours", watermark="1 day")
        .writeStream.format("memory")
        .queryName("ij_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.event_id, r.event_id_r) for r in spark.table("ij_sink").collect()}
    assert got == expected and len(expected) > 0


def test_read_delimited_permissive_corrupt_records(spark, tmp_path):
    """A malformed line costs one quarantined row, never the job: good
    rows parse, bad rows land whole in the corrupt-record column."""
    from datalake_toolkit_spark.sources.ingest import read_delimited

    raw = tmp_path / "raw.csv"
    raw.write_text("1,alpha,2.5\nnot-a-number,beta,oops\n3,gamma,9.0\n")
    df = read_delimited(
        spark,
        str(raw),
        schema="id bigint, name string, score double",
        null_value=None,
        corrupt_record_col="_bad",
    ).cache()
    good = df.where("_bad IS NULL").orderBy("id").collect()
    bad = df.where("_bad IS NOT NULL").collect()
    assert [(r.id, r.name, r.score) for r in good] == [(1, "alpha", 2.5), (3, "gamma", 9.0)]
    assert len(bad) == 1 and bad[0]._bad == "not-a-number,beta,oops"
    with pytest.raises(ValueError):
        read_delimited(spark, str(raw), corrupt_record_col="_bad")


def test_cli_entrypoints_in_process(spark, sf_dir, tmp_path, capsys):
    """The argparse front door drives ingest/query/profile/compact
    against the shared session (getOrCreate adopts the test session)."""
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main

    # ingest: csv -> partitioned parquet
    src = tmp_path / "raw.csv"
    src.write_text("1,a,2024-01-01\n2,b,2024-01-02\n3,c,2024-01-01\n")
    out_dir = str(tmp_path / "ingested")
    rc = main([
        "ingest", "--input", str(src), "--output", out_dir,
        "--schema", "id long, name string, dt_raw string",
        "--partition-source", "dt_raw",
    ])
    assert rc == 0
    res = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows_written"] == 3

    # query: named plan with row output
    rc = main(["query", "--name", "q_nation_region", "--sf-dir", sf_dir, "--show", "2"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2 and "n_name" in lines[0]
    assert main(["query", "--name", "nope", "--sf-dir", sf_dir]) == 2
    rc = main(["query", "--name", "x", "--sf-dir", sf_dir, "--list"])
    assert rc == 0
    assert "q1_pricing_summary" in capsys.readouterr().out.splitlines()

    # profile: one JSON line per column
    rc = main(["profile", "--table", "region", "--sf-dir", sf_dir])
    assert rc == 0
    prof = [json_mod.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert {p["column"] for p in prof} == {"r_regionkey", "r_name"}

    # compact: rewrite to one file
    rc = main(["compact", "--path", out_dir, "--target-partitions", "1",
               "--output", str(tmp_path / "compacted")])
    assert rc == 0
    assert json_mod.loads(capsys.readouterr().out.strip())["rows"] == 3


def test_cli_dedup_methods(spark, sf_dir, tmp_path, capsys):
    """The dedup subcommand annotates (or filters) the documents table
    through each method's full pipeline."""
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    rc = main(["dedup", "--sf-dir", sf_dir, "--output",
               str(tmp_path / "exact"), "--method", "exact"])
    assert rc == 0
    assert json_mod.loads(capsys.readouterr().out.strip())["rows"] == n_docs
    annotated = spark.read.parquet(str(tmp_path / "exact"))
    assert "is_canonical" in annotated.columns

    rc = main(["dedup", "--sf-dir", sf_dir, "--output",
               str(tmp_path / "sem"), "--method", "semantic",
               "--threshold", "0.9375", "--dim", "32", "--center",
               "--keep-canonical"])
    assert rc == 0
    kept = json_mod.loads(capsys.readouterr().out.strip())["rows"]
    assert 0 < kept <= n_docs


def test_read_files_ignore_corrupt_parquet(spark, tmp_path):
    """A truncated parquet file must cost its own rows only when the
    scan opts into ignoreCorruptFiles — and still fail fast without."""
    import pytest as _pytest

    from datalake_toolkit_spark.sources.formats import read_files

    good = tmp_path / "data"
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(str(good))
    part = next(good.glob("part-*.parquet"))
    corrupt = good / "part-corrupt.parquet"
    corrupt.write_bytes(part.read_bytes()[: part.stat().st_size // 3])

    ok = read_files(spark, str(good), "parquet", ignore_corrupt_files=True)
    assert ok.count() == 100  # good file fully read, corrupt one skipped

    with _pytest.raises(Exception):
        read_files(spark, str(good), "parquet").count()  # fail-fast default


def test_cli_curate_subcommand(spark, sf_dir, tmp_path, capsys):
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main

    out_dir = str(tmp_path / "packed")
    rc = main(["curate", "--sf-dir", sf_dir, "--output", out_dir,
               "--window-tokens", "512", "--eval-mod", "97"])
    assert rc == 0
    res = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] > 0 and res["windows"] >= 0
    packed = spark.read.parquet(out_dir)
    assert {"doc_id", "copy", "tok_offset", "window_start", "window_end"} <= set(
        packed.columns
    )
    assert packed.where("doc_id % 97 = 0").count() == 0  # decontaminated


def test_cli_table_subcommand(spark, tmp_path, capsys):
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main
    from datalake_toolkit_spark.lakehouse import LakeTable

    path = str(tmp_path / "tbl")
    t = LakeTable(spark, path, partition_by=("seg",))
    t.write(spark.createDataFrame(
        [(i, f"seg{i % 2}", float(i)) for i in range(10)],
        "id bigint, seg string, val double",
    ))
    t.delete_where(F.col("val") >= 5)

    assert main(["table", "--path", path, "history"]) == 0
    hist = [json_mod.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [h["op"] for h in hist] == ["write", "delete"]

    assert main(["table", "--path", path, "show"]) == 0
    assert json_mod.loads(capsys.readouterr().out.strip())["rows"] == 5

    assert main(["table", "--path", path, "restore", "--version", "0",
                 "--partition-by", "seg"]) == 0
    assert json_mod.loads(capsys.readouterr().out.strip())["new_version"] == 2
    assert main(["table", "--path", path, "show"]) == 0
    assert json_mod.loads(capsys.readouterr().out.strip())["rows"] == 10

    assert main(["table", "--path", path, "optimize", "--partition-by", "seg"]) == 0
    capsys.readouterr()
    assert main(["table", "--path", path, "vacuum", "--keep-last", "2"]) == 0
    assert json_mod.loads(capsys.readouterr().out.strip())["current_version"] == 3
    assert main(["table", "--path", path, "restore"]) == 2  # missing --version


def test_cli_table_skipping_and_clone_actions(spark, tmp_path, capsys):
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main
    from datalake_toolkit_spark.lakehouse import LakeTable

    path = str(tmp_path / "tbl")
    LakeTable(spark, path).write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id bigint, val double"
        ).repartitionByRange(4, "id").sortWithinPartitions("id")
    )

    assert main(["table", "--path", path, "plan-scan", "--where", "id >= 15"]) == 0
    rep = json_mod.loads(capsys.readouterr().out.strip())
    assert rep["prunable"] and rep["files_scanned"] < rep["files_total"]

    assert main(["table", "--path", path, "delete",
                 "--where", "id >= 15", "--mode", "mor"]) == 0
    out = json_mod.loads(capsys.readouterr().out.strip())
    assert out == {"deleted_version": 1, "mode": "mor"}
    assert LakeTable(spark, path).read().count() == 15
    assert main(["table", "--path", path, "delete"]) == 2  # missing --where
    capsys.readouterr()

    clone_path = str(tmp_path / "fork")
    assert main(["table", "--path", path, "clone", "--target", clone_path]) == 0
    out = json_mod.loads(capsys.readouterr().out.strip())
    assert out["shallow"] is True
    assert LakeTable(spark, clone_path).read().count() == 15
    assert main(["table", "--path", path, "clone"]) == 2  # missing --target


def test_cli_table_write_upsert_bloom_and_auto_compact(
    spark, tmp_path, capsys
):
    """r8 verdict #3: bloom columns, partition-scoped merges, and the
    auto-compact policy are all reachable from the CLI — table create
    and maintenance no longer require Python."""
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main
    from datalake_toolkit_spark.lakehouse import LakeTable

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"uid_{i:03d}", float(i)) for i in range(50)],
        "id bigint, uid string, val double",
    ).coalesce(1).write.parquet(src)
    path = str(tmp_path / "tbl")
    # create WITH bloom filters from the CLI
    assert main(["table", "--path", path, "write", "--input", src,
                 "--bloom-columns", "uid:128"]) == 0
    out = json_mod.loads(capsys.readouterr().out.strip())
    assert out == {"written_version": 0, "bloom_columns": ["uid"]}
    rep = LakeTable(spark, path).plan_scan(where="uid = 'uid_099x'")
    assert rep["files_scanned"] == 0  # bloom written and probing
    assert main(["table", "--path", path, "write"]) == 2  # missing --input

    # upsert from the CLI with a MoR auto-compact policy: the second
    # pending merge crosses the threshold and drains itself
    up = str(tmp_path / "up")
    spark.createDataFrame(
        [(0, "uid_000", 999.0)], "id bigint, uid string, val double"
    ).coalesce(1).write.parquet(up)
    assert main(["table", "--path", path, "upsert", "--input", up,
                 "--merge-keys", "id", "--mode", "mor",
                 "--auto-compact-merges", "2"]) == 0
    o1 = json_mod.loads(capsys.readouterr().out.strip())
    assert o1["pending_merges"] == 1
    assert main(["table", "--path", path, "upsert", "--input", up,
                 "--merge-keys", "id", "--mode", "mor",
                 "--auto-compact-merges", "2"]) == 0
    o2 = json_mod.loads(capsys.readouterr().out.strip())
    assert o2["pending_merges"] == 0  # auto-drained
    t = LakeTable(spark, path)
    assert t._manifest()["op"] == "optimize"
    assert {r.id: r.val for r in t.read().collect()}[0] == 999.0
    assert main(["table", "--path", path, "upsert", "--input", up]) == 2

    # partitioned flow: --partition-scoped upsert via CLI
    ppath = str(tmp_path / "ptbl")
    psrc = str(tmp_path / "psrc")
    spark.createDataFrame(
        [(i, "a" if i < 5 else "b", float(i)) for i in range(10)],
        "id bigint, seg string, val double",
    ).write.parquet(psrc)
    assert main(["table", "--path", ppath, "write", "--input", psrc,
                 "--partition-by", "seg"]) == 0
    capsys.readouterr()
    pup = str(tmp_path / "pup")
    spark.createDataFrame(
        [(0, "a", 999.0)], "id bigint, seg string, val double"
    ).coalesce(1).write.parquet(pup)
    assert main(["table", "--path", ppath, "upsert", "--input", pup,
                 "--merge-keys", "id", "--partition-scoped"]) == 0
    capsys.readouterr()
    got = {r.id: r.val for r in LakeTable(spark, ppath).read().collect()}
    assert got[0] == 999.0 and len(got) == 10


def test_cli_table_tombstone_delete_and_quarantine_vacuum(
    spark, tmp_path, capsys
):
    import json as json_mod
    import time as time_mod

    from datalake_toolkit_spark.__main__ import main
    from datalake_toolkit_spark.lakehouse import LakeTable

    path = str(tmp_path / "tbl")
    LakeTable(spark, path).write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id bigint, val double"
        )
    )
    # merge-on-read key tombstones from the CLI (string key values cast
    # to the table's key type)
    assert main(["table", "--path", path, "delete",
                 "--keys", "3,7", "--key-col", "id"]) == 0
    out = json_mod.loads(capsys.readouterr().out.strip())
    assert out["mode"] == "mor" and out["tombstoned"] == 2
    got = {r.id for r in LakeTable(spark, path).read().collect()}
    assert got == set(range(10)) - {3, 7}
    assert main(["table", "--path", path, "delete",
                 "--keys", "1"]) == 2  # missing --key-col
    capsys.readouterr()
    # an uncastable key value must fail loudly, not commit a NULL
    # tombstone that matches nothing (r8 ADVICE low)
    v_before = LakeTable(spark, path).current_version()
    assert main(["table", "--path", path, "delete",
                 "--keys", "abc,4", "--key-col", "id"]) == 2
    err = capsys.readouterr().err
    assert "abc" in err and "bigint" in err
    assert LakeTable(spark, path).current_version() == v_before
    # and an unknown key column is rejected before any Spark work
    assert main(["table", "--path", path, "delete",
                 "--keys", "4", "--key-col", "nope"]) == 2
    assert "nope" in capsys.readouterr().err

    # quarantine-aged vacuum from the CLI
    qpath = str(tmp_path / "q")
    guarded = LakeTable(
        spark, qpath, constraints={"pos": "val >= 0"},
        on_violation="quarantine",
    )
    guarded.write(
        spark.createDataFrame([(1, 5.0), (2, -1.0)], "id bigint, val double")
    )
    qroot = tmp_path / "q" / "_quarantine"
    assert any(qroot.iterdir())
    time_mod.sleep(1.1)
    assert main(["table", "--path", qpath, "vacuum",
                 "--quarantine-max-age", "1"]) == 0
    capsys.readouterr()
    assert not any(qroot.iterdir())


def test_cli_search_and_ann_subcommands(spark, tmp_path, capsys):
    """The round-9 retrieval planes are operable from the shell:
    one-shot lexical query, persistent index add + serve, and the IVF
    vector index build/add/search/sizes lifecycle."""
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main

    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "red fish blue fish"), (2, "red red red"), (3, "blue whale")],
        "doc_id bigint, text string",
    ).coalesce(1).write.parquet(docs_path)

    # one-shot keyword query over parquet docs
    assert main(["search", "query", "--docs", docs_path,
                 "--query", "red fish", "--k", "2"]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert rows[0]["n_matched"] == 2

    # persistent index: add twice (idempotent), then serve bm25
    idx_path = str(tmp_path / "pidx")
    assert main(["search", "index-add", "--index", idx_path,
                 "--docs", docs_path]) == 0
    capsys.readouterr()
    assert main(["search", "index-query", "--index", idx_path,
                 "--query", "whale", "--method", "bm25"]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in rows] == [3]

    # IVF lifecycle
    emb_path = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, [1.0 * (i % 2), 1.0 * ((i + 1) % 2), 0.1 * i, 1.0])
         for i in range(12)],
        "vec_id bigint, embedding array<double>",
    ).coalesce(1).write.parquet(emb_path)
    ivf_path = str(tmp_path / "ivf")
    assert main(["ann", "build", "--path", ivf_path, "--input", emb_path,
                 "--n-lists", "2", "--lloyd-iters", "1", "--dim", "4"]) == 0
    capsys.readouterr()
    add_path = str(tmp_path / "emb2")
    spark.createDataFrame(
        [(100, [1.0, 0.0, 0.5, 1.0])], "vec_id bigint, embedding array<double>"
    ).coalesce(1).write.parquet(add_path)
    assert main(["ann", "add", "--path", ivf_path, "--input", add_path]) == 0
    capsys.readouterr()
    assert main(["ann", "sizes", "--path", ivf_path]) == 0
    sizes = [json_mod.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert sum(s["n_vectors"] for s in sizes) == 13
    assert main(["ann", "search", "--path", ivf_path, "--input", add_path,
                 "--k", "3", "--n-probe", "2"]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3 and rows[0]["qid"] == 100


def test_cli_index_probe_and_maintain_actions(spark, tmp_path, capsys):
    """Serving-cost probe and scheduled maintenance are operable from
    the shell for both index kinds."""
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main

    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"alpha{i % 7} common") for i in range(20)],
        "doc_id bigint, text string",
    ).coalesce(1).write.parquet(docs_path)
    idx_path = str(tmp_path / "pidx")
    assert main(["search", "index-add", "--index", idx_path,
                 "--docs", docs_path]) == 0
    capsys.readouterr()
    assert main(["search", "index-probe", "--index", idx_path,
                 "--query", "common"]) == 0
    rep = json_mod.loads(capsys.readouterr().out.strip())
    assert rep["buckets_probed"] == 1 and rep["buckets_total"] >= 1
    assert main(["search", "index-maintain", "--index", idx_path,
                 "--keep-last", "2"]) == 0
    capsys.readouterr()

    emb_path = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, [1.0 * (i % 2), 1.0 * ((i + 1) % 2), 0.0, 1.0])
         for i in range(10)],
        "vec_id bigint, embedding array<double>",
    ).coalesce(1).write.parquet(emb_path)
    ivf_path = str(tmp_path / "ivf")
    assert main(["ann", "build", "--path", ivf_path, "--input", emb_path,
                 "--n-lists", "2", "--lloyd-iters", "1", "--dim", "4"]) == 0
    capsys.readouterr()
    assert main(["ann", "probe", "--path", ivf_path, "--input", emb_path,
                 "--n-probe", "1"]) == 0
    rep = json_mod.loads(capsys.readouterr().out.strip())
    assert rep["lists_total"] == 2
    assert main(["ann", "maintain", "--path", ivf_path]) == 0
    capsys.readouterr()


@pytest.mark.slow
def test_cli_hybrid_and_quantized_actions(spark, tmp_path, capsys):
    """The round-10 serve paths are operable from the shell: RRF
    hybrid over both persistent indexes, the int8 quantized ANN
    search, and the quantized byte-split probe report."""
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main

    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "red fish blue fish"), (2, "red red red"), (3, "blue whale")],
        "doc_id bigint, text string",
    ).coalesce(1).write.parquet(docs_path)
    idx_path = str(tmp_path / "pidx")
    assert main(["search", "index-add", "--index", idx_path,
                 "--docs", docs_path]) == 0
    capsys.readouterr()

    emb_path = str(tmp_path / "emb")
    spark.createDataFrame(
        [(1, [1.0, 0.1, 0.0, 1.0]), (2, [0.0, 1.0, 0.2, 1.0]),
         (3, [0.5, 0.5, 1.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    ).coalesce(1).write.parquet(emb_path)
    ivf_path = str(tmp_path / "ivf")
    assert main(["ann", "build", "--path", ivf_path, "--input", emb_path,
                 "--n-lists", "2", "--lloyd-iters", "1", "--dim", "4"]) == 0
    capsys.readouterr()

    q_path = str(tmp_path / "hq")
    spark.createDataFrame(
        [(9, "blue whale", [0.5, 0.4, 1.0, 1.0])],
        "query_id bigint, query_text string, query_vec array<double>",
    ).coalesce(1).write.parquet(q_path)
    assert main(["search", "hybrid", "--index", idx_path,
                 "--ann-path", ivf_path, "--queries", q_path,
                 "--method", "bm25", "--k", "3", "--n-probe", "2"]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert rows and rows[0]["query_id"] == 9 and rows[0]["n_lists"] >= 1
    # doc 3 ("blue whale", nearest vector) must fuse to the top
    assert rows[0]["doc_id"] == 3

    qv_path = str(tmp_path / "qv")
    spark.createDataFrame(
        [(9, [0.5, 0.4, 1.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    ).coalesce(1).write.parquet(qv_path)
    assert main(["ann", "search", "--path", ivf_path, "--input", qv_path,
                 "--k", "2", "--n-probe", "2", "--quantized"]) == 0
    qrows = [json_mod.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["cid"] for r in qrows][:1] == [3]
    assert main(["ann", "probe", "--path", ivf_path, "--input", qv_path,
                 "--n-probe", "2", "--quantized"]) == 0
    rep = json_mod.loads(capsys.readouterr().out.strip())
    assert rep["bytes_code_columns"] > 0 and rep["bytes_vec_column"] > 0

    # phrase has no ranked list to fuse — the CLI must refuse, not
    # silently degrade to keyword
    import pytest

    with pytest.raises(SystemExit, match="keyword or bm25"):
        main(["search", "hybrid", "--index", idx_path,
              "--ann-path", ivf_path, "--queries", q_path,
              "--method", "phrase"])

    # mutation from the shell: remove a doc, replace-add a changed one
    assert main(["search", "index-remove", "--index", idx_path,
                 "--ids", "2"]) == 0
    capsys.readouterr()
    assert main(["search", "index-query", "--index", idx_path,
                 "--query", "red"]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["doc_id"] for r in rows} == {1}  # doc 2 tombstoned
    repl_path = str(tmp_path / "repl")
    spark.createDataFrame(
        [(1, "green turtle")], "doc_id bigint, text string"
    ).coalesce(1).write.parquet(repl_path)
    assert main(["search", "index-add", "--index", idx_path,
                 "--docs", repl_path, "--replace"]) == 0
    capsys.readouterr()
    assert main(["search", "index-query", "--index", idx_path,
                 "--query", "red"]) == 0
    assert capsys.readouterr().out.strip() == ""  # dropped term died
    assert main(["ann", "remove", "--path", ivf_path, "--ids", "2"]) == 0
    capsys.readouterr()
    assert main(["ann", "search", "--path", ivf_path, "--input", qv_path,
                 "--k", "5", "--n-probe", "2"]) == 0
    arows = [json_mod.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert 2 not in {r["cid"] for r in arows} and arows

    # governance from the shell: rebucket to a wider prefix — answers
    # unchanged, probe report shows the new width
    assert main(["search", "index-query", "--index", idx_path,
                 "--query", "green"]) == 0
    pre = capsys.readouterr().out.strip()
    assert main(["search", "index-rebucket", "--index", idx_path,
                 "--prefix-len", "2"]) == 0
    capsys.readouterr()
    assert main(["search", "index-query", "--index", idx_path,
                 "--query", "green"]) == 0
    assert capsys.readouterr().out.strip() == pre
    assert main(["search", "index-probe", "--index", idx_path,
                 "--query", "green"]) == 0
    assert json_mod.loads(capsys.readouterr().out.strip())["prefix_len"] == 2
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="prefix-len"):
        main(["search", "index-rebucket", "--index", idx_path])


def test_cli_index_sync_actions(spark, tmp_path, capsys):
    """CDF -> index sync from the shell: `search index-sync` bootstraps
    from a LakeTable, a second call after table mutation applies the
    net changes, and `ann sync` follows a vector table the same way."""
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main
    from datalake_toolkit_spark.lakehouse import LakeTable

    t_path = str(tmp_path / "t")
    t = LakeTable(spark, t_path)
    t.write(spark.createDataFrame(
        [(1, "red fish"), (2, "blue whale")], "doc_id bigint, text string"
    ))
    idx_path = str(tmp_path / "pidx")
    assert main(["search", "index-sync", "--index", idx_path,
                 "--table", t_path]) == 0
    rep = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["upserts"] == 2 and rep["from_version"] is None
    t.upsert(spark.createDataFrame(
        [(3, "red red")], "doc_id bigint, text string"
    ), keys=["doc_id"], mode="mor")
    t.delete_where("doc_id = 2", mode="mor")
    assert main(["search", "index-sync", "--index", idx_path,
                 "--table", t_path]) == 0
    rep = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["upserts"] == 1 and rep["removes"] == 1
    assert main(["search", "index-query", "--index", idx_path,
                 "--query", "red whale"]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert sorted(r["doc_id"] for r in rows) == [1, 3]

    vt_path = str(tmp_path / "vt")
    vt = LakeTable(spark, vt_path)
    vt.write(spark.createDataFrame(
        [(i, [1.0 * (i % 2), 1.0 * ((i + 1) % 2), 1.0]) for i in range(8)],
        "vec_id bigint, embedding array<double>",
    ))
    ivf_path = str(tmp_path / "ivf")
    emb0 = str(tmp_path / "emb0")
    vt.read().coalesce(1).write.parquet(emb0)
    assert main(["ann", "build", "--path", ivf_path, "--input", emb0,
                 "--n-lists", "2", "--lloyd-iters", "1", "--dim", "3"]) == 0
    capsys.readouterr()
    assert main(["ann", "sync", "--path", ivf_path, "--table", vt_path]) == 0
    capsys.readouterr()
    vt.delete_where("vec_id = 0", mode="mor")
    assert main(["ann", "sync", "--path", ivf_path, "--table", vt_path]) == 0
    rep = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["removes"] == 1 and rep["upserts"] == 0
    q = str(tmp_path / "q")
    spark.createDataFrame(
        [(100, [0.0, 1.0, 1.0])], "vec_id bigint, embedding array<double>"
    ).coalesce(1).write.parquet(q)
    assert main(["ann", "search", "--path", ivf_path, "--input", q,
                 "--k", "10", "--n-probe", "2"]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert 0 not in {r["cid"] for r in rows} and len(rows) == 7
    # recall at full probe is exact by construction
    assert main(["ann", "recall", "--path", ivf_path, "--input", q,
                 "--k", "5", "--n-probe", "2"]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert rows[0]["recall"] == 1.0 and rows[0]["n_exact"] == 5


def test_cli_audit_actions(spark, tmp_path, capsys):
    """`search index-audit` and `ann audit` print per-check JSON rows,
    all zeros on healthy indexes."""
    import json as json_mod

    from datalake_toolkit_spark.__main__ import main
    from datalake_toolkit_spark.llm import IVFIndex, PostingsIndex

    pidx = PostingsIndex(spark, str(tmp_path / "p"), prefix_len=1)
    pidx.add(spark.createDataFrame(
        [(1, "red fish"), (2, "blue whale")], "doc_id bigint, text string"
    ))
    assert main(["search", "index-audit",
                 "--index", str(tmp_path / "p")]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["check"] for r in rows} >= {"bucket_mismatch",
                                          "corpus_stats_drift"}
    assert all(r["n_violations"] == 0 for r in rows)

    ivf = IVFIndex(spark, str(tmp_path / "v"))
    ivf.build(spark.createDataFrame(
        [(i, [1.0, 0.5 * i, 1.0]) for i in range(8)],
        "vec_id bigint, embedding array<double>",
    ), n_lists=2, lloyd_iters=1, dim=3)
    assert main(["ann", "audit", "--path", str(tmp_path / "v"),
                 "--deep"]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["check"] for r in rows} >= {"orphan_list", "misassigned"}
    assert all(r["n_violations"] == 0 for r in rows)
    # without --deep the O(index x n_lists) re-argmax is not run
    assert main(["ann", "audit", "--path", str(tmp_path / "v")]) == 0
    rows = [json_mod.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert "misassigned" not in {r["check"] for r in rows}
