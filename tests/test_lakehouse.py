"""LakeTable: MERGE/upsert, time travel, OPTIMIZE, snapshot retention."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_toolkit_spark.lakehouse import ConcurrentWriteError, LakeTable


@pytest.fixture()
def base_df(spark):
    return spark.createDataFrame(
        [(i, f"seg{i % 3}", float(i * 10)) for i in range(30)],
        "id bigint, seg string, val double",
    )


def _as_dict(df):
    return {r.id: (r.seg, r.val) for r in df.collect()}


def test_write_read_roundtrip_partitioned(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    v = t.write(base_df)
    assert v == 0
    assert _as_dict(t.read()) == _as_dict(base_df)


def test_upsert_updates_inserts_and_moves_partitions(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    # update id 0-4 (id 3 moves from seg0 to seg2), insert 100/101
    src = spark.createDataFrame(
        [
            (0, "seg0", 999.0),
            (1, "seg1", 999.0),
            (2, "seg2", 999.0),
            (3, "seg2", 999.0),  # partition move: was seg0
            (4, "seg1", 999.0),
            (100, "seg0", 1.0),
            (101, "seg9", 2.0),  # brand-new partition
        ],
        "id bigint, seg string, val double",
    )
    v = t.upsert(src, keys=["id"])
    assert v == 1
    got = _as_dict(t.read())
    assert len(got) == 32  # 30 - 0 deleted + 2 inserted
    assert got[3] == ("seg2", 999.0)  # moved, not duplicated
    assert got[101] == ("seg9", 2.0)
    assert got[5] == ("seg2", 50.0)  # untouched row intact
    # untouched partitions carried forward by pointer, not rewritten:
    # seg0/seg1/seg2 all touched here, so check via a second narrow merge
    man_before = t._manifest()
    t.upsert(
        spark.createDataFrame([(0, "seg0", 5.0)], "id bigint, seg string, val double"),
        keys=["id"],
    )
    man_after = t._manifest()
    assert man_after["owners"]["seg=seg9"] == man_before["owners"]["seg=seg9"]
    assert man_after["owners"]["seg=seg0"] != man_before["owners"]["seg=seg0"]


def test_upsert_delete_mode_and_empty_partition_drop(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)],
            "id bigint, seg string, val double",
        )
    )
    t.upsert(
        spark.createDataFrame([(3, "b", 0.0)], "id bigint, seg string, val double"),
        keys=["id"],
        when_matched="delete",
    )
    got = _as_dict(t.read())
    assert set(got) == {1, 2}
    assert "seg=b" not in t._manifest()["owners"]  # emptied partition dropped


def test_time_travel_and_history(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    t.upsert(
        spark.createDataFrame([(0, "seg0", -1.0)], "id bigint, seg string, val double"),
        keys=["id"],
    )
    assert _as_dict(t.read(version=0)) == _as_dict(base_df)
    assert _as_dict(t.read())[0] == ("seg0", -1.0)
    ops = [h["op"] for h in t.history()]
    assert ops == ["write", "merge_update"]


def test_delete_where(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    t.delete_where(F.col("val") >= 200.0)
    assert set(_as_dict(t.read())) == set(range(20))


def test_unpartitioned_merge(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 1.0), (2, 2.0)], "id bigint, val double"))
    t.upsert(
        spark.createDataFrame([(2, 20.0), (3, 30.0)], "id bigint, val double"),
        keys=["id"],
    )
    assert {r.id: r.val for r in t.read().collect()} == {1: 1.0, 2: 20.0, 3: 30.0}


def test_optimize_preserves_content(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    t.upsert(
        spark.createDataFrame([(7, "seg1", 0.5)], "id bigint, seg string, val double"),
        keys=["id"],
    )
    before = _as_dict(t.read())
    t.optimize()
    assert _as_dict(t.read()) == before
    # post-optimize the snapshot is wholly owned by one fresh data dir
    owners = set(t._manifest()["owners"].values())
    assert len(owners) == 1
    assert owners.isdisjoint(t._manifest(t.current_version() - 1)["owners"].values())


def test_vacuum_keep_last(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)  # v0
    t.optimize()  # v1 (rewrites all -> v0 data unreferenced by v1+)
    t.upsert(
        spark.createDataFrame([(0, "seg0", 0.0)], "id bigint, seg string, val double"),
        keys=["id"],
    )  # v2
    v0_dirs = {
        os.path.basename(t._vdir(o)) for o in t._manifest(0)["owners"].values()
    }
    before = _as_dict(t.read())
    dropped = t.vacuum(keep_last=2)
    assert dropped == [0]
    assert _as_dict(t.read()) == before  # current snapshot intact
    assert _as_dict(t.read(version=1)) is not None  # retained snapshot readable
    with pytest.raises(FileNotFoundError):
        t.read(version=0)
    # v0's data dirs are unreferenced by v1/v2 and physically gone
    # (retired-by-a-dropped-manifest: reaped with no staging grace)
    for d in v0_dirs:
        assert not os.path.isdir(os.path.join(t.data_dir, d))


def test_vacuum_age_mode_with_look_back_floor(spark, tmp_path, base_df):
    """Reference semantics (odl_snapshot_redshift.py:119-135): drop iff
    older than retention AND younger than the look-back floor."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)  # v0: will be PAST the look-back floor -> kept
    t.optimize()  # v1: older than retention, within look-back -> dropped
    t.optimize()  # v2: fresh -> kept
    import json

    def age_manifest(v, age):
        p = t._manifest_path(v)
        m = json.load(open(p))
        m["ts"] = 1_000_000.0 - age
        json.dump(m, open(p, "w"))

    age_manifest(0, 50 * 86400)  # 50 days old
    age_manifest(1, 10 * 86400)  # 10 days old
    age_manifest(2, 0)
    dropped = t.vacuum(
        max_age_sec=7 * 86400, look_back_sec=30 * 86400, now=1_000_000.0
    )
    assert dropped == [1]
    assert t.read(version=0) is not None  # past the floor: never deleted
    assert _as_dict(t.read()) == _as_dict(t.read(version=2))


def test_concurrent_commit_detected(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    # a second writer claims version 1 out-of-band
    other = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    other.write(base_df.limit(1))
    os.rename(other._manifest_path(1), other._manifest_path(1) + ".bak")
    os.rename(other._manifest_path(1) + ".bak", other._manifest_path(1))
    with pytest.raises(ConcurrentWriteError):
        t._commit(1, {"seg=seg0": 1}, "write", base_df.schema.json())


def test_upsert_schema_evolution(spark, tmp_path, base_df):
    """mergeSchema semantics: evolved source widens the table; rows
    written before the evolution read NULL for the new column; a
    mismatched source without the flag fails loudly."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    src = spark.createDataFrame(
        [(0, "seg0", 999.0, "gold"), (100, "seg1", 1.0, "new")],
        "id bigint, seg string, val double, tier string",
    )
    with pytest.raises(ValueError, match="schema_evolution"):
        t.upsert(src, keys=["id"])
    t.upsert(src, keys=["id"], schema_evolution=True)
    got = {r.id: r.tier for r in t.read().collect()}
    assert got[0] == "gold" and got[100] == "new"
    assert got[1] is None  # pre-evolution row in an untouched partition
    assert t.read().columns == ["id", "seg", "val", "tier"]  # manifest order
    # and the pre-evolution snapshot still reads with its own schema
    assert "tier" not in t.read(version=0).columns


def test_optimize_clustered(spark, tmp_path, base_df):
    """optimize(sort_by=...) range-clusters files on the sort key so
    parquet min/max stats are tight (the OPTIMIZE ZORDER intent)."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df.repartition(8))  # fragment: many small files
    before = _as_dict(t.read())
    v = t.optimize(sort_by=["val"])
    assert _as_dict(t.read()) == before
    # every surviving file holds a contiguous val range: file-level
    # [min,max] intervals within a partition must not overlap
    import pyarrow.parquet as pq

    vdir = t._vdir(next(iter(t._manifest(v)["owners"].values())))
    for seg in os.listdir(vdir):
        if not seg.startswith("seg="):
            continue
        spans = []
        for f in os.listdir(os.path.join(vdir, seg)):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(vdir, seg, f))
            vals = [
                md.row_group(i).column(1).statistics
                for i in range(md.num_row_groups)
            ]
            spans.append((min(s.min for s in vals), max(s.max for s in vals)))
        spans.sort()
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, f"overlapping val ranges in {seg}: {spans}"


def test_stream_upsert_maintains_table(spark, tmp_path):
    """Streaming MERGE sink: micro-batches continuously maintain the
    table; in-batch duplicates collapse newest-wins; a re-drain with
    the same checkpoint is a no-op (exactly-once effect)."""
    import json as _json

    from datalake_toolkit_spark.lakehouse import LakeTable, stream_upsert

    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        (src / name).write_text("\n".join(_json.dumps(r) for r in rows))

    def drain():
        q = stream_upsert(
            spark.readStream.schema(
                "id bigint, seg string, val double, ts double"
            ).json(str(src)),
            table,
            keys=["id"],
            checkpoint=ckpt,
            partition_by=("seg",),
            order_by=[F.desc("ts")],
        )
        q.awaitTermination(120)

    drop("b1.json", [
        {"id": 1, "seg": "a", "val": 1.0, "ts": 1.0},
        {"id": 2, "seg": "a", "val": 2.0, "ts": 1.0},
    ])
    drain()
    # update id 1 (twice in one batch — newest wins), move id 2 to
    # seg b, insert id 3
    drop("b2.json", [
        {"id": 1, "seg": "a", "val": 10.0, "ts": 2.0},
        {"id": 1, "seg": "a", "val": 99.0, "ts": 3.0},
        {"id": 2, "seg": "b", "val": 2.0, "ts": 2.0},
        {"id": 3, "seg": "b", "val": 3.0, "ts": 2.0},
    ])
    drain()
    t = LakeTable(spark, table, partition_by=("seg",))
    got = {r.id: (r.seg, r.val) for r in t.read().collect()}
    assert got == {1: ("a", 99.0), 2: ("b", 2.0), 3: ("b", 3.0)}
    v = t.current_version()
    drain()  # no new files
    assert t.current_version() == v  # empty drain commits nothing


def test_changes_between_versions(spark, tmp_path, base_df):
    """CDF: diff of two versions as insert/delete rows, reading only
    partitions whose owner changed between the manifests."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)  # v0
    src = spark.createDataFrame(
        [(0, "seg0", 999.0), (100, "seg1", 5.0)],
        "id bigint, seg string, val double",
    )
    t.upsert(src, keys=["id"])  # v1: update id 0, insert id 100
    ch = t.changes(0, 1)
    got = {(r.id, r._change_type): r.val for r in ch.collect()}
    assert got == {
        (0, "delete"): 0.0,
        (0, "insert"): 999.0,
        (100, "insert"): 5.0,
    }
    # seg2 never changed hands: its rows appear in neither side of the
    # diff (structural pruning also keeps them out of the scan)
    assert ch.where("seg = 'seg2'").count() == 0
    # identical versions diff to nothing
    assert t.changes(1, 1).count() == 0


def test_merge_retries_on_concurrent_commit(spark, tmp_path, base_df):
    """A commit that loses the version race recomputes the merge from
    the fresh manifest — both writers' changes land, nothing is lost,
    and the loser's orphaned staging dir is vacuum-reapable."""
    path = str(tmp_path / "t")
    t = LakeTable(spark, path, partition_by=("seg",))
    t.write(base_df)  # v0
    other = LakeTable(spark, path, partition_by=("seg",))
    orig = t._commit
    fired = []

    def racing_commit(version, owners, op, schema_json, **kwargs):
        if not fired:
            fired.append(True)
            other.upsert(  # sneaks in v1 before our claim
                spark.createDataFrame(
                    [(1, "seg1", -1.0)], "id bigint, seg string, val double"
                ),
                keys=["id"],
            )
        return orig(version, owners, op, schema_json, **kwargs)

    t._commit = racing_commit
    t.upsert(
        spark.createDataFrame(
            [(0, "seg0", 111.0)], "id bigint, seg string, val double"
        ),
        keys=["id"],
    )
    got = _as_dict(t.read())
    assert got[0] == ("seg0", 111.0)
    assert got[1] == ("seg1", -1.0)  # the racing write survived the retry
    assert t.current_version() == 2
    # loser's staging dir is unreferenced; eager-vacuum with no grace
    t.vacuum(keep_last=3, staging_grace_sec=0.0)
    live = {
        os.path.basename(t._vdir(o))
        for v in (0, 1, 2)
        for o in t._manifest(v)["owners"].values()
    }
    assert set(os.listdir(t.data_dir)) == live


def test_random_walk_matches_dict_model(spark, tmp_path):
    """Model-based check: a seeded random sequence of merge-update /
    merge-delete / delete_where / optimize ops must leave the table
    equal to a plain dict applying the same semantics, at every step
    and at every time-travel point."""
    import random

    rng = random.Random(42)
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    model: dict[int, tuple[str, float]] = {}
    snapshots: list[dict] = []

    def mk_df(rows):
        return spark.createDataFrame(
            [(i, s, v) for i, (s, v) in rows], "id bigint, seg string, val double"
        )

    def rand_rows(n):
        return [
            (rng.randrange(25), (f"seg{rng.randrange(4)}", float(rng.randrange(100))))
            for _ in range(n)
        ]

    t.write(mk_df(rand_rows(0)))  # empty start exercises first-merge path
    snapshots.append(dict(model))
    for _ in range(8):
        op = rng.choice(["upsert", "upsert", "delete_keys", "delete_where", "optimize"])
        if op == "upsert":
            rows = {i: sv for i, sv in rand_rows(rng.randrange(1, 6))}
            t.upsert(mk_df(sorted(rows.items())), keys=["id"])
            model.update(rows)
        elif op == "delete_keys":
            rows = {i: sv for i, sv in rand_rows(rng.randrange(1, 4))}
            t.upsert(mk_df(sorted(rows.items())), keys=["id"], when_matched="delete")
            for i in rows:
                model.pop(i, None)
        elif op == "delete_where":
            cut = float(rng.randrange(100))
            t.delete_where(F.col("val") >= cut)
            model = {i: sv for i, sv in model.items() if sv[1] < cut}
        else:
            t.optimize()
        snapshots.append(dict(model))
        assert _as_dict(t.read()) == model
    # every historical version still reproduces its model snapshot
    for v, snap in enumerate(snapshots):
        assert _as_dict(t.read(version=v)) == snap


def test_optimize_zorder_bounds_both_columns(spark, tmp_path):
    """Z-order clustering must bound per-file spans on BOTH columns;
    lexicographic sort leaves the trailing column's spans at ~full
    range (each leading-key run covers every y). Verified from parquet
    footer min/max stats."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    df = (
        spark.range(4096)
        .select(
            (F.col("id") % 64).cast("double").alias("x"),
            (F.col("id") / 64).cast("int").cast("double").alias("y"),
            F.col("id").alias("payload"),
        )
    )

    def spans(table, col_idx):
        v = table.current_version()
        vdir = table._vdir(next(iter(table._manifest(v)["owners"].values())))
        out = []
        for f in os.listdir(vdir):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(vdir, f))
            st = [md.row_group(i).column(col_idx).statistics for i in range(md.num_row_groups)]
            out.append(max(s.max for s in st) - min(s.min for s in st))
        return out

    # AQE would coalesce this tiny dataset into one file; disable it so
    # the range partitioning yields enough files to measure spans (at
    # real scale the coalescing produces right-SIZED files, same layout)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        zt = LakeTable(spark, str(tmp_path / "zt"))
        zt.write(df.repartition(8))
        zt.optimize(zorder_by=["x", "y"])
        lex = LakeTable(spark, str(tmp_path / "lex"))
        lex.write(df.repartition(8))
        lex.optimize(sort_by=["x", "y"])
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    zx, zy = spans(zt, 0), spans(zt, 1)
    ly = spans(lex, 1)
    assert len(zx) >= 4  # enough files for spans to mean anything
    # z-order: average span bounded well under the full range on BOTH dims
    assert sum(zx) / len(zx) < 40 and sum(zy) / len(zy) < 40, (zx, zy)
    # lexicographic: y-spans are near-full-range (the contrast z-order buys)
    assert sum(ly) / len(ly) > 40, ly

    with pytest.raises(ValueError):
        zt.optimize(sort_by=["x"], zorder_by=["y", "x"])


def test_zorder_validates_columns_up_front(spark, tmp_path):
    """Non-numeric or unknown zorder_by columns fail with a clear
    ValueError, not approxQuantile's opaque analysis error."""
    t = LakeTable(spark, str(tmp_path / "zv"))
    t.write(
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "id bigint, name string, val double"
        )
    )
    with pytest.raises(ValueError, match="numeric"):
        t.optimize(zorder_by=["name", "val"])
    with pytest.raises(ValueError, match="not in table schema"):
        t.optimize(zorder_by=["nope"])
    with pytest.raises(ValueError, match="at least one column"):
        t._zvalue(t.read(), [])


def test_stream_dedup_ingest_across_batches(spark, tmp_path):
    """Two micro-batches with overlapping texts: the corpus ends with
    exactly one row per distinct text (cross-batch dedup via the
    fingerprint ledger), and re-draining with no new input is a no-op."""
    from datalake_toolkit_spark.lakehouse import stream_dedup_ingest

    src = str(tmp_path / "src")
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id bigint, text string"
    )
    b2 = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma")], "doc_id bigint, text string"
    )
    b1.coalesce(1).write.mode("overwrite").parquet(src)

    corpus, ledger = str(tmp_path / "corpus"), str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_dedup_ingest(stream, corpus, ledger, ckpt)
        q.awaitTermination(180)

    drain()
    b2.coalesce(1).write.mode("append").parquet(src)
    drain()
    rows = {r.text: r.doc_id for r in LakeTable(spark, corpus).read().collect()}
    assert rows == {"alpha": 1, "beta": 2, "gamma": 11}
    v = LakeTable(spark, corpus).current_version()
    drain()  # no new files -> no new commits
    assert LakeTable(spark, corpus).current_version() == v


def test_partition_values_match_spark_directory_rendering(spark, tmp_path):
    """Owners-map keys must match the directories Spark actually
    writes: empty string and NULL -> __HIVE_DEFAULT_PARTITION__,
    booleans lowercase, Hive path escaping for '/', '=', ':'."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("p",))
    t.write(
        spark.createDataFrame(
            [(1, None), (2, ""), (3, "a/b"), (4, "x=y"), (5, "h:m"), (6, "plain")],
            "id bigint, p string",
        )
    )
    got = {r.id: r.p for r in t.read().collect()}
    # Spark reads the default-partition dir back as NULL for both
    assert got[1] is None and got[2] is None
    assert got[3] == "a/b" and got[4] == "x=y" and got[5] == "h:m"
    # escaped keys round-trip through a merge (affected-partition match)
    t.upsert(
        spark.createDataFrame([(3, "a/b")], "id bigint, p string"), keys=["id"]
    )
    assert {r.id: r.p for r in t.read().collect()} == got

    tb = LakeTable(spark, str(tmp_path / "tb"), partition_by=("flag",))
    tb.write(spark.createDataFrame([(1, True), (2, False)], "id bigint, flag boolean"))
    assert {r.id: r.flag for r in tb.read().collect()} == {1: True, 2: False}


def test_restore_zero_copy_rollback(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)  # v0
    t.upsert(
        spark.createDataFrame([(0, "seg0", -1.0)], "id bigint, seg string, val double"),
        keys=["id"],
    )  # v1
    t.delete_where(F.col("val") >= 0)  # v2: destroys most rows
    assert t.read().count() < base_df.count()

    v = t.restore(0)
    assert v == 3 and t.current_version() == 3
    # content is exactly v0 again, via re-referenced dirs (no copy)
    assert _as_dict(t.read()) == _as_dict(base_df)
    ops = [h["op"] for h in t.history()]
    assert ops[-1] == "restore(v0)"
    # history is an audit trail: the bad versions remain readable
    assert _as_dict(t.read(version=2)) != _as_dict(base_df)
    # the table keeps working after a restore
    t.upsert(
        spark.createDataFrame([(99, "seg0", 9.0)], "id bigint, seg string, val double"),
        keys=["id"],
    )
    assert 99 in _as_dict(t.read())
    # restore of a vacuumed-away version fails loudly
    t.vacuum(keep_last=2)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.restore(0)


def test_optimize_scoped_to_partitions(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df.repartition(8))  # many small files per partition
    man0 = t._manifest()
    seg_keys = sorted(man0["owners"])
    target = seg_keys[0]
    t.optimize(partitions=[target])
    man1 = t._manifest()
    # only the targeted partition changed owners; others untouched
    assert man1["owners"][target] != man0["owners"][target]
    for k in seg_keys[1:]:
        assert man1["owners"][k] == man0["owners"][k]
    # content identical
    assert _as_dict(t.read()) == _as_dict(base_df)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown partitions"):
        t.optimize(partitions=["seg=nope"])


def test_read_scoped_to_partitions(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    keys = sorted(t._manifest()["owners"])
    part = t.read(partitions=[keys[0]])
    seg = keys[0].split("=", 1)[1]
    full = base_df.where(F.col("seg") == seg)
    assert _as_dict(part) == _as_dict(full)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown partitions"):
        t.read(partitions=["seg=nope"])


def test_incremental_aggregate_view_equals_recompute(spark, tmp_path):
    from datalake_toolkit_spark.lakehouse import (
        LakeTable,
        last_refreshed_version,
        refresh_aggregate_view,
    )

    base = LakeTable(spark, str(tmp_path / "base"), partition_by=("seg",))
    view = LakeTable(spark, str(tmp_path / "view"))
    rows = [(i, f"seg{i % 3}", float(i)) for i in range(30)]
    base.write(spark.createDataFrame(rows, "id bigint, seg string, val double"))

    def recompute():
        return {
            (r["seg"],): (r["n_rows"], float(r["sum_value"]))
            for r in base.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("val").cast("decimal(18,2)")).alias("sum_value"),
            )
            .collect()
        }

    def view_state():
        return {
            (r["seg"],): (r["n_rows"], float(r["sum_value"]))
            for r in view.read().collect()
        }

    # full build
    assert refresh_aggregate_view(base, view, ["seg"], "val") == 0
    assert view_state() == recompute()
    full_build_types = dict(view.read().dtypes)
    assert full_build_types["sum_value"] == "decimal(28,2)"
    # idempotent: no base change -> no view commit
    assert refresh_aggregate_view(base, view, ["seg"], "val") is None
    assert last_refreshed_version(view) == 0

    # update + insert (incl a brand-new group), then incremental refresh
    base.upsert(
        spark.createDataFrame(
            [(0, "seg0", 1000.0), (99, "seg9", 7.5)],
            "id bigint, seg string, val double",
        ),
        keys=["id"],
    )
    assert refresh_aggregate_view(base, view, ["seg"], "val") == 1
    assert view_state() == recompute()
    assert ("seg9",) in view_state()
    # the incremental path must not flip the view's column types
    # (r5 bug: full build decimal(28,2), incremental cast to 18,2)
    assert dict(view.read().dtypes) == full_build_types

    # deletes shrink counts; an emptied group disappears
    base.delete_where(F.col("seg") == "seg9")
    base.delete_where((F.col("seg") == "seg1") & (F.col("id") < 10))
    assert refresh_aggregate_view(base, view, ["seg"], "val") == 3
    assert view_state() == recompute()
    assert ("seg9",) not in view_state()
    # NULL-key groups must stay in sync through the incremental path
    # too (mirrors test_matview_null_key_groups_stay_in_sync for the
    # aggregate-view flavor): inserts create the NULL group, an update
    # adjusts it, a delete shrinks it
    base.upsert(
        spark.createDataFrame(
            [(200, None, 5.0), (201, None, 7.0)],
            "id bigint, seg string, val double",
        ),
        keys=["id"],
    )
    assert refresh_aggregate_view(base, view, ["seg"], "val") == 4
    assert view_state() == recompute()
    assert view_state()[(None,)] == (2, 12.0)
    base.upsert(
        spark.createDataFrame(
            [(200, None, 50.0)], "id bigint, seg string, val double"
        ),
        keys=["id"],
    )
    base.delete_where(F.col("id") == 201)
    assert refresh_aggregate_view(base, view, ["seg"], "val") == 6
    assert view_state() == recompute()
    assert view_state()[(None,)] == (1, 50.0)
    # view history carries the refresh audit trail
    ops = [h["op"] for h in view.history()]
    assert ops == [
        "refresh_base_v0",
        "refresh_base_v1",
        "refresh_base_v3",
        "refresh_base_v4",
        "refresh_base_v6",
    ]


def test_stream_dedup_ingest_with_quality_gate(spark, tmp_path):
    from datalake_toolkit_spark.lakehouse import LakeTable
    from datalake_toolkit_spark.lakehouse.streaming import stream_dedup_ingest
    from datalake_toolkit_spark.llm import with_text_stats

    src = tmp_path / "src"
    src.mkdir()
    good = "the quick brown fox jumps over the lazy dog again and again today"
    (src / "b1.json").write_text(
        '{"doc_id": 1, "text": "%s"}\n{"doc_id": 2, "text": "xx!!"}\n' % good
    )
    # batch 2: duplicate of the good doc + another junk row
    (src / "b2.json").write_text(
        '{"doc_id": 3, "text": "%s"}\n{"doc_id": 4, "text": "??"}\n' % good
    )

    def gate(batch):
        return (
            with_text_stats(batch)
            .where(F.col("quality_score") >= 0.4)
            .select("doc_id", "text")
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream_dedup_ingest(
        stream,
        str(tmp_path / "corpus"),
        str(tmp_path / "ledger"),
        str(tmp_path / "ckpt"),
        batch_filter=gate,
    )
    q.awaitTermination(300)
    corpus = LakeTable(spark, str(tmp_path / "corpus")).read().collect()
    ids = sorted(r["doc_id"] for r in corpus)
    # junk rows gated out before dedup; duplicate good doc deduped
    assert ids == [1]


def test_write_constraints_reject_and_persist(spark, tmp_path):
    """Declared CHECK constraints gate every write with per-rule
    counts, persist in the manifest, and bind a later constraint-less
    handle to the same table."""
    import pytest

    from datalake_toolkit_spark.lakehouse import (
        ConstraintViolationError,
        LakeTable,
    )

    t = LakeTable(
        spark,
        str(tmp_path / "t"),
        constraints={"val_positive": "val > 0", "id_not_null": "id IS NOT NULL"},
    )
    good = spark.createDataFrame([(1, 5.0), (2, 1.0)], "id bigint, val double")
    t.write(good)

    bad = spark.createDataFrame(
        [(3, -1.0), (None, 2.0), (4, 3.0)], "id bigint, val double"
    )
    with pytest.raises(ConstraintViolationError) as exc:
        t.write(bad)
    assert dict(exc.value.report) == {"val_positive": 1, "id_not_null": 1}
    # the failed write committed nothing
    assert t.current_version() == 0

    # a fresh handle with NO constraints argument enforces the
    # persisted rules (they ride the manifest)
    t2 = LakeTable(spark, str(tmp_path / "t"))
    with pytest.raises(ConstraintViolationError):
        t2.upsert(bad, keys=["id"])
    t2.upsert(spark.createDataFrame([(9, 4.0)], "id bigint, val double"), keys=["id"])
    assert t2.read().count() == 3


def test_write_constraints_quarantine_mode(spark, tmp_path):
    """on_violation='quarantine': violating rows divert to
    _quarantine with the violated-rule list; passing rows commit."""
    import os

    from datalake_toolkit_spark.lakehouse import LakeTable

    t = LakeTable(
        spark,
        str(tmp_path / "q"),
        constraints={"val_positive": "val > 0"},
        on_violation="quarantine",
    )
    mixed = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, 2.0)], "id bigint, val double"
    )
    t.write(mixed)
    assert sorted(r.id for r in t.read().collect()) == [1, 3]
    qdir = os.path.join(str(tmp_path / "q"), "_quarantine")
    qrows = spark.read.parquet(f"{qdir}/*").collect()
    assert [(r.id, r._violated) for r in qrows] == [(2, "val_positive")]
    # an all-clean write adds no quarantine dir
    before = len(os.listdir(qdir))
    t.write(spark.createDataFrame([(7, 1.0)], "id bigint, val double"))
    assert len(os.listdir(qdir)) == before


def test_quarantine_single_evaluation_of_source(spark, tmp_path):
    """The quarantine gate evaluates the source plan once (r6 advice):
    with a non-deterministic source, re-evaluating it for the probe,
    the quarantine write, and the commit could commit a row without
    quarantining it or vice versa. Every source row must land in
    exactly one of {table, quarantine}."""
    import os

    from datalake_toolkit_spark.lakehouse import LakeTable

    t = LakeTable(
        spark,
        str(tmp_path / "q"),
        constraints={"val_small": "val < 0.5"},
        on_violation="quarantine",
    )
    # non-deterministic values: each re-evaluation of the plan draws
    # fresh randoms, so any double-evaluation shows up as rows lost or
    # duplicated across the table/quarantine split
    src = spark.range(200).select(
        F.col("id"), F.rand().alias("val")
    )
    t.write(src)
    committed = {r.id for r in t.read().collect()}
    qdir = os.path.join(str(tmp_path / "q"), "_quarantine")
    quarantined = {r.id for r in spark.read.parquet(f"{qdir}/*").collect()}
    assert committed | quarantined == set(range(200))
    assert committed & quarantined == set()
    # and the committed rows actually satisfy the rule
    assert t.read().where("val >= 0.5").count() == 0


def test_group_stats_view_recomputes_touched_groups_only(spark, tmp_path):
    """min/max cannot subtract deltas: the stats view recomputes
    exactly the CDF-touched groups and carries the rest forward —
    including the case where a delete removes a group's current max."""
    from decimal import Decimal

    from datalake_toolkit_spark.lakehouse import LakeTable, refresh_group_stats_view

    base = LakeTable(spark, str(tmp_path / "base"), partition_by=("seg",))
    view = LakeTable(spark, str(tmp_path / "view"))
    rows = [(i, f"seg{i % 3}", float(i)) for i in range(30)]
    base.write(spark.createDataFrame(rows, "id bigint, seg string, val double"))

    def recompute():
        return {
            r["seg"]: (r["n_rows"], r["sum_value"], r["min_value"], r["max_value"])
            for r in base.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("val").cast("decimal(18,2)")).alias("sum_value"),
                F.min(F.col("val").cast("decimal(18,2)")).alias("min_value"),
                F.max(F.col("val").cast("decimal(18,2)")).alias("max_value"),
            )
            .collect()
        }

    def view_state():
        return {
            r["seg"]: (r["n_rows"], r["sum_value"], r["min_value"], r["max_value"])
            for r in view.read().collect()
        }

    assert refresh_group_stats_view(base, view, ["seg"], "val") == 0
    assert view_state() == recompute()
    assert refresh_group_stats_view(base, view, ["seg"], "val") is None

    # delete seg2's maximum (29.0): an invertible +/- view could never
    # recover the new max; the recompute path must
    base.delete_where((F.col("seg") == "seg2") & (F.col("id") == 29))
    assert refresh_group_stats_view(base, view, ["seg"], "val") == 1
    state = view_state()
    assert state == recompute()
    assert state["seg2"][3] == Decimal("26.00")
    # untouched groups carried forward, not recomputed: their rows
    # survive byte-identically (same values; spot-check seg0)
    assert state["seg0"] == recompute()["seg0"]

    # mixed upsert: new group + updated value in one refresh
    base.upsert(
        spark.createDataFrame(
            [(99, "seg9", 500.0), (0, "seg0", -7.0)],
            "id bigint, seg string, val double",
        ),
        keys=["id"],
    )
    assert refresh_group_stats_view(base, view, ["seg"], "val") == 2
    state = view_state()
    assert state == recompute()
    assert state["seg9"] == (1, Decimal("500.00"), Decimal("500.00"), Decimal("500.00"))
    assert state["seg0"][2] == Decimal("-7.00")
    # schema stays put across full-build and incremental paths
    assert dict(view.read().dtypes)["sum_value"] == "decimal(28,2)"
    assert dict(view.read().dtypes)["min_value"] == "decimal(18,2)"


def test_matview_null_key_groups_stay_in_sync(spark, tmp_path):
    """NULL group keys must refresh like any other group (r6 advice):
    plain equi-joins never match NULL=NULL, so without null-safe joins
    a NULL-key group enters the view on the full build but later
    changes are neither recomputed nor carried off — the view silently
    diverges. Pins both refresh paths."""
    from decimal import Decimal

    from datalake_toolkit_spark.lakehouse import (
        LakeTable,
        refresh_aggregate_view,
        refresh_group_stats_view,
    )

    schema = "id bigint, seg string, val double"
    rows = [(1, "a", 10.0), (2, None, 20.0), (3, None, 30.0), (4, "b", 40.0)]

    def recompute(base):
        return {
            r["seg"]: (r["n_rows"], r["sum_value"])
            for r in base.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("val").cast("decimal(18,2)")).alias("sum_value"),
            )
            .collect()
        }

    # --- invertible sum/count view ---
    base = LakeTable(spark, str(tmp_path / "base"))
    view = LakeTable(spark, str(tmp_path / "view"))
    base.write(spark.createDataFrame(rows, schema))
    refresh_aggregate_view(base, view, ["seg"], "val")
    state = {r["seg"]: (r["n_rows"], r["sum_value"]) for r in view.read().collect()}
    assert state[None] == (2, Decimal("50.00"))

    # touch ONLY the NULL group: update one row, delete the other
    base.upsert(
        spark.createDataFrame([(2, None, 1000.0)], schema), keys=["id"]
    )
    base.delete_where(F.col("id") == 3)
    refresh_aggregate_view(base, view, ["seg"], "val")
    state = {r["seg"]: (r["n_rows"], r["sum_value"]) for r in view.read().collect()}
    assert state == recompute(base)
    assert state[None] == (1, Decimal("1000.00"))
    # emptying the NULL group drops its row
    base.delete_where(F.col("seg").isNull())
    refresh_aggregate_view(base, view, ["seg"], "val")
    assert None not in {r["seg"] for r in view.read().collect()}

    # --- recompute-touched min/max view ---
    base2 = LakeTable(spark, str(tmp_path / "base2"))
    view2 = LakeTable(spark, str(tmp_path / "view2"))
    base2.write(spark.createDataFrame(rows, schema))
    refresh_group_stats_view(base2, view2, ["seg"], "val")
    # delete the NULL group's max; recompute must pick the new max
    base2.delete_where(F.col("id") == 3)
    refresh_group_stats_view(base2, view2, ["seg"], "val")
    state2 = {
        r["seg"]: (r["n_rows"], r["max_value"]) for r in view2.read().collect()
    }
    assert state2[None] == (1, Decimal("20.00"))
    # untouched non-NULL groups carried forward intact
    assert state2["a"] == (1, Decimal("10.00"))
    assert state2["b"] == (1, Decimal("40.00"))


def test_stream_upsert_honors_persisted_constraints(spark, tmp_path):
    """A stream into a constrained table enforces the PERSISTED rules
    per micro-batch: quarantine mode diverts violating rows and keeps
    the stream alive; the committed table holds only passing rows."""
    from datalake_toolkit_spark.lakehouse import LakeTable
    from datalake_toolkit_spark.lakehouse.streaming import stream_upsert

    tbl_path = str(tmp_path / "t")
    t = LakeTable(spark, tbl_path, constraints={"val_positive": "val > 0"})
    t.write(spark.createDataFrame([(1, 5.0)], "id bigint, val double"))

    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text('{"id": 2, "val": 3.0}\n{"id": 3, "val": -9.0}\n')
    stream = (
        spark.readStream.schema("id bigint, val double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream_upsert(
        stream, tbl_path, keys=["id"],
        checkpoint=str(tmp_path / "ckpt"),
        on_violation="quarantine",
    )
    q.awaitTermination(300)
    got = {r.id: r.val for r in LakeTable(spark, tbl_path).read().collect()}
    assert got == {1: 5.0, 2: 3.0}  # violator never committed
    qrows = spark.read.parquet(f"{tbl_path}/_quarantine/*").collect()
    assert [(r.id, r._violated) for r in qrows] == [(3, "val_positive")]


def test_stream_near_dedup_ingest(spark, tmp_path):
    """Near-dup streaming ingestion: a later micro-batch's
    high-overlap variant of a committed doc is dropped by the band
    ledger probe; genuinely new docs land in the corpus."""
    from datalake_toolkit_spark.lakehouse import LakeTable
    from datalake_toolkit_spark.lakehouse.streaming import stream_near_dedup_ingest

    base = "the quick brown fox jumps over the lazy dog in the quiet park today"
    near = base.replace("today", "tonight")
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text('{"doc_id": 1, "text": "%s"}\n' % base)
    (src / "b2.json").write_text(
        '{"doc_id": 2, "text": "%s"}\n{"doc_id": 3, "text": "totally new legal filings corpus text here"}\n'
        % near
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream_near_dedup_ingest(
        stream,
        str(tmp_path / "corpus"),
        str(tmp_path / "ledger"),
        str(tmp_path / "ckpt"),
        threshold=0.5,
    )
    q.awaitTermination(300)
    ids = sorted(
        r.doc_id for r in LakeTable(spark, str(tmp_path / "corpus")).read().collect()
    )
    assert ids == [1, 3]  # near-dup 2 dropped across micro-batches


# -- partition-spec evolution ------------------------------------------------


def _owner_layouts(t: LakeTable) -> set[tuple[str, ...]]:
    from datalake_toolkit_spark.lakehouse.table import _key_spec

    return {_key_spec(k) for k in t._manifest()["owners"]}


def test_partition_evolution_metadata_mixed_layout_reads(spark, tmp_path, base_df):
    """evolve_partitioning(metadata): no data moves, old dirs keep the
    old layout, new writes land under the new one, and snapshot reads
    union both transparently. Earlier versions read back under the
    layout they were committed with."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df.withColumn("dt", F.concat(F.lit("d"), F.col("id") % 2)))
    t.evolve_partitioning(("dt",))
    assert t.partition_by == ("dt",)
    # legacy dirs untouched: owners still keyed under seg
    assert _owner_layouts(t) == {("seg",)}
    # new rows land under dt; legacy partitions stay put
    src = spark.createDataFrame(
        [(100, "seg0", 1.0, "d0"), (101, "seg1", 2.0, "d1")],
        "id bigint, seg string, val double, dt string",
    )
    t.upsert(src, keys=["id"])
    assert _owner_layouts(t) == {("seg",), ("dt",)}
    got = {r.id: (r.seg, r.val, r.dt) for r in t.read().collect()}
    assert len(got) == 32 and got[100] == ("seg0", 1.0, "d0")
    assert got[5] == ("seg2", 50.0, "d1")
    # v0 still reads under the original layout
    assert {r.id for r in t.read(version=0).collect()} == set(range(30))
    layouts = [tuple(h["partition_by"]) for h in t.history()]
    assert layouts == [("seg",), ("dt",), ("dt",)]


def test_partition_evolution_upsert_carries_legacy_partitions(
    spark, tmp_path, base_df
):
    """A merge matching rows still stored under the PRE-evolution
    layout must carry them off (no duplicates) and rewrite them under
    the current scheme — the incremental-migration contract."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df.withColumn("dt", F.concat(F.lit("d"), F.col("id") % 2)))
    t.evolve_partitioning(("dt",))
    src = spark.createDataFrame(
        [(3, "seg0", 999.0, "d1"), (4, "seg1", 888.0, "d0")],
        "id bigint, seg string, val double, dt string",
    )
    t.upsert(src, keys=["id"])
    rows = t.read().collect()
    assert len(rows) == 30  # updated in place, not duplicated
    got = {r.id: (r.val, r.dt) for r in rows}
    assert got[3] == (999.0, "d1") and got[4] == (888.0, "d0")
    # the touched legacy partitions (seg0/seg1 held ids 3,4) migrated;
    # untouched seg2 keeps its legacy layout
    assert _owner_layouts(t) == {("seg",), ("dt",)}
    owners = set(t._manifest()["owners"])
    assert "seg=seg0" not in owners and "seg=seg1" not in owners
    assert "seg=seg2" in owners


def test_partition_evolution_delete_where_spans_layouts(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df.withColumn("dt", F.concat(F.lit("d"), F.col("id") % 2)))
    t.evolve_partitioning(("dt",))
    t.upsert(
        spark.createDataFrame(
            [(100, "seg0", 5.0, "d0")], "id bigint, seg string, val double, dt string"
        ),
        keys=["id"],
    )
    t.delete_where(F.col("id").isin(1, 100))  # one legacy row, one new-layout row
    assert {r.id for r in t.read().collect()} == set(range(30)) - {1}


def test_partition_evolution_rewrite_and_optimize_migration(
    spark, tmp_path, base_df
):
    """migrate='rewrite' relays the snapshot under the new scheme at
    once; after a metadata evolve, a full optimize() finishes the
    migration (every owner key re-keyed under the current scheme)."""
    df = base_df.withColumn("dt", F.concat(F.lit("d"), F.col("id") % 2))
    a = LakeTable(spark, str(tmp_path / "a"), partition_by=("seg",))
    a.write(df)
    a.evolve_partitioning(("dt",), migrate="rewrite")
    assert _owner_layouts(a) == {("dt",)}
    assert _as_dict(a.read().drop("dt")) == _as_dict(df.drop("dt"))
    b = LakeTable(spark, str(tmp_path / "b"), partition_by=("seg",))
    b.write(df)
    b.evolve_partitioning(("dt",))
    assert _owner_layouts(b) == {("seg",)}
    b.optimize()
    assert _owner_layouts(b) == {("dt",)}
    assert _as_dict(b.read().drop("dt")) == _as_dict(df.drop("dt"))


def test_partition_evolution_from_unpartitioned_blob(spark, tmp_path, base_df):
    """Evolving an unpartitioned table: the legacy '' blob is carried
    off (and re-laid-out) by the first mutation that touches it."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(base_df)
    t.evolve_partitioning(("seg",))
    assert _owner_layouts(t) == {()}
    t.upsert(
        spark.createDataFrame([(0, "seg0", 1.0)], "id bigint, seg string, val double"),
        keys=["id"],
    )
    assert _owner_layouts(t) == {("seg",)}
    got = _as_dict(t.read())
    assert len(got) == 30 and got[0] == ("seg0", 1.0)


def test_open_adopts_committed_scheme_and_mismatch_raises(
    spark, tmp_path, base_df
):
    path = str(tmp_path / "t")
    t = LakeTable(spark, path, partition_by=("seg",))
    t.write(base_df)
    # no partition_by -> adopt the committed scheme (reads AND writes)
    again = LakeTable(spark, path)
    assert again.partition_by == ("seg",)
    with pytest.raises(ValueError, match="evolve_partitioning"):
        LakeTable(spark, path, partition_by=("id",))
    with pytest.raises(ValueError, match="evolve_partitioning"):
        LakeTable(spark, path, partition_by=())


def test_partition_evolution_validates_columns(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    with pytest.raises(ValueError, match="not in table schema"):
        t.evolve_partitioning(("nope",))


def test_aggregate_view_maintains_average(spark, tmp_path):
    """include_avg: avg_value is derived from the maintained
    (count, sum) pair on BOTH refresh paths, so the incremental view
    matches a recompute exactly through updates and deletes."""
    from datalake_toolkit_spark.lakehouse import LakeTable, refresh_aggregate_view

    base = LakeTable(spark, str(tmp_path / "base"), partition_by=("seg",))
    view = LakeTable(spark, str(tmp_path / "view"))
    rows = [(i, f"seg{i % 3}", float(i)) for i in range(30)]
    base.write(spark.createDataFrame(rows, "id bigint, seg string, val double"))

    def recompute():
        return {
            r["seg"]: (r["n_rows"], float(r["sum_value"]), float(r["avg_value"]))
            for r in base.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("val").cast("decimal(18,2)")).alias("sum_value"),
            )
            .withColumn(
                "avg_value",
                (F.col("sum_value") / F.col("n_rows")).cast("decimal(28,6)"),
            )
            .collect()
        }

    def view_state():
        return {
            r["seg"]: (r["n_rows"], float(r["sum_value"]), float(r["avg_value"]))
            for r in view.read().collect()
        }

    refresh_aggregate_view(base, view, ["seg"], "val", include_avg=True)
    assert view_state() == recompute()
    types = dict(view.read().dtypes)
    assert types["avg_value"] == "decimal(28,6)"
    base.upsert(
        spark.createDataFrame(
            [(0, "seg0", 1000.0), (99, "seg9", 7.5)],
            "id bigint, seg string, val double",
        ),
        keys=["id"],
    )
    base.delete_where((F.col("seg") == "seg1") & (F.col("id") < 10))
    refresh_aggregate_view(base, view, ["seg"], "val", include_avg=True)
    assert view_state() == recompute()
    assert dict(view.read().dtypes) == types


# -- file statistics / data skipping ----------------------------------------


def test_file_stats_collected_and_pruned(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(100)],
        "id bigint, name string, val double",
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    # range-cluster on id -> each file covers a disjoint id range
    t.write(df.repartitionByRange(4, "id").sortWithinPartitions("id"))
    stats = t._manifest().get("stats")
    assert stats and len(stats) == 4
    assert all({"id", "name", "val"} <= set(s) for s in stats.values())
    rep = t.plan_scan(where="id >= 75")
    assert rep["prunable"] and rep["files_total"] == 4
    assert rep["files_scanned"] == 1
    got = sorted(r.id for r in t.read(where="id >= 75").collect())
    assert got == list(range(75, 100))
    # unparsable predicate: no pruning, correct rows
    rep2 = t.plan_scan(where="id >= 75 OR id < 3")
    assert not rep2["prunable"] and rep2["files_scanned"] == 4
    got2 = sorted(r.id for r in t.read(where="id >= 75 OR id < 3").collect())
    assert got2 == [0, 1, 2, *range(75, 100)]


def test_partition_pruning_from_where(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    withnull = base_df.unionByName(
        spark.createDataFrame([(99, None, 9.9)], base_df.schema)
    )
    t.write(withnull)
    rep = t.plan_scan(where="seg = 'seg1'")
    assert rep["partitions_total"] == 4  # seg0..2 + NULL dir
    assert rep["partitions_scanned"] == 1
    # NULL partition excluded by ANY comparison, matching filter semantics
    assert {r.seg for r in t.read(where="seg = 'seg1'").collect()} == {"seg1"}


def test_stats_carry_forward_on_upsert(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    before = t._manifest().get("stats")
    src = spark.createDataFrame([(1, "seg1", 999.0)], base_df.schema)
    t.upsert(src, keys=["id"])
    after = t._manifest()
    # untouched partitions keep their ORIGINAL stats entries by pointer
    untouched = {
        p: s for p, s in before.items() if "/seg=seg0/" in f"/{p}"
        or p.split("/", 1)[1].startswith("seg=seg0")
    }
    assert untouched
    for p, s in untouched.items():
        assert after["stats"].get(p) == s
    # rewritten partition's stats reflect the new value
    seg1 = [s for p, s in after["stats"].items() if "seg=seg1" in p]
    assert seg1 and max(s["val"][1] for s in seg1) == 999.0


def test_stats_survive_restore_and_time_travel(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(base_df)
    t.write(base_df.where(F.col("id") < 5))  # v1 replaces
    t.restore(0)
    man = t._manifest()
    assert man["op"] == "restore(v0)"
    assert man.get("stats")  # regenerated (or carried) for restored owners
    assert t.read(where="id >= 20").count() == 10
    assert t.read(version=1, where="id >= 20").count() == 0


def test_plan_scan_counts_partitioned_pending_appends(spark, tmp_path, base_df):
    """plan_scan must count pending merge-on-read append FILES for
    PARTITIONED tables too — their parquet lives in key subdirectories
    of the staging token, and the old top-level listing reported 0
    pending files (a probe report claiming less I/O than the read
    does)."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    owned = t.plan_scan()["files_scanned"]
    assert owned > 0
    extra = base_df.where(F.col("id") < 3).withColumn(
        "id", F.col("id") + 1000
    )
    t.upsert(extra, keys=["id"], mode="mor")
    rep = t.plan_scan()
    assert rep["files_scanned"] > owned  # pending append files counted
    assert t.read().count() == base_df.count() + 3


def test_stats_disabled(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), stats_columns=())
    t.write(base_df)
    assert t._manifest().get("stats") == {}
    # reads still correct, pruning just can't skip files
    assert t.read(where="id >= 20").count() == 10
    rep = t.plan_scan(where="id >= 20")
    assert rep["prunable"] and rep["files_scanned"] == rep["files_total"]


# -- merge-on-read deletes --------------------------------------------------


def test_mor_delete_is_metadata_only_and_insert_immune(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    before = t._manifest()["owners"]
    t.delete_where("val >= 200.0", mode="mor")
    man = t._manifest()
    assert man["owners"] == before  # zero data movement
    assert man["op"] == "delete_mor" and len(man["deletes"]) == 1
    assert t.read().count() == 20
    # rows inserted AFTER the delete are immune even when they match
    t.upsert(
        spark.createDataFrame([(100, "seg0", 999.0)], base_df.schema),
        keys=["id"],
    )
    assert {r.id for r in t.read(where="val >= 200.0").collect()} == {100}


def test_mor_delete_stacks_drains_on_rewrite_and_time_travels(
    spark, tmp_path, base_df
):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(base_df)
    t.delete_where("id < 5", mode="mor")
    t.delete_where("id >= 25", mode="mor")
    assert t.read().count() == 20
    assert t.read(version=0).count() == 30  # pre-delete snapshot intact
    assert t.read(version=1).count() == 25
    ch = t.changes(1, 2)  # second MoR delete changed no owner
    assert ch.where("_change_type = 'delete'").count() == 5
    t.optimize()  # materializes both predicates, entries drain
    assert t._manifest()["deletes"] == []
    assert t.read().count() == 20
    t.restore(1)  # restored snapshot carries ITS delete set
    assert t.read().count() == 25 and len(t._manifest()["deletes"]) == 1


def test_mor_delete_matches_cow_delete(spark, tmp_path, base_df):
    mor = LakeTable(spark, str(tmp_path / "mor"), partition_by=("seg",))
    cow = LakeTable(spark, str(tmp_path / "cow"), partition_by=("seg",))
    mor.write(base_df)
    cow.write(base_df)
    mor.delete_where("val >= 100.0 AND seg = 'seg1'", mode="mor")
    cow.delete_where(F.expr("val >= 100.0 AND seg = 'seg1'"))
    assert _as_dict(mor.read()) == _as_dict(cow.read())


def test_mor_delete_rejects_non_string_and_bad_sql(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(base_df)
    with pytest.raises(TypeError, match="SQL string"):
        t.delete_where(F.col("id") < 5, mode="mor")
    with pytest.raises(Exception):
        t.delete_where("id <<>> 5", mode="mor")
    assert t.current_version() == 0  # nothing committed


# -- merge-on-read upsert ---------------------------------------------------


def test_mor_upsert_appends_and_resolves_newest_wins(spark, tmp_path, base_df):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(base_df)
    owners0 = dict(t._manifest()["owners"])
    t.upsert(
        spark.createDataFrame([(1, "seg9", 111.0), (99, "segX", 1.0)], base_df.schema),
        keys=["id"],
        mode="mor",
    )
    man = t._manifest()
    assert man["owners"] == owners0  # append-only: zero base rewrite
    assert man["op"] == "merge_mor" and len(man["merges"]) == 1
    t.upsert(
        spark.createDataFrame([(1, "seg8", 222.0)], base_df.schema),
        keys=["id"],
        mode="mor",
    )
    got = _as_dict(t.read())
    assert len(got) == 31
    assert got[1] == ("seg8", 222.0)  # newest append wins
    assert got[99] == ("segX", 1.0)  # insert via append
    assert got[2] == ("seg2", 20.0)  # untouched base row
    # time travel resolves each manifest's own pending set
    assert _as_dict(t.read(version=1))[1] == ("seg9", 111.0)
    assert _as_dict(t.read(version=0))[1] == ("seg1", 10.0)


def test_mor_upsert_matches_cow_upsert(spark, tmp_path, base_df):
    src = spark.createDataFrame(
        [(0, "segA", -1.0), (77, "segB", 7.0)], base_df.schema
    )
    mor = LakeTable(spark, str(tmp_path / "mor"))
    cow = LakeTable(spark, str(tmp_path / "cow"))
    mor.write(base_df)
    cow.write(base_df)
    mor.upsert(src, keys=["id"], mode="mor")
    cow.upsert(src, keys=["id"])
    assert _as_dict(mor.read()) == _as_dict(cow.read())


def test_mor_upsert_entries_drain_and_vacuum_keeps_append_dirs(
    spark, tmp_path, base_df
):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(base_df)
    t.upsert(
        spark.createDataFrame([(5, "segZ", 5.5)], base_df.schema),
        keys=["id"],
        mode="mor",
    )
    # CDF across the append sees the logical update
    ch = {
        (r._change_type, r.id, r.val)
        for r in t.changes(0, 1).where("id = 5").collect()
    }
    assert ch == {("delete", 5, 50.0), ("insert", 5, 5.5)}
    # vacuum must never reap a pending append's token dir
    t.vacuum(keep_last=1)
    assert _as_dict(t.read())[5] == ("segZ", 5.5)
    t.optimize()
    assert t._manifest()["merges"] == []
    assert _as_dict(t.read())[5] == ("segZ", 5.5)


def test_mor_upsert_guards(spark, tmp_path, base_df):
    # a batch with multiple rows per key has no deterministic
    # within-batch winner — it must fail loudly, not pick one silently
    part = LakeTable(spark, str(tmp_path / "p"), partition_by=("seg",))
    part.write(base_df)
    dup = spark.createDataFrame(
        [(1, "seg1", 10.0), (1, "seg1", 20.0)],
        "id bigint, seg string, val double",
    )
    with pytest.raises(ValueError, match="multiple rows per key"):
        part.upsert(dup, keys=["id"], mode="mor")
    assert part.current_version() == 0  # aborted before any commit
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(base_df)
    t.upsert(
        spark.createDataFrame([(5, "segZ", 5.5)], base_df.schema),
        keys=["id"],
        mode="mor",
    )
    with pytest.raises(ValueError, match="pending"):
        t.upsert(base_df.limit(1), keys=["seg"], mode="mor")
    with pytest.raises(ValueError, match="pending"):
        t.evolve_partitioning(("seg",))
    with pytest.raises(ValueError, match="schema_evolution"):
        t.upsert(
            base_df.limit(1), keys=["id"], mode="mor", schema_evolution=True
        )


def test_stream_upsert_mor_mode(spark, tmp_path):
    """Streaming MERGE with mode='mor': each micro-batch APPENDS under
    a fresh token (op merge_mor, base never rewritten) and the resolved
    read matches what CoW streaming would produce."""
    import json as _json

    from datalake_toolkit_spark.lakehouse import LakeTable, stream_upsert

    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "t")

    (src / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"id": 1, "val": 1.0, "ts": 1.0},
                {"id": 2, "val": 2.0, "ts": 1.0},
            ]
        )
    )
    q = stream_upsert(
        spark.readStream.schema("id bigint, val double, ts double").json(
            str(src)
        ),
        table,
        keys=["id"],
        checkpoint=str(tmp_path / "ckpt"),
        order_by=[F.desc("ts")],
        mode="mor",
    )
    q.awaitTermination(120)
    (src / "b2.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"id": 1, "val": 99.0, "ts": 3.0},
                {"id": 1, "val": 10.0, "ts": 2.0},  # in-batch loser
                {"id": 3, "val": 3.0, "ts": 2.0},
            ]
        )
    )
    q = stream_upsert(
        spark.readStream.schema("id bigint, val double, ts double").json(
            str(src)
        ),
        table,
        keys=["id"],
        checkpoint=str(tmp_path / "ckpt"),
        order_by=[F.desc("ts")],
        mode="mor",
    )
    q.awaitTermination(120)
    t = LakeTable(spark, table)
    man = t._manifest()
    assert man["op"] == "merge_mor" and len(man["merges"]) == 1
    got = {r.id: r.val for r in t.read().collect()}
    assert got == {1: 99.0, 2: 2.0, 3: 3.0}


# -- clone ------------------------------------------------------------------


def test_shallow_clone_zero_copy_and_divergence(spark, tmp_path, base_df):
    src = LakeTable(spark, str(tmp_path / "src"), partition_by=("seg",))
    src.write(base_df)
    src.delete_where("val >= 250.0", mode="mor")  # pending predicate
    c = src.clone(str(tmp_path / "clone"))
    # zero-copy: no data dir of its own yet, full snapshot readable
    assert not os.path.isdir(str(tmp_path / "clone" / "data"))
    assert _as_dict(c.read()) == _as_dict(src.read())
    assert c.read().count() == 25  # the carried delete predicate applies
    assert len(c._manifest()["deletes"]) == 1
    # translated file stats prune on the clone
    rep = c.plan_scan(where="seg = 'seg1'")
    assert rep["partitions_scanned"] == 1 and rep["partitions_total"] == 3
    # divergence both ways
    c.upsert(
        spark.createDataFrame([(0, "seg0", 999.0)], base_df.schema), keys=["id"]
    )
    src.upsert(
        spark.createDataFrame([(1, "seg1", 888.0)], base_df.schema), keys=["id"]
    )
    assert _as_dict(c.read())[0] == ("seg0", 999.0)
    assert _as_dict(src.read())[0] == ("seg0", 0.0)
    assert _as_dict(c.read())[1] == ("seg1", 10.0)
    # clone vacuum never reaps the source's dirs
    c.vacuum(keep_last=1)
    assert src.read().count() == 25
    with pytest.raises(ValueError, match="already has commits"):
        src.clone(str(tmp_path / "clone"))


def test_deep_clone_is_self_contained(spark, tmp_path, base_df):
    src = LakeTable(spark, str(tmp_path / "src"), partition_by=("seg",))
    src.write(base_df)
    d = src.clone(str(tmp_path / "deep"), shallow=False)
    assert all(
        not os.path.isabs(t) for t in d._manifest()["owners"].values()
    )
    assert _as_dict(d.read()) == _as_dict(src.read())
    # fully independent of the source's retention
    shutil_rm = __import__("shutil").rmtree
    shutil_rm(str(tmp_path / "src"))
    assert d.read().count() == 30


def test_shallow_clone_carries_pending_merges(spark, tmp_path, base_df):
    src = LakeTable(spark, str(tmp_path / "src"))
    src.write(base_df)
    src.upsert(
        spark.createDataFrame([(1, "segZ", 111.0), (50, "segN", 5.0)], base_df.schema),
        keys=["id"],
        mode="mor",
    )
    c = src.clone(str(tmp_path / "clone"))
    assert len(c._manifest()["merges"]) == 1
    got = _as_dict(c.read())
    assert got[1] == ("segZ", 111.0) and got[50] == ("segN", 5.0)
    c.optimize()  # localizes + clears pending entries on the CLONE only
    assert c._manifest()["merges"] == []
    assert len(LakeTable(spark, str(tmp_path / "src"))._manifest()["merges"]) == 1


def test_matview_refresh_over_mor_mutations(spark, tmp_path):
    """Incremental matview maintenance rides the change feed; MoR
    deletes and appends change NO owner, so this pins that the CDF's
    logical-change detection feeds the view the right deltas."""
    from datalake_toolkit_spark.lakehouse import (
        LakeTable,
        refresh_aggregate_view,
    )

    base = LakeTable(spark, str(tmp_path / "base"))
    view = LakeTable(spark, str(tmp_path / "view"))
    base.write(
        spark.createDataFrame(
            [(i, f"seg{i % 3}", float(i)) for i in range(30)],
            "id bigint, seg string, val double",
        )
    )

    def recompute():
        return {
            (r["seg"],): (r["n_rows"], float(r["sum_value"]))
            for r in base.read()
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("val").cast("decimal(18,2)")).alias("sum_value"),
            )
            .collect()
        }

    def view_state():
        return {
            (r["seg"],): (r["n_rows"], float(r["sum_value"]))
            for r in view.read().collect()
        }

    refresh_aggregate_view(base, view, ["seg"], "val")
    assert view_state() == recompute()
    base.upsert(
        spark.createDataFrame(
            [(0, "seg0", 1000.0), (99, "seg9", 7.5)],
            "id bigint, seg string, val double",
        ),
        keys=["id"],
        mode="mor",
    )
    base.delete_where("seg = 'seg1' AND id < 10", mode="mor")
    refresh_aggregate_view(base, view, ["seg"], "val")
    assert view_state() == recompute()


def test_timestamp_pruning_disabled_under_non_utc_session(spark, tmp_path):
    """LTZ timestamp stats are UTC-normalized but filter literals are
    session-TZ: under a non-UTC session the conjunct must NOT prune
    (it could drop files holding matching rows) while the filter still
    returns the right rows. DATE columns keep pruning either way."""
    df = spark.sql(
        "SELECT id, timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts,"
        "       date'2024-01-01' + CAST(id AS INT) AS d FROM range(40)"
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(df.repartitionByRange(4, "id").sortWithinPartitions("id"))
    pred_ts = "ts >= '2024-01-31 00:00:00'"
    pred_d = "d >= '2024-01-31'"
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = t.plan_scan(where=pred_ts)
        assert utc["files_scanned"] < utc["files_total"]  # prunes under UTC
        n_utc = t.read(where=pred_ts).count()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = t.plan_scan(where=pred_ts)
        assert ny["files_scanned"] == ny["files_total"]  # no TS pruning
        # correctness holds: filter-only result, same rows as a plain read
        assert (
            t.read(where=pred_ts).count()
            == t.read().where(F.expr(pred_ts)).count()
        )
        # DATE pruning is timezone-free and stays active
        nyd = t.plan_scan(where=pred_d)
        assert nyd["files_scanned"] < nyd["files_total"]
        assert t.read(where=pred_d).count() == 10
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert n_utc == 10


# -- merge-on-read: resolved-view deletes + partitioned appends ---------------


def test_mor_delete_after_mor_upsert_kills_shadowed_key(spark, tmp_path):
    """A MoR delete whose predicate matches the WINNING append row must
    kill the key outright — not resurrect the shadowed base row the
    delete's snapshot never showed (r7 ADVICE high). Parity against the
    same sequence replayed copy-on-write."""
    schema = "id bigint, seg string, val double"
    base = spark.createDataFrame([(0, "seg0", 50.0), (1, "seg1", 60.0)], schema)
    upd = spark.createDataFrame([(0, "seg0", 250.0)], schema)
    mor = LakeTable(spark, str(tmp_path / "mor"))
    cow = LakeTable(spark, str(tmp_path / "cow"))
    for t, mode in ((mor, "mor"), (cow, "cow")):
        t.write(base)
        t.upsert(upd, keys=["id"], mode=mode)
        t.delete_where("val >= 200.0", mode=mode)
    assert _as_dict(mor.read()) == _as_dict(cow.read()) == {1: ("seg1", 60.0)}
    # and the inverse: delete matching only the SHADOWED value leaves
    # the winner untouched
    mor2 = LakeTable(spark, str(tmp_path / "mor2"))
    mor2.write(base)
    mor2.upsert(upd, keys=["id"], mode="mor")
    mor2.delete_where("val = 50.0", mode="mor")
    assert _as_dict(mor2.read()) == {0: ("seg0", 250.0), 1: ("seg1", 60.0)}


def test_mor_delete_targets_winner_among_stacked_appends(spark, tmp_path):
    """With stacked appends, a delete matching the newest append must
    not fall back to an older (already-shadowed) append row."""
    schema = "id bigint, seg string, val double"
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(9, "seg9", 1.0)], schema))
    t.upsert(spark.createDataFrame([(0, "s", 10.0)], schema), keys=["id"], mode="mor")
    t.upsert(spark.createDataFrame([(0, "s", 250.0)], schema), keys=["id"], mode="mor")
    t.delete_where("val >= 200.0", mode="mor")
    assert _as_dict(t.read()) == {9: ("seg9", 1.0)}  # id 0 gone, not 10.0
    # an append AFTER the delete re-inserts the key (fresh tokens are
    # immune to earlier predicates)
    t.upsert(spark.createDataFrame([(0, "s", 300.0)], schema), keys=["id"], mode="mor")
    got = _as_dict(t.read())
    assert got[0] == ("s", 300.0) and len(got) == 2


def test_stacked_mor_deletes_keep_coverage_of_pending_appends(
    spark, tmp_path
):
    """Two stacked MoR predicate deletes over a pending MoR append: the
    second delete's carry must keep the first entry's coverage of the
    pending merge token (r8 ADVICE medium — `_carried_deletes` was
    called without the merges, so a delete whose only live coverage was
    an un-compacted append was pruned away and its rows resurrected)."""
    schema = "id bigint, seg string, val double"
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(9, "seg9", 1.0)], schema))
    # pending append introduces id=1 under a merge token only
    t.upsert(
        spark.createDataFrame([(1, "s1", 80.0)], schema),
        keys=["id"],
        mode="mor",
    )
    t.delete_where("id = 1", mode="mor")
    assert _as_dict(t.read()) == {9: ("seg9", 1.0)}
    # unrelated second MoR delete must not resurrect id=1
    t.delete_where("val > 1000.0", mode="mor")
    assert _as_dict(t.read()) == {9: ("seg9", 1.0)}
    man = t._manifest()
    merge_tok = man["merges"][0]["token"]
    first = [e for e in man["deletes"] if e["pred"] == "id = 1"]
    assert first and merge_tok in first[0]["tokens"]
    # and the drain still works: a full optimize materializes both
    t.optimize()
    assert _as_dict(t.read()) == {9: ("seg9", 1.0)}
    assert not t._manifest()["deletes"] and not t._manifest()["merges"]


def test_mor_upsert_partitioned_matches_cow_and_time_travels(
    spark, tmp_path, base_df
):
    src = spark.createDataFrame(
        [(0, "seg0", -1.0), (77, "seg7", 7.0)], base_df.schema
    )
    mor = LakeTable(spark, str(tmp_path / "mor"), partition_by=("seg",))
    cow = LakeTable(spark, str(tmp_path / "cow"), partition_by=("seg",))
    mor.write(base_df)
    cow.write(base_df)
    owners0 = dict(mor._manifest()["owners"])
    mor.upsert(src, keys=["id"], mode="mor")
    cow.upsert(src, keys=["id"])
    man = mor._manifest()
    assert man["owners"] == owners0  # append-only: zero base rewrite
    assert man["merges"][0]["parts"] == ["seg=seg0", "seg=seg7"]
    assert _as_dict(mor.read()) == _as_dict(cow.read())
    assert _as_dict(mor.read(version=0)) == _as_dict(base_df)


def test_mor_upsert_partitioned_cross_partition_move(spark, tmp_path, base_df):
    """An update that moves a key to another partition: the full read
    shows exactly one row for the key (new home), a read restricted to
    the OLD partition must NOT show the stale shadowed row, and the new
    home is visible even though no owner directory exists for it yet."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)  # id 3 lives in seg0
    t.upsert(
        spark.createDataFrame([(3, "segNEW", 999.0)], base_df.schema),
        keys=["id"],
        mode="mor",
    )
    got = _as_dict(t.read())
    assert got[3] == ("segNEW", 999.0) and len(got) == 30
    old_home = _as_dict(t.read(partitions=["seg=seg0"]))
    assert 3 not in old_home  # stale row stays shadowed
    assert old_home[0] == ("seg0", 0.0)
    # the new partition has no owner dir yet; restricted reads still
    # surface the appended row through global resolution
    assert _as_dict(t.read(partitions=["seg=seg1"])).keys() == {
        i for i in range(30) if i % 3 == 1
    }


def test_cow_rewrites_materialize_partitioned_pending_appends(
    spark, tmp_path, base_df
):
    """A CoW upsert/delete on a partitioned table with pending appends
    clears the merge entries WITHOUT losing append rows in partitions
    the CoW source never touched, and carries off the old home of a
    moved key (r8: merge-on-read for partitioned tables)."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    # pending: move id 3 seg0->segNEW, update id 4 in place
    t.upsert(
        spark.createDataFrame(
            [(3, "segNEW", 999.0), (4, "seg1", 44.0)], base_df.schema
        ),
        keys=["id"],
        mode="mor",
    )
    # CoW upsert touching ONLY seg2 (id 5) — must still materialize both
    t.upsert(
        spark.createDataFrame([(5, "seg2", 55.0)], base_df.schema),
        keys=["id"],
    )
    man = t._manifest()
    assert man["merges"] == []
    got = _as_dict(t.read())
    assert got[3] == ("segNEW", 999.0)
    assert got[4] == ("seg1", 44.0)
    assert got[5] == ("seg2", 55.0)
    assert len(got) == 30
    # the old home's directory no longer serves the stale row even with
    # no merge entries left
    assert 3 not in _as_dict(t.read(partitions=["seg=seg0"]))
    # same for CoW delete
    t2 = LakeTable(spark, str(tmp_path / "t2"), partition_by=("seg",))
    t2.write(base_df)
    t2.upsert(
        spark.createDataFrame([(3, "segNEW", 999.0)], base_df.schema),
        keys=["id"],
        mode="mor",
    )
    t2.delete_where(F.col("id") == 6)  # seg0, unrelated to the append
    assert t2._manifest()["merges"] == []
    got2 = _as_dict(t2.read())
    assert got2[3] == ("segNEW", 999.0) and 6 not in got2 and len(got2) == 29


def test_scoped_optimize_materializes_partitioned_pending_appends(
    spark, tmp_path, base_df
):
    """optimize(partitions=...) with pending appends widens its scope to
    the partitions they touch: entries clear, moved keys land in their
    new home, and the old home's stale row is carried off."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    t.upsert(
        spark.createDataFrame([(3, "segNEW", 999.0)], base_df.schema),
        keys=["id"],
        mode="mor",
    )
    t.optimize(partitions=["seg=seg2"])  # scope does not name seg0/segNEW
    man = t._manifest()
    assert man["merges"] == []
    got = _as_dict(t.read())
    assert got[3] == ("segNEW", 999.0) and len(got) == 30
    assert "seg=segNEW" in man["owners"]
    assert 3 not in _as_dict(t.read(partitions=["seg=seg0"]))


def test_empty_source_cow_mutations_are_lossless(spark, tmp_path, base_df):
    """Empty-source CoW upserts and never-matching CoW deletes preserve
    every row — including with pending merge-on-read appends, whose
    entries they resolve (r7 ADVICE medium pin)."""
    for part in ((), ("seg",)):
        t = LakeTable(
            spark, str(tmp_path / f"t{len(part)}"), partition_by=part
        )
        t.write(base_df)
        t.upsert(
            spark.createDataFrame([(0, "seg0", 250.0)], base_df.schema),
            keys=["id"],
            mode="mor",
        )
        t.upsert(
            spark.createDataFrame([], base_df.schema), keys=["id"]
        )
        got = _as_dict(t.read())
        assert len(got) == 30 and got[0] == ("seg0", 250.0)
        assert t._manifest()["merges"] == []
        t.delete_where("val > 99999.0")  # matches nothing
        assert len(_as_dict(t.read())) == 30


def test_cow_delete_accepts_sql_string_condition(spark, tmp_path, base_df):
    """delete_where(mode='cow') with a SQL STRING condition — the string
    must become an expression before F.coalesce (a bare string there is
    read as a column NAME and failed analysis)."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    t.delete_where("val >= 200.0 AND seg = 'seg2'")
    got = _as_dict(t.read())
    assert len(got) == 26
    assert all(not (v >= 200.0 and s == "seg2") for s, v in got.values())


def test_data_skipping_normalizes_noncanonical_temporal_literals(
    spark, tmp_path
):
    """Stats are canonical ISO strings but Spark compares literals
    semantically: '1997-1-1' (unpadded) sorts lexically ABOVE every
    '1997-0x-..' stat and used to prune files holding matching rows.
    Non-canonical literals must now prune CORRECTLY (normalized), and
    'T'-separated timestamps likewise (r7 ADVICE medium)."""
    df = spark.sql(
        "SELECT id, date'1997-01-01' + CAST(id AS INT) AS d,"
        "       timestamp'1997-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts"
        " FROM range(40)"
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(df.repartitionByRange(4, "id").sortWithinPartitions("id"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # semantic truth: d > 1997-01-05 -> ids 5..39 -> 35 rows
        for pred in ("d > '1997-01-05'", "d > '1997-1-5'"):
            assert t.read(where=pred).count() == 35, pred
        # the padded form prunes; the unpadded form normalizes to the
        # SAME pruning (not a wrong one, not zero)
        canon = t.plan_scan(where="d > '1997-01-28'")
        loose = t.plan_scan(where="d > '1997-1-28'")
        assert canon["files_scanned"] < canon["files_total"]
        assert loose == canon
        assert t.read(where="d > '1997-1-28'").count() == 12
        # T-separated / unpadded timestamp literals: same story
        canon_ts = t.plan_scan(where="ts >= '1997-01-29 00:00:00'")
        for lit in ("1997-01-29T00:00:00", "1997-1-29"):
            got = t.plan_scan(where=f"ts >= '{lit}'")
            assert got == canon_ts, lit
            assert t.read(where=f"ts >= '{lit}'").count() == 12, lit
        # an unparseable literal degrades to filter-only, never prunes
        weird = t.plan_scan(where="d > '1997~01~05'")
        assert weird["files_scanned"] == weird["files_total"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_bloom_filter_point_lookup_skips_overlapping_files(spark, tmp_path):
    """Parquet bloom filters on write + planning-side probe on read:
    two files whose [min, max] string ranges fully overlap (min/max
    stats can exclude NOTHING for a point lookup) — the bloom probe
    must still skip the file that provably lacks the key, read() must
    return the right row, and files without filters stay unpruned."""
    # file A holds even uids, file B odd uids; both span uid_000..uid_199
    rows_a = [(i, f"uid_{i:03d}") for i in range(0, 200, 2)]
    rows_b = [(i, f"uid_{i:03d}") for i in range(1, 200, 2)]
    t = LakeTable(
        spark,
        str(tmp_path / "t"),
        bloom_filter_columns={"uid": 256},
    )
    df_a = spark.createDataFrame(rows_a, "id bigint, uid string").coalesce(1)
    df_b = spark.createDataFrame(rows_b, "id bigint, uid string").coalesce(1)
    t.write(df_a.unionByName(df_b).repartitionByRange(2, (F.col("id") % 2)))
    # force exactly-2-file layout deterministically: rewrite as two
    # one-file frames under one version via union of coalesced halves
    # (repartitionByRange on id%2 gives one even + one odd partition)
    man = t._manifest()
    rep = t.plan_scan(where="uid = 'uid_004'")  # even: lives in one file
    assert rep["files_total"] == 2, man["owners"]
    # min/max can't split them (both files span the full uid range)...
    assert all(
        st["uid"][0] <= "uid_004" <= st["uid"][1]
        for st in man["stats"].values()
    )
    # ...but the bloom probe skips the odd file
    assert rep["files_bloom_skipped"] == 1
    assert rep["files_scanned"] == 1
    got = t.read(where="uid = 'uid_004'").collect()
    assert [(r.id, r.uid) for r in got] == [(4, "uid_004")]
    # a value inside BOTH files' [min,max] range but present in NO
    # file: min/max keeps both, blooms skip both, read returns empty
    rep_none = t.plan_scan(where="uid = 'uid_100a'")
    assert rep_none["files_scanned"] == 0
    assert rep_none["files_bloom_skipped"] == 2
    assert t.read(where="uid = 'uid_100a'").count() == 0
    # a reader WITHOUT the option still probes via the manifest hint
    t2 = LakeTable(spark, str(tmp_path / "t"))
    rep2 = t2.plan_scan(where="uid = 'uid_004'")
    assert rep2["files_scanned"] == 1


def test_bloom_probe_keeps_files_without_filters(spark, tmp_path, base_df):
    """Evidence-based only: files written BEFORE blooms were enabled
    (or by a bloom-less writer) are never skipped, even when the
    manifest hints the column."""
    plain = LakeTable(spark, str(tmp_path / "t"))
    plain.write(base_df.withColumn("uid", F.concat(F.lit("u"), F.col("id"))))
    # enable blooms for a later commit: hint appears, old files survive
    bloomed = LakeTable(
        spark, str(tmp_path / "t"), bloom_filter_columns=["uid"]
    )
    bloomed.upsert(
        spark.createDataFrame(
            [(999, "segZ", 9.0, "u999")],
            "id bigint, seg string, val double, uid string",
        ),
        keys=["id"],
    )
    assert "uid" in bloomed._manifest()["bloom_columns"]
    rep = bloomed.plan_scan(where="uid = 'u1'")
    assert rep["files_scanned"] >= 1
    assert bloomed.read(where="uid = 'u1'").count() == 1


def test_scoped_optimize_after_spec_evolution_does_not_duplicate(
    spark, tmp_path, base_df
):
    """optimize(partitions=[<old-layout key>]) after evolve_partitioning
    rewrites the data under the NEW layout: the old-layout owner must
    DROP from the owners map (r8 fix — carrying it alongside the new
    keys double-counted every rewritten row)."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df.withColumn("bucket", F.col("id") % 2))
    t.evolve_partitioning(("seg", "bucket"))  # metadata-only
    before = _as_dict(t.read())
    t.optimize(partitions=["seg=seg0"])  # old-layout key, new-layout write
    man = t._manifest()
    assert "seg=seg0" not in man["owners"]  # old home dropped
    assert any(k.startswith("seg=seg0/bucket=") for k in man["owners"])
    assert _as_dict(t.read()) == before  # no duplicated rows
    assert t.read().count() == 30


def test_partition_scoped_upsert_never_scans_the_table(spark, tmp_path):
    """partition_scoped=True: when the partition column derives from
    the merge keys, the CoW merge must not read ANY partition outside
    the source's own (no full-table match probe), while producing the
    same result as the unscoped merge."""
    rows = [(f"k{i:02d}", f"b{i % 4}", float(i)) for i in range(40)]
    schema = "key string, bucket string, val double"
    scoped = LakeTable(spark, str(tmp_path / "s"), partition_by=("bucket",))
    plain = LakeTable(spark, str(tmp_path / "p"), partition_by=("bucket",))
    for t in (scoped, plain):
        t.write(spark.createDataFrame(rows, schema))
    src = spark.createDataFrame(
        [("k01", "b1", 111.0), ("k99", "b3", 9.0)], schema
    )
    reads = []
    orig = scoped._read_owned

    def spy(man, keys=None, conjuncts=None, merge_scope="restrict", **kw):
        reads.append(keys)
        return orig(man, keys=keys, conjuncts=conjuncts,
                    merge_scope=merge_scope, **kw)

    scoped._read_owned = spy
    try:
        scoped.upsert(src, keys=["key"], partition_scoped=True)
    finally:
        scoped._read_owned = orig
    assert reads and all(k is not None for k in reads), reads
    assert set().union(*reads) <= {"bucket=b1", "bucket=b3"}
    plain.upsert(src, keys=["key"])
    assert {
        (r.key, r.bucket, r.val) for r in scoped.read().collect()
    } == {(r.key, r.bucket, r.val) for r in plain.read().collect()}
    # untouched buckets carried by pointer
    man = scoped._manifest()
    man0 = scoped._manifest(0)
    for k in ("bucket=b0", "bucket=b2"):
        assert man["owners"][k] == man0["owners"][k]


def test_cdf_after_partitioned_mor_append_is_scoped_and_complete(
    spark, tmp_path, base_df
):
    """changes() across a partitioned MoR append: the moved key emits
    a delete in its old home and an insert in its new one, an insert
    into a brand-new partition is NOT lost (it has no owner directory
    on either side), and the diff reads ONLY the merge-touched
    partitions — never the whole table."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)  # v0; id 3 lives in seg0
    t.upsert(
        spark.createDataFrame(
            [(3, "segNEW", 999.0), (4, "seg1", 44.0)], base_df.schema
        ),
        keys=["id"],
        mode="mor",
    )  # v1
    reads = []
    orig = t._read_owned

    def spy(man, keys=None, conjuncts=None, merge_scope="restrict", **kw):
        reads.append(keys)
        return orig(man, keys=keys, conjuncts=conjuncts,
                    merge_scope=merge_scope, **kw)

    t._read_owned = spy
    try:
        got = {
            (r._change_type, r.id, r.seg, r.val)
            for r in t.changes(0, 1).collect()
        }
    finally:
        t._read_owned = orig
    assert got == {
        ("delete", 3, "seg0", 30.0),
        ("insert", 3, "segNEW", 999.0),
        ("delete", 4, "seg1", 40.0),
        ("insert", 4, "seg1", 44.0),
    }
    # the before/after diffs are key-restricted and never name seg2
    # (untouched by the append and shadowing nothing); the only
    # unrestricted reads are the two shadowed-home probes, needed here
    # because keys=["id"] lets a key move partitions
    scoped = [set(k) for k in reads if k is not None]
    assert scoped and len([k for k in reads if k is None]) == 2
    assert all("seg=seg2" not in s for s in scoped)
    assert {"seg=segNEW", "seg=seg0", "seg=seg1"} <= set().union(*scoped)

    # with every partition column inside the merge keys, a key cannot
    # move partitions: the shadow probe is skipped and NO read touches
    # the whole table
    t2 = LakeTable(spark, str(tmp_path / "t2"), partition_by=("seg",))
    t2.write(base_df)
    t2.upsert(
        spark.createDataFrame([(4, "seg1", 44.0)], base_df.schema),
        keys=["id", "seg"],
        mode="mor",
    )
    reads2 = []
    orig2 = t2._read_owned

    def spy2(man, keys=None, conjuncts=None, merge_scope="restrict", **kw):
        reads2.append(keys)
        return orig2(man, keys=keys, conjuncts=conjuncts,
                    merge_scope=merge_scope, **kw)

    t2._read_owned = spy2
    try:
        got2 = {
            (r._change_type, r.id, r.val) for r in t2.changes(0, 1).collect()
        }
    finally:
        t2._read_owned = orig2
    assert got2 == {("delete", 4, 40.0), ("insert", 4, 44.0)}
    assert reads2 and all(k is not None for k in reads2)
    assert set().union(*reads2) == {"seg=seg1"}


def test_auto_compact_merges_threshold_scoped_drain(spark, tmp_path):
    """auto_compact_after={'merges': N}: the Nth MoR commit triggers a
    SCOPED rewrite that drains the pending appends — untouched
    partitions keep their owner token, a reader holding the prior
    snapshot stays consistent, and the data matches a CoW replay."""
    schema = "id bigint, seg string, val double"
    base = [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]
    t = LakeTable(
        spark, str(tmp_path / "t"), partition_by=("seg",),
        auto_compact_after={"merges": 3},
    )
    cow = LakeTable(spark, str(tmp_path / "cow"), partition_by=("seg",))
    t.write(spark.createDataFrame(base, schema))
    cow.write(spark.createDataFrame(base, schema))
    ups = [(1, "a", 11.0), (2, "a", 22.0), (1, "a", 111.0)]
    for i, row in enumerate(ups):
        src = spark.createDataFrame([row], schema)
        cow.upsert(src, keys=["id"])
        if i == 2:
            snapshot = t.read()  # reader opened BEFORE the Nth commit
            pre = {(r.id, r.seg, r.val) for r in snapshot.collect()}
        t.upsert(src, keys=["id"], mode="mor")
    man = t._manifest()
    # the 3rd commit crossed the threshold: merges drained by a
    # follow-up optimize commit
    assert man["op"] == "optimize" and man["merges"] == []
    # scoped: seg=b was never merge-touched and kept its v0 token
    assert man["owners"]["seg=b"] == t._manifest(0)["owners"]["seg=b"]
    assert _as_dict(t.read()) == _as_dict(cow.read())
    # versions: 3 upsert commits + 1 auto optimize
    assert t.current_version() == 4
    # the pre-trigger reader still collects its own consistent snapshot
    assert pre == {(1, "a", 11.0), (2, "a", 22.0), (3, "b", 3.0)}


def test_auto_compact_deletes_threshold_full_drain(spark, tmp_path):
    """auto_compact_after={'deletes': N}: stacked MoR predicate deletes
    drain with a FULL optimize once the entry count crosses N (their
    token coverage spans the table)."""
    schema = "id bigint, seg string, val double"
    t = LakeTable(
        spark, str(tmp_path / "t"), partition_by=("seg",),
        auto_compact_after={"deletes": 2},
    )
    t.write(
        spark.createDataFrame(
            [(i, "a" if i % 2 else "b", float(i)) for i in range(6)], schema
        )
    )
    t.delete_where("id = 1", mode="mor")
    assert t._manifest()["op"] == "delete_mor"  # below threshold
    t.delete_where("id = 4", mode="mor")
    man = t._manifest()
    assert man["op"] == "optimize"
    assert man["deletes"] == [] and man["merges"] == []
    assert {r.id for r in t.read().collect()} == {0, 2, 3, 5}


def test_auto_compact_append_ratio_trigger(spark, tmp_path):
    """auto_compact_after={'append_ratio': r}: pending append files vs
    base files (manifest stats) trigger the drain even below the
    merges count threshold."""
    schema = "id bigint, val double"
    t = LakeTable(
        spark, str(tmp_path / "t"),
        auto_compact_after={"merges": 100, "append_ratio": 0.4},
    )
    t.write(spark.createDataFrame([(i, float(i)) for i in range(4)], schema))
    base_files = len(t._manifest()["stats"])
    t.upsert(
        spark.createDataFrame([(0, 100.0)], schema), keys=["id"], mode="mor"
    )
    man = t._manifest()
    if len(man["stats"]) == 0 or base_files == 0:  # stats always on here
        raise AssertionError("test premise broken: no stats collected")
    # a single-file append against a small base crosses 0.4 immediately
    assert man["op"] == "optimize" and man["merges"] == []
    assert {r.id: r.val for r in t.read().collect()}[0] == 100.0


def test_stream_upsert_mor_auto_compacts(spark, tmp_path):
    """A MoR stream with auto_compact_after never accumulates more
    than the threshold of pending merges — the read tax is bounded
    without any out-of-band optimize()."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    schema = "id bigint, seg string, val double"
    for b in range(4):
        spark.createDataFrame(
            [(i, "s", float(b * 10 + i)) for i in range(3)], schema
        ).coalesce(1).write.mode("append").parquet(str(src_dir / f"b{b}"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "b*"))
    )
    from datalake_toolkit_spark.lakehouse.streaming import stream_upsert

    q = stream_upsert(
        stream,
        str(tmp_path / "tbl"),
        keys=["id"],
        checkpoint=str(tmp_path / "ckpt"),
        partition_by=("seg",),
        order_by=[F.col("val")],
        mode="mor",
        auto_compact_after={"merges": 2},
    )
    q.awaitTermination(120)
    t = LakeTable(spark, str(tmp_path / "tbl"))
    # pending merges bounded by the policy at every version
    for v in t._versions():
        assert len(t._manifest(v).get("merges") or []) < 2 + 1
    assert len(t._manifest().get("merges") or []) < 2
    got = _as_dict(t.read())
    assert set(got) == {0, 1, 2}
    # newest-wins under order_by=val: the max val per id survives
    assert got[0] == ("s", 30.0) and got[2] == ("s", 32.0)


def test_cdf_shadow_probe_is_stat_pruned(spark, tmp_path):
    """The shadowed-old-home probe in changes() must not read the whole
    base when partition cols are not a subset of the merge keys (r8
    verdict #2): it builds min/max range conjuncts from the delta's
    append keys, so only files whose key stats overlap are listed."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    rows = [(i, "a", float(i)) for i in range(10)]
    rows += [(i, "b", float(i)) for i in range(100, 110)]
    rows += [(i, "c", float(i)) for i in range(200, 210)]
    t.write(spark.createDataFrame(rows, "id bigint, seg string, val double"))
    # move id=5 from seg=a to seg=zz: keys=["id"] can't cover seg, so
    # the probe runs — but pruned to files overlapping id=5
    t.upsert(
        spark.createDataFrame(
            [(5, "zz", 555.0)], "id bigint, seg string, val double"
        ),
        keys=["id"],
        mode="mor",
    )
    reports = []
    orig = t._select_files

    def spy(man, keys, conjuncts, exclude_files=None):
        bg, rep = orig(man, keys, conjuncts, exclude_files)
        reports.append((conjuncts, rep))
        return bg, rep

    t._select_files = spy
    try:
        got = {
            (r._change_type, r.id, r.seg, r.val)
            for r in t.changes(0, 1).collect()
        }
    finally:
        t._select_files = orig
    assert got == {
        ("delete", 5, "a", 5.0),
        ("insert", 5, "zz", 555.0),
    }
    # two probes (from/to side), each carrying id range conjuncts and
    # scanning only the seg=a files (id stats of b/c exclude 5)
    probes = [(c, r) for c, r in reports if c]
    assert len(probes) == 2
    for conjs, rep in probes:
        assert ("id", ">=", 5) in conjs and ("id", "<=", 5) in conjs
        assert rep["files_total"] >= 3
        assert 0 < rep["files_scanned"] < rep["files_total"]
        assert rep["partitions_scanned"] == 1


def test_cdf_across_rewrite_boundary_with_mixed_merge_key_sets(
    spark, tmp_path
):
    """changes() spanning a rewrite that cleared merges committed on one
    key set and re-created them on another (r8 ADVICE low): each delta
    entry must be probed with its OWN keys, and the diff must equal the
    brute-force snapshot diff."""
    schema = "id bigint, seg string, val double"
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], schema
        )
    )  # v0
    t.upsert(
        spark.createDataFrame([(1, "zz", 11.0)], schema),
        keys=["id"],
        mode="mor",
    )  # v1: pending merge on keys=[id], cross-partition move
    t.optimize()  # v2: merges cleared
    t.upsert(
        spark.createDataFrame([(2, "b", 22.0)], schema),
        keys=["id", "seg"],
        mode="mor",
    )  # v3: pending merge on a DIFFERENT key set
    man_f, man_t = t._manifest(1), t._manifest(3)
    assert [list(e["keys"]) for e in man_f["merges"]] == [["id"]]
    assert [list(e["keys"]) for e in man_t["merges"]] == [["id", "seg"]]
    before, after = t.read(version=1), t.read(version=3)
    want = {
        ("delete", r.id, r.seg, r.val)
        for r in before.exceptAll(after).collect()
    } | {
        ("insert", r.id, r.seg, r.val)
        for r in after.exceptAll(before).collect()
    }
    got = {
        (r._change_type, r.id, r.seg, r.val)
        for r in t.changes(1, 3).collect()
    }
    assert got == want == {("delete", 2, "b", 2.0), ("insert", 2, "b", 22.0)}


def test_bloom_config_adopted_by_later_handles(spark, tmp_path):
    """A handle opened WITHOUT bloom_filter_columns adopts the table's
    committed config (like partition_by): its rewrites keep writing
    filters, so maintenance through a plain handle can't silently
    strip point-lookup skipping."""
    t = LakeTable(
        spark, str(tmp_path / "t"), bloom_filter_columns={"uid": 256}
    )
    t.write(
        spark.createDataFrame(
            [(i, f"uid_{i:03d}") for i in range(200)], "id bigint, uid string"
        )
    )
    plain = LakeTable(spark, str(tmp_path / "t"))  # no option
    assert plain.bloom_filter_columns == {"uid": None}
    plain.optimize()  # full rewrite through the adopting handle
    # an absent-but-in-range key: min/max excludes the files whose
    # range misses it, and the BLOOM must exclude the rest — zero
    # files scanned proves the rewritten files still carry filters
    rep = plain.plan_scan(where="uid = 'uid_100a'")
    assert rep["files_total"] >= 1
    assert rep["files_scanned"] == 0
    assert rep["files_bloom_skipped"] >= 1


def test_bloom_hint_retires_with_explicit_empty_config(spark, tmp_path):
    """The manifest bloom hint is a monotone union only for handles
    that ADOPT the config; an explicit bloom_filter_columns=() is
    authoritative and retires the hint (r8 ADVICE low), so point
    lookups stop paying footer probes on columns whose files lost
    their filters. A later adopting handle stays retired."""
    df = spark.createDataFrame(
        [(i, f"uid_{i:03d}") for i in range(50)], "id bigint, uid string"
    )
    t = LakeTable(spark, str(tmp_path / "t"), bloom_filter_columns=("uid",))
    t.write(df)
    assert t._manifest()["bloom_columns"] == ["uid"]
    # an adopting handle carries the hint through its commits
    LakeTable(spark, str(tmp_path / "t")).optimize()
    assert t._manifest()["bloom_columns"] == ["uid"]
    # explicit empty config: the next commit drops the hint
    off = LakeTable(spark, str(tmp_path / "t"), bloom_filter_columns=())
    off.optimize()
    assert off._manifest()["bloom_columns"] == []
    # and adoption after retirement stays empty
    again = LakeTable(spark, str(tmp_path / "t"))
    assert again.bloom_filter_columns == {}
    again.write(df, op="append")
    assert again._manifest()["bloom_columns"] == []
    # reads stay correct throughout
    assert again.read().where("uid = 'uid_007'").count() >= 1


def test_stream_upsert_mor_partitioned(spark, tmp_path):
    """Streaming merge-on-read into a PARTITIONED table (r8): each
    micro-batch appends under the table's layout, a later batch can
    move a key across partitions, and the resolved read (full and
    partition-restricted) reflects the newest state."""
    import json as _json

    from datalake_toolkit_spark.lakehouse import LakeTable, stream_upsert

    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "t")
    (src / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"id": 1, "seg": "a", "val": 1.0, "ts": 1.0},
                {"id": 2, "seg": "b", "val": 2.0, "ts": 1.0},
            ]
        )
    )
    schema = "id bigint, seg string, val double, ts double"
    q = stream_upsert(
        spark.readStream.schema(schema).json(str(src)),
        table,
        keys=["id"],
        checkpoint=str(tmp_path / "ckpt"),
        partition_by=("seg",),
        order_by=[F.desc("ts")],
        mode="mor",
    )
    q.awaitTermination(120)
    (src / "b2.json").write_text(
        _json.dumps({"id": 1, "seg": "c", "val": 99.0, "ts": 2.0})
    )
    q = stream_upsert(
        spark.readStream.schema(schema).json(str(src)),
        table,
        keys=["id"],
        checkpoint=str(tmp_path / "ckpt"),
        partition_by=("seg",),
        order_by=[F.desc("ts")],
        mode="mor",
    )
    q.awaitTermination(120)
    t = LakeTable(spark, table)
    man = t._manifest()
    assert man["op"] == "merge_mor"
    assert man["merges"] and man["merges"][-1]["parts"] == ["seg=c"]
    got = {r.id: (r.seg, r.val) for r in t.read().collect()}
    assert got == {1: ("c", 99.0), 2: ("b", 2.0)}
    # the moved key's old partition no longer serves it
    assert 1 not in {
        r.id for r in t.read(partitions=["seg=a"]).collect()
    }


def test_random_mor_cow_interleavings_match_model(spark, tmp_path):
    """Model-based check of the mutation state machine: seeded random
    interleavings of CoW/MoR upserts, CoW/MoR deletes, and full/scoped
    compactions on a partitioned table must match a plain in-memory
    dict model after EVERY op — and every committed version must still
    read back as the model state it was committed under (time travel
    across pending-append boundaries)."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        path = str(tmp_path / f"m{seed}")
        t = LakeTable(spark, path, partition_by=("seg",))
        model: dict[str, tuple[str, float]] = {}
        keys_pool = [f"k{i}" for i in range(8)]
        segs = ["s0", "s1", "s2"]
        schema = "key string, seg string, val double"

        def batch(n):
            ks = rng.sample(keys_pool, n)
            return [
                (k, rng.choice(segs), float(rng.randint(0, 9) * 10))
                for k in ks
            ]

        init = batch(5)
        t.write(spark.createDataFrame(init, schema))
        model = {k: (s, v) for k, s, v in init}
        history = [(t.current_version(), dict(model))]

        def check(tag):
            got = {r.key: (r.seg, r.val) for r in t.read().collect()}
            assert got == model, f"seed={seed} after {tag}: {got} != {model}"

        for step in range(8):
            op = rng.choice(
                ["cow_up", "mor_up", "cow_del", "mor_del", "mor_del_keys",
                 "opt", "opt_part"]
            )
            if op in ("cow_up", "mor_up"):
                rows = batch(rng.randint(1, 3))
                t.upsert(
                    spark.createDataFrame(rows, schema),
                    keys=["key"],
                    mode="mor" if op == "mor_up" else "cow",
                )
                model.update({k: (s, v) for k, s, v in rows})
            elif op in ("cow_del", "mor_del"):
                cut = float(rng.randint(0, 9) * 10)
                t.delete_where(f"val >= {cut}", mode=op[:3])
                model = {k: sv for k, sv in model.items() if sv[1] < cut}
            elif op == "mor_del_keys":
                doomed = rng.sample(keys_pool, rng.randint(1, 2))
                t.upsert(
                    spark.createDataFrame([(k,) for k in doomed], "key string"),
                    keys=["key"],
                    mode="mor",
                    when_matched="delete",
                )
                for k in doomed:
                    model.pop(k, None)
            elif op == "opt":
                t.optimize()
            else:
                owned = sorted(t._manifest()["owners"])
                if owned and owned != [""]:
                    t.optimize(partitions=[rng.choice(owned)])
                else:
                    t.optimize()
            check(f"step {step} {op}")
            history.append((t.current_version(), dict(model)))

        # time travel: every committed version reads as the state it
        # was committed under, including versions with pending appends
        for v, snap in history:
            got = {r.key: (r.seg, r.val) for r in t.read(version=v).collect()}
            assert got == snap, f"seed={seed} version {v}"


def test_stream_dedup_ingest_mor_corpus(spark, tmp_path):
    """corpus_mode='mor': each micro-batch's survivors land as a
    merge-on-read APPEND on the corpus (no base rewrite), dedup across
    batches still holds, and the resolved corpus matches the CoW
    pipeline's content."""
    from datalake_toolkit_spark.lakehouse.streaming import stream_dedup_ingest

    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        '{"doc_id": 1, "text": "alpha doc"}\n{"doc_id": 2, "text": "beta doc"}\n'
    )
    q = stream_dedup_ingest(
        spark.readStream.schema("doc_id bigint, text string").json(str(src)),
        corpus_path=str(tmp_path / "corpus"),
        ledger_path=str(tmp_path / "ledger"),
        checkpoint=str(tmp_path / "ckpt"),
        corpus_mode="mor",
    )
    q.awaitTermination(120)
    (src / "b2.json").write_text(
        '{"doc_id": 3, "text": "alpha doc"}\n{"doc_id": 4, "text": "gamma doc"}\n'
    )
    q = stream_dedup_ingest(
        spark.readStream.schema("doc_id bigint, text string").json(str(src)),
        corpus_path=str(tmp_path / "corpus"),
        ledger_path=str(tmp_path / "ledger"),
        checkpoint=str(tmp_path / "ckpt"),
        corpus_mode="mor",
    )
    q.awaitTermination(120)
    corpus = LakeTable(spark, str(tmp_path / "corpus"))
    man = corpus._manifest()
    assert man["op"] == "merge_mor" and man["merges"]  # append, no rewrite
    got = {(r.doc_id, r.text) for r in corpus.read().collect()}
    assert got == {(1, "alpha doc"), (2, "beta doc"), (4, "gamma doc")}


def test_mor_delete_by_key_tombstones(spark, tmp_path, base_df):
    """upsert(when_matched='delete', mode='mor'): key tombstones append
    O(keys) — bare key frames work, the base is never rewritten, the
    result matches the CoW key-delete, a later append re-inserts the
    key, and rewrites materialize the deletions."""
    mor = LakeTable(spark, str(tmp_path / "mor"), partition_by=("seg",))
    cow = LakeTable(spark, str(tmp_path / "cow"), partition_by=("seg",))
    mor.write(base_df)
    cow.write(base_df)
    owners0 = dict(mor._manifest()["owners"])
    doomed = spark.createDataFrame([(3,), (7,), (999,)], "id bigint")
    mor.upsert(doomed, keys=["id"], mode="mor", when_matched="delete")
    man = mor._manifest()
    assert man["op"] == "merge_mor_delete"
    assert man["owners"] == owners0  # append-only
    assert man["merges"][0].get("delete") is True
    # CoW delete needs the full schema; derive the same key set
    cow.upsert(
        base_df.where(F.col("id").isin(3, 7)),
        keys=["id"],
        when_matched="delete",
    )
    assert _as_dict(mor.read()) == _as_dict(cow.read())
    assert len(_as_dict(mor.read())) == 28
    # restricted read of the victim's partition excludes it
    assert 3 not in _as_dict(mor.read(partitions=["seg=seg0"]))
    # a later append re-inserts the key (newest-wins over the tombstone)
    mor.upsert(
        spark.createDataFrame([(3, "segX", 33.0)], base_df.schema),
        keys=["id"],
        mode="mor",
    )
    assert _as_dict(mor.read())[3] == ("segX", 33.0)
    # time travel: the tombstone version stays deleted, v0 intact
    assert 3 not in _as_dict(mor.read(version=1))
    assert _as_dict(mor.read(version=0)) == _as_dict(base_df)
    # a CoW rewrite materializes the pending set without resurrecting
    mor.upsert(
        spark.createDataFrame([(0, "seg0", 1.0)], base_df.schema),
        keys=["id"],
    )
    assert mor._manifest()["merges"] == []
    got = _as_dict(mor.read())
    assert 7 not in got and got[3] == ("segX", 33.0) and got[0] == ("seg0", 1.0)


def test_mor_tombstone_lands_in_victims_partition_when_key_covers_it(
    spark, tmp_path, base_df
):
    """With the partition column inside the merge keys, the tombstone
    carries the key's partition value and lands in that partition —
    not in __HIVE_DEFAULT_PARTITION__."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(base_df)
    t.upsert(
        spark.createDataFrame([(6, "seg0")], "id bigint, seg string"),
        keys=["id", "seg"],
        mode="mor",
        when_matched="delete",
    )
    entry = t._manifest()["merges"][0]
    assert entry["parts"] == ["seg=seg0"]
    got = _as_dict(t.read())
    assert 6 not in got and len(got) == 29


def test_mor_append_retries_on_concurrent_commit(spark, tmp_path, base_df):
    """Two writers MoR-appending concurrently: the loser recomputes
    from the fresh manifest and BOTH appends survive as distinct
    pending entries with increasing seqs — nothing lost, resolution
    sees both."""
    path = str(tmp_path / "t")
    t = LakeTable(spark, path)
    t.write(base_df)
    other = LakeTable(spark, path)
    orig = t._commit
    fired = []

    def racing_commit(version, owners, op, schema_json, **kwargs):
        if not fired:
            fired.append(True)
            other.upsert(  # sneaks in v1 before our claim
                spark.createDataFrame(
                    [(50, "segA", 5.0)], "id bigint, seg string, val double"
                ),
                keys=["id"],
                mode="mor",
            )
        return orig(version, owners, op, schema_json, **kwargs)

    t._commit = racing_commit
    t.upsert(
        spark.createDataFrame(
            [(51, "segB", 6.0)], "id bigint, seg string, val double"
        ),
        keys=["id"],
        mode="mor",
    )
    man = t._manifest()
    assert [e["seq"] for e in man["merges"]] == [1, 2]
    got = _as_dict(t.read())
    assert got[50] == ("segA", 5.0) and got[51] == ("segB", 6.0)
    assert len(got) == 32


def test_vacuum_reaps_aged_quarantine_dirs(spark, tmp_path):
    """Quarantine dirs are an audit sink with no manifest references —
    vacuum(quarantine_max_age_sec=...) reaps them once aged, keeps
    them inside the triage window, and never touches table data."""
    import time as _time

    t = LakeTable(
        spark,
        str(tmp_path / "t"),
        constraints={"pos": "val >= 0"},
        on_violation="quarantine",
    )
    t.write(
        spark.createDataFrame(
            [(1, 5.0), (2, -1.0)], "id bigint, val double"
        )
    )
    qroot = tmp_path / "t" / "_quarantine"
    assert qroot.is_dir() and any(qroot.iterdir())
    now = _time.time()
    t.vacuum(quarantine_max_age_sec=3600.0, now=now)  # young: kept
    assert any(qroot.iterdir())
    t.vacuum(quarantine_max_age_sec=3600.0, now=now + 7200)  # aged: reaped
    assert not any(qroot.iterdir())
    assert {r.id for r in t.read().collect()} == {1}  # data untouched


def test_stream_index_ingest_maintains_postings_and_ivf(spark, tmp_path):
    """Streaming index maintenance: micro-batches add into a
    PostingsIndex (and the same wrapper drives an IVFIndex); a
    re-drain with the same checkpoint is a no-op, and a REPLAYED batch
    (fresh checkpoint, same data) converges instead of duplicating —
    the add path is key-idempotent, no side ledger."""
    import json as _json

    from datalake_toolkit_spark.lakehouse import stream_index_ingest
    from datalake_toolkit_spark.llm import IVFIndex, PostingsIndex

    src = tmp_path / "src"
    src.mkdir()
    idx = PostingsIndex(spark, str(tmp_path / "pidx"), prefix_len=1)

    def drop(name, rows):
        (src / name).write_text("\n".join(_json.dumps(r) for r in rows))

    def drain(ckpt):
        q = stream_index_ingest(
            spark.readStream.schema("doc_id bigint, text string")
            .json(str(src)),
            idx,
            checkpoint=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)

    drop("b1.json", [
        {"doc_id": 1, "text": "red fish blue fish"},
        {"doc_id": 2, "text": "red red red"},
    ])
    drain("ckpt")
    drop("b2.json", [{"doc_id": 3, "text": "blue whale"}])
    drain("ckpt")

    queries = spark.createDataFrame(
        [(100, "red fish"), (200, "whale")],
        "query_id bigint, query_text string",
    )
    got = {
        (r.query_id, r.rank): (r.doc_id, r.n_matched, r.sum_tf)
        for r in idx.search(queries, k=10).collect()
    }
    assert got[(100, 1)] == (1, 2, 3)
    assert got[(100, 2)] == (2, 1, 3)
    assert got[(200, 1)] == (3, 1, 1)

    # same-checkpoint re-drain: no new source files, no new version
    v_before = idx.postings_t.current_version()
    drain("ckpt")
    assert idx.postings_t.current_version() == v_before

    # replay with a FRESH checkpoint: adds re-run but converge
    drain("ckpt2")
    assert {
        (r.query_id, r.rank): (r.doc_id, r.n_matched, r.sum_tf)
        for r in idx.search(queries, k=10).collect()
    } == got
    assert idx.doc_stats_t.read().count() == 3

    # the same wrapper maintains a vector index
    esrc = tmp_path / "esrc"
    esrc.mkdir()
    ivf = IVFIndex(spark, str(tmp_path / "ivf"))
    ivf.build(
        spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
            "vec_id bigint, embedding array<double>",
        ),
        n_lists=2,
        lloyd_iters=1,
        dim=4,
    )
    (esrc / "e1.json").write_text(
        _json.dumps({"vec_id": 5, "embedding": [0.9, 0.1, 0.0, 0.0]})
    )
    q = stream_index_ingest(
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .json(str(esrc)),
        ivf,
        checkpoint=str(tmp_path / "eckpt"),
    )
    q.awaitTermination(120)
    qdf = spark.createDataFrame(
        [(99, [1.0, 0.05, 0.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    hits = ivf.search(qdf, k=1, n_probe=2).collect()
    assert [r.cid for r in hits] == [0]  # streamed vector indexed next to it
    assert ivf.assignments_t.read().count() == 3


def test_read_partition_that_exists_only_in_pending_mor_appends(
    spark, tmp_path
):
    """A merge-on-read append may open a BRAND-NEW partition; until a
    rewrite localizes it into the owners map, a partition-restricted
    read must still address it (returning the resolved append rows)
    instead of raising unknown-partition — and bucket-pruned readers
    built on read(partitions=...) must see the fresh rows."""
    import pytest as _pytest

    from datalake_toolkit_spark.lakehouse import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("seg",))
    t.write(
        spark.createDataFrame([(1, "a", 1.0)], "id bigint, seg string, v double")
    )
    t.upsert(
        spark.createDataFrame([(2, "b", 2.0)], "id bigint, seg string, v double"),
        keys=["id"],
        mode="mor",
    )
    assert "seg=b" not in t._manifest()["owners"]  # still pending
    rows = t.read(partitions=["seg=b"]).collect()
    assert [(r.id, r.seg, r.v) for r in rows] == [(2, "b", 2.0)]
    # restriction still scopes: the owned partition alone has no id 2
    rows_a = t.read(partitions=["seg=a"]).collect()
    assert [(r.id, r.seg) for r in rows_a] == [(1, "a")]
    # truly unknown partitions still fail loudly
    with _pytest.raises(ValueError, match="unknown partitions"):
        t.read(partitions=["seg=zzz"])
    # a rewrite localizes the pending partition into owners
    t.optimize()
    assert "seg=b" in t._manifest()["owners"]
    assert t.read(partitions=["seg=b"]).count() == 1


def test_stream_dedup_ingest_maintains_indexes_on_survivors(spark, tmp_path):
    """indexes= on the streaming dedup pipeline: only ADMITTED
    survivors reach the retrieval index (dropped duplicates never do),
    inside the fingerprints-last crash window."""
    import json as _json

    from datalake_toolkit_spark.lakehouse import (
        LakeTable,
        stream_dedup_ingest,
    )
    from datalake_toolkit_spark.llm import PostingsIndex

    src = tmp_path / "src"
    src.mkdir()
    idx = PostingsIndex(spark, str(tmp_path / "pidx"), prefix_len=1)

    def drain():
        q = stream_dedup_ingest(
            spark.readStream.schema("doc_id bigint, text string")
            .json(str(src)),
            corpus_path=str(tmp_path / "corpus"),
            ledger_path=str(tmp_path / "ledger"),
            checkpoint=str(tmp_path / "ckpt"),
            indexes=[idx],
        )
        q.awaitTermination(120)

    (src / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "red fish blue fish"},
                {"doc_id": 2, "text": "red red red"},
            ]
        )
    )
    drain()
    # batch 2: doc 3 duplicates doc 1's text exactly -> dropped
    # everywhere; doc 4 is fresh
    (src / "b2.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 3, "text": "red fish blue fish"},
                {"doc_id": 4, "text": "blue whale"},
            ]
        )
    )
    drain()

    corpus_ids = {
        r.doc_id
        for r in LakeTable(spark, str(tmp_path / "corpus")).read().collect()
    }
    assert corpus_ids == {1, 2, 4}
    indexed_ids = {
        r.doc_id for r in idx.doc_stats_t.read().collect()
    }
    assert indexed_ids == corpus_ids  # the dup never reached the index
    queries = spark.createDataFrame(
        [(7, "whale"), (8, "fish")], "query_id bigint, query_text string"
    )
    got = {
        (r.query_id, r.doc_id) for r in idx.search(queries, k=10).collect()
    }
    assert got == {(7, 4), (8, 1)}


def test_partition_values_round_trip_despite_java_float_literals(
    spark, tmp_path
):
    """Hex-bucket partition values like '8f' parse as Java float
    literals (Double.parseDouble('8f') == 8.0), so Spark's partition
    type inference silently corrupted them whenever a token's
    directory set was ALL double-parseable — e.g. a one-bucket MoR
    append. Inference is disabled engine-wide and every dir-derived
    column is pinned to its manifest type from the raw string; this
    pins the round trip for base reads, pending-append reads, and the
    merge-key machinery."""
    from datalake_toolkit_spark.lakehouse import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("bucket",))
    t.write(
        spark.createDataFrame(
            [(1, "8f", 10), (2, "1d", 20), (3, "zz", 30)],
            "id bigint, bucket string, v bigint",
        )
    )
    # the append lands ONLY in double-parseable buckets — the exact
    # shape that used to trip inference
    t.upsert(
        spark.createDataFrame(
            [(1, "8f", 11), (4, "16", 40)],
            "id bigint, bucket string, v bigint",
        ),
        keys=["id"],
        mode="mor",
        assume_key_unique=True,
    )
    got = {(r.id, r.bucket, r.v) for r in t.read().collect()}
    assert got == {(1, "8f", 11), (2, "1d", 20), (3, "zz", 30), (4, "16", 40)}
    sub = {
        (r.id, r.bucket, r.v)
        for r in t.read(partitions=["bucket=8f"]).collect()
    }
    assert sub == {(1, "8f", 11)}
    # a rewrite (optimize) must materialize the same values
    t.optimize()
    assert {(r.id, r.bucket, r.v) for r in t.read().collect()} == got


def test_stream_index_ingest_watermark_bounds_state_and_commits(
    spark, tmp_path
):
    """Event-time story for streaming index maintenance: with ts_col
    set, a doc replayed WITHIN the watermark horizon is dropped
    before it costs an index commit (first wins — its changed text
    must NOT reach the index), a replay PAST the horizon re-indexes
    and converges via the key-idempotent upsert, and the dedup state
    is EVICTED by the watermark instead of growing with the stream."""
    import json as _json

    from datalake_toolkit_spark.lakehouse import stream_index_ingest
    from datalake_toolkit_spark.llm import PostingsIndex

    src = tmp_path / "src"
    src.mkdir()
    idx = PostingsIndex(spark, str(tmp_path / "pidx"), prefix_len=1)

    def drop(name, rows):
        (src / name).write_text("\n".join(_json.dumps(r) for r in rows))

    last_progress = {}

    def drain():
        q = stream_index_ingest(
            spark.readStream.schema("doc_id bigint, text string, ts timestamp")
            .json(str(src)),
            idx,
            checkpoint=str(tmp_path / "ckpt"),
            ts_col="ts",
            watermark="10 minutes",
        )
        q.awaitTermination(120)
        if q.lastProgress:
            last_progress.update(q.lastProgress)

    def dl_of(doc_id):
        return {
            r.doc_id: r.dl for r in idx.doc_stats_t.read().collect()
        }.get(doc_id)

    drop("b1.json", [
        {"doc_id": 1, "text": "alpha beta", "ts": "2026-01-01 10:00:00"},
        {"doc_id": 2, "text": "gamma", "ts": "2026-01-01 10:00:00"},
    ])
    drain()
    assert dl_of(1) == 2 and dl_of(2) == 1

    # replay of doc 1 WITHIN the horizon: dropped pre-index — its
    # longer text must not land, and the dup-only micro-batch costs
    # ZERO index commits (the cost the watermark exists to avoid)
    v_before = idx.doc_stats_t.current_version()
    pv_before = idx.postings_t.current_version()
    drop("b2a.json", [
        {"doc_id": 1, "text": "alpha beta gamma delta",
         "ts": "2026-01-01 10:01:00"},
    ])
    drain()
    assert idx.doc_stats_t.current_version() == v_before
    assert idx.postings_t.current_version() == pv_before
    assert dl_of(1) == 2  # first wins inside the watermark
    drop("b2.json", [
        {"doc_id": 3, "text": "epsilon zeta eta", "ts": "2026-01-01 12:00:00"},
    ])
    drain()
    assert dl_of(3) == 3

    # replay of doc 1 PAST the horizon (watermark advanced to ~11:50
    # by doc 3): state evicted, the re-add reaches the index and the
    # upsert converges it to the new content
    drop("b3.json", [
        {"doc_id": 1, "text": "theta iota kappa lambda mu",
         "ts": "2026-01-01 12:01:00"},
    ])
    drain()
    assert dl_of(1) == 5
    assert idx.doc_stats_t.read().count() == 3
    assert v_before is not None

    # MANY dup-only micro-batches: each must cost zero index commits
    v0 = idx.doc_stats_t.current_version()
    p0 = idx.postings_t.current_version()
    for i in range(3):
        drop(f"dup{i}.json", [
            {"doc_id": 3, "text": f"spam{i} spam{i}",
             "ts": f"2026-01-01 12:0{2 + i}:00"},
        ])
        drain()
        assert idx.doc_stats_t.current_version() == v0
        assert idx.postings_t.current_version() == p0
    assert dl_of(3) == 3  # original content untouched

    # bounded state: the b1-era keys are evicted — state holds only
    # rows inside the current horizon, not every key ever seen
    ops = last_progress.get("stateOperators") or []
    assert ops and ops[0]["numRowsTotal"] <= 3


def test_in_list_data_skipping(spark, tmp_path):
    """`col IN (...)` prunes like a disjunction of equalities: whole
    partitions whose key value is outside the list, and files whose
    min/max exclude EVERY listed value — with the filter always
    applied, so unparsable lists only lose skipping, never rows."""
    from datalake_toolkit_spark.lakehouse import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"))
    rows = [(i, f"g{i % 4}", f"k{i:03d}") for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, grp string, k string")
    t.write(df)
    # range-cluster on k so each file carries a tight k min/max
    # (AQE would coalesce this toy table into ONE file and leave
    # nothing to skip — real tables hit the 64 MB advisory size)
    coal = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t.optimize(sort_by=["k"])
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", coal
        )

    got = {
        r.id
        for r in t.read(where="k IN ('k007', 'k123')").collect()
    }
    assert got == {7, 123}
    rep = t.plan_scan(where="k IN ('k007', 'k123')")
    assert rep["prunable"]
    assert rep["partitions_scanned"] <= rep["partitions_total"]
    assert 0 < rep["files_scanned"] < rep["files_total"]

    # partition-key IN prunes whole directories
    tp = LakeTable(spark, str(tmp_path / "tp"), partition_by=("grp",))
    tp.write(df)
    rep2 = tp.plan_scan(where="grp IN ('g1', 'g2')")
    assert rep2["partitions_scanned"] == 2 and rep2["partitions_total"] == 4
    assert {
        r.grp for r in tp.read(where="grp IN ('g1','g2')").collect()
    } == {"g1", "g2"}

    # numeric IN on a stats column skips files too
    rep3 = t.plan_scan(where="id IN (3, 397)")
    assert rep3["prunable"]
    assert {r.id for r in t.read(where="id IN (3, 397)").collect()} == {
        3,
        397,
    }

    # a value list the parser must refuse: filter still correct,
    # pruning reported off
    tricky = t.plan_scan(where="k IN ('k007', 'a)b')")
    assert not tricky["prunable"]
    assert {
        r.id for r in t.read(where="k IN ('k007', 'a)b')").collect()
    } == {7}


def test_postings_term_pushdown_skips_files(spark, tmp_path):
    """After a term-sorted maintain(), a query's `term IN` pushdown
    skips most of a bucket's files at the manifest level — and the
    serve answers are unchanged (same rows, predicate is a superset
    filter of the downstream term join)."""
    from datalake_toolkit_spark.llm import PostingsIndex

    docs = spark.createDataFrame(
        [(i, f"t{i % 97:02d} t{(i + 1) % 97:02d} filler{i % 13}")
         for i in range(600)],
        "doc_id bigint, text string",
    )
    idx = PostingsIndex(spark, str(tmp_path / "p"), prefix_len=1)
    idx.add(docs)
    queries = spark.createDataFrame(
        [(1, "t03 t04 filler5")], "query_id bigint, query_text string"
    )
    before = sorted(map(tuple, idx.search(queries, k=10).collect()))
    bm_before = sorted(map(tuple, idx.search_bm25(queries, k=10).collect()))
    coal = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        idx.maintain()  # term-sorted compaction
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", coal
        )
    rep = idx.plan_probe(queries)
    assert rep["prunable"]
    assert rep["files_scanned"] < rep["files_total"]
    assert sorted(map(tuple, idx.search(queries, k=10).collect())) == before
    assert sorted(
        map(tuple, idx.search_bm25(queries, k=10).collect())
    ) == bm_before


def test_postings_term_bloom_skips_unsorted_owned_files(spark, tmp_path):
    """term_bloom=True lets the `term IN` pushdown bloom-skip OWNED
    files written unsorted (the initial build), where term min/max
    spans the alphabet and stats skipping is blind — answers
    unchanged, and a handle without the flag adopts the committed
    config."""
    from datalake_toolkit_spark.llm import PostingsIndex

    idx = PostingsIndex(
        spark, str(tmp_path / "p"), prefix_len=1, term_bloom=True
    )
    # the build lands unsorted owned files; force several files per
    # bucket so blooms have something to skip
    coal = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        idx.add(
            spark.createDataFrame(
                [(i, f"w{i % 400:03d} filler{i % 7}"
                  + (" zebraneedle" if i == 77 else ""))
                 for i in range(2000)],
                "doc_id bigint, text string",
            ).repartition(8)
        )
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", coal
        )
    assert "term" in (
        idx.postings_t._manifest().get("bloom_columns") or []
    )
    # a RARE term: its postings live in one file of its bucket, so
    # the bucket's other unsorted files are bloom-provably absent
    queries = spark.createDataFrame(
        [(1, "zebraneedle")], "query_id bigint, query_text string"
    )
    got = sorted(map(tuple, idx.search(queries, k=10).collect()))
    assert [d for (_, d, *_rest) in got] == [77]
    rep = idx.plan_probe(queries)
    assert rep["prunable"]
    # at toy scale the rebalance writes ONE file per bucket, so there
    # is nothing in-bucket to skip — the bloom SKIPPING mechanics for
    # IN lists are pinned by test_bloom_in_list_membership below; here
    # the contract is plumbing + unchanged answers
    # a handle opened WITHOUT the flag adopts the committed config
    again = PostingsIndex(spark, str(tmp_path / "p"), prefix_len=1)
    assert sorted(
        map(tuple, again.search(queries, k=10).collect())
    ) == got


def test_bloom_in_list_membership(spark, tmp_path):
    """`col IN (...)` excludes a file via blooms only when EVERY
    listed value is bloom-absent — one present value keeps it."""
    t = LakeTable(
        spark, str(tmp_path / "t"), bloom_filter_columns={"uid": 256}
    )
    rows_a = [(i, f"uid_{i:03d}") for i in range(0, 200, 2)]
    rows_b = [(i, f"uid_{i:03d}") for i in range(1, 200, 2)]
    df_a = spark.createDataFrame(rows_a, "id bigint, uid string").coalesce(1)
    df_b = spark.createDataFrame(rows_b, "id bigint, uid string").coalesce(1)
    t.write(df_a.unionByName(df_b).repartitionByRange(2, (F.col("id") % 2)))
    # both evens: the odd file bloom-skips
    rep = t.plan_scan(where="uid IN ('uid_004', 'uid_008')")
    assert rep["files_total"] == 2
    assert rep["files_bloom_skipped"] == 1 and rep["files_scanned"] == 1
    assert {
        r.id for r in t.read(where="uid IN ('uid_004','uid_008')").collect()
    } == {4, 8}
    # one even + one odd: no file can be excluded
    rep2 = t.plan_scan(where="uid IN ('uid_004', 'uid_005')")
    assert rep2["files_bloom_skipped"] == 0 and rep2["files_scanned"] == 2
    # values INSIDE both files' [min, max] but present in neither:
    # stats keep both, blooms skip both, read returns empty
    rep3 = t.plan_scan(where="uid IN ('uid_004x', 'uid_005x')")
    assert rep3["files_bloom_skipped"] == 2 and rep3["files_scanned"] == 0
    assert t.read(where="uid IN ('uid_004x','uid_005x')").count() == 0


def test_written_keys_match_partition_keys_on_hostile_values(
    spark, tmp_path
):
    """r14 verdict #3/#8: `_written_keys` reads the owners-map keys
    from the directory tree a finished write produced, assuming
    `_escape_partition_value` mirrors Spark's directory naming
    EXACTLY. Pin that invariant on hostile values — null, empty
    string, space, '=', '/', '%', backslash, quote, hash, unicode,
    a control char — by asserting the post-write listing equals the
    old pre-write `_partition_keys` job's answer, that the manifest
    owners use those keys, and that every row round-trips."""
    vals = [
        None,
        "",
        "plain",
        "with space",
        "a=b",
        "a/b",
        "50%",
        "back\\slash",
        'quo"te',
        "ha#sh",
        "unié中",
        "ctl\x07bell",
        "per.iod",
        "col:on",
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id bigint, p string"
    )
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=("p",))
    t.write(df)
    man = t._manifest()
    # None and "" both land under __HIVE_DEFAULT_PARTITION__
    want_keys = sorted(set(t._partition_keys(df)))
    assert sorted(man["owners"]) == want_keys
    # and the directory names Spark wrote are exactly those keys
    tok = next(iter(man["owners"].values()))
    listed = sorted(t._written_keys(t._vdir(tok)))
    assert listed == want_keys
    got = {r.id: r.p for r in t.read().collect()}
    for i, v in enumerate(vals):
        if v in (None, ""):
            assert got[i] is None
        else:
            assert got[i] == v, (i, v, got[i])


def test_changes_scoped_mor_equals_full_diff(spark, tmp_path):
    """The pure-MoR CDF fast path (changes() restricting both diff
    sides to mutation-keyed candidates) must return EXACTLY the rows
    of the unrestricted two-snapshot diff — pinned on a hostile
    window: updates, inserts, a predicate delete, a key tombstone,
    duplicate base rows, and NULL merge keys (which never equi-join
    but can still change hands under the per-key window resolution)."""
    t = LakeTable(spark, str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (4, "d"), (None, "n1"),
         (9, "z")],
        "k int, v string",
    )
    t.write(base)
    v1 = t.current_version()
    t.upsert(
        spark.createDataFrame(
            [(2, "B"), (5, "e"), (None, "N2")], "k int, v string"
        ),
        keys=["k"],
        mode="mor",
    )
    t.upsert(
        spark.createDataFrame([(3,)], "k int"),
        keys=["k"],
        when_matched="delete",
        mode="mor",
    )
    t.delete_where("v = 'z'", mode="mor")
    v2 = t.current_version()

    def rows(df):
        out = {}
        for r in df.collect():
            key = (r["k"], r["v"], r["_change_type"])
            out[key] = out.get(key, 0) + 1
        return out

    got = rows(t.changes(v1, v2))
    from datalake_toolkit_spark.lakehouse.table import LakeTable as LT

    orig = LT._scope_mor_delta
    LT._scope_mor_delta = lambda self, mf, mt, f_, t_, b, a: (b, a)
    try:
        want = rows(t.changes(v1, v2))
    finally:
        LT._scope_mor_delta = orig
    assert got == want
    # sanity: the window really did produce every change class
    kinds = {(k, c) for (k, _v, c) in got}
    assert (2, "delete") in kinds and (2, "insert") in kinds  # update
    assert (5, "insert") in kinds  # insert
    assert (3, "delete") in kinds  # tombstone
    assert (9, "delete") in kinds  # predicate delete
    assert (None, "insert") in kinds  # null-key update arrived
