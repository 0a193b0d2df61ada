"""JDBC (Derby-embedded), JSON-catalog, SQL-passthrough, and
partition-local-grouping endpoints."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datalake_toolkit_spark.catalog import (
    assemble_catalog_tables,
    catalog_sql,
    read_catalog_json,
    register_star_schema,
    write_catalog_json,
)
from datalake_toolkit_spark.functions import (
    ddb_json_to_plain_map,
    plain_map_to_ddb_json,
    sanitize_csv_header,
)
from datalake_toolkit_spark.operators import group_within_partitions
from datalake_toolkit_spark.plans.catalog_queries import _metastore_from_star
from datalake_toolkit_spark.sources.jdbc import (
    METASTORE_WRITE_ORDER,
    extract_metastore,
    jdbc_table_to_csv,
    load_metastore,
    read_jdbc,
    write_jdbc,
)

DERBY_URL = "jdbc:derby:memory:endpoints_test;create=true"


def test_jdbc_write_read_roundtrip(spark, sf_dir):
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    write_jdbc(nation, DERBY_URL, "NATION_RT", mode="overwrite")
    back = read_jdbc(spark, DERBY_URL, "NATION_RT")
    assert back.count() == nation.count()
    assert {r.n_nationkey for r in back.collect()} == {
        r.n_nationkey for r in nation.collect()
    }


def test_jdbc_partitioned_read(spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_jdbc(orders, DERBY_URL, "ORDERS_RT", mode="overwrite")
    hi = orders.agg(F.max("o_orderkey")).first()[0]
    back = read_jdbc(
        spark,
        DERBY_URL,
        "ORDERS_RT",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == orders.count()


def test_metastore_jdbc_fk_ordered_load(spark, sf_dir):
    ms = _metastore_from_star(spark, sf_dir)
    url = "jdbc:derby:memory:ms_test;create=true"
    written = load_metastore(ms, url, mode="overwrite")
    # parents precede children
    assert written.index("DBS") < written.index("TBLS")
    assert written.index("SDS") < written.index("TBLS")
    assert written.index("TBLS") < written.index("TABLE_PARAMS")
    back = extract_metastore(spark, url, tables=["TBLS", "COLUMNS_V2"])
    assert back["TBLS"].count() == ms["TBLS"].count()
    assert back["COLUMNS_V2"].count() == ms["COLUMNS_V2"].count()
    assert set(METASTORE_WRITE_ORDER) >= set(back)


def test_jdbc_to_csv_sqoop_chain(spark, sf_dir, tmp_path):
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet")).select(
        "r_regionkey", "r_name"
    )
    write_jdbc(region, DERBY_URL, "REGION_RT", mode="overwrite")
    out = str(tmp_path / "region_csv")
    jdbc_table_to_csv(spark, DERBY_URL, "REGION_RT", out)
    back = spark.read.option("sep", "\x01").csv(out)
    assert back.count() == 5
    assert {r._c1 for r in back.collect()} == {r.r_name for r in region.collect()}


def test_catalog_json_roundtrip(spark, sf_dir, tmp_path):
    docs = assemble_catalog_tables(_metastore_from_star(spark, sf_dir))
    path = str(tmp_path / "table_docs")
    write_catalog_json(docs, path)
    back = read_catalog_json(spark, path, kind="table")
    assert back.count() == docs.count()
    assert back.schema == docs.schema or {f.name for f in back.schema.fields} == {
        f.name for f in docs.schema.fields
    }
    a = {r.name: r.storageDescriptor.location for r in docs.collect()}
    b = {r.name: r.storageDescriptor.location for r in back.collect()}
    assert a == b


def test_catalog_sql_passthrough(spark, sf_dir):
    register_star_schema(spark, sf_dir)
    dbs = catalog_sql(spark, "SHOW DATABASES")
    assert "default" in {r.database_name for r in dbs.collect()}
    tables = {r.table_name for r in catalog_sql(spark, "SHOW TABLES").collect()}
    assert {"lineitem", "orders", "documents"} <= tables
    cols = catalog_sql(spark, "DESCRIBE lineitem")
    assert cols.columns == ["col_name", "data_type", "comment"]
    assert "l_orderkey" in {r.col_name for r in cols.collect()}
    # non-catalog statements pass through to spark.sql
    n = catalog_sql(spark, "SELECT count(*) AS n FROM region").first().n
    assert n == 5


def test_catalog_sql_show_partitions(spark, sf_dir, tmp_path):
    """SHOW PARTITIONS rides the spark.sql fall-through: the partition
    listing the reference's ES index exposes via partition docs is a
    first-class statement here."""
    from datalake_toolkit_spark.sources import load_table

    spark.sql("DROP TABLE IF EXISTS sp_orders")
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .option("path", str(tmp_path / "sp_orders"))
        .mode("overwrite")
        .saveAsTable("sp_orders")
    )
    try:
        parts = {r.partition for r in catalog_sql(spark, "SHOW PARTITIONS sp_orders").collect()}
        assert parts and all(p.startswith("o_year=") for p in parts)
    finally:
        spark.sql("DROP TABLE IF EXISTS sp_orders")


def test_group_within_partitions_is_partition_local(spark):
    df = spark.range(0, 100, 1, 4).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    out = group_within_partitions(df, "k", "v")
    rows = out.collect()
    # every key appears once per input partition that holds it
    assert len(rows) == 20  # 5 keys x 4 partitions
    total = sum(len(r.items) for r in rows)
    assert total == 100
    # global regroup of the batched output reproduces the global grouping
    regrouped = (
        out.select("k", F.explode("items").alias("v")).groupBy("k").count().collect()
    )
    assert all(r['count'] == 20 for r in regrouped)


def test_sanitize_and_ddb_json(spark):
    df = spark.createDataFrame(
        [("col@1;col#2|col 3.x",)], "header string"
    ).select(sanitize_csv_header("header").alias("h"))
    assert df.first().h == "col1col2col 3.x"

    src = spark.createDataFrame(
        [(1, {"name": "alice", "size": "12"})], "id int, attrs map<string,string>"
    )
    ddb = src.select(
        "id",
        plain_map_to_ddb_json("attrs", F.array(F.lit("size"))).alias("doc"),
    )
    doc = ddb.first().doc
    assert '"name":{"S":"alice"}' in doc and '"size":{"N":"12"}' in doc
    back = ddb.select("id", ddb_json_to_plain_map("doc").alias("attrs"))
    assert back.first().attrs == {"name": "alice", "size": "12"}


def test_salted_join_matches_plain_join(spark, sf_dir):
    from datalake_toolkit_spark.operators import salted_join

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.col("l_orderkey_renamed") if False else F.col("o_orderkey").alias("l_orderkey"),
        "o_orderdate",
    )
    plain = li.join(orders, "l_orderkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
    ).first()
    salted = salted_join(li, orders, "l_orderkey", salt=4).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
    ).first()
    assert (plain.n, plain.s) == (salted.n, salted.s)
    # left join keeps unmatched left rows exactly once
    some = orders.where(F.col("l_orderkey") % 2 == 0)
    plain_left = li.join(some, "l_orderkey", "left").count()
    salted_left = salted_join(li, some, "l_orderkey", salt=4, how="left").count()
    assert plain_left == salted_left


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Co-located join: two tables bucketed on the join key join
    without any Exchange in the physical plan — the bucketing answer
    to 'does this shuffle when it doesn't need to?' at 100 TB."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS b_li")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_li")).mode("overwrite").saveAsTable("b_li"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders")).mode("overwrite").saveAsTable("b_orders"))
    # merge hint: at test scale Spark would broadcast instead (valid,
    # but then bucketing proves nothing); at 100 TB both sides are too
    # big to broadcast and SMJ-over-buckets is the plan that matters.
    joined = spark.table("b_li").hint("merge").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
    assert joined.count() == li.count()
    spark.sql("DROP TABLE b_li")
    spark.sql("DROP TABLE b_orders")


def test_resolve_params_precedence(tmp_path, monkeypatch):
    """M0 config loader: CLI > JSON file > env > defaults, None CLI
    entries treated as absent (the reference's click-option chain)."""
    from datalake_toolkit_spark.config import resolve_params

    cfg = tmp_path / "job.json"
    cfg.write_text('{"table": "from_file", "sep": ";"}')
    monkeypatch.setenv("DTS_TABLE", "from_env")
    monkeypatch.setenv("DTS_ENCODING", "utf-8")
    params = resolve_params(
        cli={"table": "from_cli", "header": None},
        config_file=str(cfg),
        defaults={"table": "from_default", "mode": "append"},
    )
    assert params["table"] == "from_cli"      # CLI wins
    assert params["sep"] == ";"               # file beats env/defaults
    assert params["encoding"] == "utf-8"      # env visible
    assert params["mode"] == "append"         # defaults fill gaps
    assert "header" not in params             # None CLI = absent
