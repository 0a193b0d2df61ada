"""One-off sf1-equivalent scale point (the r13 verdict's stretch #8).

The 2x-vs-baseline bar is measured at sf0.1; this script adds a
second measured point at 10x that volume so the "scales linearly"
design story has data behind it and hidden superlinearity shows up.
No sf1 parquet exists in the provided testdata, so the corpus is the
sf0.1 documents/embeddings tables unioned 10x with shifted ids —
same distributions, 10x the rows (synthetic SCALE input only; all
correctness gates keep reading the provided testdata untouched).

Measures, idle-box, n=N medians (default 1 — these are minutes-long
lifecycles; raise REMEASURE_N for publication numbers):

- postings lifecycle (q_postings_search shape): two add commits +
  bucket-pruned BM25 serve
- CDF index sync window (q_index_sync shape): MoR upsert + delete,
  one sync apply
- filtered quantized ANN (q_filtered_ann shape): IVF build + int8
  filtered serve
- CSV ingest MB/s (bench.py's _ingest_throughput at the 10x events)

Usage: python scripts/bench_sf1_point.py  [REMEASURE_N=1] [MULT=10]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_toolkit_spark.lakehouse import LakeTable
from datalake_toolkit_spark.llm import (
    IVFIndex,
    PostingsIndex,
    sync_postings_from_table,
)
from datalake_toolkit_spark.session import get_spark
from datalake_toolkit_spark.sources import load_table


def _mult(df, id_col, mult):
    out = df
    for i in range(1, mult):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + i * 10_000_000)
        )
    return out.localCheckpoint(eager=True)


def postings_lifecycle(spark, docs) -> dict:
    work = tempfile.mkdtemp(prefix="sf1_post_")
    try:
        t0 = time.monotonic()
        idx = PostingsIndex(spark, work, prefix_len=2)
        idx.add(docs.where(F.col("doc_id") % 2 == 0))
        idx.add(docs.where(F.col("doc_id") % 2 == 1), mode="mor")
        t_build = time.monotonic() - t0
        queries = docs.where(
            (F.col("doc_id") >= 12) & (F.col("doc_id") < 15)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 1, 40).alias("query_text"),
        )
        t0 = time.monotonic()
        n = idx.search_bm25(queries, k=10, prune="auto").count()
        t_serve = time.monotonic() - t0
        return {"build_s": t_build, "serve_s": t_serve, "rows": n}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def sync_window(spark, docs) -> dict:
    work = tempfile.mkdtemp(prefix="sf1_sync_")
    try:
        t = LakeTable(spark, os.path.join(work, "t"))
        t.write(docs)
        idx = PostingsIndex(spark, os.path.join(work, "p"), prefix_len=2)
        sync_postings_from_table(idx, t)
        upd = docs.limit(200).select(
            "doc_id", F.concat_ws(" ", F.lit("updated"), "text").alias("text")
        )
        t.upsert(upd, keys=["doc_id"], mode="mor")
        t.delete_where("doc_id % 1009 = 0", mode="mor")
        t0 = time.monotonic()
        sync_postings_from_table(idx, t)
        return {"sync_s": time.monotonic() - t0}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def filtered_ann(spark, emb) -> dict:
    work = tempfile.mkdtemp(prefix="sf1_ann_")
    try:
        t0 = time.monotonic()
        idx = IVFIndex(spark, work)
        idx.build(emb, n_lists=64, lloyd_iters=1)
        t_build = time.monotonic() - t0
        queries = emb.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 14))
        allow = emb.where(F.col("vec_id") % 3 == 0).select("vec_id").limit(5000)
        t0 = time.monotonic()
        n = idx.search_quantized(
            queries, k=5, n_probe=8, id_filter=allow
        ).count()
        return {"build_s": t_build, "serve_s": time.monotonic() - t0, "rows": n}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def signature_scan(spark, docs) -> dict:
    """Compute-bound plan shape (no lifecycle constant): 64-hash
    MinHash signatures + banding over the multiplied corpus, through
    the noop sink. md5-per-shingle arithmetic is pure executor CPU,
    so THIS is the shape that should show real core scaling at the
    10x point (the lifecycle shapes above are commit-bound)."""
    from datalake_toolkit_spark.llm.dedup import (
        _doc_shingles,
        minhash_signature,
    )

    t0 = time.monotonic()
    (
        _doc_shingles(docs, "doc_id", "text", 3)
        .select("doc_id", minhash_signature("sh", 24).alias("sig"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return {"scan_s": time.monotonic() - t0}


def ingest_point(spark, sf_dir, mult) -> dict:
    # bench.py's own measurement is volume-normalized (it replicates
    # the CSV to $SPARK_GRAFT_INGEST_MB); the 10x point just raises
    # the target so the write path runs minutes, not seconds
    import bench as bench_mod

    os.environ["SPARK_GRAFT_INGEST_MB"] = str(500 * mult)
    mb_s = bench_mod._ingest_throughput(spark, sf_dir)
    return {"target_mb": 500 * mult, "mb_s": mb_s}


def main() -> None:
    n = int(os.environ.get("REMEASURE_N", "1"))
    mult = int(os.environ.get("MULT", "10"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-sf1-point")
    docs = _mult(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id", mult,
    )
    emb = _mult(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id", mult,
    )
    print(json.dumps({"docs": docs.count(), "vecs": emb.count(),
                      "mult": mult}), flush=True)
    for name, fn, arg in (
        ("postings_lifecycle", postings_lifecycle, docs),
        ("sync_window", sync_window, docs),
        ("filtered_ann", filtered_ann, emb),
        ("signature_scan", signature_scan, docs),
    ):
        meds: list[dict] = []
        for _ in range(n):
            meds.append(fn(spark, arg))
        agg = {
            k: round(statistics.median(m[k] for m in meds), 2)
            for k in meds[0]
        }
        print(json.dumps({name: agg, "n": n}), flush=True)
    print(json.dumps({"ingest": ingest_point(spark, sf_dir, mult)}),
          flush=True)


if __name__ == "__main__":
    main()
