"""Production-ratio economics of the postings-index term-stats refresh.

The r12 verdict's #2 ask: the write-path cost of the default
``stats_refresh="add"`` mode was measured only at the gate lifecycle's
worst-case add:corpus ratio (adds of HALF the corpus per commit). This
script measures the case that decides whether the default is shippable
at 100 TB ingest rates — a SMALL batch (~1% of corpus) added to an
ALREADY-BUILT index — for both modes:

- ``add``      in-add scoped refresh (covered buckets recompute only
               the batch's terms)
- ``maintain`` no in-add refresh (the pre-stats r11 add cost: postings
               upsert + doc_stats upsert + corpus-stats bucket refresh)

Protocol: idle box, n=N (default 3) DISJOINT 1%-batches added
sequentially to the same built index per mode, per-add wall time +
medians printed as one JSON line. A 50%-batch single add is measured
once per mode for the worst-case anchor (the gate shape).

Usage: python scripts/bench_add_ratio.py   [REMEASURE_N=3]
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

from datalake_toolkit_spark.llm import PostingsIndex
from datalake_toolkit_spark.session import get_spark
from datalake_toolkit_spark.sources import load_table


def main() -> None:
    n = int(os.environ.get("REMEASURE_N", "4"))  # 1 warmup + n-1 counted
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dts-bench-add-ratio")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    total = docs.count()
    batch_sz = max(1, total // 100)  # ~1% of corpus
    base_n = total - n * batch_sz

    # deterministic split by doc_id rank: base corpus + n disjoint
    # 1% batches (collected ids are bounded: n * 1% of a bench table)
    ids = [r[0] for r in docs.select("doc_id").orderBy("doc_id").collect()]
    base_ids = set(ids[:base_n])
    batches_ids = [
        set(ids[base_n + i * batch_sz : base_n + (i + 1) * batch_sz])
        for i in range(n)
    ]

    out: dict = {
        "sf_dir": sf_dir,
        "total_docs": total,
        "batch_docs": batch_sz,
        "modes": {},
    }
    mode_order = ("add", "maintain")
    if os.environ.get("ADD_RATIO_REVERSED"):
        mode_order = ("maintain", "add")
    for mode in mode_order:
        root = tempfile.mkdtemp(prefix=f"addratio_{mode}_")
        try:
            idx = PostingsIndex(
                spark, os.path.join(root, "idx"), stats_refresh=mode
            )
            t0 = time.time()
            idx.add(docs.where(docs.doc_id.isin(base_ids)))
            build_s = time.time() - t0
            adds = []
            # warmup add (uncounted): first-add codegen/JIT and the
            # session's broadcast warmup are fixed cost, not add cost
            idx.add(
                docs.where(docs.doc_id.isin(batches_ids[0])), mode="mor"
            )
            for b in batches_ids[1:]:
                t0 = time.time()
                idx.add(docs.where(docs.doc_id.isin(b)), mode="mor")
                adds.append(round(time.time() - t0, 3))
            # worst-case anchor: one add of HALF the corpus into a
            # fresh half-corpus index (the gate lifecycle's shape)
            half = set(ids[: total // 2])
            idx2 = PostingsIndex(
                spark, os.path.join(root, "idx2"), stats_refresh=mode
            )
            idx2.add(docs.where(docs.doc_id.isin(half)))
            t0 = time.time()
            idx2.add(docs.where(~docs.doc_id.isin(half)), mode="mor")
            half_add_s = time.time() - t0
            out["modes"][mode] = {
                "build_s": round(build_s, 3),
                "one_pct_adds_s": adds,
                "one_pct_median_s": round(statistics.median(adds), 3),
                "half_corpus_add_s": round(half_add_s, 3),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    a, m = out["modes"]["add"], out["modes"]["maintain"]
    out["one_pct_refresh_overhead_s"] = round(
        a["one_pct_median_s"] - m["one_pct_median_s"], 3
    )
    out["half_refresh_overhead_s"] = round(
        a["half_corpus_add_s"] - m["half_corpus_add_s"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
