"""Asymptotics of the CDF before-image hint (the r13 verdict's #5 ask).

``remove(ids, removed_docs=...)`` / ``add(replace=True,
replaced_old=...)`` derive the removal-affected terms by tokenizing
the caller's before-image frame — O(batch) — instead of scanning the
postings table for the ids' rows — O(corpus). At sf0.1 (5k docs) the
avoided scan measured "a wash" (~1 s); the claim that justifies the
caller-owned contract surface is the SHAPE: the scan path grows with
corpus size while the hint path stays flat. This script measures a
fixed-size remove (50 ids) against indexes built over 1x / 4x / 16x
the sf0.1 documents corpus, both paths, idle-box n=N medians, one
JSON line per corpus size.

Usage: python scripts/bench_cdf_hint.py   [REMEASURE_N=3]
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

from datalake_toolkit_spark.llm import PostingsIndex
from datalake_toolkit_spark.session import get_spark
from datalake_toolkit_spark.sources import load_table


def main() -> None:
    n = int(os.environ.get("REMEASURE_N", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-cdf-hint")
    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    base_n = base.count()
    out = []
    for mult in (1, 4, 16):
        docs = base
        for i in range(1, mult):
            docs = docs.unionByName(
                base.select(
                    (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                    "text",
                )
            )
        docs = docs.localCheckpoint(eager=True)
        times: dict[str, list[float]] = {"hint": [], "scan": []}
        for trial in range(n):
            ids = [
                r["doc_id"]
                for r in docs.where(
                    F.col("doc_id") % 997 == (trial * 7) % 997
                ).select("doc_id").limit(50).collect()
            ]
            hint = docs.where(F.col("doc_id").isin(ids))
            for mode in ("hint", "scan"):
                work = tempfile.mkdtemp(prefix=f"cdfh_{mult}_{mode}_")
                try:
                    idx = PostingsIndex(spark, work, prefix_len=1)
                    idx.add(docs)
                    assert idx._stats_fresh()
                    t0 = time.monotonic()
                    idx.remove(
                        ids,
                        removed_docs=hint if mode == "hint" else None,
                    )
                    times[mode].append(time.monotonic() - t0)
                    assert idx._stats_fresh(), "pruning dropped"
                finally:
                    shutil.rmtree(work, ignore_errors=True)
        rec = {
            "corpus_docs": base_n * mult,
            "n": n,
            "remove_hint_median_s": round(
                statistics.median(times["hint"]), 3
            ),
            "remove_scan_median_s": round(
                statistics.median(times["scan"]), 3
            ),
            "hint_all_s": [round(x, 3) for x in times["hint"]],
            "scan_all_s": [round(x, 3) for x in times["scan"]],
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
