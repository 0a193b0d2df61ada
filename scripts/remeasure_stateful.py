"""Like-for-like re-measure of the r10-flagged stateful gates.

VERDICT r10 flagged q_postings_search (+36%), q_stream_near_dedup
(+26%), q_stateful_running_status (+43%) and ingest_mb_s (209->161)
as regressions vs r9 that were never re-measured; its regression
table also listed q_semantic_dedup (5.14 -> 6.35) as "dissolved on
re-run", so it is included to settle that claim too. This script
runs those five metrics n=N times (default 3) at sf0.1 and prints
per-run timings + medians so each delta can be attributed to load
noise or a real plan change.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_toolkit_spark.plans import QUERIES
from datalake_toolkit_spark.session import get_spark

SUSPECTS = [
    "q_postings_search",
    "q_stream_near_dedup",
    "q_stateful_running_status",
    "q_semantic_dedup",
]


def main() -> None:
    n = int(os.environ.get("REMEASURE_N", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dts-remeasure")
    # warmup (same as bench.py)
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, object] = {}
    for name in SUSPECTS:
        fn = QUERIES[name]
        runs: list[float] = []
        for _ in range(n + 1):  # first run is codegen warmup, discarded
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "warmup": runs[0],
            "runs": runs[1:],
            "median": round(statistics.median(runs[1:]), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    import bench

    ing = []
    for _ in range(n):
        ing.append(bench._ingest_throughput(spark, sf_dir))
        print(json.dumps({"ingest_run_mb_s": ing[-1]}), flush=True)
    out["ingest_mb_s"] = {"runs": ing, "median": round(statistics.median(ing), 2)}
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
