"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line.

Each query executes to completion through the ``noop`` sink (full JVM
execution, no driver-side row collection skewing the numbers). A warmup
query runs first so JVM/codegen startup isn't billed to q1, and each
query is timed as best-of-2 runs: the first run pays one-time Janino
codegen compilation (1-3 s for the wide expressions regardless of data
size), the second measures the steady-state execution that actually
scales with data volume.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake_toolkit_spark.plans import QUERIES
from datalake_toolkit_spark.session import get_spark


def run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="dts-bench")

    # warmup: touch the big fact table once so first-query numbers are engine,
    # not JVM spin-up
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    run()
