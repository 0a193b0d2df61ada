"""A/B helper: run the named queries with bench.py's exact protocol
(q1 warmup, then n=3 noop-sink runs each, median + min reported) in a
fresh process. Usage:

    SPARK_GRAFT_CPUS=32 python scripts/ab_queries.py q_index_sync ...
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


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dts-ab")
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in names:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "median": round(statistics.median(runs), 3),
            "min": min(runs),
            "runs": runs,
        }
    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS"), **out}))


if __name__ == "__main__":
    main()
