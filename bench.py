"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line (compact:
aggregates + the 50-query gate window, sized to survive the round
driver's 2000-char stdout tail capture intact); the full per-query
payload is written to bench_latest.json next to this file.

Each query executes to completion through the ``noop`` sink (full JVM
execution, no driver-side row collection skewing the numbers). A warmup
query runs first so JVM/codegen startup isn't billed to q1, and each
query runs n=3 times: ``queries`` reports the MEDIAN (the round-over-
round comparison statistic — robust to one loaded-VM outlier, and the
first run's one-time Janino codegen cost lands in the max so the
median is steady-state), ``queries_best`` the minimum (comparable to
the best-of-2 protocol rounds <= 10 recorded). Stateful lifecycle
queries (commit cycles / streaming replays, plans.STATEFUL) are
subtotaled apart from pure-plan queries so totals stay like-for-like
as the gate window rotates.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake_toolkit_spark.plans import (
    DEMOTED,
    GATE_WINDOW,
    QUERIES,
    STATEFUL,
)
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

    timings: dict[str, object] = {}
    best: dict[str, object] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(QUERIES.items()):
        # a broken query must cost one "err" entry, never the whole
        # benchmark — every failure is isolated and the JSON line still
        # prints with timings for everything else
        try:
            runs: list[float] = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(runs), 3)
            best[name] = round(min(runs), 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = "err"
            best[name] = "err"
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    try:
        ingest_mb_s = _ingest_throughput(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        ingest_mb_s = -1.0
        errors["_ingest"] = f"{type(exc).__name__}: {exc}"[:300]

    total = round(sum(v for v in timings.values() if isinstance(v, float)), 3)
    # Stateful pipelines (multi-commit / streaming replays, see
    # plans.STATEFUL) are subtotaled apart from pure-plan queries so
    # round-over-round comparisons compare like with like: a 2-commit
    # ledger replay's seconds are commit-protocol + multiple jobs, not
    # one Catalyst plan execution.
    stateful_sec = round(
        sum(v for n, v in timings.items() if n in STATEFUL and isinstance(v, float)),
        3,
    )
    # The round driver archives only the LAST ~2000 characters of
    # stdout and json-parses that window (every BENCH_r*.json since r1
    # shows parsed:None — the one-line payload outgrew 2000 chars the
    # moment the query count did). So: the FULL payload goes to
    # bench_latest.json (committed with the round), and stdout gets a
    # compact line kept under ~1900 chars — aggregates plus as much of
    # the driver's 50-query gate window as fits — so the archived tail
    # is finally machine-parseable end to end.
    payload = {
        "metric": "total_query_sec",
        "unit": "sec",
        "timing": "median-of-3 (queries_best = min-of-3, "
        "comparable to rounds <= 10's best-of-2)",
        "stateful_queries": sorted(n for n in timings if n in STATEFUL),
        "queries_best": best,
        "queries_all": timings,
        **({"errors": errors} if errors else {}),
        "sf": sf,
        "ingest_mb_s": ingest_mb_s,
        "stateful_query_sec": stateful_sec,
        "plan_query_sec": round(total - stateful_sec, 3),
        "n_queries": len(timings),
        "value": total,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_latest.json"),
        "w",
    ) as f:
        json.dump(payload, f, indent=1)

    compact = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "timing": "median-of-3",
        "n_queries": len(timings),
        "ingest_mb_s": ingest_mb_s,
        "stateful_query_sec": stateful_sec,
        "plan_query_sec": round(total - stateful_sec, 3),
        # cap the error list: a catastrophic run (many errs) must not
        # push the line back over the driver's tail capture
        **(
            {"n_errors": len(errors), "errors": sorted(errors)[:10]}
            if errors
            else {}
        ),
        "detail": "bench_latest.json",
        "queries": {},
    }
    window = [n for n in QUERIES if n not in DEMOTED][:GATE_WINDOW]
    for n in window:
        if n not in timings:
            continue
        compact["queries"][n] = timings[n]
        if len(json.dumps(compact)) > 1880:
            del compact["queries"][n]
            break
    print(json.dumps(compact))


def _ingest_throughput(spark, sf_dir: str) -> float:
    """End-to-end CSV -> partitioned-Parquet throughput of the M1
    ingest pipeline (BASELINE.md metric). The events table is
    replicated at stage time until the CSV input reaches
    $SPARK_GRAFT_INGEST_MB (default 500 MB), so the measurement is
    dominated by scan + date-derive + partitioned write, not by fixed
    per-job startup (~6 MB of source at sf0.1 measured only
    overhead). Best-of-2 like the query timings: the first run pays
    one-time codegen/JIT for the CSV parse + write path (measured
    78 vs 143 MB/s cold vs warm on an idle box), which is fixed cost,
    not throughput."""
    import math
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datalake_toolkit_spark.sources.ingest import ingest_delimited
    from datalake_toolkit_spark.sources.tables import load_table

    target_mb = float(os.environ.get("SPARK_GRAFT_INGEST_MB", "500"))
    work = tempfile.mkdtemp(prefix="dts_bench_ingest_")
    try:
        ev = load_table(spark, sf_dir, "events")

        def _stage(df, sub: str) -> tuple[str, int]:
            d = os.path.join(work, sub)
            df.write.option("header", "false").csv(d)
            return d, sum(
                os.path.getsize(os.path.join(d, f))
                for f in os.listdir(d)
                if f.endswith(".csv")
            )

        csv_dir, n_bytes = _stage(ev, "csv_probe")
        k = math.ceil(target_mb * 1e6 / max(n_bytes, 1))
        if k > 1:
            replicated = ev.withColumn(
                "__r", F.explode(F.expr(f"sequence(1, {k})"))
            ).drop("__r")
            csv_dir, n_bytes = _stage(replicated, "csv")
        best = float("inf")
        for attempt in ("warm", "timed"):
            t0 = time.perf_counter()
            ingest_delimited(
                spark,
                csv_dir,
                os.path.join(work, f"out_{attempt}"),
                schema=(
                    "event_id bigint, ts timestamp, user_id bigint, "
                    "event_type string, value double, props string"
                ),
                partition_source="ts",
                partition_col="dt",
                partition_kind="date",
            )
            best = min(best, time.perf_counter() - t0)
        return round(n_bytes / 1e6 / best, 2)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    run()
