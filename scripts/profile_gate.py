"""Profile one registered gate query: run it once in THIS process with
the Spark UI enabled, then dump per-job wall time / task counts from the
UI REST API. Usage:

    SPARK_GRAFT_CPUS=32 python scripts/profile_gate.py q_index_sync

Prints a per-job table (description, duration, n_tasks) plus totals —
the per-task-overhead diagnostic for the many-small-jobs lifecycles
(guide §1.5/§7.1). Timings are single-run (profiling, not benching).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "true")

from datalake_toolkit_spark.plans import QUERIES  # noqa: E402
from datalake_toolkit_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"profile-{name}")
    # warmup (JVM/codegen) on an unrelated query
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    jobs_before = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
    )
    first_new = max((j["jobId"] for j in jobs_before), default=-1) + 1

    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    jobs = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        )
    )
    jobs = [j for j in jobs if j["jobId"] >= first_new]
    jobs.sort(key=lambda j: j["jobId"])
    total_tasks = 0
    total_job_ms = 0.0
    rows = []
    for j in jobs:
        sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        done = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        # second resolution is too coarse — use stage durations instead
        dur_ms = 0.0
        n_tasks = j["numCompletedTasks"]
        total_tasks += n_tasks
        rows.append((j["jobId"], n_tasks, j.get("description") or j["name"]))
        _ = (sub, done, dur_ms)
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    stage_ms = {}
    for s in stages:
        try:
            sub = s["submissionTime"]
            done = s["completionTime"]
        except KeyError:
            continue

        def _ms(ts: str) -> float:
            base = time.mktime(time.strptime(ts[:19], "%Y-%m-%dT%H:%M:%S"))
            frac = float("0" + ts[19:23]) if len(ts) > 19 else 0.0
            return base * 1000 + frac * 1000

        stage_ms[s["stageId"]] = (_ms(done) - _ms(sub), s["numCompleteTasks"])
    job_stage = {
        j["jobId"]: j["stageIds"] for j in jobs
    }
    print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs, "
          f"{total_tasks} tasks, cpus={os.environ.get('SPARK_GRAFT_CPUS')}")
    agg: dict[str, list[float]] = {}
    for jid, n_tasks, desc in rows:
        ms = sum(stage_ms.get(s, (0, 0))[0] for s in job_stage.get(jid, []))
        total_job_ms += ms
        key = desc[:90]
        agg.setdefault(key, [0.0, 0, 0])
        agg[key][0] += ms
        agg[key][1] += n_tasks
        agg[key][2] += 1
    print(f"sum(job stage-ms) = {total_job_ms/1000:.2f}s "
          f"(gaps to wall = driver/planning time)")
    for desc, (ms, n_tasks, n_jobs) in sorted(
        agg.items(), key=lambda kv: -kv[1][0]
    ):
        print(f"{ms/1000:8.2f}s {n_jobs:4d} jobs {n_tasks:6d} tasks  {desc}")
    print("\n--- top stages by duration ---")
    top = sorted(
        (s for s in stages if s["stageId"] in stage_ms),
        key=lambda s: -stage_ms[s["stageId"]][0],
    )[:25]
    for s in top:
        ms, nt = stage_ms[s["stageId"]]
        print(
            f"stage {s['stageId']:5d} {ms/1000:7.2f}s {nt:5d} tasks  "
            f"{s['name'][:100]}"
        )
    # task-count histogram: how many stages ran with how many tasks
    from collections import Counter

    hist = Counter(nt for _ms, nt in stage_ms.values())
    print("\ntasks-per-stage histogram:",
          dict(sorted(hist.items())))
    wide = int(os.environ.get("PROFILE_WIDE_TASKS", "0"))
    if wide:
        print(f"\n--- stages with >= {wide} tasks (callsites) ---")
        for s in stages:
            if s["stageId"] not in stage_ms:
                continue
            ms, nt = stage_ms[s["stageId"]]
            if nt < wide:
                continue
            det = s.get("details") or ""
            frames = [
                ln for ln in det.splitlines()
                if "datalake_toolkit_spark" in ln or "bench" in ln
            ]
            print(f"stage {s['stageId']:5d} {nt:4d} tasks {ms/1000:6.2f}s "
                  f"{frames[0].strip() if frames else s['name'][:60]}")


if __name__ == "__main__":
    main()
