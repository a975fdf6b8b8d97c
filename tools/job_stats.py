"""Deterministic execution-shape stats per catalog query: number of
Spark jobs, stages and tasks a query's build+noop-write submits. These
counts are load-independent — the honest before/after evidence on a box
with documented phantom load storms (SCALE_SMOKE.md), where wall-clock
A/Bs need many repeats to clear the noise floor.

Usage: python tools/job_stats.py [sf_dir] q1 q2 ... [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dnsflow_clickhouse_spark.queries import QUERY_REGISTRY
from dnsflow_clickhouse_spark.session import get_spark


def main() -> None:
    args = list(sys.argv[1:])
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark(app_name="job-stats")
    sc = spark.sparkContext
    # warm (same shape as time_queries)
    warm = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        group = f"stats-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        QUERY_REGISTRY[name][0](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None:
                    continue
                # skipped stages report 0 active/completed via numTasks
                # only when actually run; count submitted tasks
                if si.numCompletedTasks > 0 or si.numActiveTasks > 0 or si.numFailedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numCompletedTasks
        out[name] = {
            "jobs": len(job_ids),
            "stages_run": n_stages,
            "tasks": n_tasks,
            "wall_s": round(wall, 2),
        }
        print(f"{name}: jobs={len(job_ids)} stages={n_stages} tasks={n_tasks} wall={wall:.2f}s", flush=True)
    if out_json:
        Path(out_json).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
