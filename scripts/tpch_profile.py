#!/usr/bin/env python
"""Per-query job/stage profile for the TPC-H sf0.1 block (VERDICT r11
ask #3 follow-up). For each query: one warm timed run inside its own
job group, then read the status tracker — job count, total task time,
sum of stage wall (executorRunTime is the compute; wall - compute/32 is
roughly scheduling). Tests the decomposition
    wall ~= n_jobs * per_job_floor + task_time / 32
against the r8->r12 drift: if today's wall minus today's floor-cost
matches r8's wall minus a lucky-window floor-cost, the drift is floor
history + machine throughput, not plans.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import bench  # noqa: E402
from opusdb_spark.registry import queries  # noqa: E402
from opusdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tpch-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = queries()
    qs["agg_invariant"](spark, sf_dir).collect()
    names = sorted(k for k in qs if k.startswith("tpch_q"))
    for name in names:
        qs[name](spark, sf_dir).count()  # warm
    try:
        os.sync()
    except (AttributeError, OSError):
        pass
    floor_ms = bench.measure_floor_ms(spark)
    st = sc.statusTracker()
    prof: dict[str, dict] = {}
    for name in names:
        spark.catalog.clearCache()
        group = f"prof_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        sc.setJobGroup("idle", "idle")
        job_ids = st.getJobIdsForGroup(group)
        stage_ids = set()
        for jid in job_ids:
            ji = st.getJobInfo(jid)
            if ji:
                stage_ids.update(ji.stageIds)
        n_tasks = 0
        for sid in stage_ids:
            si = st.getStageInfo(sid)
            if si:
                n_tasks += si.numTasks
        prof[name] = {
            "wall": round(wall, 3),
            "n_jobs": len(job_ids),
            "n_stages": len(stage_ids),
            "n_tasks": n_tasks,
        }
        print(f"# {name}: {prof[name]}", file=sys.stderr)
    print(json.dumps({"floor_ms": floor_ms, "prof": prof}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
