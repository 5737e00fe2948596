#!/usr/bin/env python
"""Job-count profile for arbitrary registered queries (generalizes
scripts/tpch_profile.py — the tool that found the register_views
footer-job tax). For each query: warm once, then one timed run inside
its own job group; report wall, job count, stage count, task count.
Queries whose job count far exceeds their plan's stage needs are
paying driver-side overhead (schema re-reads, eager collects, per-call
artifact probes) that a 1000-executor cluster would amortize but a
per-query scheduler floor multiplies.

Usage: python scripts/job_profile.py [query ...]   (default: HEADLINE)
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
    spark = get_spark(app_name="job-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = queries()
    names = sys.argv[1:] or bench.HEADLINE
    for name in names:
        qs[name](spark, sf_dir).count()  # warm + ingest artifacts
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
        prof[name] = {
            "wall": round(wall, 3),
            "n_jobs": len(job_ids),
            "n_stages": len(stage_ids),
        }
        print(f"# {name:28s} {prof[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"floor_ms": floor_ms, "prof": prof}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
