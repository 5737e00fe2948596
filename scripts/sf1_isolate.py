#!/usr/bin/env python
"""Isolated sf1-ladder measurement for the r13 optimization loop.

Runs ONLY the named ladder slots — fresh session, same
prepare/sync/floor/timing discipline as bench.py's run_ladder — so a
candidate rewrite can be A/B-ed without paying the full bench and
without in-bench position contamination. Prints per-query best/spread/
n_jobs; with PLAN_TAG set, also drops .explain("formatted") into
plans/<PLAN_TAG>/<query>_<PLAN_SUFFIX>.txt.

Usage:
  python scripts/sf1_isolate.py llm_winnowing_overlap llm_semdedup
  PLAN_TAG=r13 PLAN_SUFFIX=after python scripts/sf1_isolate.py ...
"""
from __future__ import annotations

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
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sf1-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    sf1_dir = bench.ensure_sf1(spark, sf_dir)
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf1_dir).count()
        print(
            f"# prepare {name}: {time.perf_counter() - t0:.3f}s",
            file=sys.stderr,
        )
    try:
        os.sync()
    except (AttributeError, OSError):
        pass
    floor = bench.measure_floor_ms(spark)
    print(f"# floor_ms: {floor}")
    tag = os.environ.get("PLAN_TAG")
    for name in names:
        spark.sparkContext.setJobDescription(f"isolate {name}")
        sec, rows = bench.time_query(
            spark, lambda n=name: qs[n](spark, sf1_dir), runs=3
        )
        print(
            f"{name}: {sec:.3f}s rows={rows} spread={bench.LAST_SPREAD} "
            f"worst={bench.LAST_SPREAD_WORST} n_jobs={bench.LAST_N_JOBS}"
        )
        if tag:
            suffix = os.environ.get("PLAN_SUFFIX", "after")
            df = qs[name](spark, sf1_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = Path(_REPO) / "plans" / tag / f"{name}_{suffix}.txt"
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(plan)
            print(f"# wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
