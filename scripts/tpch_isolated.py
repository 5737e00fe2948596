#!/usr/bin/env python
"""Isolated TPC-H sf0.1 measurement (VERDICT r11 ask #3).

The full bench runs the 18-query TPC-H block AFTER the 20-key headline
section (timed runs + their ingest-once artifact warmups); the sf0.1
TPC-H total drifted 15.09 s (r8) -> 19.48 s (r11) while session confs
and queries/tpch.py are byte-identical across those rounds (verified:
`git diff 832db55..HEAD -- opusdb_spark/session.py
opusdb_spark/queries/tpch.py` is empty). This script runs ONLY the
TPC-H block — fresh session, same warmup/prepare/sync/floor/timing
discipline as bench.py — so in-bench position contamination is the one
variable removed. Interpretation:
  * isolated total ~= r8's 15 s at a like floor  -> the drift is
    position contamination inside the bench run (fix: per-section
    floors / a sync fence before the block);
  * isolated total ~= 19.5 s                     -> something
    process-independent moved; bisect further.
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
    spark = get_spark(app_name="tpch-isolated")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    qs["agg_invariant"](spark, sf_dir).collect()
    names = sorted(k for k in qs if k.startswith("tpch_q"))
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        print(f"# prepare {name}: {time.perf_counter() - t0:.3f}s", file=sys.stderr)
    try:
        os.sync()
    except (AttributeError, OSError):
        pass
    floor_ms = bench.measure_floor_ms(spark)
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in names:
        timings[name], n = bench.time_query(
            spark, lambda: qs[name](spark, sf_dir)
        )
        spreads[name] = bench.LAST_SPREAD
        print(
            f"# {name}: {timings[name]:.3f}s (spread {bench.LAST_SPREAD:.3f}s,"
            f" {n} rows)",
            file=sys.stderr,
        )
    floor_end_ms = bench.measure_floor_ms(spark)
    out = {
        "total": round(sum(timings.values()), 4),
        "floor_ms": floor_ms,
        "floor_end_ms": floor_end_ms,
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "spread": spreads,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
