"""Simulate the driver's CORRECTNESS sweep and time every query.

Runs each registered query at sf0.01 in registry order (the order the
driver iterates `queries()`), executes the Spark side to pandas and the
DuckDB oracle, and prints per-query wall seconds sorted slowest-first
plus the cumulative total. This is the feedback loop for keeping the
full sweep inside the driver's time budget (the r01 run truncated at
50/113 queries).

Usage: python scripts/driver_sim.py [sf_dir] [--fresh]
  --fresh  wipe the ingest-artifact scratch dirs first so every
           ingest-once layout pays its first-run cost (worst case,
           which is what the driver sees on a clean round).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

# Pin the parity corpus to THIS run's corpus before conftest/registry
# import — same footgun note as scripts/verify_backlog.py.
_sf_dir = next(
    (a for a in sys.argv[1:] if not a.startswith("-")),
    "/root/testdata/sf0.01",
)
os.environ["OPUSDB_PARITY_SF_DIR"] = _sf_dir

from opusdb_spark.registry import registry  # noqa: E402
from opusdb_spark.session import get_spark  # noqa: E402
from tests.conftest import make_duck  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    fresh = False
    for a in sys.argv[1:]:
        if a == "--fresh":
            fresh = True
        else:
            sf_dir = a

    if fresh:
        from opusdb_spark.sources import formats

        shutil.rmtree(formats._SCRATCH, ignore_errors=True)
        print(f"cleared scratch root {formats._SCRATCH}", flush=True)

    spark = get_spark()
    duck = make_duck(sf_dir)
    qs = registry()

    times: dict[str, float] = {}
    oracle_times: dict[str, float] = {}
    failures: dict[str, str] = {}
    t_start = time.monotonic()
    for name, q in qs.items():
        t0 = time.monotonic()
        try:
            sdf = q.fn(spark, sf_dir)
            sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures[name] = repr(e)[:200]
        t1 = time.monotonic()
        times[name] = t1 - t0
        if q.oracle is not None:
            try:
                duck.execute(q.oracle).df()
            except Exception as e:  # noqa: BLE001
                failures[name] = "oracle: " + repr(e)[:200]
            oracle_times[name] = time.monotonic() - t1
        print(
            f"{name:32s} spark={times[name]:7.2f}s"
            f" oracle={oracle_times.get(name, 0.0):6.2f}s"
            f" cum={time.monotonic() - t_start:7.1f}s",
            flush=True,
        )

    total = time.monotonic() - t_start
    print("\n=== slowest 20 (spark+oracle) ===")
    combined = {
        n: times[n] + oracle_times.get(n, 0.0) for n in times
    }
    for n, t in sorted(combined.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{n:32s} {t:7.2f}s")
    print(f"\nTOTAL {total:.1f}s for {len(qs)} queries")
    if failures:
        print(f"FAILURES ({len(failures)}):")
        for n, e in failures.items():
            print(f"  {n}: {e}")
    with open("/tmp/driver_sim_times.json", "w") as f:
        json.dump(
            {"total": total, "times": times, "oracle": oracle_times,
             "failures": failures},
            f, indent=1,
        )


if __name__ == "__main__":
    main()
