"""Hash-verify the driver-verification backlog at the driver's scale.

Runs the first N queries in registry (sweep) order — exactly what the
driver's 50-query sample will take — through the full local t2 replica
(tests/parity.compare: rows + schema + strict dtype kinds + values) at
sf0.01, and times each query so the sample's wall-clock budget is known
before the round runs.

Usage: python scripts/verify_backlog.py [sf_dir] [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

# Pin the parity corpus to THIS run's corpus BEFORE conftest/registry
# import: artifact-backed oracles embed OPUSDB_PARITY_SF_DIR-derived
# store paths in their SQL at query-module import, and tests/conftest
# (imported below for make_duck) would otherwise default it to the
# pytest corpus (sf0.001) — silently comparing sf0.01 Spark results
# against sf0.001 artifacts (caught in r10 when llm_pq_recall_eval,
# the first artifact-backed key to enter the sweep head, "failed"
# locally while the env-free driver pairing was correct).
_sf_dir = next(
    (a for a in sys.argv[1:] if not a.startswith("-") and not a.isdigit()),
    "/root/testdata/sf0.01",
)
os.environ["OPUSDB_PARITY_SF_DIR"] = _sf_dir

from opusdb_spark.registry import registry  # noqa: E402
from opusdb_spark.session import get_spark  # noqa: E402
from tests.conftest import make_duck  # noqa: E402
from tests.parity import compare, spark_to_pandas  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 52

    spark = get_spark()
    duck = make_duck(sf_dir)
    qs = registry()
    names = list(qs)[:n]

    bad: dict[str, str] = {}
    t_all = time.monotonic()
    for name in names:
        q = qs[name]
        t0 = time.monotonic()
        try:
            sdf = q.fn(spark, sf_dir)
            spdf = spark_to_pandas(sdf)
            if q.oracle is None:
                status = f"rows-only ({len(spdf)} rows)"
            else:
                ddf = duck.execute(q.oracle).df()
                res = compare(spdf, ddf)
                if not res.ok:
                    bad[name] = res.detail
                    status = f"FAIL: {res.detail[:120]}"
                else:
                    status = "pass" if res.exact else "pass (float-inexact)"
        except Exception as e:  # noqa: BLE001
            bad[name] = repr(e)[:200]
            status = f"ERROR: {repr(e)[:120]}"
        dt = time.monotonic() - t0
        print(f"{name:32s} {dt:6.2f}s  {status}", flush=True)

    print(f"\nTOTAL {time.monotonic() - t_all:.1f}s for {len(names)} queries")
    if bad:
        print(f"FAILURES ({len(bad)}):")
        for k, v in bad.items():
            print(f"  {k}: {v}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
