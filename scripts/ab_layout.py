#!/usr/bin/env python
"""Interleaved A/B: sf1 corpus in the pre-r14 layout (1-2 single-row-
group files per table, rebuilt here verbatim) vs the r14
size-proportional layout, same session, alternating rounds — isolates
the file-layout effect from window position. Store-free scan-bound
queries only (store-backed keys would rebuild their stores per dir and
measure ingest, not the scan).

Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_layout.py agg_q1 tpch_q18 ...
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


def ensure_old_layout(spark, src_dir: str, replicas: int = 10) -> str:
    """The pre-r14 build verbatim: write inherits the source's split
    count (1-2 files, one row group each)."""
    from pyspark.sql import functions as F

    from opusdb_spark.sources.formats import ensure_written

    out_dir = os.path.join(_REPO, ".scratch", "bench_sf1_oldlayout")
    fingerprint = {
        "src": src_dir,
        "replicas": replicas,
        "stride": bench._KEY_STRIDE,
        "key_cols": {t: list(c) for t, c in bench._KEY_COLS.items()},
        "layout": "inherit-source-splits-v1",
    }

    def _build(path: str) -> None:
        os.makedirs(path, exist_ok=True)
        for tname, keys in bench._KEY_COLS.items():
            src = spark.read.parquet(f"{src_dir}/{tname}.parquet")
            rep = src.crossJoin(
                spark.range(replicas).select(F.col("id").alias("_rep"))
            )
            for k in keys:
                rep = rep.withColumn(
                    k, F.col(k) + F.col("_rep") * F.lit(bench._KEY_STRIDE)
                )
            rep.select(*src.columns).write.mode("overwrite").parquet(
                f"{path}/{tname}.parquet"
            )

    return ensure_written(out_dir, fingerprint, _build)


def main() -> None:
    names = sys.argv[1:]
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-layout")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    new_dir = bench.ensure_sf1(spark, src)
    old_dir = ensure_old_layout(spark, src)
    for name in names:
        # warm both
        qs[name](spark, old_dir).count()
        qs[name](spark, new_dir).count()
        best = {"old": float("inf"), "new": float("inf")}
        wins = 0
        for _ in range(rounds):
            for tag, d in (("old", old_dir), ("new", new_dir)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qs[name](spark, d).count()
                best[tag] = min(best[tag], time.perf_counter() - t0)
        print(
            f"{name}: old best {best['old']:.3f}s  new best "
            f"{best['new']:.3f}s  ({best['old'] / best['new']:.2f}x)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
