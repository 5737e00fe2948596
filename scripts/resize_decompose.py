#!/usr/bin/env python
"""Decompose multimodal_resize's scale-probe wall (VERDICT r12 ask #5).

The probe's 100×/10× ratio for `multimodal_resize` was 8.4 — the
closest number to the ratio-10 ceiling in scale_probe_out.json. This
script splits the timed wall into its three phases at both probe
scales so the ratio can be attributed:

  synth    — synthesize_media alone (fixture ENCODE: PGM/PNG/JPEG
             writers inside mapInPandas). A benchmark-fixture cost:
             a production table reads stored blobs instead.
  resize   — decode + area-resize + PGM re-encode over a
             MATERIALIZED media table (parquet round-trip), i.e. the
             production-shaped work: read blobs → mapInPandas kernel.
  combined — the registered query's actual plan (synth feeding resize
             in one pipeline, nothing materialized) for reference.

Also reports decoded-bytes throughput (bytes/s/core) for the resize
phase so the 100 TB projection is a number, not a ratio: decoded
bytes = Σ w·h·n_frames(·3 for RGB video) over the corpus.

Run: python scripts/resize_decompose.py [n_10x [n_100x]]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from opusdb_spark.session import get_spark  # noqa: E402


def decoded_bytes(n: int) -> int:
    """Exact decoded-plane bytes for synthesize_media(n): the id →
    (kind, w, h, n_frames) mapping is deterministic (multimodal.py)."""
    total = 0
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w, h = 16 + i % 32, 16 + (i // 2) % 32
        n_frames = 1 + i % 8
        if kind == "image":
            total += w * h
        elif kind == "video":
            total += w * h * 3 * n_frames
        else:  # audio byte plane
            total += w * h
    return total


def main() -> None:
    from opusdb_spark.operators import multimodal

    n10 = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n100 = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = get_spark(app_name="resize-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    out: dict = {"cores": cores, "scales": {}}
    store = os.path.join(_REPO, ".scratch", "resize_decompose_media")

    for label, n in (("10x", n10), ("100x", n100)):
        rec: dict = {"n": n}
        # warm JVM + python workers once per scale
        multimodal.synthesize_media(spark, n=min(n, 2048)).count()

        t0 = time.perf_counter()
        multimodal.synthesize_media(spark, n=n).count()
        rec["synth_sec"] = round(time.perf_counter() - t0, 2)

        shutil.rmtree(store, ignore_errors=True)
        multimodal.synthesize_media(spark, n=n).write.parquet(store)
        media = spark.read.parquet(store)
        media.count()  # warm the stored-table scan
        t0 = time.perf_counter()
        multimodal.resize_plan(media).count()
        rec["resize_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        multimodal.resize_plan(
            multimodal.synthesize_media(spark, n=n)
        ).count()
        rec["combined_sec"] = round(time.perf_counter() - t0, 2)

        db = decoded_bytes(n)
        rec["decoded_mb"] = round(db / 1e6, 1)
        rec["resize_mb_per_sec_per_core"] = round(
            db / 1e6 / rec["resize_sec"] / cores, 3
        )
        out["scales"][label] = rec
        print(f"# {label}: {rec}", file=sys.stderr, flush=True)

    s10, s100 = out["scales"]["10x"], out["scales"]["100x"]
    out["ratios"] = {
        "synth": round(s100["synth_sec"] / s10["synth_sec"], 2),
        "resize": round(s100["resize_sec"] / s10["resize_sec"], 2),
        "combined": round(s100["combined_sec"] / s10["combined_sec"], 2),
        "data": round(n100 / n10, 2),
    }
    shutil.rmtree(store, ignore_errors=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
