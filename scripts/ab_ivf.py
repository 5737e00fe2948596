#!/usr/bin/env python
"""Interleaved A/B: ivf_probe full-decimal scoring (old) vs two-phase
pooled scoring (new) on the sf1 bench corpus. Alternates shapes
round-robin in ONE session so window drift hits both sides equally;
asserts the two shapes return IDENTICAL rows first.

Usage: python scripts/ab_ivf.py [rounds=4]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from opusdb_spark.operators import ann_index  # noqa: E402
from opusdb_spark.session import get_spark  # noqa: E402


def old_probe(spark, idx, vec, k=10, exclude_id=0):
    """The pre-r13 tail: full decimal fold over every candidate."""
    from opusdb_spark.operators.ann_index import (
        N_PROBE,
        _score_against,
        load_centroids,
        read_index_store,
    )
    import numpy as np

    cents = load_centroids(idx)
    cn = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12)
    v = np.asarray(vec, dtype=np.float64)
    vn = v / (np.linalg.norm(v) + 1e-12)
    cells = [int(c) for c in np.argsort(-(cn @ vn))[:N_PROBE]]
    cands = (
        read_index_store(spark, idx, "ivf")
        .filter(F.col("cell").isin(cells))
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") != exclude_id)
    )
    return (
        cands.select(
            "vec_id", _score_against("embedding", vec).alias("cosine")
        )
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark()
    sf1 = os.path.join(_REPO, ".scratch", "bench_sf1")
    assert os.path.isdir(sf1), "run bench.py first to build bench_sf1"
    from opusdb_spark.queries.llm import _ann_index

    idx = _ann_index(spark, sf1)
    vec = ann_index.fetch_vector(spark, idx, probe_id=0)

    a = old_probe(spark, idx, vec)
    b = ann_index.ivf_probe(spark, idx, vec, k=10, exclude_id=0)
    ra = [(r["vec_id"], r["cosine"]) for r in a.collect()]
    rb = [(r["vec_id"], r["cosine"]) for r in b.collect()]
    assert ra == rb, f"MISMATCH\nold={ra}\nnew={rb}"
    print(f"# identical top-10 ({len(ra)} rows), bit-exact cosines")

    def run(df, label):
        spark.sparkContext.setJobDescription(f"ab_ivf {label}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    times = {"old": [], "new": []}
    for i in range(rounds):
        times["old"].append(run(old_probe(spark, idx, vec), f"old r{i}"))
        times["new"].append(
            run(
                ann_index.ivf_probe(spark, idx, vec, k=10, exclude_id=0),
                f"new r{i}",
            )
        )
    out = {
        "old": [round(t, 3) for t in times["old"]],
        "new": [round(t, 3) for t in times["new"]],
        "old_best": round(min(times["old"]), 3),
        "new_best": round(min(times["new"]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
