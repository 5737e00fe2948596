"""Guarantee pins for the deterministic sketch queries (sketches.py).

Parity vs the DuckDB oracle is covered by test_oracle_parity; these pin
the MATHEMATICAL contracts the oracle comparison can't see — the
DDSketch relative-error bound, KMV's sketch-complete exactness regime,
and lossless partial merging."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from opusdb_spark.operators.sketch import DD_GAMMA as _GAMMA
from opusdb_spark.queries.sketches import (
    _KMV_K,
    agg_ddsketch_quantiles,
    agg_kmv_set_ops,
    ddsketch_buckets,
)
from opusdb_spark.tables import table
from tests.conftest import SF_SMALL


def test_ddsketch_relative_error_bound(spark):
    """DDSketch's defining guarantee: the returned bucket midpoint is
    within alpha = (gamma-1)/(gamma+1) of the EMPIRICAL q-quantile —
    the data point at rank ceil(q*n), which is exactly the element the
    sketch's cumulative walk targets. (The query's shipped rel_err uses
    the INTERPOLATED quantile_cont instead, which can sit a whole
    inter-point gap away from any data point in a 200-sample tail —
    visible data, but not what the sketch promises.)"""
    import math

    alpha = (_GAMMA - 1.0) / (_GAMMA + 1.0)
    rows = agg_ddsketch_quantiles(spark, SF_SMALL).collect()
    assert len(rows) == 15  # 5 types x 3 quantiles
    vals = {
        t: sorted(
            r["value"]
            for r in table(spark, SF_SMALL, "events")
            .filter((F.col("value") > 0) & (F.col("event_type") == t))
            .select("value")
            .collect()
        )
        for t in {r["event_type"] for r in rows}
    }
    for r in rows:
        v = vals[r["event_type"]]
        rank_stat = v[math.ceil(r["q"] * len(v)) - 1]
        err = abs(r["est_value"] / rank_stat - 1)
        assert err <= alpha + 1e-6, (
            f"{r['event_type']} q={r['q']}: |est/rank_stat - 1| = "
            f"{err:.6f} exceeds alpha={alpha:.6f}"
        )


def test_ddsketch_partial_merge_lossless(spark):
    """Merging per-(type, day) bucket partials by count addition must
    equal sketching the whole table in one pass — the decomposability
    that makes the sketch storable in a rollup store."""
    ev = (
        table(spark, SF_SMALL, "events")
        .filter(F.col("value") > 0)
        .select("event_type", F.to_date("ts").alias("day"), "value")
    )
    merged = (
        ddsketch_buckets(ev, ["event_type", "day"])
        .groupBy("event_type", "bkt")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = ddsketch_buckets(ev, ["event_type"])
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_kmv_sketch_complete_regime_is_exact(spark):
    """At sf0.001 every type has ~15 distinct users < k=64, so each KMV
    sketch holds the ENTIRE hashed set: union and intersection
    estimates must equal the exact counts — no estimator error when
    the sketch hasn't saturated."""
    rows = agg_kmv_set_ops(spark, SF_SMALL).collect()
    assert len(rows) == 10  # C(5,2) type pairs
    for r in rows:
        assert r["exact_union"] < _KMV_K  # precondition of the regime
        assert r["est_union"] == pytest.approx(r["exact_union"])
        assert r["est_intersect"] == pytest.approx(r["exact_intersect"])
        assert 0.0 <= r["est_jaccard"] <= 1.0
