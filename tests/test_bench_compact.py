"""Pin bench.py's compact-line contract.

The driver tail-captures ~2000 chars of stdout and parses the final
JSON line; bench._compact trims verbose sections to fit
_FINAL_LINE_BUDGET. This has silently broken twice: r7 (the combined
line outgrew the window and the whole metric went unparsed) and r12
(the streaming instrumentation pushed the line past budget and the
trim ladder fell off a cliff, discarding the 750-char sf1 per-query
map — the round-over-round drift localizer — to recover 36 chars).
This test builds a worst-case-shaped detail object from bench's OWN
constants (every section maximal, every new field present) and pins:
the line fits the budget, and the drift-localizer maps (headline
queries, tpch per-query, sf1 per-query) plus the streaming
instrumentation survive the trims.
"""

from __future__ import annotations

import json

import bench


def _detail() -> dict:
    headline = {k: 0.987 for k in bench.HEADLINE}
    spreads = {k: 0.1234 for k in bench.HEADLINE}
    tpch_names = [f"tpch_q{i}" for i in (2, 3, 4, 6, 7, 8, 9, 10, 11, 12,
                                          13, 14, 16, 18, 19, 20, 21, 22)]
    tpch = {k: 1.234 for k in tpch_names}
    sf1 = {k: 12.345 for k in bench.SF1_LADDER}
    return {
        "metric": "headline_queries_total_time",
        "value": round(sum(headline.values()), 4),
        "unit": "sec",
        "timing": bench.TIMING,
        "queries": headline,
        "spread": spreads,
        "spread_worst": {k: 1.5678 for k in bench.HEADLINE},
        "sf": 0.1,
        "q1_rows_per_sec": 12345678,
        "floor_ms": 123.4,
        "floor_end_ms": 234.5,
        "tpch": {
            "queries": tpch,
            "spread": {k: 0.1234 for k in tpch_names},
            "spread_worst": {k: 1.5678 for k in tpch_names},
            "floor_ms": 123.4,
            "total": round(sum(tpch.values()), 4),
        },
        "streaming": {
            "query": "stream_session_timeout",
            "sec": 10.4287,
            "spread": 1.3254,
            "spread_worst": 2.4321,
            "floor_ms": 123.4,
            "n_batches": 4,
            "events_rows": 1000000,
            "rows_per_sec": 95906,
            "sessions_closed": 953910,
        },
        "sf1": {
            "queries": sf1,
            "spread": {k: 0.1234 for k in bench.SF1_LADDER},
            "spread_worst": {k: 1.5678 for k in bench.SF1_LADDER},
            "n_jobs": {k: 123 for k in bench.SF1_LADDER},
            "floor_ms": 123.4,
            "lineitem_rows": 60000000,
            "q1_rows_per_sec": 9876543,
            "tpch": {
                "queries": {k: 12.34 for k in bench.TPCH_SF1},
                "total": 61.7,
            },
        },
    }


def test_compact_line_fits_and_keeps_drift_localizers():
    line = bench._compact(_detail())
    s = json.dumps(line)
    assert len(s) <= bench._FINAL_LINE_BUDGET, (
        f"compact line {len(s)} chars exceeds the "
        f"{bench._FINAL_LINE_BUDGET} budget"
    )
    # the always-survive core
    for k in ("metric", "value", "unit", "sf", "q1_rows_per_sec"):
        assert k in line, k
    # drift localizers: the maps the round verdicts actually consume
    assert "queries" in line, "headline per-query map trimmed"
    assert "q" in line.get("tpch", {}), "tpch per-query map trimmed"
    assert "queries" in line.get("sf1", {}), (
        "sf1 per-query map trimmed — the r12 cliff regressed"
    )
    # the r12 streaming instrumentation (VERDICT r11 ask #1)
    for k in ("sec", "spread", "floor_ms", "n_batches", "rows_per_sec"):
        assert k in line.get("streaming", {}), f"streaming.{k} missing"
    # window-health floors
    assert "floor_ms" in line
    assert "floor_ms" in line.get("tpch", {})
    # r13 sf1 noise/attribution channel (VERDICT r12 asks #1/#2):
    # even in this worst-case-shaped detail, the WIDEST sf1 spread and
    # the n_jobs count for the unattributed store-backed slot must
    # survive the trim ladder — they are the fields that let a judge
    # separate an sf1 swing from plan drift using the line alone.
    sp = line.get("sf1", {}).get("spread_w", {})
    assert sp, "sf1.spread_w fully trimmed"
    # all spreads equal in this fixture; require ≥1 entry carrying
    # the fixture's worst-def value
    assert any(abs(v - 1.57) < 0.01 for v in sp.values())
    assert "events_rollup_incremental" in line.get("sf1", {}).get(
        "n_jobs", {}
    ), "watch-slot n_jobs trimmed"


def test_compact_line_survives_missing_sections():
    """Partial runs (SPARK_GRAFT_TPCH=0 etc.) emit without those
    sections — _compact must not KeyError."""
    d = _detail()
    for drop in ("tpch", "streaming", "sf1"):
        dd = {k: v for k, v in d.items() if k != drop}
        line = bench._compact(dd)
        assert drop not in line
        assert len(json.dumps(line)) <= bench._FINAL_LINE_BUDGET


def test_time_query_counts_jobs():
    """time_query's job-group instrumentation (r13): after a timed
    build, LAST_N_JOBS must hold the run's job count (≥1; the exact
    number is AQE's business — even range().count() is 2 stage-jobs).
    The load-bearing property is STABILITY: group names are unique per
    run (the status tracker accumulates ids per group NAME for the
    app's lifetime), so a repeat of the same build must report the
    SAME count — a reused name would double it."""
    from opusdb_spark.session import get_spark

    spark = get_spark(
        app_name="njobs-test", master="local[2]", shuffle_partitions=2
    )
    try:
        bench.time_query(spark, lambda: spark.range(100), runs=1)
        first = bench.LAST_N_JOBS
        assert first >= 1, first
        bench.time_query(spark, lambda: spark.range(100), runs=1)
        assert bench.LAST_N_JOBS == first, (
            "job-group name reuse leaked a prior run's jobs into the count"
        )
    finally:
        spark.stop()


def test_scaled_table_layout_policy():
    """Pin the r14 scale-corpus layout policy: split tables (the
    relational fact/dim chain + embeddings) get one range-partitioned
    file per core slot, growing past 128 MB/file for genuinely large
    corpora; events/documents inherit the build's splits (measured
    slower under every split variant — their ladder slots are
    partial-agg/shuffle-bound, and scattering defeats the map-side
    collapse); tiny tables stay single-file rather than paying 31
    empty scan tasks."""
    # split table, local bench size: one file per slot, keyed
    assert bench.scaled_table_layout("lineitem", 108 << 20, 32) == (
        32,
        "l_orderkey",
    )
    # split table, large corpus: file count grows with bytes
    n, key = bench.scaled_table_layout("lineitem", 100 << 30, 32)
    assert key == "l_orderkey" and n == (100 << 30) // (128 << 20)
    # agg-collapse-sensitive tables are never split
    assert bench.scaled_table_layout("events", 1 << 30, 32) is None
    assert bench.scaled_table_layout("documents", 1 << 30, 32) is None
    # tiny split tables inherit (not worth empty scan tasks)
    assert bench.scaled_table_layout("supplier", 1 << 20, 32) is None
