"""Physical-plan quality gates — the 100 TB story is in the plan.

Each test asserts the *shape* of the executed plan, not timing:
filters reach the parquet scan, projections prune the read schema,
small dims broadcast, top-k avoids global sorts, windows use group
limits. A regression here is a silent 100× at scale even when sf0.01
results stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opusdb_spark.plans import explain_str as plan
from opusdb_spark.registry import registry
from opusdb_spark.tables import table

SF = "/root/testdata/sf0.001"

_Q = registry()


def test_filter_pushdown_reaches_scan(spark):
    p = plan(_Q["scan_filter_pushdown"].fn(spark, SF))
    assert "PushedFilters:" in p
    assert "GreaterThanOrEqual(l_shipdate" in p.replace("\n", " ")


def test_column_pruning(spark):
    p = plan(_Q["scan_prune"].fn(spark, SF))
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema
    assert "l_extendedprice" not in read_schema, "pruned column still read"
    assert "l_comment" not in read_schema


def test_q1_prunes_untouched_columns(spark):
    p = plan(_Q["agg_q1"].fn(spark, SF))
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" not in read_schema, "agg_q1 reads columns it never uses"
    assert "l_suppkey" not in read_schema


def test_broadcast_join_used_for_small_dim(spark):
    p = plan(_Q["join_broadcast"].fn(spark, SF))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def test_multiway_broadcasts_dims(spark):
    p = plan(_Q["join_multiway"].fn(spark, SF))
    assert "BroadcastHashJoin" in p, "dims should broadcast, not shuffle"


def test_sort_merge_hint_respected(spark):
    p = plan(_Q["join_sort_merge"].fn(spark, SF))
    assert "SortMergeJoin" in p


def test_topk_uses_take_ordered(spark):
    p = plan(_Q["topk_global"].fn(spark, SF))
    assert "TakeOrderedAndProject" in p, "global top-k must not be a full sort"


def test_window_topk_uses_group_limit(spark):
    p = plan(_Q["win_topk_group"].fn(spark, SF))
    assert "WindowGroupLimit" in p, "rn<=k filter should push into the window"


def test_q1_whole_stage_codegen(spark):
    # With AQE the codegen spans only appear in the *final* plan, so
    # execute first, then read the executed plan.
    df = _Q["agg_q1"].fn(spark, SF)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    # "*(n)" prefixes mark whole-stage-codegen stages in plan strings.
    assert "*(1)" in p, "agg pipeline fell out of codegen"
    assert "*(2)" in p, "final aggregate fell out of codegen"


def test_q1_partial_aggregation(spark):
    p = plan(_Q["agg_q1"].fn(spark, SF), mode="simple")
    # partial_ functions before the exchange = map-side combine
    assert "partial_" in p, "no map-side partial aggregation"


def test_semi_join_planned_as_semi(spark):
    p = plan(_Q["join_semi"].fn(spark, SF))
    assert "LeftSemi" in p


def test_scan_events_single_shuffle(spark):
    p = plan(_Q["scan_events_ordered"].fn(spark, SF), mode="simple")
    assert p.count("Exchange") <= 1, "ordered scan needs exactly one range exchange"


def test_asof_join_single_shuffle_per_side(spark):
    """The as-of join must not explode into a range join: one union, one
    window (one hash partitioning on the key), no nested-loop join."""
    p = plan(_Q["join_asof"].fn(spark, SF), mode="simple")
    assert "NestedLoop" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p


def test_fuzzy_dedup_never_all_pairs(spark):
    """Candidate generation must stay bucket-local: an accidental
    cross/nested-loop join is the O(n²) cliff at corpus scale."""
    p = plan(_Q["llm_dedup_fuzzy"].fn(spark, SF), mode="simple")
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p


def test_simhash_dedup_never_all_pairs(spark):
    p = plan(_Q["llm_dedup_simhash"].fn(spark, SF), mode="simple")
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p


def test_lsh_similarity_candidates_are_equi_join(spark):
    # The only non-equi join allowed is the broadcast of the 1-row
    # probe-norm scalar; bucket candidate generation must hash-join.
    p = plan(_Q["llm_simsearch_lsh"].fn(spark, SF), mode="simple")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin [table_id" in p, "bucket join must be an equi-join"


def test_exact_dedup_single_shuffle(spark):
    p = plan(_Q["llm_dedup_exact"].fn(spark, SF), mode="simple")
    assert p.count("Exchange") <= 1, "hash dedup is one groupBy shuffle"


def test_wordcount_partial_aggregation(spark):
    p = plan(_Q["llm_wordcount"].fn(spark, SF), mode="simple")
    assert "partial_" in p, "word counts must combine map-side"


def test_theta_join_is_banded_equi_join(spark):
    """The ±band self-join must run as a bucket hash join, not a
    nested loop over all pairs."""
    p = plan(_Q["join_theta"].fn(spark, SF), mode="simple")
    assert "NestedLoop" not in p
    assert "CartesianProduct" not in p


def test_bucketed_join_has_no_exchange(spark):
    """Bucketed scans must satisfy the join's distribution: the sort-
    merge join runs with ZERO Exchange below it (the one organizing
    shuffle was paid at write time; every later join on the key rides
    free). Only the final groupBy on a different key may shuffle."""
    df = _Q["join_bucketed_colocated"].fn(spark, SF)
    p = plan(df, mode="simple")
    join_part = p.split("SortMergeJoin")[-1]
    assert "SortMergeJoin" in p
    assert "Exchange" not in join_part, "bucketed join still shuffles"
    assert p.count("Exchange") <= 1, "only the priority groupBy may shuffle"


def test_partitioned_join_uses_dynamic_pruning(spark):
    """The fact scan must carry a dynamicpruning subquery on its
    partition column — at scale, reading one status directory instead
    of the table."""
    p = plan(_Q["join_partition_pruned"].fn(spark, SF))
    assert "dynamicpruning" in p, "DPP did not engage on the partition column"


def test_correlated_subquery_decorrelated(spark):
    p = plan(_Q["sub_correlated"].fn(spark, SF), mode="simple")
    # Catalyst must rewrite to aggregate + join, not per-row subplans
    assert "Join" in p
    assert "Subquery" not in p or "SubqueryExec" not in p
