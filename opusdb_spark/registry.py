"""Query registry — the single source of truth for the t2 contract.

Each operator from SURVEY.md §2B registers here with:
  - a Spark callable ``(spark, sf_dir) -> DataFrame``
  - an equivalent DuckDB oracle SQL string (or None for rows-only ops:
    approximate / streaming / hash-dependent semantics)

``__spark_entry__.py`` delegates to :func:`queries` / :func:`oracle_sql`.
"""

from __future__ import annotations

import importlib
import json
import os
import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules whose import registers queries. Order = SURVEY §7 build order.
_QUERY_MODULES = [
    "opusdb_spark.queries.scans",
    "opusdb_spark.queries.filters",
    "opusdb_spark.queries.joins",
    "opusdb_spark.queries.aggregates",
    "opusdb_spark.queries.windows",
    "opusdb_spark.queries.sorts",
    "opusdb_spark.queries.setops",
    "opusdb_spark.queries.scalar_functions",
    "opusdb_spark.queries.subqueries",
    "opusdb_spark.queries.reshape",
    "opusdb_spark.queries.versioned",
    "opusdb_spark.queries.streaming_batch",
    "opusdb_spark.queries.udfs",
    "opusdb_spark.queries.llm",
    "opusdb_spark.queries.pipeline",
    "opusdb_spark.queries.tpch",
    "opusdb_spark.queries.graph",
    "opusdb_spark.queries.sketches",
]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}
_LOADED = False


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


# Sweep prioritization: a time-budgeted correctness sweep that runs in
# dict order should reach the most-informative queries FIRST. Until
# round 7 this was a hand-maintained frozenset of verdicted keys plus a
# hand-rotated `_NEVER_SAMPLED` head; since round 8 freshness is
# derived from the committed CORRECTNESS_r*.json artifacts themselves
# (the driver's own verdict record), so promotion is automatic:
#
#   tier 1 — `_RECENTLY_CHANGED`: queries rewritten in the CURRENT
#            round, whose on-file verdicts describe code that no longer
#            exists (hand-listed, rotated each round);
#   tier 2 — no clean verdict on file (new queries, and any key whose
#            NEWEST verdict is a failure — a red latest verdict drops
#            the key back here automatically);
#   tier 3 — everything else, STALEST verdict first, so sweep budget
#            rotates through r1-r3-era verdicts instead of re-checking
#            keys the driver just confirmed.
#
# "Clean" matches the driver's own semantics: hash_match true, or a
# rows-only query (err == "no_oracle") that ran and reported a row
# count. Harmless if the consumer sorts or completes the full sweep.

# Round 9: queries whose plans changed this round -> jump the queue.
_RECENTLY_CHANGED: tuple[str, ...] = (
    # ingest/query split: set ops now served from the ingest-once
    # sketch state (counts + k-row sketches + precomputed exact
    # intersects); the r8 corpus self-join is gone
    "agg_kmv_set_ops",
    # _dd_merge2 normalizes merged DDSketch maps to sorted-key form:
    # every query whose plan runs the merge (refresh/backfill/cascade
    # maintenance, the map-folding readouts) changed
    "events_rollup_incremental",
    "events_rollup_backfill",
    "events_rollup_cascade",
    "events_rollup_quantiles",
    "stream_rollup_maintain",
    # upgraded from rows-only to full value-hash oracles (portable
    # md5-bit hashes / idempotent sink shapes)
    "llm_fingerprint",
    "filter_hash_sample",
    "sink_append",
    "mvcc_txn_rollback",
    "llm_dedup_cluster",
    # second r9 batch of rows-only -> hash upgrades (ingest-artifact
    # replay: sigs-store candidates, signature banding, recursive-CTE
    # EWMA recurrence, centroid-model cell replay, decimal-fold
    # retrieval evals)
    "llm_simsearch_lsh",
    "llm_dedup_fuzzy",
    "udaf_ewma",
    "llm_simsearch_ivf",
    "llm_ann_recall_eval",
    "emb_truncated_recall",
    # new in r9 session 2
    "events_forecast_holt",
    "dq_schema_drift",
    # compressed-ANN replay (r9 session 2)
    "llm_simsearch_ivfpq",
    # exhaustive-vs-blocked simhash proof + asymmetric band replay
    "llm_dedup_simhash",
    "llm_dedup_incremental",
    # composite reports: every branch now replays in DuckDB
    "llm_dedup_method_report",
    "llm_corpus_report",
    # estimator calibration + end-to-end pipeline replay
    "llm_minhash_calibration",
    "llm_dedup_pipeline",
    # integer-recurrence packing replay
    "llm_seq_pack",
    # new in r9 session 2: delta-rule join-view maintenance
    "mv_join_incremental",
    # unrolled greedy-selection replay (left-fold cosines)
    "llm_mmr_select",
    # clear-on-entry sinks: content is a pure function of the source
    "sink_partitioned",
    "sink_reopen_append",
    # new in r9 session 2: merge-on-read positional deletes
    "scan_delete_vectors",
    # TWAP LEAD re-lowered to the bucket-split window (the per-type
    # window was a 5-task parallelism ceiling)
    "events_time_weighted_avg",
)

_CORRECTNESS_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_VERDICT_ROUNDS: dict[str, int] | None = None


def _verdict_rounds() -> dict[str, int]:
    """key -> newest round with a CLEAN driver verdict (see tiers above);
    keys whose newest verdict is a failure are absent. Computed once per
    process from the committed CORRECTNESS_r*.json artifacts."""
    global _VERDICT_ROUNDS
    if _VERDICT_ROUNDS is not None:
        return _VERDICT_ROUNDS
    rounds: dict[str, int] = {}
    try:
        names = os.listdir(_ROOT)
    except OSError:
        names = []
    # numeric round order, NOT lexicographic filename order: an
    # unpadded r8 vs r10 (or r99 vs r100) sorted as strings would
    # process a NEWER file first, letting an older clean verdict
    # resurrect a key whose newest verdict is red
    matched = []
    for fname in names:
        m = _CORRECTNESS_RE.fullmatch(fname)
        if m:
            matched.append((int(m.group(1)), fname))
    for rnd, fname in sorted(matched):
        try:
            with open(os.path.join(_ROOT, fname)) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for key, res in data.items():
            if not isinstance(res, dict):
                continue
            clean = bool(res.get("hash_match")) or (
                res.get("err") == "no_oracle"
                and res.get("spark_rows") is not None
            )
            if clean:
                rounds[key] = max(rounds.get(key, 0), rnd)
            elif rounds.get(key, 0) < rnd:
                rounds.pop(key, None)  # newest verdict is red -> tier 2
    _VERDICT_ROUNDS = rounds
    return rounds


def _sweep_ordered(items: dict[str, Query]) -> dict[str, Query]:
    rounds = _verdict_rounds()
    pos = {k: i for i, k in enumerate(items)}
    changed = [k for k in _RECENTLY_CHANGED if k in items]
    rest = [k for k in items if k not in set(changed)]
    fresh = [k for k in rest if k not in rounds]
    stale = sorted(
        (k for k in rest if k in rounds), key=lambda k: (rounds[k], pos[k])
    )
    return {k: items[k] for k in changed + fresh + stale}


def registry() -> dict[str, Query]:
    _load()
    return _sweep_ordered(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in registry().items() if q.oracle is not None
    }
