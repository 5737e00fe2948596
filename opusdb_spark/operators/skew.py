"""Skew mitigation: salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (one viral user, one default value) can
put 10% of a join's rows in one shuffle partition and stall the stage on
a single straggler task. Two standard remedies, both pure DataFrame
code:

- `salted_join`: append a random salt 0..S-1 to the big side's key and
  replicate the small(er) side S times, one copy per salt — the hot
  key's rows spread over S tasks. Result is row-identical to the plain
  join (verified against the plain-join SQL oracle).
- `two_phase_agg`: pre-aggregate on (key, salt), then finish on key.
  Spark's map-side partial aggregation already does this within a task;
  the explicit form also splits a hot key ACROSS tasks in the first
  shuffle.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
automatically at runtime; salting is the declarative fallback for
hash-partitioned work AQE can't re-split (aggregations, or when the
skew is known up front).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


_SPREAD_SMALL_BYTES = 512 * 1024 * 1024


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen a narrow scan before a compute-heavy map stage.

    Spark parallelizes map work by INPUT SPLIT; a small-on-disk but
    compute-dense table (compressed text whose per-row work explodes
    ~100× into grams/hashes) can arrive as ONE split, serializing the
    whole projection on one core (BENCH r7 finding: sf1 documents.parquet
    is 1 MB → 1 task → gram hashing ran single-threaded; winnowing at
    17 s of which 13 s was this). A round-robin repartition to
    defaultParallelism fixes that for the cost of shuffling the raw
    rows once — cheap exactly when the condition fires (the input is
    tiny). At cluster scale a 100 TB scan already has thousands of
    splits, so this is a metadata-only no-op there: the guards below
    never trigger a job.

    TWO guards, because split COUNT alone lies for small inputs: byte-
    range splitting can report `target` partitions over a file whose
    rows live in one or two parquet ROW GROUPS — a row group belongs to
    the single split containing its midpoint, so the other splits are
    EMPTY and the claimed parallelism is fictitious (the 100× scale
    probe caught exactly this: a 4.9 MB corpus "split" 32 ways put all
    500k rows in one task and serialized 25 minutes of gram hashing on
    one core). So: when the scan's total input bytes are known and
    small (< 512 MB — i.e. the one-shuffle cost is trivial next to the
    ≥100× downstream map work every call site has), repartition
    UNCONDITIONALLY; the partition-count guard remains the fallback
    when input size is unknown (non-file sources, intermediate
    frames). Inputs ≥ 512 MB have real row-group-bearing splits every
    ~128 MB, where the count guard is truthful.

    Both guards apply only to NARROW frames (nothing but scans /
    projections / filters upstream): once the plan contains a real
    SHUFFLE exchange, row distribution is governed by an exchange
    whose partitions actually hold rows — the empty-split fiction the
    guards exist for cannot occur, the exchange's sizing is the
    engine's own decision (shuffle.partitions + AQE advisory
    coalesce), and an unconditional repartition would add a redundant
    full shuffle per call (frames downstream of a shuffle can still
    report inputFiles()). Detection reads the PHYSICAL plan for
    shuffle Exchange nodes, not logical operator names: a broadcast
    join redistributes nothing on the streamed side and coalesce() is
    narrow, so neither may suppress the widen (a logical-name match
    would); a global orderBy shows up as its range Exchange. Shuffled
    frames are returned unchanged without touching df.rdd (which
    would trigger a job under AQE)."""
    import re

    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism

    try:
        # executedPlan = physical plan AFTER EnsureRequirements (the
        # stage where shuffle exchanges are inserted; sparkPlan is
        # BEFORE it and shows none) but not yet executed — with AQE it
        # prints as `AdaptiveSparkPlan isFinalPlan=false` over the
        # initial plan; building it is driver-side planning only, no
        # job runs. Shuffle exchanges print `Exchange
        # hashpartitioning/rangepartitioning/roundrobinpartitioning/
        # SinglePartition`; `BroadcastExchange` is one word (no
        # boundary before "Exchange") and deliberately does NOT match.
        plan = df._jdf.queryExecution().executedPlan().toString()
        shuffled = (
            re.search(
                r"\bExchange (hash|range|roundrobin|single)",
                plan,
                re.IGNORECASE,
            )
            is not None
        )
    except Exception:
        shuffled = False  # can't introspect -> keep the byte guard

    if shuffled:
        return df

    total: int | None = 0
    try:
        from urllib.parse import unquote, urlparse

        files = df.inputFiles()
        if files:
            import os

            for f in files:
                u = urlparse(f)
                if u.scheme not in ("", "file"):
                    # remote store: no driver-side stat — fall to
                    # the count guard rather than guessing sizes
                    total = None
                    break
                total += os.stat(unquote(u.path)).st_size
        else:
            total = None
    except Exception:
        total = None

    if total is not None and total < _SPREAD_SMALL_BYTES:
        return df.repartition(target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join robust to hot keys on the big side.

    big gets salt = pmod(hash(salt_cols), S) — deterministic, no rand()
    so results are reproducible and retries are safe; small is exploded
    ×S. The join key becomes (key, salt): the shuffle spreads each hot
    key over S partitions while total small-side volume grows only ×S
    (bounded — use for dim-sized or mid-sized right sides).

    `salt_cols` should include a per-row-distinct column (an id); the
    default hashes every column, which leaves fully-identical rows on
    one salt — they are the same shuffle row either way, but a hot key
    whose rows only differ in a column you dropped needs that column
    here to actually spread.

    Only join types that never null-extend the SMALL side are legal:
    its salt replicas would each survive as a spurious null-extended
    row under right/full joins.
    """
    if how not in ("inner", "left", "left_semi", "left_anti", "semi", "anti"):
        raise ValueError(
            f"salted_join cannot preserve '{how}' semantics: the replicated "
            "small side would emit one null-extended row per salt"
        )
    cols = salt_cols or big.columns
    big_salted = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_salted.join(small_salted, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    n_salts: int = DEFAULT_SALTS,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregate with a salted pre-phase: (key, salt) partials → key
    finals. `aggs` is [(col, fn, alias)] with fn in sum/count/
    count_nonnull/min/max (the decomposable aggregates — avg must be
    expressed as sum+count by the caller, then divided). `count` is a
    ROW count (COUNT(*) semantics, col ignored); `count_nonnull` is the
    null-skipping COUNT(col). As with salted_join, pass a
    per-row-distinct column in `salt_cols` so identical rows spread.
    """
    partial_exprs, final_exprs = [], []
    for col, fn, alias in aggs:
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(alias))
            final_exprs.append(F.sum(alias).alias(alias))
        elif fn == "count_nonnull":
            partial_exprs.append(F.count(col).alias(alias))
            final_exprs.append(F.sum(alias).alias(alias))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(alias))
            final_exprs.append(F.sum(alias).alias(alias))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(alias))
            final_exprs.append(F.min(alias).alias(alias))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(alias))
            final_exprs.append(F.max(alias).alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = df.withColumn(
        "_salt",
        F.pmod(F.hash(*[F.col(c) for c in (salt_cols or df.columns)]), F.lit(n_salts)),
    )
    return (
        salted.groupBy(key, "_salt")
        .agg(*partial_exprs)
        .groupBy(key)
        .agg(*final_exprs)
    )
