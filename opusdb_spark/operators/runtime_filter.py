"""Explicit bloom-filter join pruning (semi-join reduction).

The classic 100 TB join shape: a petabyte fact table joined to a
selectively-filtered dimension. The shuffle join is correct but moves
every fact row; the scale win is discarding fact rows that CANNOT match
*before* the shuffle, with a compact filter built from the dimension's
surviving keys. Spark's optimizer injects this itself (`spark.sql.
optimizer.runtime.bloomFilter.*`) but only past a 10 GB application-side
scan heuristic and via internal expressions (`bloom_filter_agg` is not
SQL-registered, so the shape can't be requested explicitly). This module
composes the identical plan from public primitives, so the reduction is
declarative, always available, and visible in the physical plan:

  build:  explode each dim key into k probe-bit positions
          (xxhash64(key, seed) mod m) → bit_or per 64-bit word →
          zero-filled dense `array<long>` in ONE row. Every step is a
          map-side-combinable aggregate; the filter itself is
          MODEL-SIZED by construction (bits ∝ |filtered dim|, i.e. the
          side that is small by assumption — the same size-class
          exception as IVF centroids / NTILE split points, but without
          any driver collect: the array never leaves the cluster).
  apply:  broadcast the one-row array to the fact side and keep rows
          where all k probe bits are set — pure codegen bit arithmetic
          (element_at + shiftleft + bitwiseAND), no UDF, no shuffle.

False positives pass extra rows into the exact join that follows and
are dropped there — results are IDENTICAL to the plain join for any
(m, k), which is what the DuckDB oracle (a plain join) pins. False
negatives are impossible: a key present in the dimension sets exactly
the bits its probes test. Only join types that never null-extend the
fact side are legal (inner/semi — same restriction as skew.salted_join,
and for the same reason: pruning drops fact rows that a left join would
have to keep as null-extended output).

Reference anchor: the reference's only join-shaped access is deref over
the page table (stm.clj:31-41) — there is no semi-join reduction to
mirror; this operator exists for the 100 TB mandate's fact-dim joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ~16 bits/key at k=4 gives ~0.24% false positives — at that rate the
# post-join cost of survivors is noise next to the shuffle avoided.
DEFAULT_BITS_PER_KEY = 16
DEFAULT_HASHES = 4
_MIN_BITS = 1024


def _probe_bit(key: Column, seed: int, m_bits: int) -> Column:
    """Bit position of probe `seed` for `key` — shared by build and
    apply so both sides hash identically. The key is hashed through a
    STRING cast because xxhash64 is type-sensitive (an INT 5 and a
    BIGINT 5 hash differently): a fact/dim key-type mismatch would
    otherwise flip every probe into a false NEGATIVE and silently empty
    the join — the one failure mode this module promises cannot
    happen. The cast is canonical for integral/string keys (the only
    sensible join-key types; floats/decimals should be keyed
    deliberately by the caller)."""
    return F.pmod(
        F.xxhash64(key.cast("string"), F.lit(seed)), F.lit(m_bits)
    )


def bloom_build(
    dim_keys: DataFrame, key: str, m_bits: int, k: int = DEFAULT_HASHES
) -> DataFrame:
    """ONE-row DataFrame {__rtf_bf: array<long>} — the dense
    m_bits-wide filter over `dim_keys[key]`, built without any driver
    collect. The working columns here and in `bloom_prune` carry a
    `__rtf_` prefix so a fact table that itself has a `bf`/`_h0` column
    can't produce an ambiguous-reference error (or silent shadowing)
    at apply time."""
    m_words = (m_bits + 63) // 64
    spark = dim_keys.sparkSession
    bits = dim_keys.select(
        F.explode(
            F.array(*[_probe_bit(F.col(key), s, m_bits) for s in range(k)])
        ).alias("bit")
    )
    words = (
        bits.select(
            (F.col("bit") / 64).cast("long").alias("w"),
            # F.shiftleft only takes a literal shift; the SQL form
            # accepts a column
            F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    dense = (
        spark.range(m_words)
        .withColumnRenamed("id", "w")
        .join(words, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
    )
    # ≤ m_bits/64 rows — model-sized single-row fold; array order pinned
    # by the sort on w, not by collect_list arrival order.
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda x: x["bits"],
        ).alias("__rtf_bf")
    )


def bloom_prune(
    fact: DataFrame,
    key: str,
    bloom: DataFrame,
    m_bits: int,
    k: int = DEFAULT_HASHES,
) -> DataFrame:
    """Keep only fact rows whose `key` MIGHT be in the filter — a
    broadcast of one row plus per-row codegen bit tests."""
    out = fact.crossJoin(F.broadcast(bloom))
    hs = [f"__rtf_h{s}" for s in range(k)]
    for s in range(k):
        out = out.withColumn(hs[s], _probe_bit(F.col(key), s, m_bits))
    cond = None
    for h in hs:
        c = F.expr(
            f"(element_at(__rtf_bf, CAST({h} / 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST({h} % 64 AS INT))) != 0"
        )
        cond = c if cond is None else (cond & c)
    return out.filter(cond).drop("__rtf_bf", *hs)


def bloom_semi_reduce(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    k: int = DEFAULT_HASHES,
    n_keys: int | None = None,
) -> DataFrame:
    """`fact` reduced to rows whose `fact_key` might appear in
    `dim[dim_key]`. Sizes the filter from one model-sized count of the
    (already filtered) dimension — the same stats-probe action the
    ranking split points pay. That count is a second (column-pruned)
    scan of the dim; a caller who already knows the cardinality — or
    an upper bound, which only makes the filter larger, never wrong —
    should pass `n_keys` to skip it rather than persist the dim (a
    pinned handle the caller would then own releasing)."""
    n = dim.count() if n_keys is None else n_keys
    m_bits = max(_MIN_BITS, bits_per_key * max(n, 1))
    bloom = bloom_build(dim.select(dim_key), dim_key, m_bits, k)
    return bloom_prune(fact, fact_key, bloom, m_bits, k)
