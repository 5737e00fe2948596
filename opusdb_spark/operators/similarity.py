"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k — the exact baseline. Feature-parallel
    (posexplode + keyed agg) with exact-decimal dot products so scores
    hash-match a SQL oracle bit-for-bit.
  - LSH-bucketed ANN — the 100 TB path: random-hyperplane signatures
    bucket the vectors; candidates come only from the probe's bucket
    (+ multiprobe neighbors), turning全-scan scoring into a bucket scan.

No driver-side loops: the probe vector stays a 1-row DataFrame that
gets broadcast, never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC12 = "decimal(27,12)"


def _flat(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, i, x): one row per vector component, 1-based position."""
    return df.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("pos", "xf"),
    ).select(
        id_col, (F.col("pos") + 1).alias("i"), F.col("xf").cast("double").alias("x")
    )


def cosine_topk(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors of `probe_id` (excluded from results).

    Dot products and norms are exact decimal sums over per-component
    double products → deterministic under any partitioning (and equal to
    the DuckDB oracle's identical formulation).
    """
    flat = _flat(emb, id_col, vec_col)
    probe = flat.filter(F.col(id_col) == probe_id).select(
        "i", F.col("x").alias("p")
    )
    probe_norm = probe.agg(
        F.sum((F.col("p") * F.col("p")).cast(DEC12)).cast("double").alias("np")
    )
    scored = (
        flat.filter(F.col(id_col) != probe_id)
        .join(F.broadcast(probe), "i")
        .groupBy(id_col)
        .agg(
            F.sum((F.col("x") * F.col("p")).cast(DEC12)).cast("double").alias("dot"),
            F.sum((F.col("x") * F.col("x")).cast(DEC12)).cast("double").alias("nx"),
        )
        .crossJoin(F.broadcast(probe_norm))
        .select(
            id_col,
            (F.col("dot") / F.sqrt(F.col("nx") * F.col("np"))).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


# OR-amplified random-hyperplane LSH: L independent tables of b bits.
# Collision probability per table is (1 - θ/π)^b; over L tables the
# near neighbors almost surely collide somewhere while the scored
# candidate set stays a small fraction of the data. At 100 TB, raise
# BITS_PER_TABLE (finer buckets) and write the table partitioned by
# (table_id, bucket); these defaults suit the small test corpus.
N_TABLES = 8
BITS_PER_TABLE = 4


def _plane_sign(i, plane: int) -> F.Column:
    """Deterministic ±1 weight of component i under hyperplane `plane`
    (derived from hash — no stored model, identical across runs)."""
    return F.when(F.pmod(F.hash(i, F.lit(plane)), F.lit(2)) == 0, 1.0).otherwise(-1.0)


def _table_signature(vec_col: str, table_id: int) -> F.Column:
    """b-bit signature of a vector under table `table_id`'s planes."""
    def weighted(plane: int):
        # closure (not a default arg): pyspark derives lambda arity from
        # the signature, so extra params break higher-order functions
        return lambda x, i: x.cast("double") * _plane_sign(i, plane)

    sig = F.lit(0).cast("long")
    for b in range(BITS_PER_TABLE):
        plane = table_id * BITS_PER_TABLE + b
        proj = F.aggregate(
            F.transform(F.col(vec_col), weighted(plane)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseXOR(
            F.shiftleft(F.when(proj > 0, F.lit(1).cast("long")).otherwise(0), b)
        )
    return sig


def _bucketed(df: DataFrame, vec_col: str) -> DataFrame:
    """Explode each vector to its L (table_id, bucket) rows."""
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        _table_signature(vec_col, t).alias("bucket"),
                    )
                    for t in range(N_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("*", "tb.table_id", "tb.bucket").drop("tb")


def lsh_topk(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only vectors colliding with the probe in ≥1 of
    the L hash tables — candidate generation is an equi-join on
    (table_id, bucket), never a full scan of scored pairs."""
    bucketed = _bucketed(emb, vec_col)
    probe_buckets = bucketed.filter(F.col(id_col) == probe_id).select(
        "table_id", "bucket"
    )
    candidate_ids = (
        bucketed.join(F.broadcast(probe_buckets), ["table_id", "bucket"], "left_semi")
        .select(id_col)
        .distinct()
    )
    candidates = emb.join(candidate_ids, id_col, "left_semi")
    return cosine_topk(candidates, probe_id, k, id_col, vec_col)
