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


N_HYPERPLANES = 16


def _bucket_expr(vec_col: str) -> F.Column:
    """Random-hyperplane LSH bucket id from fixed deterministic planes.

    Plane j's component i weight is a pseudo-random ±1 derived from
    hash(i, j) — generated as expressions, identical across runs, no
    stored model needed.
    """
    bucket = F.lit(0).cast("long")
    for j in range(N_HYPERPLANES):
        proj = F.aggregate(
            F.transform(
                F.col(vec_col),
                lambda x, i: x.cast("double")
                * F.when(F.pmod(F.hash(i, F.lit(j)), F.lit(2)) == 0, 1.0).otherwise(
                    -1.0
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseXOR(
            F.shiftleft(F.when(proj > 0, F.lit(1).cast("long")).otherwise(0), j)
        )
    return bucket


def lsh_topk(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only vectors sharing the probe's LSH bucket
    (multiprobe: plus buckets at Hamming distance 1).

    At 100 TB the bucketed table is written partitioned by bucket so a
    probe touches ~1/2^16 of the data; here the bucket table is computed
    inline. Recall is approximate — rows-only checked.
    """
    bucketed = emb.withColumn("bucket", _bucket_expr(vec_col))
    probe_bucket = bucketed.filter(F.col(id_col) == probe_id).select(
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << j))
                    for j in range(N_HYPERPLANES)
                ],
            )
        ).alias("bucket")
    )
    candidates = bucketed.join(
        F.broadcast(probe_bucket), "bucket", "left_semi"
    ).filter(F.col(id_col) != probe_id)
    return cosine_topk(
        candidates.unionByName(emb.filter(F.col(id_col) == probe_id).withColumn("bucket", F.lit(0))),
        probe_id,
        k,
        id_col,
        vec_col,
    )
