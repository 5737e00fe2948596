"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k — the exact baseline. Feature-parallel
    (posexplode + keyed agg) with exact-decimal dot products so scores
    hash-match a SQL oracle bit-for-bit.
  - LSH-bucketed ANN — the 100 TB path: random-hyperplane signatures
    bucket the vectors; candidates come only from the probe's exact
    (table_id, bucket) matches across L tables (OR-amplification
    supplies the recall; no multiprobe of neighboring buckets is
    implemented), turning full-scan scoring into a bucket scan.

No driver-side loops: the probe vector stays a 1-row DataFrame that
gets broadcast, never collected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC12 = "decimal(27,12)"


def _flat(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, i, x): one row per vector component, 1-based position.
    spread() first: the explode is a dim× per-row fan-out feeding
    compute-dense consumers, and the embeddings table is small on disk
    — a single-split scan would serialize everything downstream on one
    core (no-op at cluster scale — see skew.spread)."""
    from opusdb_spark.operators.skew import spread

    return spread(df).select(
        F.col(id_col),
        F.posexplode(vec_col).alias("pos", "xf"),
    ).select(
        id_col, (F.col("pos") + 1).alias("i"), F.col("xf").cast("double").alias("x")
    )


def _dec_fold(products: F.Column) -> F.Column:
    """Exact left-fold decimal sum of an array of doubles, as double.

    Decimal addition is associative and exact, so the fold equals the
    order-independent SUM(CAST(.. AS DECIMAL)) the SQL oracle computes
    — per-element cast first, identical rounding to the grouped-sum
    formulation this replaces."""
    # accumulator is (37,12), NOT (38,12): a (38,12)+(27,12) add hits
    # the 38-precision cap and Spark sheds a scale digit (result
    # (38,11)), silently rounding EVERY step at 1e-11; (37,12)+(27,12)
    # yields (38,12) at full scale, and the cast back to (37,12) is an
    # identity for any sum below 1e25
    return F.aggregate(
        products,
        F.lit("0").cast("decimal(37,12)"),
        lambda acc, v: (acc + v.cast(DEC12)).cast("decimal(37,12)"),
    ).cast("double")


def cosine_topk(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefilter: int = 100,
) -> DataFrame:
    """Exact cosine top-k neighbors of `probe_id` (excluded from results).

    Shuffle-free two-phase formulation: the probe's single row (with
    its norm pre-folded ONCE — r3 evaluated it per candidate row) is
    broadcast, and every candidate computes an APPROXIMATE cosine with
    plain double folds (whole-stage-codegen arithmetic); the top
    `max(prefilter, 10k)` by approximate score — TakeOrderedAndProject,
    partition-local heads only — are exactly re-scored with decimal
    folds and the final top-k ordered on the exact value. The exact
    phase runs on a candidate-sized input, so the corpus pass never
    pays BigDecimal arithmetic: measured sf0.1 A/B (2,000×64-dim):
    3-fold decimal scan 1.11s → probe-norm hoist 0.80s → two-phase
    0.61s, bit-identical results.

    Why the prefilter is safe: float32 component products are EXACT in
    double (24+24 < 53 mantissa bits), so the approximate sum differs
    from the decimal sum only by double-summation rounding and the
    oracle's per-element 1e-12 quantization — |approx − exact| ≤ ~1e-10
    for 64 dims. A true top-k member can only be cut if ≥ prefilter−k
    candidates score within that margin of the kth cosine; the 10×
    overfetch makes the required near-tie pile-up unreachable for real
    embeddings (exact duplicates rank identically in both phases and
    share the id tie-break). Dot products and norms in the exact phase
    are decimal sums over per-component double products → deterministic
    under any partitioning (and equal to the DuckDB oracle's
    formulation)."""
    probe = emb.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("_pvec")
    )
    probe = probe.select(
        "_pvec",
        _dec_fold(
            F.transform("_pvec", lambda b: b.cast("double") * b.cast("double"))
        ).alias("_np"),
    )
    scored = emb.filter(F.col(id_col) != probe_id).crossJoin(
        F.broadcast(probe)
    )
    fdot = F.aggregate(
        F.zip_with(
            vec_col, "_pvec", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    fnx = F.aggregate(
        F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # zero-norm vectors (failed encodes are often zero-filled in real
    # embedding dumps) have no defined cosine: the conditional makes the
    # division row-lazy (no ANSI 0/0 abort) and the NULLs are dropped
    approx = F.when(
        (fnx > 0) & (F.col("_np") > 0), fdot / F.sqrt(fnx * F.col("_np"))
    )
    cand = (
        scored.select(id_col, vec_col, "_pvec", "_np", approx.alias("_ac"))
        .filter(F.col("_ac").isNotNull())
        .orderBy(F.desc("_ac"), F.asc(id_col))
        .limit(max(prefilter, 10 * k))
    )
    dot = _dec_fold(
        F.zip_with(
            vec_col, "_pvec", lambda a, b: a.cast("double") * b.cast("double")
        )
    )
    nx = _dec_fold(
        F.transform(vec_col, lambda a: a.cast("double") * a.cast("double"))
    )
    cosine = F.when(
        (nx > 0) & (F.col("_np") > 0), dot / F.sqrt(nx * F.col("_np"))
    )
    return (
        cand.select(id_col, cosine.alias("cosine"))
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# OR-amplified random-hyperplane LSH: L independent tables of b bits.
# Collision probability per table is (1 - θ/π)^b; over L tables the
# near neighbors almost surely collide somewhere while the scored
# candidate set stays a small fraction of the data.
N_TABLES = 8
BITS_PER_TABLE = 4  # small-corpus floor; builds scale bits with n


def adaptive_bits_per_table(n_vectors: int) -> int:
    """Bits per table scaled so the EXPECTED bucket holds ~125 vectors.

    With fixed bits, bucket population grows linearly with the corpus
    and every bucket-join (near-dup pairing, probe scoring) grows as
    Σ bucket² — the r7 bench corpus (20k vectors, 4 bits → 128 buckets
    total) produced 82M candidate pairs, 41% of ALL pairs, i.e. the
    index had stopped indexing. ceil(log2(n/125)) keeps Σ bucket²
    linear in n at any scale; the floor keeps the small test corpora
    (≤2k vectors) on the long-verified 4-bit layout."""
    import math

    return max(
        BITS_PER_TABLE, math.ceil(math.log2(max(n_vectors, 1) / 125))
    )


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


def lsh_plane_matrix(
    dim: int, bits_per_table: int = BITS_PER_TABLE
) -> "np.ndarray":
    """±1 hyperplane matrix (N_TABLES*bits_per_table × dim) from a
    fixed-seed RNG — the stored-model analog of the hash-derived signs
    (same role as the IVF centroids: deterministic, model-sized,
    shareable between the distributed build and a driver-side probe).
    Row-major generation makes smaller-bit matrices a PREFIX of larger
    ones, so the default-bit matrix is unchanged by the adaptive-bit
    feature."""
    import numpy as np

    rng = np.random.RandomState(20240817)
    return (
        rng.randint(0, 2, (N_TABLES * bits_per_table, dim)) * 2 - 1
    ).astype(np.float64)


def lsh_buckets_np(
    X: "np.ndarray", bits_per_table: int = BITS_PER_TABLE
) -> "np.ndarray":
    """(n, dim) float matrix → (n, N_TABLES) int64 bucket ids via one
    matmul against the plane matrix — the vectorized signature kernel
    shared by the index build (Arrow batches) and driver-side probes.
    `bits_per_table` MUST match the index build's (stored in its
    marker.json) or probe buckets won't match stored ones.
    """
    import numpy as np

    W = lsh_plane_matrix(X.shape[1], bits_per_table)
    bits = (X @ W.T) > 0  # (n, N_TABLES*bits_per_table)
    out = np.zeros((X.shape[0], N_TABLES), dtype=np.int64)
    for t in range(N_TABLES):
        for b in range(bits_per_table):
            out[:, t] |= bits[:, t * bits_per_table + b].astype(np.int64) << b
    return out


def lsh_signatures_arrow(vec_col: str, bits_per_table: int = BITS_PER_TABLE):
    """pandas_udf: embedding array → array<long> of N_TABLES bucket
    ids. One numpy matmul per Arrow batch — the fast path for the
    corpus-wide index build (the interpreted higher-order-function
    expression tree costs ~2s per evaluation regardless of row count;
    same Arrow-vs-HOF trade the MinHash signatures measured at ~7×)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def sig_udf(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        B = lsh_buckets_np(X, bits_per_table)
        return pd.Series(list(B))

    return sig_udf(vec_col)


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


# ----------------------------------------------------------------- IVF
# Inverted-file ANN: a coarse k-means quantizer partitions vectors into
# cells; a probe scores only the vectors in its n_probe nearest cells.
# Centroids are driver-side model state (n_cells × dim floats — tiny,
# like any k-means model); vector assignment is a vectorized Arrow UDF
# map. At 100 TB the assigned table is written partitioned by cell, so
# a probe reads n_probe/n_cells of the data and the cell scan is a
# partition-pruned parquet read.

N_CELLS = 16
N_PROBE = 4


def _assign_udf(centroids: np.ndarray, n: int = 1):
    """Arrow UDF: per vector, the n nearest centroid ids by cosine
    (array<int>, nearest first). Centroids ship in the closure."""
    cn = centroids / (np.linalg.norm(centroids, axis=1, keepdims=True) + 1e-12)

    @F.pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        if not len(vecs):  # np.stack([]) raises on empty Arrow batches
            return pd.Series([], dtype=object)
        v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        vn = v / (np.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
        sims = vn @ cn.T
        order = np.argsort(-sims, axis=1)[:, :n].astype("int32")
        return pd.Series(list(order))

    return assign


def ivf_centroids(
    emb: DataFrame,
    n_cells: int = N_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train the coarse quantizer: deterministic pseudo-random seed pick
    (hash-ordered, so the same corpus always yields the same model) plus
    one distributed Lloyd step (assign → per-cell mean via posexplode +
    avg — exact, partitioning-independent)."""
    from opusdb_spark.operators.skew import spread

    emb = spread(emb)  # dim× fan-out; see skew.spread
    seeds = (
        emb.select(id_col, vec_col)
        .orderBy(F.pmod(F.hash(F.col(id_col)), F.lit(997)).asc(), F.col(id_col).asc())
        .limit(n_cells)
        .collect()
    )
    cents = np.array([list(r[1]) for r in seeds], dtype=np.float64)
    assigned = emb.select(
        vec_col, _assign_udf(cents, 1)(vec_col)[0].alias("cell")
    )
    # decimal-summed mean: double partial-sum order varies with
    # partitioning, and the model must be identical however the input
    # was split (the determinism the cache in queries/llm.py relies on)
    means = (
        assigned.select("cell", F.posexplode(vec_col).alias("dim", "xf"))
        .groupBy("cell", "dim")
        .agg(
            (
                F.sum(F.col("xf").cast("decimal(27,12)")) / F.count(F.lit(1))
            ).cast("double").alias("m")
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .collect()
    )
    for r in means:
        cents[r["cell"]] = [d["m"] for d in r["dm"]]
    return cents


def ivf_topk(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """ANN top-k via IVF: exact cosine over only the probe's n_probe
    nearest cells. The probe's cell list is a 1-row broadcast (the
    probe vector itself is never collected). Pass `centroids` to reuse
    a trained quantizer — the normal production shape, where one index
    serves every probe."""
    cents = centroids if centroids is not None else ivf_centroids(
        emb, n_cells, id_col, vec_col
    )
    assigned = emb.select(
        id_col, vec_col, _assign_udf(cents, 1)(vec_col)[0].alias("cell")
    )
    probe_cells = (
        emb.filter(F.col(id_col) == probe_id)
        .select(F.explode(_assign_udf(cents, n_probe)(vec_col)).alias("cell"))
    )
    candidates = assigned.join(F.broadcast(probe_cells), "cell", "left_semi").drop(
        "cell"
    )
    return cosine_topk(candidates, probe_id, k, id_col, vec_col)


def cosine_topk_batch(
    emb: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for a MODEL-SIZED probe set in ONE corpus
    pass: the flattened probe components (|probes| × dim rows)
    broadcast against the corpus, scores aggregate per (probe, vector),
    and a per-probe group-limit window takes each top-k — the ground
    truth an ANN recall evaluation compares against. Same exact-decimal
    dot products as cosine_topk, so scores are order-independent."""
    from pyspark.sql import Window

    flat = _flat(emb, id_col, vec_col)
    probe = flat.filter(F.col(id_col).isin(list(probe_ids))).select(
        F.col(id_col).alias("probe_id"), "i", F.col("x").alias("p")
    )
    pnorm = probe.groupBy("probe_id").agg(
        F.sum((F.col("p") * F.col("p")).cast(DEC12)).cast("double").alias("np")
    )
    scored = (
        flat.join(F.broadcast(probe), "i")
        .filter(F.col(id_col) != F.col("probe_id"))
        .groupBy("probe_id", id_col)
        .agg(
            F.sum((F.col("x") * F.col("p")).cast(DEC12)).cast("double").alias("dot"),
            F.sum((F.col("x") * F.col("x")).cast(DEC12)).cast("double").alias("nx"),
        )
        .join(F.broadcast(pnorm), "probe_id")
        .select(
            "probe_id",
            id_col,
            # same zero-norm guard as cosine_topk: row-lazy conditional
            # division, NULL (dropped) where cosine is undefined
            F.when(
                (F.col("nx") > 0) & (F.col("np") > 0),
                F.col("dot") / F.sqrt(F.col("nx") * F.col("np")),
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def semdedup_drops(
    emb: DataFrame,
    tau: float,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup: within each cluster, a vector is
    DROPPED when a lower-id vector in the same cluster has cosine
    similarity > tau. Returns one row per dropped vector with its
    smallest qualifying duplicate and that pair's exact cosine —
    (cluster, vec_id, dup_of, cosine).

    Scale shape (the whole point of clustering first): candidate pairs
    are generated per cluster, so the pairwise cost is sum(|cluster|^2),
    never O(n^2) over the corpus — at 100 TB the quantizer (emb_kmeans /
    ivf_centroids) caps cluster sizes and the corpus shuffles ONCE on
    the cluster key. Candidate generation is an Arrow kernel
    (applyInPandas, one float64 X @ X.T per cluster batch — the same
    matmul path as ann_index; measured warm at sf0.1: 1.5s vs 11.5s
    for per-pair zip_with folds) with a tau − 1e-6 acceptance margin:
    numpy-vs-
    decimal summation error is ~1e-10 for 64 dims, so no true hit can
    fall below the margin. Candidates carry their two vectors out of
    the kernel, and only this hit-sized set pays the exact decimal
    rescore that makes the result hash-stable against the SQL oracle —
    no corpus re-join, no BigDecimal on the full pair set."""
    import pandas as pd

    id_f = emb.schema[id_col].dataType.simpleString()
    c_f = emb.schema[cluster_col].dataType.simpleString()
    v_f = emb.schema[vec_col].dataType.simpleString()
    out_schema = (
        f"{cluster_col} {c_f}, {id_col} {id_f}, dup_of {id_f}, "
        f"_va {v_f}, _vb {v_f}"
    )
    # The carried-out vectors must round-trip the DECLARED element type:
    # a hard-coded float32 downcast under an array<double> schema would
    # silently lose the bits the exact decimal rescore depends on.
    vec_np_dtype = np.float32 if v_f == "array<float>" else np.float64
    margin = tau - 1e-6

    def cluster_pairs(key, pdf):
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        n = np.sqrt((X * X).sum(axis=1))
        ok = n > 0  # zero-norm vectors have no defined cosine
        ids, X, n = ids[ok], X[ok], n[ok]
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    cluster_col: [],
                    id_col: [],
                    "dup_of": [],
                    "_va": [],
                    "_vb": [],
                }
            )
        S = (X @ X.T) / np.outer(n, n)
        ai, bi = np.nonzero(np.triu(S > margin, k=1))  # ids sorted: a < b
        return pd.DataFrame(
            {
                cluster_col: np.full(len(ai), key[0]),
                id_col: ids[bi],
                "dup_of": ids[ai],
                "_va": [X[i].astype(vec_np_dtype) for i in ai],
                "_vb": [X[i].astype(vec_np_dtype) for i in bi],
            }
        )

    cand = emb.select(cluster_col, id_col, vec_col).groupBy(
        cluster_col
    ).applyInPandas(cluster_pairs, out_schema)
    dot = _dec_fold(
        F.zip_with(
            "_va", "_vb", lambda x, y: x.cast("double") * y.cast("double")
        )
    )
    n2a = _dec_fold(
        F.transform("_va", lambda x: x.cast("double") * x.cast("double"))
    )
    n2b = _dec_fold(
        F.transform("_vb", lambda x: x.cast("double") * x.cast("double"))
    )
    hits = cand.select(
        cluster_col,
        id_col,
        "dup_of",
        (dot / F.sqrt(n2a * n2b)).alias("cosine"),
    ).filter(F.col("cosine") > tau)
    return (
        hits.groupBy(cluster_col, id_col)
        .agg(F.min(F.struct("dup_of", "cosine")).alias("_best"))
        .select(
            cluster_col,
            id_col,
            F.col("_best.dup_of").alias("dup_of"),
            F.col("_best.cosine").alias("cosine"),
        )
        .orderBy(cluster_col, id_col)
    )


def kmeans_seed_order_sql(id_sql: str) -> str:
    """ENGINE-PORTABLE seed ordering key for k-means initialization:
    the md5-bit word hash of the id (operators/text.py construction).
    Replaces the r1-era `F.hash` (Spark-private Murmur3) seeding so a
    second engine can derive the SAME k seeds — the change that made
    emb_kmeans hash-oracle-able in r10."""
    from opusdb_spark.operators.text import word_hash48_sql

    return word_hash48_sql(f"CAST({id_sql} AS STRING)", salt="km:")


def kmeans_inertia(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, float, int]]:
    """Classic Lloyd k-means for `iters` iterations, returning the
    model-sized convergence trace [(iteration, inertia, n_moved_cells)].
    Per iteration ONE distributed pass: assignment is a whole-stage-
    codegen fold — per vector, k sequential left-fold Σ(a−b)² distances
    against centroid LITERALS, argmin via array_min over (sqd, cell)
    structs (ties → lowest cell) — then posexplode into a single
    groupBy(cell,dim) carrying BOTH the per-dim decimal mean and the
    per-cell decimal inertia share (riding the dim0 == 0 rows).
    Everything collected is O(k × dim) — the model — never data.
    Squared-Euclidean + mean update makes inertia provably
    non-increasing, which the tests pin.

    Replayable by construction (r10, previously rows-only): seeds
    order by the portable md5 hash (kmeans_seed_order_sql), distances
    are SEQUENTIAL left folds (DuckDB list_reduce replays them bitwise
    — premise pinned in tests/test_properties.py), means are exact
    decimal sums cast to double then divided as doubles, and the
    inertia total is an exact decimal sum converted once — so a second
    engine stepping the same recurrence reproduces every centroid,
    assignment, and trace row (see queries/llm.py _kmeans_oracle)."""
    import decimal

    from opusdb_spark.operators.skew import spread

    emb = spread(emb)  # dim× fan-out per iteration; see skew.spread
    seeds = (
        emb.select(id_col, vec_col)
        .orderBy(
            F.expr(kmeans_seed_order_sql(id_col)).asc(),
            F.col(id_col).asc(),
        )
        .limit(k)
        .collect()
    )
    cents = [[float(x) for x in r[1]] for r in seeds]
    trace: list[tuple[int, float, int]] = []
    for it in range(iters):
        d2s = [
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(v) for v in c]),
                    lambda a, b: (a.cast("double") - b)
                    * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in cents
        ]
        best = F.array_min(
            F.array(
                *[
                    F.struct(d2.alias("sqd"), F.lit(ci).alias("cell"))
                    for ci, d2 in enumerate(d2s)
                ]
            )
        )
        assigned = emb.select(
            vec_col,
            best.getField("cell").alias("cell"),
            best.getField("sqd").alias("sqd"),
        )
        flat = assigned.select(
            "cell", "sqd", F.posexplode(vec_col).alias("dim0", "x")
        )
        rows = (
            flat.groupBy("cell", "dim0")
            .agg(
                (
                    # float → DOUBLE → decimal: casting the float
                    # straight to decimal would round its SHORTEST
                    # string form, which a double-side replay cannot
                    # reproduce (same trap _flat guards against)
                    F.sum(F.col("x").cast("double").cast("decimal(27,12)"))
                    .cast("double")
                    / F.count(F.lit(1))
                ).alias("m"),
                F.sum(
                    F.when(F.col("dim0") == 0, F.col("sqd"))
                    .otherwise(0.0)
                    .cast("decimal(27,12)")
                ).alias("inertia_part"),
            )
            .collect()
        )
        # exact decimal total (order-independent), ONE conversion to
        # double — a Python float sum over collect() row order would
        # be nondeterministic in its last bits
        inertia = float(
            sum(
                (r["inertia_part"] for r in rows),
                decimal.Decimal(0),
            )
        )
        new_cents = [list(c) for c in cents]
        for r in rows:
            new_cents[r["cell"]][r["dim0"]] = float(r["m"])
        n_moved = sum(1 for c in range(k) if new_cents[c] != cents[c])
        trace.append((it, inertia, n_moved))
        cents = new_cents
    return trace


def mahalanobis_fixedpoint_udf(
    mu: "np.ndarray", pq: "np.ndarray", d_scale: float, divisor: float
):
    """Arrow UDF: vector → √((x−μ)ᵀ P (x−μ)) on fixed-point grids,
    rounded 6dp. The mean and QUANTIZED precision matrix (int64, the
    persisted model — see llm.py _ensure_maha_model) ship in the
    closure; scoring is two int64 matmuls per Arrow batch whose every
    product and partial sum is an exact integer — replayable
    bit-for-bit by a second engine (the float einsum this replaced
    was BLAS-order-dependent and could never hash-match). Bounds
    asserted: |d|·d_scale < 2^13 and |pq| < 2^27 keep the row sums
    under 2^62."""

    @F.pandas_udf("double")
    def maha(vecs: pd.Series) -> pd.Series:
        if not len(vecs):  # np.stack([]) raises on empty Arrow batches
            return pd.Series([], dtype=float)
        D = np.stack([np.asarray(v, dtype=np.float64) for v in vecs]) - mu
        assert np.abs(D).max() < 0.75, "difference exceeds the int64 grid bound"
        Dq = np.floor(D * d_scale + 0.5).astype(np.int64)
        Y = Dq @ pq  # exact: |entry| ≤ 64·2^13·2^27 < 2^46
        s = (Dq * Y).sum(axis=1)  # exact: ≤ 64·2^13·2^46 < 2^62
        v = np.sqrt(np.maximum(s, 0).astype(np.float64) / divisor)
        return pd.Series(np.floor(v * 1e6 + 0.5) / 1e6)  # ROUND kernel

    return maha


def mmr_select(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pool_n: int = 1024,
) -> DataFrame:
    """Greedy Maximal Marginal Relevance: iteratively pick the vector
    maximizing  lam * rel(v) − (1 − lam) * max_sim(v, selected),
    where rel is cosine to the probe — the diversity-aware selection
    used for dedup-aware retrieval and diverse few-shot/eval-set
    picking (Carbonell & Goldstein 1998).

    Scale shape (pool-restricted since r10): ONE corpus pass computes
    rel for every candidate (double left-folds, whole-stage codegen),
    then TakeOrderedAndProject keeps the top `pool_n` candidates by
    (rel DESC, id ASC) — partition-local heads, no global sort, no
    corpus materialization. The k greedy rounds then run over the
    pool only, which is model-sized by construction (pool_n × dim
    doubles ≈ 0.5 MB), so the iterative phase costs zero corpus scans
    and zero corpus-sized cache writes — the r9 shape (k corpus
    arg-max passes + k corpus-wide persist rewrites) priced at 75 s /
    ratio 7.8 in the 100× probe and could never persist a 100 TB
    corpus k times.

    The pool restriction is an APPROXIMATION (the standard MMR-at-
    scale trade, not a preserved-selection guarantee — ADVICE r10): an
    out-of-pool vector's score is lam·rel − (1−lam)·penalty with a
    clamped-non-negative penalty, so it is bounded by lam·rel_boundary
    and CAN exceed an in-pool candidate's score when every pool member
    carries a large diversity penalty (near-duplicate pools). The
    per-round objective regret is bounded by (1−lam)·max_pool_penalty
    ≤ (1−lam): the pool's boundary member scores at least
    lam·rel_boundary − (1−lam)·penalty, and no outsider can exceed
    lam·rel_boundary. Both regimes are pinned in tests/
    test_operators.py: pick-for-pick agreement with full-corpus numpy
    greedy on the sf corpus and on a seeded corpus > pool_n (with a
    per-round certificate check: picked_score ≥ lam·rel_boundary
    PROVES the round matches unrestricted greedy), and an adversarial
    near-duplicate corpus where divergence is demonstrated and its
    regret asserted within the bound.

    Exactness: the in-pool rounds run driver-side with SEQUENTIAL
    left-fold double sums starting at 0.0 — the same fold F.aggregate
    performs and the same fold DuckDB's list_reduce performs
    (premise property-pinned in tests/test_properties.py), so the
    DuckDB oracle replays every cosine, every running max, and every
    arg-max tie-break (score DESC, id ASC, IEEE ==) bit-for-bit."""
    import math

    from opusdb_spark.operators.skew import spread

    emb = spread(emb)  # HOF cosine fan-out on a small-on-disk table
    probe = emb.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("_pvec")
    )
    fdot = F.aggregate(
        F.zip_with(
            vec_col, "_pvec", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    fnx = F.aggregate(
        F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    probe = probe.select(
        "_pvec",
        F.aggregate(
            F.transform("_pvec", lambda b: b.cast("double") * b.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("_np"),
    )
    rel = F.when(
        (fnx > 0) & (F.col("_np") > 0), fdot / F.sqrt(fnx * F.col("_np"))
    )
    pool_rows = (
        emb.filter(F.col(id_col) != probe_id)
        .crossJoin(F.broadcast(probe))
        .select(
            id_col,
            vec_col,
            fnx.alias("_nx"),
            rel.alias("_rel"),
        )
        .filter(F.col("_rel").isNotNull())
        # TakeOrderedAndProject: partition-local top-pool_n heads, one
        # pool-sized driver result — the ONLY corpus-shaped work
        .orderBy(F.desc("_rel"), F.asc(id_col))
        .limit(pool_n)
        .collect()
    )
    # pool state: [id, vec(list[float]), nx, rel, maxsim]
    pool = [
        [r[id_col], [float(x) for x in r[vec_col]], float(r["_nx"]),
         float(r["_rel"]), 0.0]
        for r in pool_rows
    ]
    picks = []
    for rank in range(min(k, len(pool_rows))):
        best = None
        best_score = None
        for c in pool:
            s = c[3] * lam - c[4] * (1.0 - lam)
            if (
                best is None
                or s > best_score
                or (s == best_score and c[0] < best[0])
            ):
                best, best_score = c, s
        if best is None:
            break
        picks.append((rank + 1, best[0], float(best_score)))
        sel_vec, sel_id = best[1], best[0]
        sn = 0.0
        for x in sel_vec:  # sequential left fold, matches list_reduce
            sn += x * x
        pool = [c for c in pool if c[0] != sel_id]
        for c in pool:
            sdot = 0.0
            for a, b in zip(c[1], sel_vec):
                sdot += a * b
            sim = (
                sdot / math.sqrt(c[2] * sn)
                if (c[2] > 0 and sn > 0)
                else 0.0
            )
            if sim > c[4]:
                c[4] = sim
    spark = emb.sparkSession
    return spark.createDataFrame(
        picks, f"rank int, {id_col} long, mmr_score double"
    )


def hard_negatives(
    emb: DataFrame,
    probe_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe,
    the k most cosine-similar vectors with a DIFFERENT label — similar
    enough to be hard, labeled differently so they are negatives.

    Same one-corpus-pass shape as cosine_topk_batch (model-sized probe
    components broadcast, exact decimal dots, per-probe group-limit
    window); the label rides in the flatten projection (no corpus
    self-join) and the candidate norm folds inside the SAME
    per-(probe, candidate) aggregate as the dot product, so the whole
    scoring costs one shuffle. The label filter applies BEFORE the
    top-k so negatives are never crowded out by same-label
    neighbors."""
    from pyspark.sql import Window

    from opusdb_spark.operators.skew import spread

    emb = spread(emb)
    flat = emb.select(
        id_col, label_col, F.posexplode(vec_col).alias("pos", "xf")
    ).select(
        id_col,
        label_col,
        (F.col("pos") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )
    probe = flat.filter(F.col(id_col).isin(list(probe_ids))).select(
        F.col(id_col).alias("probe_id"),
        F.col(label_col).alias("_plabel"),
        "i",
        F.col("x").alias("p"),
    )
    pn = probe.groupBy("probe_id").agg(
        F.sum((F.col("p") * F.col("p")).cast(DEC12))
        .cast("double")
        .alias("np")
    )
    scored = (
        flat.join(F.broadcast(probe), "i")
        .filter(
            (F.col(id_col) != F.col("probe_id"))
            & (F.col(label_col) != F.col("_plabel"))
        )
        .groupBy("probe_id", id_col, label_col)
        .agg(
            F.sum((F.col("x") * F.col("p")).cast(DEC12))
            .cast("double")
            .alias("dot"),
            F.sum((F.col("x") * F.col("x")).cast(DEC12))
            .cast("double")
            .alias("n2"),
        )
    )
    sims = (
        scored.join(F.broadcast(pn), "probe_id")
        .filter((F.col("n2") > 0) & (F.col("np") > 0))
        .select(
            "probe_id",
            id_col,
            label_col,
            (F.col("dot") / F.sqrt(F.col("n2") * F.col("np"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "rank",
            F.col(id_col).alias("negative_id"),
            F.col(label_col).alias("negative_label"),
            "cosine",
        )
        .orderBy("probe_id", "rank")
    )
