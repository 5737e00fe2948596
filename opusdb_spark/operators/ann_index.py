"""Persisted ANN index: build once, probe via partition-pruned reads.

Round-1 shape recomputed LSH bucket assignment / IVF cell assignment of
the WHOLE corpus on every probe — fine at test scale, not runnable at
100 TB. This module materializes the index the way a production vector
store does:

  <index_dir>/
    marker.json      build fingerprint (source stat + hyperparams) —
                     the build is skipped when it matches (idempotent)
    centroids.json   IVF coarse-quantizer model (n_cells × dim floats)
    by_id/           (id, vec) range-partitioned + sorted by id, so a
                     probe-vector fetch by id is a min/max-stat-pruned
                     parquet read, not a full scan
    lsh/             (id, vec) partitioned by (table_id, bucket) — one
                     copy per hash table (L× storage for zero-join
                     probes; a production variant stores PQ codes)
    ivf/             (id, vec) partitioned by cell (1× storage)

Probes collect only MODEL-SIZED data driver-side (the probe vector, its
L bucket ids, its n_probe cell ids — a handful of rows), then read the
index with LITERAL predicates on the partition columns: the scan plans
show `PartitionFilters`, i.e. static partition pruning — only the
probe's buckets/cells are listed and read (pinned in tests/test_plans.py).

Scoring matches operators/similarity.cosine_topk exactly: per-row
decimal-accumulated dot products (decimal addition is associative, so
the score is identical to the groupBy-sum formulation bit-for-bit).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opusdb_spark.operators.similarity import (
    BITS_PER_TABLE,
    N_CELLS,
    N_PROBE,
    N_TABLES,
    _assign_udf,
    ivf_centroids,
    lsh_buckets_np,
    lsh_signatures_arrow,
)

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch"
)

# Product quantization (Jégou, Douze, Schmid — TPAMI 2011): PQ_M
# subspaces × PQ_KS centroids each. With KS=16 every code is 4 bits, so
# all M=8 codes PACK INTO ONE BIGINT — the pq/ store is (id, cell,
# codes) at ~16 bytes/vector vs ~256 bytes for the raw 64-dim vector.
# That 16× is the 100 TB story: a billion-vector corpus's code store
# fits in cluster page cache, so the ADC candidate scan never touches
# the raw vectors; only the final rerank reads true vectors, and only
# for `rerank` ids through the stat-pruned by_id store.
PQ_M = 8
PQ_KS = 16
_PQ_SAMPLE = 2048  # codebook training sample (model-sized collect)
_PQ_LLOYD_ITERS = 8

def index_dir_for(sf_dir: str) -> str:
    """Stable per-corpus index location (full-path hash, not basename —
    two corpora sharing a basename must not share an index)."""
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_SCRATCH, f"ann_index_{base}_{tag}")


def _parquet_num_rows(path: str) -> int:
    """Row count from parquet FOOTER metadata (file or directory) — no
    data read, no Spark job; used to size the LSH bucket space."""
    import pyarrow.parquet as pq

    from opusdb_spark.sources.formats import list_store_files

    if os.path.isdir(path):
        return sum(
            pq.read_metadata(f).num_rows
            for f, _ in list_store_files(path, recursive=False)
        )
    return pq.read_metadata(path).num_rows


def source_fingerprint(sf_dir: str) -> dict:
    """Stat-based fingerprint of the embeddings source + hyperparams.
    bits_per_table scales with the corpus (similarity.
    adaptive_bits_per_table) so bucket population — and with it every
    Σ bucket² candidate join — stays bounded as the corpus grows; the
    built value rides in the marker for probe-side signature
    evaluation."""
    from opusdb_spark.operators.similarity import adaptive_bits_per_table

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    n = _parquet_num_rows(src)
    # directory-form sources (Spark-written part files): the dir
    # inode's size/mtime miss an in-place part rewrite, so fingerprint
    # the per-part (name, size) listing too
    parts: list | None = None
    if os.path.isdir(src):
        from opusdb_spark.sources.formats import (
            list_store_files,
            stat_mtime_ns,
        )

        # lists, NOT tuples: the marker round-trips through JSON, which
        # has no tuple type — a tuple here would make json.load(marker)
        # != fingerprint on EVERY call for directory-form sources, i.e.
        # a silent full index rebuild per probe (caught by the r8 scale
        # probe: 17 s "probes" that were 14 s of rebuild writes)
        parts = [
            [os.path.basename(p), s, stat_mtime_ns(p)]
            for p, s in list_store_files(src, recursive=False)
        ]
    return {
        "source": os.path.abspath(src),
        "mtime_ns": st.st_mtime_ns,
        "size": st.st_size,
        "parts": parts,
        "n_vectors": n,
        "n_tables": N_TABLES,
        "bits_per_table": adaptive_bits_per_table(n),
        "n_cells": N_CELLS,
        # ALL the PQ knobs, not just the shape ones: codebooks trained
        # under a different sample size or Lloyd budget are different
        # models, and a stale marker would silently serve their codes
        "pq_m": PQ_M,
        "pq_ks": PQ_KS,
        "pq_sample": _PQ_SAMPLE,
        "pq_iters": _PQ_LLOYD_ITERS,
        "layout": 5,  # v5: adds the pq/ code store; bump forces rebuild
    }


def ensure_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    fingerprint: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Build the index unless an identical build already exists.

    Ingest-once / query-many: the organizing shuffles (bucket
    assignment, cell assignment, range partitioning) are paid here,
    not per probe.
    """
    marker = os.path.join(index_dir, "marker.json")
    # normalize through JSON before comparing (tuples→lists): a
    # non-JSON-stable fingerprint would otherwise never match its own
    # stored marker — a silent full rebuild per probe (r8 scale probe)
    fingerprint = json.loads(json.dumps(fingerprint))
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == fingerprint:
                    return index_dir
        except (json.JSONDecodeError, OSError):
            pass
    # Build into a staging dir and swap at the END: deleting the old
    # index first would leave NO usable index if the multi-store build
    # dies midway (and a concurrent probe would see a markerless,
    # partially-written store). The swap is two renames — the old
    # index keeps serving until the new one is complete. (read_store's
    # handle cache keys on the marker mtime, so the swap invalidates
    # stale handles automatically.)
    build_dir = index_dir + ".build"
    shutil.rmtree(build_dir, ignore_errors=True)
    os.makedirs(build_dir, exist_ok=True)
    final_dir, index_dir = index_dir, build_dir

    base = emb.select(id_col, vec_col)

    # by_id: range-partitioned + sorted so id-equality probes prune via
    # row-group min/max stats (the parquet form of a PK lookup).
    (
        base.repartitionByRange(F.col(id_col))
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "by_id"))
    )

    # lsh: one row per (vector, hash table), partitioned by bucket.
    # Bucket ids come from the Arrow/numpy signature kernel (one matmul
    # per batch) — the corpus-wide build never evaluates the
    # interpreted HOF expression tree. Each row also carries the FULL
    # signature array (`sig_all`, N_TABLES small longs — noise next to
    # the 128-double vector): a bucket-local consumer can then decide
    # cross-table questions (e.g. "is this table the pair's FIRST
    # collision?") without joining back to sigs/, which is what lets
    # the near-dup sweep emit every candidate pair exactly once and
    # aggregate it map-side instead of shuffling a pair-count-sized
    # stream to dedupe (layout v4).
    bits = int(fingerprint.get("bits_per_table", BITS_PER_TABLE))
    lsh = base.withColumn(
        "sig_all", lsh_signatures_arrow(vec_col, bits)
    ).select(
        id_col,
        vec_col,
        "sig_all",
        F.posexplode("sig_all").alias("table_id", "bucket"),
    )
    (
        # cluster by the partition key first: otherwise every write
        # task emits a file into every (table_id, bucket) directory —
        # L×2^b × n_tasks tiny files and the matching filesystem ops.
        lsh.repartition(F.col("table_id"), F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("table_id", "bucket")
        .parquet(os.path.join(index_dir, "lsh"))
    )

    # sigs: (id → table_id, bucket), range-partitioned + sorted by id.
    # A probe's bucket list is then a stat-pruned lookup of L tiny rows
    # — NOT a re-evaluation of the signature expressions, whose
    # interpreted higher-order-function tree costs ~2s per execution
    # regardless of row count. Signatures are an ingest artifact; the
    # probe path only reads. (Derived from the already-written lsh/
    # table so the expensive expressions run exactly once.)
    (
        spark.read.parquet(os.path.join(index_dir, "lsh"))
        .select(id_col, "table_id", "bucket")
        .repartitionByRange(F.col(id_col))
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "sigs"))
    )

    # ivf: train the coarse quantizer, persist the model, partition the
    # assignment by cell.
    cents = ivf_centroids(emb, N_CELLS, id_col, vec_col)
    with open(os.path.join(index_dir, "centroids.json"), "w") as f:
        json.dump(cents.tolist(), f)
    assigned = base.select(
        id_col, vec_col, _assign_udf(cents, 1)(vec_col)[0].alias("cell")
    )
    (
        # cluster by the partition key first — same tiny-files reasoning
        # as the lsh/ write above (n_cells × n_tasks files otherwise)
        assigned.repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "ivf"))
    )

    # pq: residual product-quantizer codes, partitioned by cell like
    # ivf/ but WITHOUT the raw vector — the compressed scan path.
    # Codebooks train on a deterministic hash-ordered sample of
    # residuals (model-sized collect, the Faiss convention), then one
    # Arrow encode pass packs each vector's M 4-bit codes into a BIGINT.
    # (read the assignment back from the just-written ivf/ store: the
    # assign UDF already ran once for that write — never twice)
    ivf_store = spark.read.parquet(os.path.join(index_dir, "ivf")).select(
        id_col, vec_col, "cell"
    )
    sample = (
        ivf_store.orderBy(
            F.pmod(F.hash(F.col(id_col)), F.lit(997)).asc(),
            F.col(id_col).asc(),
        )
        .limit(_PQ_SAMPLE)
        .collect()
    )
    res = np.array(
        [np.asarray(list(r[1]), dtype=np.float64) - cents[int(r[2])]
         for r in sample],
        dtype=np.float64,
    )
    codebooks = _pq_train(res)
    with open(os.path.join(index_dir, "pq_codebooks.json"), "w") as f:
        json.dump(codebooks.tolist(), f)
    (
        ivf_store.select(
            id_col,
            "cell",
            _pq_encode_udf(cents, codebooks)(vec_col, "cell").alias("codes"),
        )
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "pq"))
    )

    # marker is written INSIDE the staging dir (build-complete flag),
    # then the finished build replaces the old index
    with open(os.path.join(index_dir, "marker.json"), "w") as f:
        json.dump(fingerprint, f)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(index_dir, final_dir)
    return final_dir


_READ_CACHE: dict[tuple, "DataFrame"] = {}


def read_index_store(spark: SparkSession, index_dir: str, sub: str) -> DataFrame:
    """`spark.read.parquet` over an index sub-store, with the resolved
    DataFrame handle cached per (session, path, build). Re-reading a
    2048-directory partitioned store re-runs partition discovery at
    PLAN time — ~0.5 s of driver-side listing per read.parquet() call,
    paid by every probe — while the store itself is immutable between
    rebuilds. Cache key includes the Spark application id (a handle
    from a stopped session is unusable) and the marker's mtime (a
    rebuild rewrites the marker last, invalidating stale handles)."""
    from opusdb_spark.sources.formats import stat_mtime_ns

    marker = os.path.join(index_dir, "marker.json")
    try:
        build_tag = stat_mtime_ns(marker)
    except OSError:
        build_tag = 0
    key = (os.path.abspath(index_dir), sub)
    tag = (spark.sparkContext.applicationId, build_tag)
    hit = _READ_CACHE.get(key)
    if hit is not None and hit[0] == tag:
        return hit[1]
    df = spark.read.parquet(os.path.join(index_dir, sub))
    _READ_CACHE[key] = (tag, df)  # replaces any stale session/build
    # handle for this store; size is bounded by #stores (≤4 per corpus)
    return df


def load_centroids(index_dir: str) -> np.ndarray:
    with open(os.path.join(index_dir, "centroids.json")) as f:
        return np.array(json.load(f), dtype=np.float64)


def fetch_vector(
    spark: SparkSession, index_dir: str, probe_id: int, id_col: str = "vec_id"
) -> list[float]:
    """Probe-vector fetch by id from the sorted store — a stat-pruned
    single-row read (the only per-probe driver collect, and it is one
    row; a serving deployment would have the query vector in hand)."""
    row = (
        read_index_store(spark, index_dir, "by_id")
        .filter(F.col(id_col) == probe_id)
        .first()
    )
    if row is None:
        raise KeyError(f"probe id {probe_id} not in index {index_dir}")
    return [float(x) for x in row[1]]


def _score_against(vec_col: str, probe_vec: list[float]):
    """Exact-decimal cosine of each row's vector vs a literal probe.

    The fold is similarity._dec_fold — ONE shared definition of the
    accumulator precision/rounding, so probe scores stay bit-identical
    to cosine_topk (and its SQL oracle) by construction rather than by
    two hand-synchronized copies."""
    from opusdb_spark.operators.similarity import _dec_fold as dec_fold

    p = F.array(*[F.lit(float(x)).cast("double") for x in probe_vec])
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    dot = dec_fold(F.zip_with(x, p, lambda a, b: a * b))
    nx = dec_fold(F.zip_with(x, x, lambda a, b: a * b))
    # same decimal fold for the probe norm (a literal expression —
    # constant-folded once) so scores are bit-identical to the
    # cosine_topk formulation, which decimal-sums every term.
    np_ = dec_fold(F.zip_with(p, p, lambda a, b: a * b))
    # zero-norm guard (same contract as similarity.cosine_topk): an
    # unguarded 0/0 yields NaN, and Spark sorts NaN ABOVE every real
    # double — a zero-filled garbage vector would rank #1 in the
    # descending top-k. NULL instead; callers' orderBy(desc) puts NULLs
    # last, so degenerate vectors can never displace true neighbors.
    return F.when((nx > 0) & (np_ > 0), dot / F.sqrt(nx * np_))


def _exact_topk_pooled(
    cands: DataFrame,
    probe_vec: list[float],
    k: int,
    id_col: str,
    vec_col: str,
    prefilter: int = 100,
) -> DataFrame:
    """Exact top-k vs a literal probe, two-phase (cosine_topk's shape
    applied to a candidate frame): every candidate computes an
    APPROXIMATE cosine with plain double folds, only the top
    max(prefilter, 10k) pool (TakeOrderedAndProject — partition-local
    heads, one tiny final merge) is re-scored with _score_against, and
    the final top-k orders on the exact value. So the only BigDecimal
    arithmetic runs on a pool-sized input, never the probed cells —
    at sf1 the IVF candidate set is ~1/4 of the corpus and the three
    64-term decimal folds per row dominated the probe (measured
    2025-08, scripts/ab_ivf.py).

    Safety is similarity.cosine_topk's adjudicated margin argument
    verbatim: float32 component products are exact in double, so
    |approx − exact| ≤ ~1e-10 for 64 dims, and a true top-k member can
    only be cut if ≥ prefilter−k candidates tie within that margin —
    unreachable for real embeddings; exact duplicates rank identically
    in both phases and share the id tie-break. The probe norm enters
    the approx score as a POSITIVE CONSTANT (any value yields the same
    candidate order), so the pool choice needs no norm fold at all."""
    p = F.array(*[F.lit(float(x)).cast("double") for x in probe_vec])
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    fdot = F.aggregate(
        F.zip_with(x, p, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    fnx = F.aggregate(
        F.transform(x, lambda a: a * a),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    fnp = sum(float(v) * float(v) for v in probe_vec)
    approx = (
        F.when(fnx > 0, fdot / F.sqrt(fnx * F.lit(fnp)))
        if fnp > 0
        else F.lit(None).cast("double")
    )
    pool = (
        cands.select(id_col, vec_col, approx.alias("_ac"))
        .filter(F.col("_ac").isNotNull())
        .orderBy(F.desc("_ac"), F.asc(id_col))
        .limit(max(prefilter, 10 * k))
    )
    return (
        pool.select(
            id_col, _score_against(vec_col, probe_vec).alias("cosine")
        )
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def index_bits(index_dir: str | None) -> int:
    """The bits_per_table an index was BUILT with (from its marker) —
    probes must hash with the same plane count or buckets won't match.

    A corrupt/missing marker NEXT TO an intact lsh/ store RAISES
    instead of defaulting: hashing an 8-bit store with the 4-bit
    default would probe effectively random buckets and return silently
    wrong (or empty) neighbors — an error the caller can see beats a
    recall collapse nobody can."""
    if index_dir:
        try:
            with open(os.path.join(index_dir, "marker.json")) as f:
                return int(
                    json.load(f).get("bits_per_table", BITS_PER_TABLE)
                )
        except (OSError, json.JSONDecodeError, ValueError) as e:
            from opusdb_spark.sources.formats import list_store_files

            if list_store_files(os.path.join(index_dir, "lsh")):
                raise RuntimeError(
                    f"ANN index at {index_dir} has data but an "
                    f"unreadable marker.json ({e!r}); rebuild the "
                    "index rather than probing with default plane "
                    "count"
                ) from e
    return BITS_PER_TABLE


def _probe_buckets(
    spark: SparkSession,
    probe_vec: list[float],
    index_dir: str | None = None,
) -> list[tuple[int, int]]:
    """The probe's L (table_id, bucket) pairs from the SAME numpy plane
    model the build used — pure driver-side arithmetic on one vector
    (no Spark job at all for an out-of-corpus probe).

    Known edge (accepted): the build hashes in batched GEMM while this
    path evaluates one GEMV; BLAS summation order can differ, so a
    projection within ~1 ulp of zero could flip a sign bit vs the
    stored bucket. In-corpus probes are immune (stored_buckets reads
    the persisted sigs/), and for out-of-corpus probes the L-table OR
    amplification means one flipped table costs a fraction of recall,
    not correctness — the same degradation any float boundary in LSH
    carries."""
    B = lsh_buckets_np(
        np.asarray([probe_vec], dtype=np.float64), index_bits(index_dir)
    )[0]
    return [(t, int(B[t])) for t in range(N_TABLES)]


def stored_buckets(
    spark: SparkSession, index_dir: str, probe_id: int, id_col: str = "vec_id"
) -> list[tuple[int, int]]:
    """The probe's L (table_id, bucket) pairs from the persisted sigs/
    store — a stat-pruned read of L rows. The production lookup path
    for in-corpus probes; out-of-corpus vectors fall back to
    _probe_buckets (one signature evaluation)."""
    rows = (
        read_index_store(spark, index_dir, "sigs")
        .filter(F.col(id_col) == probe_id)
        .collect()
    )
    if not rows:
        raise KeyError(f"probe id {probe_id} not in index {index_dir}")
    return [(int(r["table_id"]), int(r["bucket"])) for r in rows]


def lsh_probe(
    spark: SparkSession,
    index_dir: str,
    probe_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: int | None = None,
) -> DataFrame:
    """ANN top-k from the persisted LSH index: literal (table_id, bucket)
    predicates → the scan lists only the probe's L bucket directories
    (PartitionFilters; everything else is never read). Pass `probe_id`
    for an in-corpus probe to read its buckets from the sigs/ store
    instead of re-evaluating the signature expressions."""
    if probe_id is not None:
        buckets = stored_buckets(spark, index_dir, probe_id, id_col)
    else:
        buckets = _probe_buckets(spark, probe_vec, index_dir)
    cond = None
    for t, b in buckets:
        c = (F.col("table_id") == t) & (F.col("bucket") == b)
        cond = c if cond is None else (cond | c)
    cands = (
        read_index_store(spark, index_dir, "lsh")
        .filter(cond)
        .select(id_col, vec_col)
        .dropDuplicates([id_col])
    )
    if exclude_id is not None:
        cands = cands.filter(F.col(id_col) != exclude_id)
    return (
        cands.select(id_col, _score_against(vec_col, probe_vec).alias("cosine"))
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_probe(
    spark: SparkSession,
    index_dir: str,
    probe_vec: list[float],
    k: int = 10,
    n_probe: int = N_PROBE,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k from the persisted IVF index: the probe's n_probe
    nearest cells are computed driver-side against the tiny centroid
    model, then read as literal cell predicates (PartitionFilters).
    Candidate scoring is the two-phase pooled shape (approx double
    prefilter, exact decimal rescore of the pool — _exact_topk_pooled):
    the probed cells are a corpus-fraction-sized set, so they must not
    pay per-row BigDecimal folds."""
    cents = load_centroids(index_dir)
    cn = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12)
    v = np.asarray(probe_vec, dtype=np.float64)
    vn = v / (np.linalg.norm(v) + 1e-12)
    cells = [int(c) for c in np.argsort(-(cn @ vn))[:n_probe]]
    cands = (
        read_index_store(spark, index_dir, "ivf")
        .filter(F.col("cell").isin(cells))
        .select(id_col, vec_col)
    )
    if exclude_id is not None:
        cands = cands.filter(F.col(id_col) != exclude_id)
    return _exact_topk_pooled(cands, probe_vec, k, id_col, vec_col)


# ----------------------------------------------------------- IVF-PQ
def _pq_train(residuals: np.ndarray) -> np.ndarray:
    """Per-subspace k-means codebooks over sampled residuals →
    (PQ_M, PQ_KS, dim/PQ_M). Deterministic: seeds are the first PQ_KS
    sample rows (the sample itself is hash-ordered), Lloyd runs a fixed
    iteration count, argmin ties take the lowest index, and an emptied
    cluster keeps its previous centroid. Pure float64 numpy on a
    model-sized sample — the driver does O(sample × KS) work once per
    build, never per probe."""
    if residuals.size == 0:
        raise ValueError(
            "PQ training sample is empty — the embeddings source has "
            "no rows; build the index against a non-empty corpus"
        )
    n, dim = residuals.shape
    if dim % PQ_M:
        raise ValueError(
            f"PQ requires dim % {PQ_M} == 0, got dim={dim}; "
            "adjust PQ_M for this corpus"
        )
    d = dim // PQ_M
    books = np.empty((PQ_M, PQ_KS, d), dtype=np.float64)
    for m in range(PQ_M):
        sub = residuals[:, m * d : (m + 1) * d]
        # seed with the first KS rows; tile if the sample is tiny
        idx = np.arange(PQ_KS) % max(n, 1)
        cents = sub[idx].copy()
        for _ in range(_PQ_LLOYD_ITERS):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(PQ_KS):
                mask = assign == j
                if mask.any():
                    cents[j] = sub[mask].mean(axis=0)
        books[m] = cents
    return books


def _pq_encode_udf(centroids: np.ndarray, codebooks: np.ndarray):
    """Arrow UDF (vec, cell) → BIGINT of PQ_M packed 4-bit codes for the
    vector's residual against its cell centroid. One batched numpy pass;
    models ship in the closure (KB-sized)."""
    cents = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    d = books.shape[2]

    @F.pandas_udf("long")
    def encode(vecs: pd.Series, cells: pd.Series) -> pd.Series:
        if not len(vecs):  # np.stack of an empty sequence raises
            return pd.Series([], dtype="int64")
        V = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        R = V - cents[cells.to_numpy(dtype=np.int64)]
        packed = np.zeros(len(V), dtype=np.int64)
        for m in range(PQ_M):
            sub = R[:, m * d : (m + 1) * d]
            d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
            codes = np.argmin(d2, axis=1).astype(np.int64)  # ties → lowest
            packed |= codes << (4 * m)
        return pd.Series(packed)

    return encode


def load_codebooks(index_dir: str) -> np.ndarray:
    with open(os.path.join(index_dir, "pq_codebooks.json")) as f:
        return np.array(json.load(f), dtype=np.float64)


def _adc_expr(lut: np.ndarray):
    """Asymmetric-distance expression for ONE cell's lookup table
    (PQ_M × PQ_KS floats): each 4-bit code indexes its subspace's
    literal array — shiftright/AND/element_at, all whole-stage codegen,
    no UDF in the scan path."""
    terms = None
    for m in range(PQ_M):
        lut_m = F.array(*[F.lit(float(v)) for v in lut[m]])
        code_m = (
            F.shiftright(F.col("codes"), 4 * m).bitwiseAND(F.lit(15))
        ).cast("int")
        t = F.element_at(lut_m, code_m + F.lit(1))
        terms = t if terms is None else terms + t
    return terms


def ivfpq_probe(
    spark: SparkSession,
    index_dir: str,
    probe_vec: list[float],
    k: int = 10,
    n_probe: int = N_PROBE,
    rerank: int = 50,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over the COMPRESSED code store: the probe's n_probe
    cells are partition-pruned (same as ivf_probe), but the candidate
    scan reads 16-byte code rows instead of 256-byte vectors and ranks
    them by ADC — per-cell residual lookup tables built driver-side
    against the tiny codebook model, applied as pure codegen bit-ops.
    The top-`rerank` candidate ids (a model-sized TakeOrdered +
    collect — the production point-lookup set) are then rescored
    EXACTLY against the stat-pruned by_id store, so PQ's quantization
    error costs recall only if a true neighbor falls outside the
    rerank pool, never final-score accuracy."""
    cents = load_centroids(index_dir)
    books = load_codebooks(index_dir)
    d = books.shape[2]
    cn = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12)
    v = np.asarray(probe_vec, dtype=np.float64)
    vn = v / (np.linalg.norm(v) + 1e-12)
    cells = [int(c) for c in np.argsort(-(cn @ vn))[:n_probe]]

    pq = read_index_store(spark, index_dir, "pq").filter(F.col("cell").isin(cells))
    if exclude_id is not None:
        pq = pq.filter(F.col(id_col) != exclude_id)
    adc = None
    for c in cells:
        r = v - cents[c]
        lut = np.array(
            [
                ((r[m * d : (m + 1) * d][None, :] - books[m]) ** 2).sum(axis=1)
                for m in range(PQ_M)
            ]
        )
        expr = _adc_expr(lut)
        adc = (
            F.when(F.col("cell") == c, expr)
            if adc is None
            else adc.when(F.col("cell") == c, expr)
        )
    cand = (
        pq.select(id_col, adc.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(rerank)
    )
    pool = {int(r[0]): float(r[1]) for r in cand.collect()}
    if not pool:
        # no candidates in the probed cells (empty index slice):
        # return an empty k-shaped frame instead of building a
        # zero-arg create_map / empty isin, which fail at analysis
        return (
            read_index_store(spark, index_dir, "by_id")
            .select(
                id_col,
                F.lit(None).cast("double").alias("cosine"),
                F.lit(None).cast("double").alias("adc_dist"),
            )
            .limit(0)
        )
    exact = (
        read_index_store(spark, index_dir, "by_id")
        .filter(F.col(id_col).isin(list(pool)))
        .select(
            id_col, _score_against(vec_col, probe_vec).alias("cosine")
        )
        .filter(F.col("cosine").isNotNull())
    )
    lut_adc = F.create_map(
        *[F.lit(x) for kv in pool.items() for x in kv]
    )
    return (
        exact.select(
            id_col,
            "cosine",
            F.round(lut_adc[F.col(id_col)], 6).alias("adc_dist"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
