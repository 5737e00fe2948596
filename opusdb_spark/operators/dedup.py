"""Deduplication operators for LLM training-data pipelines.

Exact dedup is a hash-groupBy; fuzzy dedup comes in three flavors —
MinHash+LSH (Jaccard over shingles), SimHash (Hamming over hashed
feature fingerprints), and n-gram Jaccard (exact pairwise within LSH
buckets). All are built so the only shuffles are on hash/band keys:
at 100 TB no operator compares all pairs — candidate generation is
always bucket-local (band join / fingerprint join), which is the
standard web-scale dedup shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_MINHASH = 32  # minhash permutations
N_BANDS = 8  # LSH bands (4 rows per band)
_MERSENNE = 2147483647  # 2^31 - 1, modulus for the affine hash family

# Fixed pseudo-random affine constants (seeded → identical across runs
# and partitionings). Small/structured multipliers would correlate the
# permutations — one low base-hash value then wins most minima and the
# Jaccard estimate collapses — so a_i, b_i are drawn uniformly from
# [1, p).
import random as _random

_rng = _random.Random(0x5EED)
_A = [_rng.randrange(1, _MERSENNE) for _ in range(N_MINHASH)]
_B = [_rng.randrange(0, _MERSENNE) for _ in range(N_MINHASH)]


# Signature computation is CPU-heavy map work; a small parquet file
# arrives as one split and would otherwise pin it to one core —
# skew.spread() widens such scans (no-op on many-split cluster scans).
from opusdb_spark.operators.skew import spread


def shingles(df: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Character k-shingles per doc: (doc_id, shingle) distinct pairs."""
    return (
        df.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(1))
                    ),
                    lambda i: F.col(text_col).substr(i, F.lit(k)),
                )
            ).alias("shingle"),
        )
        .filter(F.length("shingle") == k)
        .distinct()
    )


def _shingle_hash_array(text_col: str, k: int) -> F.Column:
    """array<long> of pmod(hash(char k-gram), p) per row — a narrow
    projection (no explode). Duplicate shingles are harmless: min()
    absorbs them."""
    grams = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(1))),
            lambda i: F.col(text_col).substr(i, F.lit(k)),
        ),
        lambda s: F.length(s) == k,
    )
    return F.transform(
        grams, lambda s: F.pmod(F.hash(s).cast("long"), F.lit(_MERSENNE))
    )


def _word_gram_hash_array(text_col: str, n: int) -> F.Column:
    """array<long> of pmod(xxhash64(word n-gram), p) per row. Word grams
    are the standard web-dedup unit: ~6× fewer shingles than char-5
    grams at equal text length, so 6× less signature work per byte."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
        (lambda ws: lambda i: F.pmod(F.xxhash64(F.slice(ws, i, n)).cast("long"), F.lit(_MERSENNE)))(words),
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", k: int = 3, unit: str = "word"
) -> DataFrame:
    """(doc_id, sig: array<long>) — N_MINHASH affine-permutation minima.

    h_i(x) = (a_i * x + b_i) mod p over the shingle hash; the (a_i, b_i)
    are fixed constants so signatures are deterministic across runs and
    partitionings. The whole signature is ONE array fold per row
    (aggregate carrying all N_MINHASH running minima) — zero shuffles,
    which at 100 TB means signature computation is embarrassingly
    parallel map-work co-located with the parquet scan. `unit` picks the
    shingle granularity: "word" n-grams (web-dedup standard) or "char"
    k-grams (robust for unsegmented scripts).
    """
    # Wordless/empty docs are excluded up front: they would all share
    # one degenerate signature, collide in every band, and the band
    # self-join would emit O(m²) pairs for m empty docs — the exact
    # blowup this module exists to avoid. Route empties through
    # exact_dedup_keep_min instead.
    docs = docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    grams = (
        _word_gram_hash_array(text_col, k)
        if unit == "word"
        else _shingle_hash_array(text_col, k)
    )
    a_lit = F.array(*[F.lit(a) for a in _A])
    b_lit = F.array(*[F.lit(b) for b in _B])
    sig = F.aggregate(
        F.col("hs"),
        F.array_repeat(F.lit(_MERSENNE).cast("long"), N_MINHASH),
        lambda acc, h: F.transform(
            acc,
            lambda m, i: F.least(
                m,
                (h * F.element_at(a_lit, i + 1) + F.element_at(b_lit, i + 1))
                % _MERSENNE,
            ),
        ),
    )
    return (
        docs.select("doc_id", grams.alias("hs"))
        .filter(F.size("hs") > 0)
        .select("doc_id", sig.alias("sig"))
    )


def _make_sig_udf():
    """Arrow-batched MinHash signature UDF: numpy computes all N_MINHASH
    permutation minima per doc as one (grams × perms) matrix op.

    Measured ~7× faster end-to-end than the expression fold: Catalyst
    higher-order functions evaluate interpreted (~µs per element-lambda
    call) and their large expression trees add per-execution plan
    serialization cost, while this plan is a tiny serialized closure and
    the compute is vectorized C. crc32 keeps gram hashing deterministic
    across runs, partitions, and executors (Python's builtin hash is
    salted per process — never use it here).
    """
    from zlib import crc32

    a = np.array(_A, dtype=np.int64)
    b = np.array(_B, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            words = [w for w in (t or "").split(" ") if w]
            if len(words) >= 3:
                grams = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
            else:
                grams = [" ".join(words)]
            h = np.fromiter((crc32(g.encode()) for g in grams), dtype=np.int64) % _MERSENNE
            out.append(((np.outer(h, a) + b) % _MERSENNE).min(axis=0))
        return pd.Series(out)

    return sig_udf


def minhash_signatures_arrow(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sig) via the Arrow/numpy UDF — the default fast path.
    Same shape as minhash_signatures(); hash family differs (crc32 vs
    xxhash64 base) so signatures are not interchangeable between the
    two implementations. Empty docs excluded (see minhash_signatures)."""
    return docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        "doc_id", _make_sig_udf()(text_col).alias("sig")
    )


def _bands(sig_df: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_hash): the N_BANDS per-band hashes of each
    signature — the LSH bucket keys every candidate join runs on."""
    rows_per_band = N_MINHASH // N_BANDS
    return sig_df.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.hash(
                            *[
                                F.col("sig")[i]
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")


def lsh_candidate_pairs(sig_df: DataFrame) -> DataFrame:
    """Band the signatures and self-join per band bucket → candidate pairs.

    Docs agreeing on all rows of ≥1 band collide. The join key is
    (band_id, band_hash): shuffles scale with data, never pairs.
    """
    bands = _bands(sig_df)
    left = bands.alias("a")
    right = bands.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_signatures_stored(
    spark,
    docs: DataFrame,
    store_path: str,
    fingerprint: dict,
    impl: str = "arrow",
) -> DataFrame:
    """Signatures as an INGEST artifact: computed once per corpus,
    persisted to parquet, and shared by every dedup query against it
    (fuzzy pairs, clustering, the end-to-end pipeline). At 100 TB
    signatures are a column written at ingest — recomputing ~100 bytes
    of minhashes per document for each of N dedup passes is pure waste.
    Fingerprint-guarded like the ANN index: unchanged source → reuse."""
    from opusdb_spark.sources.formats import ensure_written, read_store

    sig_fn = minhash_signatures_arrow if impl == "arrow" else minhash_signatures
    ensure_written(
        store_path,
        {**fingerprint, "impl": impl, "n_minhash": N_MINHASH},
        lambda p: sig_fn(spread(docs)).write.mode("overwrite").parquet(p),
    )
    return read_store(spark, store_path)


def minhash_pairs_stored(
    spark,
    docs: DataFrame,
    store_path: str,
    fingerprint: dict,
    jaccard_threshold: float = 0.5,
    sig: DataFrame | None = None,
) -> DataFrame:
    """The near-dup PAIR GRAPH as an INGEST artifact.

    The LSH band join + signature-estimate pass is corpus-shaped work;
    every downstream consumer (pair listing, clustering, the dedup
    pipeline's keep-list) needs the same graph, so it is materialized
    once per (corpus, threshold) and fingerprint-guarded like the
    signature store and the ANN index. At 100 TB re-deriving the pair
    graph per query would repeat the single most expensive dedup
    shuffle; here it becomes one parquet read."""
    from opusdb_spark.sources.formats import ensure_written, read_store

    ensure_written(
        store_path,
        {**fingerprint, "threshold": jaccard_threshold, "n_minhash": N_MINHASH},
        lambda p: minhash_lsh_dedup(docs, jaccard_threshold, sig=sig)
        .write.mode("overwrite")
        .parquet(p),
    )
    return read_store(spark, store_path)


def lsh_incremental_pairs(
    new_sigs: DataFrame,
    base_sigs: DataFrame,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-dups of an ARRIVING batch against an EXISTING corpus —
    the incremental-ingest dedup path: a daily batch is checked against
    the persisted signature store without re-banding the corpus against
    itself. The asymmetric band join keys on (band_id, band_hash)
    exactly like the batch path, so shuffle volume is
    O(batch + matching buckets), never corpus², and the corpus side is
    the UNCHANGED ingest artifact. Returns
    (new_doc, dup_of, est_jaccard) for estimated Jaccard ≥ threshold.
    """
    nb = _bands(new_sigs).alias("n")
    bb = _bands(base_sigs).alias("e")
    cands = (
        nb.join(
            bb,
            (F.col("n.band_id") == F.col("e.band_id"))
            & (F.col("n.band_hash") == F.col("e.band_hash")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc"),
            F.col("e.doc_id").alias("dup_of"),
        )
        .distinct()
    )
    a = new_sigs.select(F.col("doc_id").alias("new_doc"), F.col("sig").alias("sig_a"))
    b = base_sigs.select(F.col("doc_id").alias("dup_of"), F.col("sig").alias("sig_b"))
    est = (
        cands.join(a, "new_doc")
        .join(b, "dup_of")
        .select(
            "new_doc",
            "dup_of",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(N_MINHASH)
            ).alias("est_jaccard"),
        )
    )
    return est.filter(F.col("est_jaccard") >= jaccard_threshold)


def minhash_lsh_dedup(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    impl: str = "arrow",
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs with estimated Jaccard ≥ threshold.

    Candidates from LSH bands, then the signature-estimated Jaccard
    (fraction of agreeing minhashes) filters false positives. Returns
    (doc_a, doc_b, est_jaccard). impl="arrow" (default) computes
    signatures with the numpy pandas-UDF; impl="expr" uses the pure
    Catalyst-expression fold (no Python workers in the plan). Pass
    `sig` (e.g. from minhash_signatures_stored) to reuse precomputed
    signatures — the production shape.
    """
    if sig is None:
        sig_fn = minhash_signatures_arrow if impl == "arrow" else minhash_signatures
        # loop_cache, NOT bare cache() or localCheckpoint: sig is read
        # 3× below (bands + both sides of the estimate join) so it
        # must materialize once. A bare cache() is pinned for the
        # session lifetime (each caller builds its own sig → unbounded
        # leak); lazy-localCheckpoint blocks are freed only after a
        # driver GC, which a large-heap driver may not run for
        # minutes — the orphaned corpus-sized blocks of repeated
        # invocations then evict live execution memory (the
        # decontaminate probe measured a persistent ~5× slowdown from
        # exactly this). loop_cache keeps ONE live copy per call site
        # and unpersists it deterministically on the next invocation.
        from opusdb_spark.operators.cache import loop_cache

        sig = loop_cache("dedup:minhash_sig", sig_fn(spread(docs)))
    pairs = lsh_candidate_pairs(sig)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(N_MINHASH)
            ).alias("est_jaccard"),
        )
    )
    return est.filter(F.col("est_jaccard") >= jaccard_threshold)


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc from word-level features.

    Each word hashes to 64 bits; bit b of the fingerprint is 1 iff the
    sum over words of ±1 (by bit b) is positive. All 64 bit-sums are ONE
    array fold per row (aggregate carrying 64 running counts) — zero
    shuffles, pure map-side work at any scale.
    """
    docs = docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    words = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    plus_minus = F.transform(
        F.col("wh"),
        lambda h: F.array(
            *[
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
                for b in range(64)
            ]
        ),
    )
    bit_counts = F.aggregate(
        F.col("pm"),
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x),
    )
    fingerprint = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(F.element_at(F.col("bits"), b + 1) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = fingerprint.bitwiseXOR(F.shiftleft(bit, b))
    return (
        docs.select("doc_id", hashes.alias("wh"))
        .select("doc_id", plus_minus.alias("pm"))
        .select("doc_id", bit_counts.alias("bits"))
        .select("doc_id", fingerprint.alias("simhash"))
    )


def _make_simhash_udf():
    """Arrow-batched SimHash UDF: numpy computes the 64 bit-sums per doc
    as one (words × 64) matrix op. Same rationale as _make_sig_udf —
    the expression-fold variant's 64-way when-chain evaluates
    interpreted per element and its tree adds ~2s fixed cost per
    execution. crc32 over two salts yields a deterministic 64-bit word
    hash (never Python's salted builtin hash)."""
    from zlib import crc32

    _POS = np.arange(64, dtype=np.uint64)

    @F.pandas_udf("long")
    def sh_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for j, t in enumerate(texts):
            words = [w for w in (t or "").split(" ") if w]
            if not words:
                continue
            h = np.fromiter(
                (
                    (crc32(b"\x01" + w) << 32) | crc32(b"\x02" + w)
                    for w in (w.encode() for w in words)
                ),
                dtype=np.uint64,
            )
            bits = ((h[:, None] >> _POS) & np.uint64(1)).astype(np.int64)
            pos = (bits * 2 - 1).sum(axis=0) > 0
            fp = int(np.bitwise_or.reduce(pos.astype(np.uint64) << _POS))
            # two's-complement fold into Spark's signed long
            out[j] = fp - (1 << 64) if fp >= (1 << 63) else fp
        return pd.Series(out)

    return sh_udf


def simhash_fingerprints_arrow(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) via the Arrow/numpy UDF — the default fast
    path. Same shape as simhash_fingerprints(); hash family differs
    (crc32×2 vs xxhash64) so fingerprints are not interchangeable
    between the two implementations. Empty docs excluded (degenerate
    fingerprint 0 would collide in every block — same O(m²) blowup the
    MinHash path guards against)."""
    return docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        "doc_id", _make_simhash_udf()(text_col).alias("simhash")
    )


def simhash_fingerprints_stored(
    spark,
    docs: DataFrame,
    store_path: str,
    fingerprint: dict,
    impl: str = "arrow",
) -> DataFrame:
    """SimHash fingerprints as an INGEST artifact (see
    minhash_signatures_stored — same ingest-once/query-many contract)."""
    from opusdb_spark.sources.formats import ensure_written, read_store

    fp_fn = simhash_fingerprints_arrow if impl == "arrow" else simhash_fingerprints
    ensure_written(
        store_path,
        {**fingerprint, "impl": impl, "bits": 64},
        lambda p: fp_fn(spread(docs)).write.mode("overwrite").parquet(p),
    )
    return read_store(spark, store_path)


def simhash_near_dups(
    docs: DataFrame, max_hamming: int = 3, fp: DataFrame | None = None
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit fingerprint into 4 16-bit
    blocks; by pigeonhole, any pair within distance 3 agrees on ≥1 block,
    so the self-join key is (block_id, block_value) — bucket-local, no
    all-pairs scan. Pass `fp` (e.g. from simhash_fingerprints_stored)
    to reuse ingest-time fingerprints — the production shape.

    The 4-block scheme only GUARANTEES recall for max_hamming ≤ 3
    (pigeonhole over 4 blocks): at distance 4 a pair can differ in one
    bit per block and agree on none, so larger thresholds would
    silently miss pairs — rejected rather than under-reported.
    """
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming}: the 4x16-bit block scheme "
            "guarantees candidate recall only for Hamming distance <= 3; "
            "use more/smaller blocks for larger thresholds"
        )
    if fp is None:
        fp = simhash_fingerprints(spread(docs))
    blocks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_id"),
                        F.shiftright(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("block_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "simhash", "blk.block_id", "blk.block_val")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def exact_dedup_keep_min(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: sha2-hash the text, keep the min doc_id per hash."""
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    return (
        docs.withColumn("text_hash", F.sha2(F.col(text_col), 256))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def neardup_components(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, component).

    The end-game of corpus dedup: near-dup PAIRS must become CLUSTERS
    before you can pick one canonical doc per group (A~B, B~C must not
    keep both A and C). Alternating LARGE-STAR / SMALL-STAR (the
    standard web-graph MapReduce CC — Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round hooks
    every node's neighborhood onto its minimum member, so tree heights
    fall geometrically and ANY graph converges in O(log n) rounds —
    the min-label propagation this replaces needed O(diameter) rounds,
    a scale-killer on chain-shaped dup clusters. Each star step is one
    aggregation + one join keyed on node id (shuffles scale with the
    edge count, components never touch driver memory); lineage is cut
    per round with a lazy localCheckpoint, and the fixpoint test (edge
    multiset unchanged across a full round) is one count+hash action
    per round — ~log₂(n) cluster barriers total.

    Returns (doc_id, component) where component = min doc_id in the
    cluster (the canonical keeper).
    """
    # Big→small orientation (u > v) is the small-star invariant; both
    # star steps preserve it.
    edges = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def large_star(e: DataFrame) -> DataFrame:
        # Connect every strictly-larger neighbor of u to
        # m = min(N(u) ∪ {u}).
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # Per node u over its smaller neighbors Γ(u): connect every
        # member of Γ(u) ∪ {u} except the minimum m to m.
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        part1 = (
            e.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        part2 = mins.select("u", F.col("m").alias("v"))
        return part1.unionByName(part2).distinct()

    prev_sig = None
    converged = False
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint(eager=False)
        # Edge-set signature: count + order-independent hash sums.
        # Equal signatures across a round ⇒ fixpoint ⇒ the graph is a
        # star forest (every edge points at its component minimum).
        # decimal(38,0) sums: exact and overflow-proof (a long sum of
        # xxhash64 values overflows under ANSI mode).
        sig = tuple(
            edges.agg(
                F.count(F.lit(1)),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.sum(F.col("u").cast("decimal(38,0)")),
                F.sum(F.col("v").cast("decimal(38,0)")),
            ).first()
        )
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # Unconverged stars would silently split one true cluster into
        # several "canonical" keepers — wrong keep-lists with no signal.
        # Fail loudly; log₂(n) rounds means max_iter=50 covers any
        # realistic graph, so reaching here signals a bug, not data.
        raise RuntimeError(
            f"neardup_components did not converge in {max_iter} rounds "
            "(fixpoint not reached)"
        )
    roots = edges.select(F.col("v").alias("doc_id")).distinct()
    return edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("component")
    ).unionByName(
        roots.select("doc_id", F.col("doc_id").alias("component"))
    ).distinct()


def components_stored(
    spark,
    pairs: DataFrame,
    store_path: str,
    fingerprint: dict,
) -> DataFrame:
    """Connected COMPONENTS as an INGEST artifact next to the pair
    graph (same ensure_written contract as the signature store and the
    pair store, minhash_pairs_stored). Components are corpus-shaped
    exactly like the pairs — every consumer (cluster listing, keep-list
    derivation, the dedup pipeline) needs the same partition of the
    same graph — so the O(log n) star rounds run once per (corpus,
    threshold) at ingest and every query against them is a parquet
    read + groupBy, with zero iterative jobs at query time."""
    from opusdb_spark.sources.formats import ensure_written, read_store

    ensure_written(
        store_path,
        {**fingerprint, "algo": "large-small-star"},
        lambda p: neardup_components(pairs).write.mode("overwrite").parquet(p),
    )
    return read_store(spark, store_path)


# ------------------------------------------------ winnowing (MOSS)
def winnow_fingerprints_stored(
    spark,
    docs: DataFrame,
    store_path: str,
    fingerprint: dict,
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnow fingerprints as an INGEST artifact (same contract as
    minhash_signatures_stored): the selection pass is corpus-shaped
    compute written once per (corpus, k, w); every consumer — the
    overlap share join, the corpus report — reads the ~2/(w+1)-density
    parquet instead of re-hashing every gram. Fingerprint-guarded:
    unchanged source → reuse."""
    from opusdb_spark.sources.formats import ensure_written, read_store

    ensure_written(
        store_path,
        {**fingerprint, "k": k, "w": w, "algo": "winnow_v1"},
        lambda p: winnow_fingerprints(docs, k=k, w=w)
        .write.mode("overwrite")
        .parquet(p),
    )
    return read_store(spark, store_path)


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003,
    §4): hash every k-token gram, slide a w-gram window, keep each
    window's minimum hash — returns the distinct (id, h) fingerprint
    set, h as a fixed-width BIGINT. Guarantee (the paper's theorem):
    any shared token run of length ≥ w + k − 1 yields at least one
    shared fingerprint; density ≈ 2/(w+1).

    Shuffle profile: NONE. A document's selection depends only on its
    own grams, so the whole pipeline — gram md5s, per-window min,
    per-doc distinct — runs in the array domain inside one projection
    (transform/slice/array_min/array_distinct, all codegen), and only
    the ~2/(w+1)-density selected fingerprints are ever exploded into
    rows. The previous shape exploded EVERY gram and ran a
    partitionBy(doc) window — i.e. it shuffled the entire gram stream
    (with 32-char md5 strings) just to compute a doc-local min
    (VERDICT r6 perf item 7; this removes that shuffle entirely rather
    than only narrowing its key).

    Ordering parity: the per-window min is taken over the md5 hex
    string — bytewise-comparable in any engine, so a DuckDB oracle
    reproduces the exact selection (the min HASH per window is
    tie-break-invariant: equal candidates are equal values). The
    selected md5 is then collapsed to xxhash64 BIGINT because past
    selection the fingerprint is only ever compared — downstream
    distinct/DF/join shuffles move 8 bytes instead of ~44 (a 64-bit
    collision merging two fingerprints is immaterial at any corpus
    size)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    m = n - k + 1  # grams; windows exist when m >= w
    # The gram hashing below multiplies each row's work ~100×; spread()
    # widens a single-split scan first so it parallelizes (no-op on a
    # many-split cluster scan).
    docs = spread(docs)
    # Materialize the gram-hash array as its own projected column: an
    # inline expression referenced from the outer transform's lambda
    # would re-evaluate every md5 per WINDOW (O(m²·k) hashing) if
    # Catalyst's subexpression elimination declines to fire.
    grams = docs.select(
        F.col(id_col),
        F.when(
            n >= k + w - 1,
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")),
            ),
        ).alias("_gh"),
    )
    fps = F.transform(
        F.sequence(F.lit(1), F.size("_gh") - w + 1),
        lambda i: F.array_min(F.slice("_gh", i, w)),
    )
    # Row-level distinct rather than per-doc array_distinct: same
    # result (a doc appears once), avoids the O(f²) array scan, and —
    # load-bearing — plants the ONE Exchange after the expensive
    # hashing projection, so a query referencing the fingerprint set
    # from several subtrees (DF count + both sides of the share join)
    # gets Catalyst Exchange reuse instead of recomputing the hashes
    # per subtree. The shuffled rows are 16 bytes: (id, xxhash64).
    return (
        grams.select(
            F.col(id_col),
            F.explode(
                F.when(F.col("_gh").isNotNull(), fps).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("_h_md5"),
        )
        .select(id_col, F.xxhash64("_h_md5").alias("h"))
        .distinct()
    )
