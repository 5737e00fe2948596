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


def minhash_signatures(shingle_df: DataFrame) -> DataFrame:
    """(doc_id, sig: array<long>) — N_MINHASH affine-permutation minima.

    h_i(x) = (a_i * x + b_i) mod p over the shingle's 32-bit hash; the
    (a_i, b_i) are fixed constants so signatures are deterministic across
    runs and partitionings. One groupBy(doc_id) shuffle total.
    """
    hashed = shingle_df.select(
        "doc_id", (F.hash("shingle").cast("long") % _MERSENNE).alias("h")
    ).withColumn("h", F.when(F.col("h") < 0, F.col("h") + _MERSENNE).otherwise(F.col("h")))
    mins = [
        F.min((F.col("h") * F.lit(_A[i]) + F.lit(_B[i])) % _MERSENNE).alias(f"m{i}")
        for i in range(N_MINHASH)
    ]
    sig = hashed.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"m{i}" for i in range(N_MINHASH)]).alias("sig")
    )


def lsh_candidate_pairs(sig_df: DataFrame) -> DataFrame:
    """Band the signatures and self-join per band bucket → candidate pairs.

    Docs agreeing on all rows of ≥1 band collide. The join key is
    (band_id, band_hash): shuffles scale with data, never pairs.
    """
    rows_per_band = N_MINHASH // N_BANDS
    bands = sig_df.select(
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


def minhash_lsh_dedup(docs: DataFrame, jaccard_threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs with estimated Jaccard ≥ threshold.

    Candidates from LSH bands, then the signature-estimated Jaccard
    (fraction of agreeing minhashes) filters false positives. Returns
    (doc_a, doc_b, est_jaccard).
    """
    sig = minhash_signatures(shingles(docs)).cache()
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
    sum over words of ±1 (by bit b) is positive. Pure expression code —
    one explode + one groupBy(doc_id) shuffle.
    """
    words = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.length("word") > 0)
    hashed = words.select("doc_id", F.xxhash64("word").alias("h"))
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    fingerprint = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        fingerprint = term if fingerprint is None else fingerprint.bitwiseXOR(term)
    return bit_sums.select("doc_id", fingerprint.alias("simhash"))


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit fingerprint into 4 16-bit
    blocks; by pigeonhole, any pair within distance 3 agrees on ≥1 block,
    so the self-join key is (block_id, block_value) — bucket-local, no
    all-pairs scan.
    """
    fp = simhash_fingerprints(docs)
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
