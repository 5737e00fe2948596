"""BPE vocabulary training over a distributed corpus.

The canonical LLM-tokenizer preprocessing step (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
public algorithm GPT/Llama tokenizers descend from), shaped for Spark:

 1. ONE corpus pass reduces the text to a word-frequency table
    (groupBy shuffle — vocabulary-sized output, not corpus-sized).
 2. Every merge iteration runs on the DISTINCT-WORD table only:
    adjacent-pair counts weighted by word frequency (JVM array
    algebra + one small aggregation), the arg-max pair collected to
    the driver (ONE row — model-sized), and the merge applied with an
    Arrow UDF over the vocabulary.

At 100 TB the corpus is touched exactly once; the iterative part
scales with |vocabulary|, which is what makes BPE trainable at all.
Ties on pair count break by (left, right) lexicographic order, so the
learned merge sequence is deterministic for a given corpus.

SCALE CONTRACT (the r8 probe priced the loop: ~35 s per 8 merges at
100× — a job-per-merge design, thousands of driver round-trips at a
real 32k-merge vocabulary). A production run does BOTH of the
standard mitigations:

 1. Train on a SAMPLED word-frequency table (the universal practice —
    merge statistics converge long before the full tail of a 100 TB
    vocabulary is seen; pass a sampled `docs`).
 2. Batch symbol-disjoint merges per pass (`merges_per_pass > 1`,
    bpe_train below): pairs sharing no symbol — including the merged
    token itself — have pair counts INVARIANT under each other's
    application, so one pair-count job can safely commit several
    merges, cutting driver round-trips ~K×. The batched sequence is
    the standard approximation (new pairs created by an earlier merge
    in the batch cannot be picked until the next pass); rank order
    within a batch follows the pre-batch counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# adjacent symbol pairs, frequency-weighted: (sym[i], sym[i+1])
_PAIRS_EXPR = (
    "transform(slice(syms, 1, size(syms) - 1),"
    " (s, i) -> struct(s AS l, syms[i + 1] AS r))"
)


def merge_pair(syms: list, left: str, right: str) -> list:
    """One greedy left-to-right merge of the (left, right) pair in a
    symbol sequence — the reference algorithm's replacement step, shared
    by training (vocab update) and encoding (corpus apply)."""
    joined = left + right
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _merge_udf(pairs: list[tuple[str, str]]):
    """Arrow UDF applying greedy left-to-right merges of `pairs` (in
    order) inside each symbol array — the reference algorithm's
    replacement step, vectorized over the vocabulary. With one pair
    this is the classic single-merge step; a batch of symbol-disjoint
    pairs commutes, so applying them in one pass equals applying them
    sequentially."""

    @pandas_udf("array<string>")
    def merge(col: pd.Series) -> pd.Series:
        def apply_all(a):
            syms = list(a)
            for left, right in pairs:
                syms = merge_pair(syms, left, right)
            return syms

        return col.apply(apply_all)

    return merge


def _disjoint_prefix(
    ranked: list[tuple[str, str, int]], k: int
) -> list[tuple[str, str, int]]:
    """Greedily select ≤ k pairs from the ranked candidate list whose
    symbol sets — left, right, AND the merged token — are mutually
    disjoint. Disjointness is what makes the batch exact w.r.t. the
    pre-batch counts: merging (a,b) can only change counts of pairs
    touching a, b, or the new token ab."""
    out: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for left, right, w in ranked:
        if len(out) >= k:
            break
        if left in used or right in used or (left + right) in used:
            continue
        out.append((left, right, w))
        used.update((left, right, left + right))
    return out


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    merges_per_pass: int = 1,
) -> list[tuple[int, str, str, str, int]]:
    """Learn `n_merges` BPE merges; returns the model-sized merge table
    [(rank, left, right, merged, pair_freq)].

    merges_per_pass=1 is exact reference BPE (one argmax per
    pair-count job). merges_per_pass=K>1 is the batched scale variant
    (module docstring #2): each pair-count job commits up to K
    symbol-disjoint merges, so a 32k-merge vocabulary needs ~32k/K
    jobs instead of 32k."""
    spark = docs.sparkSession
    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.col(text_col), " "), lambda w: F.length(w) > 0
            )
        ).alias("word")
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("freq", F.split("word", "").alias("syms"))
    )
    merges: list[tuple[int, str, str, str, int]] = []
    passes = 0
    while len(merges) < n_merges:
        if passes and passes % 4 == 0:
            # cap the chained-UDF lineage depth on the vocab table
            vocab = vocab.localCheckpoint(eager=False)
        passes += 1
        k = min(merges_per_pass, n_merges - len(merges))
        # candidate rows are model-sized: k disjoint picks need at
        # most 3k+1 ranked candidates in the worst case (each pick
        # blocks ≤ 3 symbols), padded to 4k for the tie margin
        top = (
            vocab.select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy("p")
            .agg(F.sum("freq").alias("w"))
            .orderBy(F.desc("w"), F.asc("p"))
            .limit(max(4 * k, 1))
            .collect()
        )
        picked = _disjoint_prefix(
            [(r["p"]["l"], r["p"]["r"], int(r["w"])) for r in top], k
        )
        if not picked:
            break
        for left, right, w in picked:
            merges.append((len(merges), left, right, left + right, w))
        vocab = vocab.withColumn(
            "syms", _merge_udf([(lt, rt) for lt, rt, _ in picked])("syms")
        )
    return merges


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge sequence to the corpus: each word is
    re-segmented by replaying the merges in rank order (the standard
    encode step — merges are a total order, replay is deterministic).
    The merge table is model-sized and ships in the UDF closure (the
    broadcast-a-model shape, same as the IVF centroids); one Arrow pass
    over the corpus, no shuffle. Returns (doc-identity columns,
    n_words, n_tokens)."""
    ranked = [(left, right) for _, left, right, _, _ in merges]

    @pandas_udf("long")
    def count_tokens(texts: pd.Series) -> pd.Series:
        def encode_word(w):
            syms = list(w)
            for left, right in ranked:
                syms = merge_pair(syms, left, right)
            return len(syms)

        return texts.map(
            lambda t: sum(encode_word(w) for w in t.split(" ") if w)
        )

    other = [c for c in docs.columns if c != text_col]
    words_n = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    )
    return docs.select(
        *other,
        words_n.alias("n_words"),
        count_tokens(F.col(text_col)).alias("n_tokens"),
    )
