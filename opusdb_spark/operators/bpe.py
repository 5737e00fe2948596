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


def _merge_udf(left: str, right: str):
    """Arrow UDF applying one greedy left-to-right merge of the
    (left, right) pair inside each symbol array — the reference
    algorithm's replacement step, vectorized over the vocabulary."""

    @pandas_udf("array<string>")
    def merge(col: pd.Series) -> pd.Series:
        return col.apply(lambda a: merge_pair(list(a), left, right))

    return merge


def bpe_train(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[tuple[int, str, str, str, int]]:
    """Learn `n_merges` BPE merges; returns the model-sized merge table
    [(rank, left, right, merged, pair_freq)]."""
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
    for rank in range(n_merges):
        if rank and rank % 4 == 0:
            # cap the chained-UDF lineage depth on the vocab table
            vocab = vocab.localCheckpoint(eager=False)
        top = (
            vocab.select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy("p")
            .agg(F.sum("freq").alias("w"))
            .orderBy(F.desc("w"), F.asc("p"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, w = top[0]["p"]["l"], top[0]["p"]["r"], int(top[0]["w"])
        merges.append((rank, left, right, left + right, w))
        vocab = vocab.withColumn("syms", _merge_udf(left, right)("syms"))
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
