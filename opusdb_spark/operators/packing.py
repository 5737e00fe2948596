"""Sequence packing for LLM training-data pipelines.

Greedy sequential bin packing: documents, in a deterministic order,
are appended to the current training sequence until the next doc would
overflow the token capacity, then a new sequence starts. The scan is
inherently sequential *within* a shard but embarrassingly parallel
*across* shards — exactly how 100 TB corpora are packed in practice
(each worker packs its shard independently). Here the shard key is the
group column and the per-shard scan is one applyInPandas group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(tokens: list[int], capacity: int) -> list[int]:
    """Reference packing: seq id per doc. A doc larger than capacity
    gets a sequence of its own (never split, never dropped — truncation
    is a separate policy decision)."""
    seq_ids, cur_seq, cur_fill = [], 0, 0
    for t in tokens:
        if cur_fill > 0 and cur_fill + t > capacity:
            cur_seq += 1
            cur_fill = 0
        seq_ids.append(cur_seq)
        cur_fill += t
    return seq_ids


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    group_col: str = "lang",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """(group, order, n_tokens, seq_id): greedy packing per group in
    order_col order. seq_id restarts at 0 per group; (group, seq_id)
    identifies a packed training sequence."""
    out_schema = (
        f"{group_col} string, {order_col} long, {token_col} long, seq_id long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        pdf["seq_id"] = pack_greedy([int(t) for t in pdf[token_col]], capacity)
        return pdf[[group_col, order_col, token_col, "seq_id"]]

    return (
        docs.select(group_col, order_col, F.col(token_col).cast("long").alias(token_col))
        .groupBy(group_col)
        .applyInPandas(pack, schema=out_schema)
    )
