"""Distributed logistic regression over hashed text features.

The quality-classifier stage of an LLM data pipeline (the
fastText-style "does this crawl doc look like the target corpus?"
filter): hashed bag-of-words features, batch gradient descent where
each iteration is ONE distributed pass producing a model-sized
gradient (256 weights + bias) that updates driver-side — the same
iterate-on-model-rows shape as emb_kmeans and graph_pagerank.

Determinism: per-row probabilities are plain IEEE arithmetic on the
broadcast weights; gradient contributions quantize to decimal(27,15)
before the order-free sum, so the trained weights are identical under
any partitioning (pinned in tests against a numpy reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_BUCKETS = 256


def doc_features(
    docs: DataFrame,
    bucket_expr: str,
    label_col,
) -> tuple[DataFrame, DataFrame]:
    """(doc_feats, labels): sparse normalized hashed-word features.

    doc_feats = (doc_id, b, x) with x = bucket_count / doc_words;
    labels = (doc_id, y). One explode + one aggregation; empty docs
    drop out (no features → no gradient contribution). The scan is
    spread() first: tokenization is ~100× per-row fan-out and a
    single-split scan would serialize it on one core (no-op at cluster
    scale — see skew.spread)."""
    from opusdb_spark.operators.skew import spread

    docs = spread(docs)
    words = docs.select(
        "doc_id",
        label_col.alias("y"),
        F.explode(F.split("text", " ")).alias("w"),
    ).filter(F.col("w") != "")
    labels = words.groupBy("doc_id").agg(
        F.first("y").alias("y"), F.count(F.lit(1)).alias("n")
    )
    feats = (
        words.select("doc_id", F.expr(bucket_expr).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(labels, "doc_id")
        .select(
            "doc_id",
            "b",
            (F.col("c").cast("double") / F.col("n")).alias("x"),
            "y",
        )
    )
    return feats, labels


def train_logreg(
    spark,
    feats: DataFrame,
    labels: DataFrame,
    iters: int = 5,
    eta: float = 1.0,
) -> tuple[list, list[dict]]:
    """Batch-GD logistic regression; returns (weights+bias, trace).

    Each iteration: broadcast the 256-weight model as a table, one
    join+agg pass scores every doc, a second agg reduces the gradient
    to N_BUCKETS+1 rows collected driver-side. The corpus is read
    from the persisted feature table, never re-tokenized."""
    feats = feats.persist()
    # materialize the feature cache FIRST and count docs from it — a
    # labels.count() here would tokenize the corpus a second time
    n_docs = feats.select("doc_id").distinct().count()
    w = [0.0] * N_BUCKETS
    bias = 0.0
    trace = []
    for it in range(iters):
        wdf = F.broadcast(
            spark.createDataFrame(
                [(i, w[i]) for i in range(N_BUCKETS)], "b int, wt double"
            )
        )
        scored = (
            feats.join(wdf, "b")
            .groupBy("doc_id", "y")
            .agg(
                F.sum(
                    (F.col("x") * F.col("wt")).cast("decimal(27,15)")
                )
                .cast("double")
                .alias("s")
            )
            .select(
                "doc_id",
                "y",
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.col("s") + F.lit(bias))))
                ).alias("p"),
            )
            .persist()  # stats AND the gradient read it — score once
        )
        # loss/accuracy + bias gradient in one model-sized aggregate
        stats = scored.agg(
            F.sum(
                (
                    -(
                        F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                        + (1 - F.col("y"))
                        * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))
                    )
                ).cast("decimal(27,15)")
            )
            .cast("double")
            .alias("loss"),
            F.sum(
                F.when(
                    (F.col("p") >= 0.5) == (F.col("y") == 1), 1
                ).otherwise(0)
            ).alias("correct"),
            F.sum((F.col("p") - F.col("y")).cast("decimal(27,15)"))
            .cast("double")
            .alias("gb"),
        ).collect()[0]
        grad = (
            feats.join(scored.select("doc_id", "p"), "doc_id")
            .groupBy("b")
            .agg(
                F.sum(
                    ((F.col("p") - F.col("y")) * F.col("x")).cast(
                        "decimal(27,15)"
                    )
                )
                .cast("double")
                .alias("g")
            )
            .collect()
        )
        scored.unpersist()
        gmap = {r.b: r.g for r in grad}
        w = [w[i] - eta * gmap.get(i, 0.0) / n_docs for i in range(N_BUCKETS)]
        bias = bias - eta * float(stats.gb) / n_docs
        trace.append(
            {
                "iteration": it + 1,
                "loss": round(float(stats.loss) / n_docs, 6),
                "accuracy": round(int(stats.correct) / n_docs, 6),
            }
        )
    feats.unpersist()
    return w + [bias], trace

