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

Cross-engine exactness (r12, VERDICT r11 ask #5): the per-doc
probability is the ONE transcendental in the recurrence — JVM
Math.exp and a second engine's libm can disagree by 1 ulp, and a
1-ulp p difference COMPOUNDS through the weight updates of later
iterations (unlike the inference key, where it's absorbed once by the
final 6-dp round). So p itself snaps to the 6-dp grid before anything
consumes it: both engines then chain bit-identical weights/bias, and
the only residual divergence class is a 1-ulp exp landing within
1e-16 of a 5e-7 grid midpoint (~2e-10 per doc-iteration — the same
accepted class as every ln/corr oracle, see exactness.py). A 1e-6
probability grid is far inside the noise of 5-step batch GD. Bumping
TRAIN_VERSION busts persisted model artifacts on semantic changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# DuckDB-kernel rounding, not Python banker's (the emb_kmeans
# convention): the trace is oracle-replayed since r12
from opusdb_spark.exactness import round_like_duckdb

N_BUCKETS = 256
# Training-procedure version: part of every persisted-model fingerprint
# (a semantic change here must retrain, not reuse a stale artifact).
# v2 = p quantized to the 6-dp grid inside the GD loop (r12).
TRAIN_VERSION = 2


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
    scale — see skew.spread).

    r13 (guide §2.4 — share the partitioning): the per-doc word total
    is a window SUM over the (doc_id, b) aggregate instead of a second
    tokenize pass joined back by doc_id. Before, `words` fed two
    subtrees — per-(doc,bucket) counts and per-doc totals — so the
    corpus was scanned and exploded TWICE (plan: two Scan+Generate
    chains) and the totals re-attached through a join. Σc over the
    doc_id window IS the word count (same filtered stream), and the
    window's doc_id exchange is reused by the downstream per-doc logit
    aggregate (ClusteredDistribution(doc_id, y) is satisfied by
    HashPartitioning(doc_id)), so scoring drops one full corpus pass
    and one join. x is bit-identical: same count, same double/long
    division."""
    from pyspark.sql import Window

    from opusdb_spark.operators.skew import spread

    docs = spread(docs)
    words = docs.select(
        "doc_id",
        label_col.alias("y"),
        F.explode(F.split("text", " ")).alias("w"),
    ).filter(F.col("w") != "")
    pairs = (
        words.select("doc_id", "y", F.expr(bucket_expr).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"), F.min("y").alias("y"))
    )
    wnd = Window.partitionBy("doc_id")
    feats = pairs.select(
        "doc_id",
        "b",
        (F.col("c").cast("double") / F.sum("c").over(wnd)).alias("x"),
        "y",
    )
    labels = pairs.groupBy("doc_id").agg(
        F.min("y").alias("y"), F.sum("c").alias("n")
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
                # 6-dp grid snap: see the module docstring — without it
                # JVM-vs-libm exp ulps compound through the iterations
                F.round(
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.col("s") + F.lit(bias)))),
                    6,
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
                "loss": round_like_duckdb(float(stats.loss) / n_docs, 6),
                "accuracy": round_like_duckdb(int(stats.correct) / n_docs, 6),
            }
        )
    feats.unpersist()
    return w + [bias], trace

