"""Interleaved A/B: emb_covariance pair-product stream — interpreted
nested transform() array build vs chained codegen explode(sequence())
Generates (r13, guide §4.1). Usage:
    python scripts/ab_cov.py <sf_dir> <rounds> <out_json>
Times the FULL query (noop sink) for both shapes, alternating, plus a
floor probe per round. Also asserts the two shapes' outputs are
identical (exceptAll both ways) at the given SF before timing.
"""

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from opusdb_spark.operators.skew import spread  # noqa: E402
from opusdb_spark.session import get_spark  # noqa: E402
from opusdb_spark.tables import table  # noqa: E402

sf_dir, rounds, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark()

DIM = 64


def old_shape():
    emb = spread(table(spark, sf_dir, "embeddings"))
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: F.transform(
                F.sequence(i, F.lit(DIM)),
                lambda j: (
                    F.element_at("embedding", i).cast("double")
                    * F.element_at("embedding", j).cast("double")
                ),
            ),
        )
    )
    flat = emb.select(F.posexplode(pairs).alias("pos", "xy"))
    by_pos = flat.groupBy("pos").agg(
        F.sum(F.col("xy").cast("decimal(27,12)")).cast("double").alias("sxy")
    )
    ij = [
        (pos, i, j)
        for pos, (i, j) in enumerate(
            (i, j) for i in range(1, DIM + 1) for j in range(i, DIM + 1)
        )
    ]
    mapping = spark.createDataFrame(ij, "pos int, i int, j int")
    return by_pos.join(F.broadcast(mapping), "pos").select("i", "j", "sxy")


def new_shape():
    emb = spread(table(spark, sf_dir, "embeddings"))
    e1 = emb.select(
        "embedding", F.explode(F.sequence(F.lit(1), F.lit(DIM))).alias("i")
    )
    e2 = e1.select(
        "embedding", "i", F.explode(F.sequence(F.col("i"), F.lit(DIM))).alias("j")
    )
    flat = e2.select(
        "i",
        "j",
        (
            F.element_at("embedding", F.col("i")).cast("double")
            * F.element_at("embedding", F.col("j")).cast("double")
        ).alias("xy"),
    )
    return flat.groupBy("i", "j").agg(
        F.sum(F.col("xy").cast("decimal(27,12)")).cast("double").alias("sxy")
    )


def noop(df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


# equivalence gate
a, b = old_shape(), new_shape()
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
assert d1 == 0 and d2 == 0, f"shape mismatch: {d1} / {d2}"

res = {"old": [], "new": [], "floor_ms": []}
for r in range(rounds):
    t0 = time.monotonic()
    spark.range(1).write.format("noop").mode("overwrite").save()
    res["floor_ms"].append(round((time.monotonic() - t0) * 1000, 1))
    if r % 2 == 0:
        res["old"].append(round(noop(old_shape()), 3))
        res["new"].append(round(noop(new_shape()), 3))
    else:
        res["new"].append(round(noop(new_shape()), 3))
        res["old"].append(round(noop(old_shape()), 3))

with open(out_path, "w") as f:
    json.dump(res, f)
print(json.dumps(res))
