"""Projection / filter / predicate queries (SURVEY §2B).

Anchor: the reference's only predicate-guarded operation — the
conditional transfer `(when (>= balance amount) …)` (bank.clj:10-18) —
generalized to the full predicate algebra over columnar scans. All
row-level arithmetic stays in double (IEEE-deterministic per row, so
values hash-match the oracle bit-for-bit without rounding).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opusdb_spark.registry import register
from opusdb_spark.tables import table


@register(
    "project_arith",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        FROM lineitem
    """,
    tags=("project",),
)
def project_arith(spark, sf_dir):
    """Arithmetic projection: revenue / charge expressions per row."""
    lt = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return lt.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("revenue"),
        (disc * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


@register(
    "filter_range",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("filter",),
)
def filter_range(spark, sf_dir):
    """TPC-H Q6-shaped range predicates (guarded op anchor, bank.clj:13)."""
    lt = table(spark, sf_dir, "lineitem")
    return lt.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice"
    )


@register(
    "filter_in_like_null",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM orders
        WHERE o_orderstatus IN ('O', 'F')
          AND o_orderpriority LIKE '1-%'
          AND o_custkey IS NOT NULL
          AND o_totalprice BETWEEN 1000 AND 200000
    """,
    tags=("filter",),
)
def filter_in_like_null(spark, sf_dir):
    """isin / like / null-check / between predicate combination."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_custkey").isNotNull()
        & F.col("o_totalprice").between(1000, 200000)
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@register(
    "case_when",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity < 10 THEN 'small'
                    WHEN l_quantity < 30 THEN 'medium'
                    ELSE 'large' END AS qty_band,
               CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END
                   AS returned_price
        FROM lineitem
    """,
    tags=("project",),
)
def case_when(spark, sf_dir):
    """Multi-branch conditional columns (conditional-transfer anchor, bank.clj:13-16)."""
    lt = table(spark, sf_dir, "lineitem")
    return lt.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_band"),
        F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))
        .otherwise(F.lit(0.0))
        .alias("returned_price"),
    )


# The sample hash is the engine-portable md5-bit construction
# (operators/text.py:word_hash48_sql), written in the SQL subset both
# engines share — so the SAME ~10% of keys is selected by any engine
# that replays it (a sample that only Spark can reproduce is not
# "repeatable" in a multi-engine pipeline), and the oracle hash-checks
# it (upgraded from rows-only in r9; Spark's hash() is murmur3,
# DuckDB's is different — neither replays the other).
def _sample_hash_sql() -> str:
    from opusdb_spark.operators.text import word_hash48_sql

    return word_hash48_sql("CAST(o_orderkey AS STRING)", salt="sample:")


@register(
    "filter_hash_sample",
    oracle=f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE {_sample_hash_sql()} % 10 = 0
    """,
    tags=("filter", "sample"),
)
def filter_hash_sample(spark, sf_dir):
    """Deterministic ~10% sample: portable_hash48(key) % 10 = 0.

    Hash-based so the sample is stable across partitioning, re-runs,
    AND engines (md5-bit arithmetic, replayable anywhere) — the
    scalable form of repeatable sampling (no global sort, no RNG
    state); at 100 TB this is a pure map-side filter.
    """
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.pmod(F.expr(_sample_hash_sql()), F.lit(10)) == 0
    ).select("o_orderkey", "o_custkey", "o_totalprice")
