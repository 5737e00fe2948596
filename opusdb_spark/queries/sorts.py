"""Sorts / limits / top-k (SURVEY §2B).

Anchor: the reference's ordered log scan (log_mgr.clj:16-33) — the only
ordered read it has. Spark plans a global sort as range-partitioned
exchange + per-partition sort; `orderBy().limit()` becomes
TakeOrderedAndProject (per-partition top-k + driver merge — no global
sort), which is the scalable top-k at 100 TB.

Every limit query ties on a unique key so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opusdb_spark.registry import register
from opusdb_spark.tables import table


@register(
    "sort_multi",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment
        FROM customer
        ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey ASC
    """,
    tags=("sort",),
)
def sort_multi(spark, sf_dir):
    """Multi-key sort, mixed asc/desc, nulls-last."""
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment").orderBy(
        F.asc("c_mktsegment"), F.desc_nulls_last("c_acctbal"), F.asc("c_custkey")
    )


@register(
    "limit_n",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_orderkey LIMIT 100
    """,
    tags=("sort", "limit"),
)
def limit_n(spark, sf_dir):
    """LIMIT after a sort on a unique key (deterministic prefix)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


@register(
    "topk_global",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
        ORDER BY revenue DESC, l_orderkey, l_linenumber
        LIMIT 10
    """,
    tags=("sort", "limit"),
)
def topk_global(spark, sf_dir):
    """Global top-10 by revenue → TakeOrderedAndProject (no full sort);
    unique (orderkey, linenumber) tie-break keeps ties deterministic."""
    lt = table(spark, sf_dir, "lineitem")
    return (
        lt.select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(10)
    )
