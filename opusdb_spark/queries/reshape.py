"""Pivot / unpivot reshaping (SURVEY §2B, mandate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opusdb_spark.registry import register
from opusdb_spark.tables import table


@register(
    "pivot_status",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F",
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O",
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P"
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("reshape",),
)
def pivot_status(spark, sf_dir):
    """Order counts pivoted by status. Pivot values are pinned explicitly
    — at scale an unpinned pivot needs an extra distinct pass to discover
    them. (SUM CASE with no ELSE so absent cells are NULL on both sides.)"""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )


@register(
    "unpivot_melt",
    oracle="""
        SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
        UNION ALL
        SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    """,
    tags=("reshape",),
)
def unpivot_melt(spark, sf_dir):
    """Melt part attributes into (attr, val) rows via stack() — a
    zero-shuffle generator (each input row yields 2 output rows)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'retailprice', p_retailprice,"
            " 'size', CAST(p_size AS DOUBLE)) AS (attr, val)"
        ),
    )
