"""Subqueries / CTEs / reshaping via Spark SQL (SURVEY §2B).

These are declared in SQL so Catalyst's subquery rewrites (scalar
subquery → join, IN → semi-join, correlated agg → decorrelated join —
all absent in the reference, SURVEY §4.1) do the planning. Thresholds
derived from aggregates use the exact-decimal form on both engines so
boundary comparisons are bit-identical.
"""

from __future__ import annotations

from opusdb_spark.registry import register
from opusdb_spark.tables import register_views

# Exact global average (identical double in both engines).
_AVG_PRICE = (
    "CAST(SUM(CAST(p_retailprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)"
)


_SUB_SCALAR = f"""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT {_AVG_PRICE} FROM part)
"""


@register("sub_scalar", oracle=_SUB_SCALAR, tags=("subquery",))
def sub_scalar(spark, sf_dir):
    """Scalar subquery: parts above the global average retail price."""
    register_views(spark, sf_dir)
    return spark.sql(_SUB_SCALAR)


_SUB_IN = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
"""


@register("sub_in", oracle=_SUB_IN, tags=("subquery",))
def sub_in(spark, sf_dir):
    """IN-subquery → planned as a left-semi join."""
    register_views(spark, sf_dir)
    return spark.sql(_SUB_IN)


# l_quantity is integral by the TPC-H spec (1–50, verified over the
# fixture): SUM(CAST(... AS BIGINT)) is exact in both engines and ~3×
# faster than the DECIMAL(27,6) sum needed for genuinely fractional
# doubles (the 200k-group aggregate dominated the 4.4 s sf1 time).
_SUB_CORRELATED = """
    SELECT l.l_orderkey, l.l_partkey, l.l_quantity
    FROM lineitem l
    WHERE l.l_quantity < (
        SELECT 0.2 * CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS DOUBLE)
                   / COUNT(*)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    )
"""


# The decorrelated-join form Catalyst plans from _SUB_CORRELATED scans
# lineitem TWICE (once for the per-partkey aggregate, once for the
# probe side) and — when the aggregate fits the broadcast threshold —
# serially builds a ~#partkeys-entry HashedRelation on the driver. The
# window form below computes the identical threshold with ONE scan and
# ONE hash shuffle of the fact (guide §2.4: two operations keyed the
# same way share one exchange): measured at sf1, 3.65 → 2.57 s (noop
# sink, warm), rows identical (exceptAll both ways = 0; the r13 parity
# harness value-hashes it against the unchanged correlated oracle). At
# 100 TB the window shape also strictly dominates: same shuffle bytes
# as the join's probe side, half the scans, no driver-side relation
# build.
_SUB_CORRELATED_WINDOW = """
    SELECT l_orderkey, l_partkey, l_quantity FROM (
        SELECT l_orderkey, l_partkey, l_quantity,
               0.2 * CAST(SUM(CAST(l_quantity AS BIGINT))
                          OVER (PARTITION BY l_partkey) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY l_partkey) AS thresh
        FROM lineitem
    ) WHERE l_quantity < thresh
"""


@register("sub_correlated", oracle=_SUB_CORRELATED, tags=("subquery",))
def sub_correlated(spark, sf_dir):
    """TPC-H Q17 shape: correlated aggregate subquery, evaluated as a
    single-pass window over l_partkey (see _SUB_CORRELATED_WINDOW note;
    the DuckDB oracle keeps the correlated form, so the subquery
    semantics are still value-checked end-to-end)."""
    register_views(spark, sf_dir)
    return spark.sql(_SUB_CORRELATED_WINDOW)


# Plan note: the CTE is referenced ONCE and the global max is an
# OVER () window — Catalyst inlines `WITH`, so the textbook form
# (`WHERE total_revenue = (SELECT MAX(...) FROM revenue)`) re-runs the
# lineitem aggregation per reference. The window exchange moves only
# the supplier-count-sized aggregate, never lineitem.
_CTE_QUERY = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
                    AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN (
        SELECT supplier_no, total_revenue,
               MAX(total_revenue) OVER () AS max_revenue
        FROM revenue
    ) r ON s_suppkey = r.supplier_no
    WHERE total_revenue = max_revenue
"""


@register("cte_query", oracle=_CTE_QUERY, tags=("subquery", "cte"))
def cte_query(spark, sf_dir):
    """TPC-H Q15 shape: a revenue CTE feeding a global-max filter (top
    supplier by exact revenue — equality on identical doubles is safe).
    The max is an OVER () window so the CTE body runs once."""
    register_views(spark, sf_dir)
    return spark.sql(_CTE_QUERY)


_SUB_LATERAL = """
    SELECT o_orderkey, o_totalprice, mx.max_item_price
    FROM orders,
         LATERAL (SELECT MAX(l_extendedprice) AS max_item_price
                  FROM lineitem WHERE l_orderkey = o_orderkey) AS mx
    WHERE mx.max_item_price IS NOT NULL
"""


@register("sub_lateral", oracle=_SUB_LATERAL, tags=("subquery", "lateral"))
def sub_lateral(spark, sf_dir):
    """LATERAL correlated subquery in FROM: per-order max item price,
    restricted to orders with items (the engines disagree on whether an
    aggregate lateral keeps empty groups, so the query pins the
    common INNER semantics). Catalyst decorrelates to an aggregate +
    join on l_orderkey: one shuffle, never a per-row rescan."""
    register_views(spark, sf_dir)
    return spark.sql(_SUB_LATERAL)


_SUB_NOT_IN_NULLS = """
    WITH keys AS (
        SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                    ELSE o_custkey END AS k
        FROM orders
    )
    SELECT 'not_in' AS variant, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer WHERE c_custkey NOT IN (SELECT k FROM keys)
    UNION ALL
    SELECT 'not_exists', CAST(COUNT(*) AS BIGINT)
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = c.c_custkey)
"""


@register(
    "sub_not_in_nulls",
    oracle=_SUB_NOT_IN_NULLS,
    tags=("subquery", "null-semantics"),
)
def sub_not_in_nulls(spark, sf_dir):
    """The NOT IN / NULL trap, pinned as data: one NULL in the subquery
    makes NOT IN return ZERO rows (three-valued logic: x <> NULL is
    never true), while NOT EXISTS — the form people actually mean —
    still excludes only real matches. Both variants side by side so the
    trap is visible, not folklore. NOT EXISTS plans as an anti-join;
    the 100 TB advice is in the result: never NOT IN over a nullable
    key."""
    register_views(spark, sf_dir)
    return spark.sql(_SUB_NOT_IN_NULLS)
