"""Classic TPC-H query shapes over the driver's TPC-H-ish tables.

Each query is ONE ANSI-SQL string executed verbatim by BOTH engines —
Spark (spark.sql over registered views) and the DuckDB oracle — so the
parity check also pins Spark's SQL-dialect conformance, not just the
DataFrame API. Shapes are adapted only where the pruned schema lacks a
column (no partsupp table; orders has no o_shippriority/clerk;
customer has no phone/address): the join/agg/filter structure — what
Catalyst has to plan — is the original.

Exactness: every revenue/price sum routes through per-element
CAST(... AS DECIMAL(27,6)) so partial-aggregation order can't change
the double result (exactness.py contract). l_extendedprice and
l_discount are doubles; their product is the same IEEE double in both
engines, and the decimal cast quantizes identically (6-dp grid).

The flagship Q1 lives in aggregates.py (`agg_q1`); Q5 is
joins.py `join_multiway`; Q15 is subqueries.py `cte_query`; Q17 is
subqueries.py `sub_correlated`. This module adds the rest of the
schema-compatible classics.
"""

from __future__ import annotations

from opusdb_spark.registry import register
from opusdb_spark.tables import register_views

_REV = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)"


def _sql_query(name: str, sql: str, doc: str):
    @register(name, oracle=sql, tags=("tpch", "sql"))
    def q(spark, sf_dir, _sql=sql):
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    q.__doc__ = doc
    q.__name__ = name
    return q


TPCH_Q3 = f"""
    SELECT l.l_orderkey,
           {_REV} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate > DATE '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
"""

TPCH_Q6 = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""

TPCH_Q7 = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""

TPCH_Q8 = """
    SELECT o_year,
           ROUND(
               CAST(SUM(CAST(CASE WHEN nation = 'NATION_1' THEN volume
                                  ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
               / CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE),
               6) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
          AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""

TPCH_Q10 = f"""
    SELECT c.c_custkey, c.c_name, {_REV} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1996-10-01'
      AND o.o_orderdate < DATE '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""

TPCH_Q13 = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""

TPCH_Q14 = """
    SELECT ROUND(
        100.0
        * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                             THEN l.l_extendedprice * (1 - l.l_discount)
                             ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(27,6))) AS DOUBLE),
        6) AS promo_revenue_pct,
        CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1997-09-01'
      AND l.l_shipdate < DATE '1997-10-01'
"""

TPCH_Q18 = f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE)
               AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 210
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
"""

_sql_query(
    "tpch_q3",
    TPCH_Q3,
    "TPC-H Q3 shape (shipping-priority top orders): 3-way join, "
    "segment + date-range filters pushed to the scans, "
    "TakeOrderedAndProject top-10 by decimal-exact revenue.",
)
_sql_query(
    "tpch_q6",
    TPCH_Q6,
    "TPC-H Q6 (forecast revenue change): pure scan-filter-agg — every "
    "predicate reaches PushedFilters; the canonical pushdown probe.",
)
_sql_query(
    "tpch_q7",
    TPCH_Q7,
    "TPC-H Q7 shape (bilateral nation volume): 6-way join with a "
    "symmetric OR nation predicate and per-year decimal-exact volume.",
)
_sql_query(
    "tpch_q8",
    TPCH_Q8,
    "TPC-H Q8 shape (market share): 8-way star join; share = guarded "
    "decimal ratio per year.",
)
_sql_query(
    "tpch_q10",
    TPCH_Q10,
    "TPC-H Q10 shape (returned-item reporting): returnflag filter, "
    "4-way join, top-20 customers by decimal-exact lost revenue.",
)
_sql_query(
    "tpch_q13",
    TPCH_Q13,
    "TPC-H Q13 (customer order-count distribution): LEFT OUTER join "
    "with an ON-clause residual filter, double aggregation — the "
    "null-preserving outer-join histogram.",
)
_sql_query(
    "tpch_q14",
    TPCH_Q14,
    "TPC-H Q14 (promotion effect): conditional revenue share over one "
    "month, decimal-exact numerator/denominator.",
)
_sql_query(
    "tpch_q18",
    TPCH_Q18,
    "TPC-H Q18 (large-volume customers): HAVING-subquery IN filter on "
    "the fact table (Catalyst plans a semi join), then re-join and "
    "re-aggregate.",
)
