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

# Plan notes: (a) the textbook Q18 re-joins lineitem and re-aggregates
# the same per-order quantity sum its IN/HAVING subquery already
# computed — neither Catalyst nor DuckDB fuses the two, so the fact
# table is scanned AND shuffled on l_orderkey twice. The outer grouping
# keys are all per-order constants, so the re-aggregation is exactly
# the subquery's sum: compute it once, keep only qualifying orders (a
# tiny set), then join orders+customer. (b) l_quantity is integral by
# the TPC-H spec (1–50, verified over the fixture) — SUM(CAST(...AS
# BIGINT)) is exact in both engines and ~3× faster than the
# DECIMAL(27,6) sum the generic exactness contract uses for genuinely
# fractional doubles (11.7 s → 3.9 s for the 1.47M-group aggregate at
# sf1). Together: 6.8 s → ~4 s at sf1.
TPCH_Q18 = f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(t.total_qty AS DOUBLE) AS total_qty
    FROM (
        SELECT l_orderkey,
               SUM(CAST(l_quantity AS BIGINT)) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 210
    ) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
"""

TPCH_Q2 = """
    SELECT DISTINCT s.s_acctbal AS s_acctbal, s.s_name AS s_name,
           n.n_name AS n_name, p.p_partkey AS p_partkey, p.p_type AS p_type
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_size = 15
      AND s.s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""

TPCH_Q4 = """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-07-01'
      AND o.o_orderdate < DATE '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""

TPCH_Q9 = """
    SELECT nation, o_year,
           CAST(SUM(CAST(amount AS DECIMAL(27,6))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - p.p_retailprice * l.l_quantity * 0.1 AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""

# Threshold note: the official Q11 fraction is 0.0001/SF — it SCALES
# WITH THE DATA. A fixed fraction goes vacuous as the corpus grows
# (0.001 returned 0 rows at sf0.01 — the round-5 vacuous pass; 0.0001
# returned 0 rows at sf1). The scale-free form keeps the spec's intent
# — "parts holding an outsized share of stock value" — by comparing
# each part to 2× the AVERAGE part value, with the compare as decimal
# MULTIPLICATIONS only (v·n_parts > total·2): division would introduce
# engine-specific decimal scales; products stay exact. Non-vacuous at
# every SF (17 / 116 / 1172 / 11720 rows at sf0.001/0.01/0.1/1).
#
# Plan note: the global count/sum are OVER () window aggregates, not
# scalar subqueries over a CTE. Catalyst INLINES `WITH` — a `t`
# referenced three times runs the 4-table join+agg three times (BENCH
# r7: 9.5 s vs 1.0 s at sf0.1); the window form computes t once by
# construction in both engines. The OVER () exchange moves only the
# one-nation part-value aggregate (#parts/25 rows), never lineitem.
TPCH_Q11 = """
    SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
    FROM (
        SELECT l_partkey, v,
               COUNT(*) OVER () AS n_parts,
               SUM(v) OVER () AS total_v
        FROM (
            SELECT l.l_partkey AS l_partkey,
                   SUM(CAST(l.l_quantity * p.p_retailprice
                            AS DECIMAL(27,6))) AS v
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_3'
            GROUP BY l.l_partkey
        ) t
    )
    WHERE v * n_parts > total_v * 2
    ORDER BY part_value DESC, l_partkey
"""

TPCH_Q12 = """
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A','R')
      AND l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
"""

TPCH_Q16 = """
    SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 4, 7, 10, 14, 19, 23, 36)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

TPCH_Q19 = f"""
    SELECT {_REV} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
"""

TPCH_Q20 = """
    SELECT s.s_name AS s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l.l_shipdate >= DATE '1997-01-01'
          AND l.l_shipdate < DATE '1998-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(27,6))) > 50)
    ORDER BY s_name
"""

TPCH_Q21 = """
    SELECT s.s_name AS s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""

TPCH_Q22 = """
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT CAST(c.c_nationkey % 7 AS INT) AS cntrycode,
             c.c_acctbal AS c_acctbal
      FROM customer c
      WHERE c.c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
                 / COUNT(*)
          FROM customer c2 WHERE c2.c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= DATE '1999-01-01')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
"""

_sql_query(
    "tpch_q2",
    TPCH_Q2,
    "TPC-H Q2 shape (min-cost supplier): correlated scalar-MIN subquery "
    "re-joining the same 4-table chain as the outer query. Adapted — no "
    "partsupp table, so 'supplies part X' is derived from lineitem and "
    "min supply cost becomes min supplier acctbal; the plan shape "
    "(decorrelated min-agg joined back on the correlation key) is the "
    "original's.",
)
_sql_query(
    "tpch_q4",
    TPCH_Q4,
    "TPC-H Q4 shape (order-priority checking): EXISTS semi-join from "
    "orders into lineitem plus a priority histogram. Adapted — the "
    "pruned lineitem has no commit/receipt dates, so the late-delivery "
    "predicate becomes l_returnflag = 'R'.",
)
_sql_query(
    "tpch_q9",
    TPCH_Q9,
    "TPC-H Q9 shape (product-type profit by nation and year): 5-way "
    "join, LIKE filter on part name, per-(nation, year) decimal-exact "
    "profit. Adapted — no partsupp, so supply cost is proxied by "
    "p_retailprice * quantity * 0.1.",
)
_sql_query(
    "tpch_q11",
    TPCH_Q11,
    "TPC-H Q11 shape (important stock): grouped value per part with a "
    "scalar subquery threshold in HAVING (decimal on both sides so the "
    "boundary compare is exact). Adapted — partsupp value becomes "
    "quantity * retailprice from lineitem.",
)
_sql_query(
    "tpch_q12",
    TPCH_Q12,
    "TPC-H Q12 shape (shipping-class priority counts): orders-lineitem "
    "join with conditional CASE counts per class. Adapted — no "
    "l_shipmode column, so the two-mode filter becomes "
    "l_returnflag IN ('A','R').",
)
_sql_query(
    "tpch_q16",
    TPCH_Q16,
    "TPC-H Q16 shape (supplier count by part attrs): COUNT(DISTINCT "
    "supplier) per (brand, type, size) with a NOT IN supplier "
    "blacklist. Adapted — part-supplier pairs come from lineitem "
    "instead of partsupp; the complaints blacklist becomes negative "
    "account balance.",
)
_sql_query(
    "tpch_q19",
    TPCH_Q19,
    "TPC-H Q19 (discounted revenue, disjunctive predicates): three OR "
    "branches each mixing part and lineitem columns — the classic "
    "CNF-conversion / partial-pushdown probe.",
)
_sql_query(
    "tpch_q20",
    TPCH_Q20,
    "TPC-H Q20 shape (excess-stock suppliers): nested IN chains — "
    "suppliers IN (grouped lineitem HAVING qty threshold, parts IN "
    "name-LIKE list) — filtered to one region. Adapted — availqty "
    "threshold becomes shipped-quantity threshold.",
)
_sql_query(
    "tpch_q21",
    TPCH_Q21,
    "TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS plus "
    "NOT EXISTS self-joins on the fact table under the same "
    "correlation key with <> residuals. Adapted — 'late' is "
    "l_returnflag = 'R' (no receipt/commit dates in the pruned "
    "schema).",
)
_sql_query(
    "tpch_q22",
    TPCH_Q22,
    "TPC-H Q22 shape (global sales opportunity): scalar-AVG threshold "
    "subquery (decimal-summed so the boundary is engine-independent) "
    "plus NOT EXISTS anti-join into orders. Adapted — country code is "
    "c_nationkey % 7 (no phone column) and 'no orders' is 'no orders "
    "since 1999' so the result is non-empty at test scale.",
)

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
    "TPC-H Q18 (large-volume customers): one per-order quantity "
    "aggregate with a HAVING filter, qualifying orders joined to "
    "orders+customer (the IN-subquery's re-aggregation fused away — "
    "one fact-table pass instead of two).",
)
