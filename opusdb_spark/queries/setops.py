"""Set operations (SURVEY §2B, mandate).

Two customer slices — BUILDING-segment vs high-balance — combined four
ways. UNION ALL is a zero-shuffle concatenation; the distinct variants
hash-aggregate on all columns (one shuffle each).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opusdb_spark.registry import register
from opusdb_spark.tables import table


def _slices(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_nationkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_nationkey")
    return a, b


_A = "SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_B = "SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000"


@register("set_union_all", oracle=f"{_A} UNION ALL {_B}", tags=("setop",))
def set_union_all(spark, sf_dir):
    """Bag union — pure concatenation, no shuffle."""
    a, b = _slices(spark, sf_dir)
    return a.unionAll(b)


@register("set_union", oracle=f"{_A} UNION {_B}", tags=("setop",))
def set_union(spark, sf_dir):
    """Distinct union — concatenation + hash-dedup."""
    a, b = _slices(spark, sf_dir)
    return a.union(b).distinct()


@register("set_intersect", oracle=f"{_A} INTERSECT {_B}", tags=("setop",))
def set_intersect(spark, sf_dir):
    """Rows in both slices (distinct semantics)."""
    a, b = _slices(spark, sf_dir)
    return a.intersect(b)


@register("set_except", oracle=f"{_A} EXCEPT {_B}", tags=("setop",))
def set_except(spark, sf_dir):
    """Rows in the first slice only (distinct semantics)."""
    a, b = _slices(spark, sf_dir)
    return a.subtract(b)
