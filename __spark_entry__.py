"""Driver contract for the spark-graft builder (PySpark target).

Delegates to opusdb_spark.registry — the single source of truth mapping
SURVEY.md §2B operator keys to (Spark callable, DuckDB oracle SQL).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from opusdb_spark import registry as _registry  # noqa: E402
from opusdb_spark.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1, `agg_q1`) on /root/testdata/sf0.001."""
    apply_runtime_confs(spark)
    return _registry.queries()["agg_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted → rows-only check)."""
    return _registry.oracle_sql()
