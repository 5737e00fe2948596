"""Query registry — the single source of truth for the t2 contract.

Each operator from SURVEY.md §2B registers here with:
  - a Spark callable ``(spark, sf_dir) -> DataFrame``
  - an equivalent DuckDB oracle SQL string (or None for rows-only ops:
    approximate / streaming / hash-dependent semantics)

``__spark_entry__.py`` delegates to :func:`queries` / :func:`oracle_sql`.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules whose import registers queries. Order = SURVEY §7 build order.
_QUERY_MODULES = [
    "opusdb_spark.queries.scans",
    "opusdb_spark.queries.filters",
    "opusdb_spark.queries.joins",
    "opusdb_spark.queries.aggregates",
    "opusdb_spark.queries.windows",
    "opusdb_spark.queries.sorts",
    "opusdb_spark.queries.setops",
    "opusdb_spark.queries.scalar_functions",
    "opusdb_spark.queries.subqueries",
    "opusdb_spark.queries.reshape",
    "opusdb_spark.queries.versioned",
    "opusdb_spark.queries.streaming_batch",
    "opusdb_spark.queries.udfs",
    "opusdb_spark.queries.llm",
]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}
_LOADED = False


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


def registry() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    _load()
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
