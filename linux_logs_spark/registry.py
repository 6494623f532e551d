"""Central query registry — the engine's verifiable surface.

Every operator from SURVEY.md §2 registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``,
- optionally the equivalent ANSI SQL for the DuckDB oracle (None for
  genuinely non-SQL-expressible ops → the driver falls back to a
  rows-only check).

``__spark_entry__.py`` exposes this registry to the driver; tests and
bench.py iterate it too, so one registration makes an operator
smoke-tested, oracle-checked, and benchmarked.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import. Kept explicit so the import
# order (and thus registry order) is deterministic.
_QUERY_MODULES = (
    "linux_logs_spark.operators.scans",
    "linux_logs_spark.operators.relational",
    "linux_logs_spark.operators.joins",
    "linux_logs_spark.operators.aggregates",
    "linux_logs_spark.operators.windows",
    "linux_logs_spark.operators.sorts_sets",
    "linux_logs_spark.operators.functions_scalar",
    "linux_logs_spark.operators.log_analytics",
    "linux_logs_spark.operators.udfs",
    "linux_logs_spark.operators.llm_pipeline",
    "linux_logs_spark.operators.extras",
    "linux_logs_spark.streaming.queries",
)

_loaded = False


def register(name: str, category: str, oracle: str | None = None):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, category=category, fn=fn, oracle=oracle)
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def get_query(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]
