"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``linux_logs_spark``: the engine's query registry
(one entry per operator in SURVEY.md §2) provides both the Spark
callables and the DuckDB oracle SQL. The driver runs ``entry(spark)``
as a smoke check, then each ``queries()[name]`` at sf=0.01 against
``oracle_sql()[name]``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from linux_logs_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    flagship = all_queries()["agg_groupby"]
    return flagship.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted → rows-only check."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
