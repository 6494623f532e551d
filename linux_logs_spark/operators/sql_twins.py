"""SQL-string twins — the ANTLR parser path (SURVEY.md §3.2).

Three representative §2 queries re-registered as ``spark.sql()``
forms. Each twin executes the SAME ANSI text Spark-side that DuckDB
runs as its oracle: one string, two engines, hash-compared — the
strongest possible statement that the SQL surface parses and
evaluates identically. The DataFrame originals stay the hot-path
forms; the twins exist to exercise parse → analyze → optimize over
named views (catalog.register_views, replaced idempotently per call
so a driver-supplied fresh session always resolves).

Costs are the originals' plus view registration; the plan after
analysis is identical to the DataFrame form's, so every pushdown /
partial-agg property pinned by tests/test_plans.py holds here too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Import the originator modules (idempotent under the registry loader)
# so their registrations exist before we read their oracle strings.
from linux_logs_spark.operators import aggregates, log_analytics, relational  # noqa: F401
from linux_logs_spark.catalog import register_views
from linux_logs_spark.registry import _REGISTRY, register


def _twin(original: str):
    """Register <original>_sql: run the original's oracle text through
    spark.sql(), sharing that very string as the DuckDB oracle."""
    sql = _REGISTRY[original].oracle
    category = _REGISTRY[original].category

    @register(f"{original}_sql", category, oracle=sql)
    def run(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    return run


q_filter_basic_sql = _twin("q_filter_basic")
agg_groupby_sql = _twin("agg_groupby")
log_error_rate_hourly_sql = _twin("log_error_rate_hourly")
