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
from linux_logs_spark.operators import (  # noqa: F401
    aggregates,
    joins,
    log_analytics,
    relational,
    windows,
)
from linux_logs_spark.catalog import register_views
from linux_logs_spark.registry import _REGISTRY, register


def _twin(original: str, spark_sql: str | None = None):
    """Register <original>_sql: run the original's oracle text through
    spark.sql(), sharing that very string as the DuckDB oracle.

    spark_sql overrides the Spark-side text where an engine-defined
    detail (not query semantics) differs — e.g. ranking functions are
    INT in Spark but BIGINT in DuckDB, and the driver hash-compares
    dtypes, so the Spark text adds width casts."""
    sql = _REGISTRY[original].oracle
    category = _REGISTRY[original].category

    @register(f"{original}_sql", category, oracle=sql)
    def run(spark: SparkSession, sf_dir: str, _sql: str = spark_sql or sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    return run


q_filter_basic_sql = _twin("q_filter_basic")
agg_groupby_sql = _twin("agg_groupby")
log_error_rate_hourly_sql = _twin("log_error_rate_hourly")
join_inner_equi_sql = _twin("join_inner_equi")
# WINDOW clause + full ranking family; Spark text casts the ranking
# outputs to BIGINT (Spark: INT, DuckDB: BIGINT — width, not values)
win_ranking_sql = _twin(
    "win_ranking",
    spark_sql="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank()       OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS prank,
       cume_dist()    OVER w AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
