"""Projections, filters, predicates (SURVEY.md §2.2).

These are the reference's bread-and-butter "search the log store"
operations re-expressed declaratively: every predicate here is
sargable, so Catalyst pushes it into the parquet scan (visible as
PushedFilters in .explain), and column pruning trims the read schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linux_logs_spark.catalog import load
from linux_logs_spark.registry import register


@register(
    "q_project",
    "relational",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charged,
       l_quantity
FROM lineitem
""",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level float expressions stay UNROUNDED: with identical
    parenthesization the doubles are IEEE-bit-identical across engines,
    whereas round(x, 2) breaks ties differently (compat.py).
    """
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charged"),
        "l_quantity",
    )


@register(
    "q_filter_basic",
    "relational",
    oracle="""
SELECT l_orderkey, l_partkey, l_quantity, l_discount
FROM lineitem
WHERE l_quantity > 30 AND l_discount < 0.05 AND l_returnflag <> 'A'
""",
)
def q_filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & (F.col("l_discount") < 0.05)
        & (F.col("l_returnflag") != "A")
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_discount")


@register(
    "q_filter_in_between",
    "relational",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 50000 AND 150000
  AND nullif(o_orderstatus, 'P') IS NOT NULL
""",
)
def q_filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 150000)
        & F.nullif(F.col("o_orderstatus"), F.lit("P")).isNotNull()
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "q_filter_like",
    "relational",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE (p_name LIKE '%red%' OR p_type LIKE 'SMALL%')
  AND regexp_matches(p_brand, '^Brand#1[0-9]$')
""",
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        (F.col("p_name").like("%red%") | F.col("p_type").like("SMALL%"))
        & F.col("p_brand").rlike("^Brand#1[0-9]$")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "q_case_when",
    "relational",
    oracle="""
SELECT event_id,
       event_type,
       CASE event_type
            WHEN 'error' THEN 3
            WHEN 'purchase' THEN 2
            WHEN 'signup' THEN 2
            ELSE 1
       END AS severity,
       coalesce(nullif(event_type, 'click'), 'interaction') AS kind,
       CASE WHEN value > 30 THEN round(value, 2) ELSE 0.0 END AS big_value
FROM events
""",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sev = (
        F.when(F.col("event_type") == "error", 3)
        .when(F.col("event_type").isin("purchase", "signup"), 2)
        .otherwise(1)
    )
    return e.select(
        "event_id",
        "event_type",
        sev.alias("severity"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("click")), F.lit("interaction")).alias(
            "kind"
        ),
        F.when(F.col("value") > 30, F.round("value", 2)).otherwise(F.lit(0.0)).alias("big_value"),
    )
