"""Sorts, limits, top-k, set operations (SURVEY.md §2.6).

Global top-k compiles to TakeOrderedAndProject (per-partition heap +
driver merge of k rows) — no full sort, no full shuffle; that's the
plan that survives 100 TB. Full sorts use range partitioning
(repartitionByRange under orderBy) so they scale out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linux_logs_spark.catalog import load
from linux_logs_spark.registry import register


@register(
    "sort_multi",
    "sort",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
FROM orders
ORDER BY o_orderpriority DESC NULLS LAST, o_totalprice ASC, o_orderkey
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice").orderBy(
        F.col("o_orderpriority").desc_nulls_last(),
        F.col("o_totalprice").asc(),
        F.col("o_orderkey"),
    )


@register(
    "limit_topk",
    "sort",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K → TakeOrderedAndProject; deterministic via o_orderkey tiebreak."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "set_union_all",
    "setop",
    oracle="""
SELECT o_custkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 400000
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey", "o_totalprice")
    b = o.filter(F.col("o_totalprice") > 400000).select("o_custkey", "o_totalprice")
    return a.unionByName(b)


@register(
    "set_union_distinct",
    "setop",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    "setop",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 300000
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    "setop",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    # subtract() IS SQL EXCEPT (distinct). The previous
    # exceptAll(distinct).distinct() form diverged on duplicate LEFT
    # rows: exceptAll removes only one occurrence per right match, so
    # a doubled left key survived into the result while SQL EXCEPT
    # excludes it (round-5 review; latent only because c_custkey is
    # unique in the fixture).
    return c.subtract(o)


@register(
    "set_except_all",
    "setop",
    oracle="""
WITH d AS (
  SELECT l_partkey FROM lineitem WHERE l_quantity >= 10
  EXCEPT ALL
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT l_partkey, CAST(count(*) AS BIGINT) AS surplus
FROM d GROUP BY l_partkey
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag difference): per part, occurrences of
    high-quantity lines minus occurrences of returned lines — the
    multiplicity-aware complement set_except's DISTINCT semantics
    can't express (each right occurrence cancels exactly ONE left
    occurrence). Spark plans exceptAll as a generate+sum-count
    rewrite, not a join per row — one shuffle on the value, no
    row-pairing blowup, so the 100 TB shape is a single hash
    aggregate either side. The trailing count canonicalizes the bag
    into deterministic (value, multiplicity) rows for the hash
    compare — the surviving multiplicities ARE the semantics under
    test."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 10).select("l_partkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return a.exceptAll(b).groupBy("l_partkey").agg(
        F.count("*").alias("surplus")
    )


@register(
    "set_intersect_all",
    "setop",
    oracle="""
WITH d AS (
  SELECT l_partkey FROM lineitem WHERE l_quantity >= 10
  INTERSECT ALL
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT l_partkey, CAST(count(*) AS BIGINT) AS multiplicity
FROM d GROUP BY l_partkey
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL — min-of-multiplicities bag
    intersection, completing the set-op family (set_intersect is the
    DISTINCT form, set_except_all the bag difference). Spark plans
    intersectAll as the same generate+min-count rewrite as exceptAll:
    one shuffle on the value, per-key min of the two sides' counts,
    no row pairing. The trailing count canonicalizes the bag into
    deterministic (value, multiplicity) rows for the hash compare."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 10).select("l_partkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return a.intersectAll(b).groupBy("l_partkey").agg(
        F.count("*").alias("multiplicity")
    )
