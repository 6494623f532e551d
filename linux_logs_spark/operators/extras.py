"""Second-ring operators: pivot/unpivot, subqueries, CDC/SCD2 merge
emulation, bitwise functions, blocked vectorized similarity.

These round out the surface a user of a log-analytics + training-data
engine expects beyond SURVEY.md §2's core rows (pivot was called out
in the PySpark guide's OLAP patterns; SCD2 merge is the standard
"update the searchable store" operation when the store is immutable
parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linux_logs_spark.catalog import load
from linux_logs_spark.functions.compat import dsum, oracle_dsum
from linux_logs_spark.registry import register


@register(
    "agg_pivot",
    "aggregate",
    oracle=f"""
SELECT l_returnflag,
       {oracle_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 2)} AS qty_O,
       {oracle_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 2)} AS qty_F,
       count(*) FILTER (WHERE l_linestatus = 'O') AS n_O,
       count(*) FILTER (WHERE l_linestatus = 'F') AS n_F
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list (never let Spark scan for
    distinct pivot values at 100 TB — that's an extra full pass)."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            dsum("l_quantity", 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),  # count(*) is rejected inside pivot
        )
    )
    return p.select(
        "l_returnflag",
        F.col("O_qty").alias("qty_O"),
        F.col("F_qty").alias("qty_F"),
        F.col("O_n").alias("n_O"),
        F.col("F_n").alias("n_F"),
    )


@register(
    "agg_unpivot",
    "aggregate",
    oracle="""
SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS measure, CAST(c_nationkey AS DOUBLE) AS value
FROM customer
""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via the native unpivot operator — the lazy
    relational form of stack()."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "measure", "value")


@register(
    "q_subquery_scalar",
    "relational",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
""",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate — Catalyst plans the subquery
    once and broadcasts the scalar into the scan filter."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "q_exists_correlated",
    "relational",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
""",
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated by Catalyst into a semi-join
    (same plan the explicit left_semi query produces)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        """
    )


@register(
    "scd2_merge",
    "join",
    oracle="""
WITH updates AS (
  SELECT c_custkey, c_name, c_acctbal * 1.1 AS new_acctbal
  FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT c.c_custkey, c.c_name,
       CASE WHEN u.c_custkey IS NOT NULL THEN u.new_acctbal
            ELSE c.c_acctbal END AS acctbal,
       (u.c_custkey IS NOT NULL) AS is_updated
FROM customer c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
""",
)
def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO emulation over immutable parquet (no Delta in this
    image): left-join the update set, project the merged row. At scale
    this is the standard copy-on-write upsert: join on the key,
    rewrite affected partitions."""
    c = load(spark, sf_dir, "customer")
    updates = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            F.col("c_custkey").alias("u_custkey"),
            (F.col("c_acctbal") * 1.1).alias("new_acctbal"),
        )
    )
    merged = c.join(F.broadcast(updates), c.c_custkey == updates.u_custkey, "left")
    return merged.select(
        "c_custkey",
        "c_name",
        F.when(F.col("u_custkey").isNotNull(), F.col("new_acctbal"))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
        F.col("u_custkey").isNotNull().alias("is_updated"),
    )


@register(
    "fn_bitwise",
    "scalar",
    oracle="""
SELECT event_id,
       event_id & 255                    AS low_byte,
       event_id | 4096                   AS with_flag,
       xor(event_id, user_id)            AS xored,
       event_id << 2                     AS shifted_l,
       event_id >> 3                     AS shifted_r,
       CAST(bit_count(event_id) AS BIGINT) AS popcount
FROM events
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft("event_id", 2).alias("shifted_l"),
        F.shiftright("event_id", 3).alias("shifted_r"),
        F.bit_count("event_id").cast("long").alias("popcount"),
    )


@register("sim_cosine_blocked", "llm", oracle=None)  # BLAS order ≠ fold → rows-only
def sim_cosine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB brute-force path: blocked matrix multiply via
    mapInPandas — each Arrow batch of query vectors multiplies against
    the broadcast candidate matrix in one numpy float64 GEMM (SIMD,
    ~100× the scalar codegen loop). Results are the same top-5 as
    sim_cosine_topk up to BLAS summation order (~1 ulp), hence
    rows-only: the exact fold version remains the oracle-checked
    baseline."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings")
    rows = e.select("vec_id", "embedding").toPandas()
    mat = np.array(rows["embedding"].tolist(), dtype=np.float64)
    ids = rows["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    sc = spark.sparkContext
    b_mat, b_ids, b_norms = sc.broadcast(mat), sc.broadcast(ids), sc.broadcast(norms)

    def topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        M, I, N = b_mat.value, b_ids.value, b_norms.value
        id_pos = {v: i for i, v in enumerate(I)}
        for pdf in batches:
            q = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            sims = (q @ M.T) / np.outer(qn, N)  # one GEMM per batch
            out = []
            for r, vid in enumerate(pdf["vec_id"]):
                # Round BEFORE selecting so boundary ties break on
                # (sim, neighbor_id) exactly like sim_cosine_topk.
                # Full lexsort, not argpartition: argpartition keeps an
                # ARBITRARY subset of rank-5 boundary ties, while the
                # baseline's row_number keeps the lowest neighbor_id.
                row = np.round(sims[r], 6)
                row[id_pos[vid]] = -np.inf  # exclude self
                nn = np.lexsort((I, -row))[:5]
                for rank, j in enumerate(nn, start=1):
                    out.append((vid, int(I[j]), float(row[j]), rank))
            yield pd.DataFrame(
                out, columns=["vec_id", "neighbor_id", "sim", "nn_rank"]
            )

    return (
        e.repartition(8, "vec_id")
        .mapInPandas(topk, "vec_id long, neighbor_id long, sim double, nn_rank long")
    )
