"""Table catalog: the ten driver-generated parquet tables.

Replaces the reference's searchable SQLite store (SURVEY.md §1.1) with
parquet + temp views: the scan is columnar, filters and projections
push down into the parquet reader, and partition/row-group pruning is
free. Schemas are fixed by the parquet footers (FIXTURES.md); we do not
re-infer anything.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# DataFrame plans are immutable, so one (session, sf_dir, table) read
# can be shared by every query: saves a parquet footer read + schema
# analysis per load() call, which is pure fixed overhead in a
# time-budgeted 115-query correctness pass.
_df_cache: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Parquet scan → vectorized reader, pushdown-capable.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark's reader
    rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives
    as epoch-nanos LongType and we floor-truncate to a µs timestamp —
    exactly what DuckDB produces when it coerces ns→µs, so oracle
    comparisons agree.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (spark.sparkContext.applicationId, os.path.normpath(sf_dir), name)
    cached = _df_cache.get(key)
    if cached is not None:
        return cached
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The driver hands us ITS session; timestamps must render in
        # UTC to hash-match the UTC-naive DuckDB oracle.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # static conf in some sessions; builder sets it too
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _df_cache[key] = df
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register temp views so SQL-path queries resolve names.

    Cheap (lazy plans only); safe to call per-query since views are
    replaced idempotently.
    """
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
