"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

Ladder of escape hatches, in preference order (pyspark_guide):
built-ins (everything else in this repo) → pandas_udf (Arrow-batched,
vectorized) → applyInPandas (grouped map) → plain Python UDF (row-at-
a-time pickling; registered here once to prove the surface, never in
a hot path). Each UDF's semantics are re-expressed in plain SQL for
the oracle, so parity also documents exactly what the UDF computes.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linux_logs_spark.catalog import load
from linux_logs_spark.registry import register

_SEVERITY = {"error": 3, "purchase": 2, "signup": 2, "view": 1, "click": 1}


@register(
    "udf_python",
    "udf",
    oracle="""
SELECT event_id,
       CASE event_type WHEN 'error' THEN 3
                       WHEN 'purchase' THEN 2
                       WHEN 'signup' THEN 2
                       ELSE 1 END AS severity
FROM events
""",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (severity parser) — the slow path,
    registered for SQL use too (spark.udf.register)."""

    @F.udf("int")
    def severity_of(event_type: str) -> int:
        return _SEVERITY.get(event_type, 1)

    spark.udf.register("severity_of", severity_of)
    e = load(spark, sf_dir, "events")
    return e.select("event_id", severity_of("event_type").alias("severity"))


@register(
    "udf_pandas_scalar",
    "udf",
    oracle="""
SELECT doc_id,
       CAST(n_chars AS DOUBLE)
         / (1.0 + (length(text) - length(replace(text, ' ', '')) + 1))
         AS chars_per_word
FROM documents
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF over Arrow batches — ~10-100× the plain
    Python UDF. Word count = space count + 1 (single-space corpus),
    identical arithmetic to the oracle so doubles match exactly."""

    @F.pandas_udf("double")
    def chars_per_word(n_chars: pd.Series, text: pd.Series) -> pd.Series:
        n_words = text.str.count(" ") + 1
        res = n_chars.astype("float64") / (1.0 + n_words)
        # Nullable Float64 so a NULL text yields SQL NULL (the oracle's
        # length(NULL) arithmetic), not a NaN that breaks the hash
        # (round-5 review; str.count on null is NaN, which propagates).
        return res.astype("Float64")

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", chars_per_word("n_chars", "text").alias("chars_per_word")
    )


@register(
    "udaf_pandas_agg",
    "udf",
    oracle="""
SELECT lang,
       round(exp(avg(ln(CAST(n_chars AS DOUBLE)))), 6) AS geo_mean_chars
FROM documents
GROUP BY lang
""",
)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregate (geometric mean) as a GROUPED_AGG
    pandas_udf. Rounded to 6 digits: np.log/np.mean and the oracle's
    ln/avg accumulate in different orders (~1e-13 drift). Spark
    disallows mixing GROUPED_AGG UDFs with built-in aggregates in one
    agg(), so the UDF is the lone aggregate and rounding happens in a
    following projection."""
    import numpy as np

    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.astype("float64")).mean()))

    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(geo_mean("n_chars").alias("gm"))
        .select("lang", F.round("gm", 6).alias("geo_mean_chars"))
    )


@register(
    "udtf_apply_in_pandas",
    "udf",
    oracle="""
SELECT doc_id, lang,
       round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
             / stddev_samp(n_chars) OVER (PARTITION BY lang), 6) AS z_chars
FROM documents
""",
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map 'UDTF': per-language z-score normalization via
    applyInPandas (whole group as a pandas DataFrame in, transformed
    frame out). The per-group state fits memory because groups are
    languages — bounded cardinality even at 100 TB."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].astype("float64")
        z = (x - x.mean()) / x.std(ddof=1)
        # Float64: a single-row group's std(ddof=1) is NaN — surface it
        # as SQL NULL like the oracle's stddev_samp (round-5 review).
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang": pdf["lang"],
             "z_chars": z.round(6).astype("Float64")}
        )

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", "n_chars").groupBy("lang").applyInPandas(
        zscore, "doc_id long, lang string, z_chars double"
    )


@register(
    "udtf_python_native",
    "udf",
    oracle="""
-- events.props carries exactly one key ('k' — FIXTURES.md), so the
-- generic key/value expansion reduces to a single projected pair
SELECT event_id, 'k' AS prop_key, CAST(props ->> 'k' AS INTEGER) AS prop_val
FROM events
""",
)
def udtf_python_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PySpark 4 native Python UDTF (@udtf, lateral-join shape): each
    event's JSON props expands to (key, value) rows — the generic
    'explode semi-structured attributes' operator a log pipeline uses
    for property search. Row-at-a-time Python is acceptable here
    because the UDTF surface is what's under test; the vectorized
    equivalent (from_json + explode(map_entries)) is the hot-path form.
    """
    import json as _json

    from pyspark.sql.functions import udtf

    @udtf(returnType="prop_key: string, prop_val: int")
    class ExplodeProps:
        def eval(self, event_id: int, props: str):  # noqa: ANN001
            # NULL/empty props mirror the oracle's props ->> 'k': one
            # row with a NULL value, never a worker TypeError or a
            # silently dropped event (round-5 review).
            data = _json.loads(props) if props else {}
            if not data:
                yield "k", None
                return
            for k, v in sorted(data.items()):
                yield k, (int(v) if v is not None else None)

    spark.udtf.register("explode_props", ExplodeProps)
    e = load(spark, sf_dir, "events")
    e.createOrReplaceTempView("events_for_udtf")
    return spark.sql(
        """
        SELECT e.event_id, t.prop_key, t.prop_val
        FROM events_for_udtf e,
             LATERAL explode_props(e.event_id, e.props) t
        """
    )


@register(
    "udf_arrow_batch",
    "udf",
    oracle="""
SELECT l_orderkey % 97 AS bucket,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,4)))
            AS DOUBLE) AS revenue
FROM lineitem GROUP BY 1
""",
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the Arrow-NATIVE batch path (Spark 4): RecordBatches
    flow JVM→Python with zero pandas materialization, so per-batch cost
    is pure pyarrow.compute kernels (SIMD, no boxing). This is the
    floor-overhead escape hatch when a transform needs Python but not
    pandas semantics — one rung below pandas_udf on the §2.10 ladder.
    Per-row arithmetic is the same IEEE multiply both engines run; the
    downstream sum is exact DECIMAL accumulation (2dp × 2dp = exact
    4dp, on-grid)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from linux_logs_spark.functions.compat import dsum

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )

    def revenue_batches(batches):
        for b in batches:
            rev = pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), rev], ["l_orderkey", "revenue"]
            )

    mapped = li.mapInArrow(revenue_batches, "l_orderkey bigint, revenue double")
    return mapped.groupBy((F.col("l_orderkey") % 97).alias("bucket")).agg(
        dsum("revenue", 4).alias("revenue")
    )


@register(
    "udaf_arrow_grouped",
    "udf",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS price_sum
FROM lineitem GROUP BY 1, 2
""",
)
def udaf_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow — grouped-map over Arrow tables (Spark 4), the
    Arrow-native sibling of applyInPandas: each (l_returnflag,
    l_linestatus) group arrives as ONE pyarrow.Table (so groups must
    fit an executor — fine for enum-bounded keys like these 6;
    corpus-keyed groups would use the built-in agg instead, exactly as
    §2.4 does). Float parity: the group sum runs on exact integer
    CENTS (2dp prices scale to int64 losslessly: pc.round half-even is
    exact ON-GRID — the value is within 1e-10 of an integer, no tie),
    then divides once — order-independent, so pyarrow's SIMD pairwise
    sum cannot diverge from DuckDB's sequential DECIMAL fold."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )

    def group_stats(table: "pa.Table") -> "pa.Table":
        cents = pc.cast(
            pc.round(pc.multiply(table.column("l_extendedprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "l_linestatus": [table.column("l_linestatus")[0].as_py()],
                "n": [table.num_rows],
                "price_sum": [pc.sum(cents).as_py() / 100.0],
            }
        )

    return li.groupBy("l_returnflag", "l_linestatus").applyInArrow(
        group_stats,
        "l_returnflag string, l_linestatus string, n bigint, price_sum double",
    )
