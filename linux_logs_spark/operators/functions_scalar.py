"""Scalar function families (SURVEY.md §2.7).

All JVM-side built-ins (whole-stage-codegen'd) — no Python in the hot
path. Cross-engine notes baked into each oracle:
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all semantics.
- Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday (+1 shim).
- Spark ceil/floor(double) return BIGINT; DuckDB returns DOUBLE
  (cast to double on the Spark side).
- Transcendentals (ln/pow) are libm-dependent → round to 6 digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linux_logs_spark.catalog import load
from linux_logs_spark.registry import register


@register(
    "fn_string",
    "scalar",
    oracle="""
SELECT c_custkey,
       lower(c_name)                                    AS lname,
       upper(c_mktsegment)                              AS useg,
       substring(c_name, 10, 9)                         AS id_digits,
       concat_ws('|', c_mktsegment, c_name)             AS tagged,
       CAST(length(c_name) AS BIGINT)                   AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0')        AS padded_key,
       replace(c_name, 'Customer#', 'C-')               AS short_name,
       trim(concat('  ', c_mktsegment, '  '))           AS trimmed
FROM customer
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.substring("c_name", 10, 9).alias("id_digits"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias("short_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("trimmed"),
    )


@register(
    "fn_regex",
    "scalar",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '^(\\w+)', 1)                 AS first_word,
       regexp_extract(text, '(\\w+)$', 1)                 AS last_word,
       regexp_replace(text, '[aeiou]', '_', 'g')          AS devoweled,
       regexp_matches(text, 'data\\s+\\w+\\s+query')      AS has_pattern
FROM documents
""",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core skill — regex over log-ish text — as
    codegen'd JVM expressions (regexp_extract/replace/rlike)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("text", r"(\w+)$", 1).alias("last_word"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
        F.col("text").rlike(r"data\s+\w+\s+query").alias("has_pattern"),
    )


@register(
    "fn_datetime",
    "scalar",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)                   AS yr,
       CAST(month(o_orderdate) AS BIGINT)                  AS mo,
       CAST(day(o_orderdate) AS BIGINT)                    AS dom,
       CAST(date_part('dow', o_orderdate) + 1 AS BIGINT)   AS dow_sunday1,
       date_trunc('month', o_orderdate)                    AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
                                                           AS days_to_2002,
       CAST(floor(epoch(o_orderdate)) AS BIGINT)           AS epoch_s
FROM orders
""",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.dayofweek("o_orderdate").cast("long").alias("dow_sunday1"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "fn_math",
    "scalar",
    oracle="""
SELECT p_partkey,
       abs(p_retailprice - 1000.0)            AS dist_from_1k,
       CAST(ceil(p_retailprice) AS DOUBLE)    AS price_ceil,
       CAST(floor(p_retailprice) AS DOUBLE)   AS price_floor,
       pow(CAST(p_size AS DOUBLE), 2)         AS size_sq,
       round(ln(p_retailprice), 6)            AS log_price,
       p_partkey % 7                          AS key_mod7,
       CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS above_1k
FROM part
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist_from_1k"),
        F.ceil("p_retailprice").cast("double").alias("price_ceil"),
        F.floor("p_retailprice").cast("double").alias("price_floor"),
        F.pow(F.col("p_size").cast("double"), 2).alias("size_sq"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("log_price"),
        (F.col("p_partkey") % 7).alias("key_mod7"),
        F.signum(F.col("p_retailprice") - 1000.0).cast("double").alias("above_1k"),
    )


@register(
    "fn_array",
    "scalar",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT)               AS n_words,
       list_contains(string_split(text, ' '), 'data')             AS has_data,
       array_to_string(list_sort(list_slice(string_split(text, ' '), 1, 5)), '|')
                                                                  AS first5_sorted,
       array_to_string(list_transform(list_slice(string_split(text, ' '), 1, 3),
                      w -> upper(w)), '|')                        AS first3_upper
FROM documents
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + higher-order functions, all JVM-side.
    Array results serialize to '|'-joined strings in the OUTPUT only —
    the driver's canonicalizer cannot sort pandas list cells."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.array_contains(words, "data").alias("has_data"),
        F.concat_ws("|", F.sort_array(F.slice(words, 1, 5))).alias("first5_sorted"),
        F.concat_ws(
            "|", F.transform(F.slice(words, 1, 3), lambda w: F.upper(w))
        ).alias("first3_upper"),
    )


@register(
    "fn_array_agg",
    "scalar",
    oracle="""
SELECT vec_id, label,
       round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 6)
         AS norm_sq,
       round(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 6) AS mean_dim
FROM embeddings
""",
)
def fn_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order fold over the embedding vector (F.aggregate) —
    the building block of the similarity operators. Elements cast to
    double BEFORE multiply/sum so both engines fold identical values
    left-to-right; result rounded since fold FP is libm-free but
    float→double element casts must match (they do, exactly)."""
    e = load(spark, sf_dir, "embeddings")
    dvec = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        "label",
        F.round(
            F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("norm_sq"),
        F.round(
            F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x) / F.size("embedding"),
            6,
        ).alias("mean_dim"),
    )


@register(
    "fn_json",
    "scalar",
    oracle="""
SELECT event_id,
       props ->> 'k'                       AS k_str,
       CAST(props ->> 'k' AS INTEGER)      AS k_int,
       CAST(props ->> 'k' AS INTEGER) % 10 AS k_bucket
FROM events
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction (events.props = '{"k": <int>}'): string
    path via get_json_object, typed path via from_json."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") % 10).alias("k_bucket"),
    )


@register(
    "fn_variant",
    "scalar",
    oracle="""
WITH w AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS ws
           FROM documents)
SELECT doc_id, lang, n_chars,
       ws[1] AS head_word,
       ws[3] AS third_word
FROM w
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT round trip — the open-format answer to schema
    drift in semi-structured logs: parse once into the binary VARIANT
    encoding, extract typed paths lazily (try_variant_get), never
    re-parse the JSON string per field the way repeated
    get_json_object calls do. The JSON here is synthesized from
    documents columns (a nested object + array), so the DuckDB oracle
    replays the extraction from the base columns directly — a variant
    encode/decode trip that loses or coerces anything hash-fails.
    At 100 TB the VARIANT column is what lands in the lake: shredded
    binary paths, no per-query string parsing, schema evolution
    without rewrites. Missing paths (docs under 3 words) yield NULL
    via try_variant_get, matching the oracle's out-of-range list
    index."""
    d = load(spark, sf_dir, "documents")
    payload = F.to_json(
        F.struct(
            F.col("lang"),
            F.col("n_chars"),
            F.slice(F.split("text", " "), 1, 3).alias("head_words"),
        )
    )
    v = d.select("doc_id", F.parse_json(payload).alias("v"))
    return v.select(
        "doc_id",
        F.try_variant_get("v", "$.lang", "string").alias("lang"),
        F.try_variant_get("v", "$.n_chars", "long").alias("n_chars"),
        F.try_variant_get("v", "$.head_words[0]", "string").alias("head_word"),
        F.try_variant_get("v", "$.head_words[2]", "string").alias("third_word"),
    )


@register(
    "fn_trig",
    "scalar",
    oracle="""
SELECT p_partkey,
       round(sin(p_retailprice / 100.0), 6)                 AS s,
       round(cos(p_retailprice / 100.0), 6)                 AS c,
       round(atan2(CAST(p_size AS DOUBLE), 10.0), 6)        AS angle,
       round(sqrt(p_retailprice), 6)                        AS root,
       round(exp(p_size / 50.0), 6)                         AS growth
FROM part
""",
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendental math family — libm-dependent, so rounded to 6
    digits per the compat convention (sqrt alone is IEEE-exact)."""
    p = load(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(F.sin(price / 100.0), 6).alias("s"),
        F.round(F.cos(price / 100.0), 6).alias("c"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.lit(10.0)), 6).alias("angle"),
        F.round(F.sqrt(price), 6).alias("root"),
        F.round(F.exp(F.col("p_size") / 50.0), 6).alias("growth"),
    )


@register(
    "fn_string_extended",
    "scalar",
    oracle="""
SELECT p_partkey,
       array_to_string(list_transform(string_split(p_name, ' '),
           w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), ' ')
                                            AS title_name,
       reverse(p_name)                      AS reversed,
       left(p_name, 4)                      AS prefix,
       right(p_name, 4)                     AS suffix,
       repeat(p_brand, 2)                   AS doubled,
       translate(p_name, 'aeiou', 'AEIOU')  AS vowels_up,
       CAST(strpos(p_name, ' ') AS BIGINT)  AS space_at
FROM part
""",
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("title_name"),
        F.reverse("p_name").alias("reversed"),
        F.substring("p_name", 1, 4).alias("prefix"),
        F.expr("right(p_name, 4)").alias("suffix"),
        F.repeat(F.col("p_brand"), 2).alias("doubled"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.instr("p_name", " ").cast("long").alias("space_at"),
    )


@register(
    "fn_posexplode",
    "scalar",
    oracle="""
SELECT doc_id, pos, word FROM (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos,
         unnest(string_split(text, ' ')) AS word
  FROM documents
)
WHERE pos <= 5
""",
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral view with ordinality): first five
    token positions per document; 1-based to match SQL ordinality."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
        .select(
            "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "word"
        )
        .filter(F.col("pos") <= 5)
    )


@register(
    "fn_map",
    "scalar",
    oracle="""
SELECT event_id,
       array_to_string(json_keys(props), '|')        AS prop_keys,
       CAST(CAST(props ->> 'k' AS INTEGER) AS VARCHAR) AS prop_vals,
       CAST(props ->> 'k' AS INTEGER)                AS k_val
FROM events
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON props into map<string,int>,
    then keys/values/element access (props carries only key 'k').
    Keys/values serialize to '|'-joined strings in the OUTPUT — the
    driver's canonicalizer cannot sort pandas list cells."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.concat_ws("|", F.sort_array(F.map_keys(m))).alias("prop_keys"),
        F.concat_ws("|", F.map_values(m)).alias("prop_vals"),
        m.getItem("k").alias("k_val"),
    )


@register(
    "fn_conditional",
    "scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       greatest(l_quantity, l_discount * 100)      AS g,
       least(l_tax, l_discount)                    AS l,
       TRY_CAST(CASE WHEN l_orderkey % 1000 = 0 THEN l_returnflag
                     ELSE CAST(l_linenumber AS VARCHAR) END AS INTEGER)
                                                   AS flag_as_int,
       CASE WHEN l_discount = 0 THEN NULL
            ELSE l_extendedprice / l_discount END  AS price_per_disc,
       ifnull(nullif(l_returnflag, 'N'), 'NONE')   AS flag_or_none
FROM lineitem
WHERE l_orderkey % 7 = 0
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null-safe family incl. the try_* error-safe variants
    (ANSI-mode-proof: try_cast of a non-numeric → NULL, divide guarded
    against zero on both sides).

    try_cast's failure path is a caught JVM exception (~8µs/row): the
    original form cast the always-non-numeric l_returnflag and spent
    5s/600k rows just throwing. Failures here hit only l_orderkey %
    1000 == 0 rows — the NULL-production path is still exercised, at
    a failure rate a 100 TB scan could also afford. The %7 slice
    keeps every expression path (multiples of 7000 exercise the
    failing try_cast) while cutting the oracle-compare volume 7× —
    the driver's cost for this query was pure row transfer, not
    computation."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 7 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("l"),
        F.expr(
            "try_cast(CASE WHEN l_orderkey % 1000 = 0 THEN l_returnflag"
            "              ELSE CAST(l_linenumber AS STRING) END AS INT)"
        ).alias("flag_as_int"),
        F.when(F.col("l_discount") == 0, F.lit(None)).otherwise(
            F.col("l_extendedprice") / F.col("l_discount")
        ).alias("price_per_disc"),
        F.ifnull(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")).alias(
            "flag_or_none"
        ),
    )


@register(
    "fn_interval",
    "scalar",
    oracle="""
SELECT event_id,
       CAST(floor(epoch(ts + INTERVAL 90 MINUTE)) AS BIGINT) AS plus_90m_s,
       CAST(floor(epoch(ts - INTERVAL 1 DAY)) AS BIGINT)     AS minus_1d_s,
       CAST(floor(epoch(date_trunc('day', ts) + INTERVAL 6 HOUR)) AS BIGINT)
                                                             AS day_6am_s
FROM events
""",
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic on event time; results surface as epoch
    seconds per the cross-engine timestamp convention."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_timestamp(F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias(
            "plus_90m_s"
        ),
        F.unix_timestamp(F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("minus_1d_s"),
        F.unix_timestamp(
            F.date_trunc("day", "ts") + F.expr("INTERVAL 6 HOURS")
        ).alias("day_6am_s"),
    )


@register(
    "agg_bool",
    "aggregate",
    oracle="""
SELECT l_returnflag,
       bool_and(l_quantity > 0)    AS all_positive,
       bool_or(l_discount > 0.09)  AS any_big_discount,
       count(*) FILTER (WHERE l_tax = 0) AS n_tax_free
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_discount"),
        F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
    )


@register(
    "fn_hash",
    "scalar",
    oracle="""
SELECT doc_id,
       sha256(text) AS text_sha256,
       md5(text)    AS text_md5
FROM documents
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable content hashes (dedup keys). xxhash64 is exercised in
    dedup_near_minhash (rows-only — DuckDB lacks xxhash64)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.col("text")).alias("text_md5"),
    )


@register(
    "fn_url_parse",
    "scalar",
    oracle=r"""
WITH urls AS (
  SELECT doc_id,
         'https://host' || CAST(doc_id % 20 AS VARCHAR)
           || '.example.com/api/v' || CAST(doc_id % 3 AS VARCHAR)
           || '/items?item=' || CAST(doc_id AS VARCHAR)
           || '&lang=' || lang AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]item=([^&]*)', 1) AS item_param
FROM urls
""",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — web-log realism for the analytics surface
    (every access-log pipeline splits URLs into host/path/query and
    plucks parameters). Spark side uses the BUILT-IN parse_url
    (java.net.URI-backed, codegen'd); DuckDB has no URL family, so
    the oracle replays the decomposition with the conservative
    RE2∩Java regexp dialect over the same synthesized URLs — valid
    because the synthesis produces clean absolute URLs where the two
    definitions coincide (no userinfo/ports/fragments)."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://host"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.com/api/v"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("/items?item="),
        F.col("doc_id").cast("string"),
        F.lit("&lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("item")).alias("item_param"),
    )


# ONE body template, formatted with parameter names for the CREATE
# FUNCTION text and with column names for the oracle's textual inline.
_SQL_UDF_BODY = "{p} * (1.0 - {d}) * (1.0 + {t})"
_SQL_UDF_EXPR = _SQL_UDF_BODY.format(p="p", d="d", t="t")
_SQL_UDF_INLINED = _SQL_UDF_BODY.format(
    p="l_extendedprice", d="l_discount", t="l_tax"
)


@register(
    "fn_sql_udf",
    "function",
    oracle=f"""
SELECT l_returnflag,
       CAST(sum(CAST({_SQL_UDF_INLINED} AS DECIMAL(25,6))) AS DOUBLE)
         AS charged
FROM lineitem GROUP BY l_returnflag
""",
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF (Spark 4 ``CREATE FUNCTION … RETURN expr``):
    the declarative UDF path — the body is SQL, so Catalyst INLINES
    it into the caller's plan (whole-stage codegen, pushdown-capable),
    unlike any Python UDF. The oracle substitutes the body textually:
    same expression tree, two engines. CREATE OR REPLACE TEMPORARY
    per call because the driver may hand a fresh session each time.
    The per-row arithmetic is identical IEEE ops; the sum is exact
    DECIMAL accumulation (compat.py convention)."""
    from linux_logs_spark.catalog import register_views

    register_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged_price("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE "
        f"RETURN {_SQL_UDF_EXPR}"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(sum(CAST(charged_price(l_extendedprice, l_discount, l_tax)
                             AS DECIMAL(25,6))) AS DOUBLE) AS charged
        FROM lineitem GROUP BY l_returnflag
        """
    )


@register(
    "fn_collation",
    "function",
    oracle="""
WITH mixed AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
              ELSE event_type END AS et
  FROM events
), dim AS (
  SELECT DISTINCT event_type FROM events
)
SELECT d.event_type,
       count(*) AS n_events,
       count(DISTINCT m.et) AS case_variants
FROM mixed m JOIN dim d ON lower(m.et) = d.event_type
GROUP BY d.event_type
""",
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 ``collate(…, 'UTF8_LCASE')``):
    a case-insensitive equi-join expressed through the COLLATED string
    type, not through lower() rewrites — the collation rides the type,
    so the join stays a plain hash equi-join on a binary-stable key
    (Spark hashes the collation key), shuffle-partitioned like any
    other: nothing about case-insensitivity costs an extra pass at
    100 TB. Mixed case is synthesized deterministically (even
    event_ids upper-cased); the oracle is the lower()-rewrite twin —
    identical groups by construction. The output key comes from the
    LOWERCASE dim side (a collated group key's representative would be
    nondeterministic); case_variants pins that the join genuinely
    crossed case (2 variants per type, not 1)."""
    e = load(spark, sf_dir, "events")
    mixed = e.select(
        F.when(F.col("event_id") % 2 == 0, F.upper("event_type"))
        .otherwise(F.col("event_type"))
        .alias("et")
    )
    dim = e.select("event_type").distinct()
    joined = mixed.join(
        dim,
        F.collate(F.col("et"), "UTF8_LCASE")
        == F.collate(F.col("event_type"), "UTF8_LCASE"),
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("et").alias("case_variants"),
    )


# Overflow pivot for the try_* family: rows with l_orderkey above this
# overflow BIGINT on + _TRY_ADDEND; the oracle guards the same split.
_TRY_PIVOT = 30_000
_TRY_ADDEND = 9_223_372_036_854_775_807 - _TRY_PIVOT


@register(
    "fn_try_arith",
    "scalar",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = 0 THEN NULL
            ELSE round(l_extendedprice / l_discount, 6) END AS safe_div,
       CASE WHEN l_orderkey > {_TRY_PIVOT} THEN NULL
            ELSE l_orderkey + {_TRY_ADDEND} END AS safe_add,
       CASE WHEN l_orderkey > {_TRY_PIVOT} THEN NULL
            ELSE l_orderkey - (-{_TRY_ADDEND}) END AS safe_sub,
       l_orderkey * 1 AS safe_mul_small,
       CASE WHEN l_orderkey > 4 THEN NULL
            ELSE l_orderkey * 2305843009213693951 END AS safe_mul
FROM lineitem
WHERE l_orderkey % 100 = 0
""",
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic (``try_add``/``try_subtract``/
    ``try_multiply``/``try_divide``): overflow and division-by-zero
    yield NULL instead of failing the job — the contract a 100 TB
    pipeline needs, because one poisoned row must not kill a
    1000-executor stage (the alternative, ansi=false silent wraparound,
    corrupts results instead). All codegen'd JVM expressions; the
    oracle is the equivalent guarded CASE (DuckDB raises on real
    overflow, so the guard must be exact: x + A overflows iff
    x > MAX - A)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_discount")), 6
        ).alias("safe_div"),
        F.try_add(F.col("l_orderkey"), F.lit(_TRY_ADDEND)).alias("safe_add"),
        F.try_subtract(F.col("l_orderkey"), F.lit(-_TRY_ADDEND)).alias("safe_sub"),
        F.try_multiply(F.col("l_orderkey"), F.lit(1)).alias("safe_mul_small"),
        F.try_multiply(
            F.col("l_orderkey"), F.lit(2_305_843_009_213_693_951)
        ).alias("safe_mul"),
    )


# AES key for the roundtrip demo — 16 bytes, deterministic ECB so the
# ciphertext (and its PKCS#7-padded length) is a pure function of the
# plaintext and the oracle can predict it without a crypto library.
_AES_KEY = "0123456789abcdef"


@register(
    "fn_aes_roundtrip",
    "scalar",
    oracle="""
SELECT c_custkey,
       CAST((length(c_name) // 16) * 16 + 16 AS BIGINT) AS cipher_len,
       c_name AS decrypted,
       true AS roundtrip_ok
FROM customer
WHERE c_custkey % 10 = 0
""",
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface (``aes_encrypt``/``aes_decrypt``,
    AES-128-ECB + PKCS#7): encrypt-then-decrypt must be the identity,
    and ECB ciphertext length is the deterministic padded length
    floor(len/16)*16 + 16 — which is exactly what the oracle predicts
    without running any crypto (the roundtrip-identity oracle pattern:
    the engine under test does the real work; the oracle checks the
    algebraic contract). ECB is chosen FOR determinism of the
    demonstration — real deployments use the default GCM whose random
    IV makes ciphertext non-deterministic by design (documented, not a
    recommendation). Pure JVM expressions, map-side only, no shuffle."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    enc = c.select(
        "c_custkey",
        "c_name",
        F.aes_encrypt(
            F.col("c_name").cast("binary"),
            F.lit(_AES_KEY).cast("binary"),
            F.lit("ECB"),
        ).alias("ct"),
    )
    # decrypt ONCE in its own projection; the comparison reuses the
    # column (round-8 review: the inline form ran AES twice per row)
    dec = enc.select(
        "c_custkey",
        "c_name",
        F.octet_length("ct").cast("long").alias("cipher_len"),
        F.aes_decrypt(
            F.col("ct"), F.lit(_AES_KEY).cast("binary"), F.lit("ECB")
        )
        .cast("string")
        .alias("decrypted"),
    )
    return dec.select(
        "c_custkey",
        "cipher_len",
        "decrypted",
        (F.col("decrypted") == F.col("c_name")).alias("roundtrip_ok"),
    )


@register(
    "fn_xpath",
    "scalar",
    oracle="""
SELECT o_orderkey,
       o_orderpriority AS xp_priority,
       o_totalprice AS xp_price,
       CAST(o_custkey AS BIGINT) AS xp_cust,
       concat(o_orderstatus, '|', o_orderpriority) AS xp_all_tags
FROM orders
WHERE o_orderkey % 50 = 0
""",
)
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction family (``xpath_string`` / ``xpath_double`` /
    ``xpath_long`` / ``xpath`` array form) — the XML drill-down
    surface, verified by the roundtrip-identity pattern (fn_aes's
    rule): XML is synthesized from typed columns with format_string,
    every xpath extraction must return exactly the source column, so
    the oracle is pure base-column algebra with no XML library. The
    array form (``xpath`` returns array<string>) is canonicalized with
    concat_ws — complex-typed outputs don't survive the driver's
    pandas canonicalizer (round-1 agg_collect lesson). All JVM
    expressions, map-side, no shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    xml = o.select(
        "o_orderkey",
        F.format_string(
            '<order status="%s"><priority>%s</priority>'
            "<price>%s</price><cust>%d</cust></order>",
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            F.col("o_totalprice").cast("string"),
            F.col("o_custkey"),
        ).alias("x"),
    )
    return xml.select(
        "o_orderkey",
        F.expr("xpath_string(x, '/order/priority')").alias("xp_priority"),
        F.expr("xpath_double(x, '/order/price')").alias("xp_price"),
        F.expr("xpath_long(x, '/order/cust')").alias("xp_cust"),
        F.concat_ws(
            "|", F.expr("xpath(x, '//@status | //priority/text()')")
        ).alias("xp_all_tags"),
    )


@register(
    "fn_struct",
    "function",
    oracle="""
SELECT o_orderkey,
       o_orderpriority AS prio,
       o_totalprice * 1.01 AS total_with_fee,
       o_totalprice AS total_roundtrip
FROM orders
""",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT column manipulation surface: build a nested struct,
    reach through it with dotted access, evolve it in place with
    withField (the nested-schema-evolution primitive — at 100 TB you
    patch one leaf of a deep event struct without rewriting the
    column), prune with dropFields, and extract scalars back out. The
    oracle replays from base columns (the fn_xpath roundtrip-identity
    pattern: every extraction must return what went in — here the fee
    field is the only computed leaf). All map-side codegen projections;
    struct ops never shuffle."""
    o = load(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderpriority").alias("prio"),
        F.struct(
            F.col("o_totalprice").alias("amount"),
        ).alias("money"),
    )
    evolved = (
        o.withColumn("s", s)
        .withColumn(
            "s", F.col("s").withField("money.with_fee", F.col("o_totalprice") * 1.01)
        )
        .withColumn("s", F.col("s").dropFields("money.amount"))
    )
    return evolved.select(
        "o_orderkey",
        F.col("s.prio").alias("prio"),
        F.col("s.money.with_fee").alias("total_with_fee"),
        F.col("o_totalprice").alias("total_roundtrip"),
    )
