"""Training-data pipeline operators beyond the reference inventory:
sequence packing, deterministic train/holdout splits, stratified
sampling, duplicate-cluster resolution (connected components), and
corpus n-gram statistics.

These are the steps a 100 TB pretraining-data pipeline runs between
"raw corpus" and "tokenized shards"; each is expressed as a
declarative DataFrame plan (Catalyst optimizes the whole chain), with
the one genuinely iterative algorithm (connected components) done as
a bounded Pregel-style loop over persisted, lineage-truncated frames.

Scale shapes:
- pack_sequences: one window per source shard (concat-and-chunk
  accounting) — a single hash shuffle on the shard key; chunk ids
  derive arithmetically from the running token offset, so no second
  pass over the data.
- split / sample: pure map-side hash filters (md5 threshold), no
  shuffle at all for the split; the exact-rank stratified sample
  shuffles once on the stratum key.
- dedup_clusters_cc: candidate edges come from the same blocked
  posting-list equi-join that dedup_ngram_jaccard verifies; label
  propagation runs on the (tiny) vertex set, never on documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from linux_logs_spark.catalog import load, table_row_count
from linux_logs_spark.functions.text import STOPWORDS, word_shingles, words
from linux_logs_spark.functions.vector import round6_away_sql
from linux_logs_spark.operators.llm_pipeline import (
    _JACCARD_PAIRS_SQL,
    blocked_jaccard_pairs,
)
from linux_logs_spark.registry import register
from linux_logs_spark.session import broadcast_if_fits

# Token budget per packed training sequence. Small so sf0.001 already
# exercises multi-chunk docs; the plan shape is budget-independent.
PACK_BUDGET = 256

# ------------------------------------------------------------- packing


@register(
    "pack_sequences",
    "llm",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
  FROM documents
), c AS (
  SELECT source, doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
              PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
  FROM t
)
SELECT source, doc_id, n_tokens, start_tok,
       start_tok // {PACK_BUDGET} AS first_chunk,
       (start_tok + n_tokens - 1) // {PACK_BUDGET} AS last_chunk,
       (start_tok + n_tokens - 1) // {PACK_BUDGET}
         - start_tok // {PACK_BUDGET} + 1 AS n_chunks
FROM c
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing accounting: per source shard,
    documents are laid end-to-end in doc_id order and cut into
    PACK_BUDGET-token chunks; each doc reports its token span and the
    chunk range it lands in. One window (= one shuffle on the shard
    key) computes the running offset; chunk ids are pure arithmetic on
    it. At 100 TB the shard key is (source, path-bucket) so no single
    window partition exceeds a task — the plan is unchanged."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "source", "doc_id", F.size(words("text")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    c = t.withColumn("start_tok", start)
    first = F.floor(F.col("start_tok") / PACK_BUDGET)
    last = F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / PACK_BUDGET)
    return c.select(
        "source",
        "doc_id",
        "n_tokens",
        "start_tok",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    )


# ------------------------------------------------- splits and sampling


@register(
    "split_train_holdout",
    "llm",
    oracle="""
SELECT doc_id,
       CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccc' THEN 'train'
            WHEN md5(CAST(doc_id AS VARCHAR)) < 'e666' THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split by md5(doc_id)
    hex-prefix threshold (hex digits are ASCII-ordered, so a string
    compare against 'cccc' ≡ hash/65536 < 0.8). Pure map-side filter:
    no shuffle, no state, stable under re-runs and repartitioning —
    the property that makes the split reproducible across a 1000-
    executor job and a laptop. md5 is content-stable across engines
    (same lowercase hex in Spark and DuckDB)."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        F.when(h < "cccc", "train").when(h < "e666", "val").otherwise("test").alias(
            "split"
        ),
    )


@register(
    "sample_stratified",
    "llm",
    oracle="""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang, rn AS sample_rank
FROM r
WHERE rn <= CAST(ceil(0.2 * n) AS BIGINT)
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 20%-per-language stratified sample: rank docs inside each
    stratum by md5(doc_id) (a deterministic stand-in for a random
    draw) and keep the top ceil(0.2·n). One shuffle on the stratum
    key. The stratum key is low-cardinality and skewed (en dominates),
    so at 100 TB the exact-rank window gives way to the md5-threshold
    filter of split_train_holdout (map-side, no shuffle, approximate
    fraction); this operator is the exact-count form for when the
    sample size must be precise."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    rn = F.row_number().over(Window.partitionBy("lang").orderBy(h, "doc_id"))
    n = F.count("*").over(Window.partitionBy("lang"))
    return (
        d.select("doc_id", "lang", rn.cast("long").alias("sample_rank"), n.alias("n"))
        .filter(F.col("sample_rank") <= F.ceil(0.2 * F.col("n")))
        .select("doc_id", "lang", "sample_rank")
    )


# ------------------------------------- duplicate clusters (components)

CC_MAX_ITERS = 20


@register(
    "dedup_clusters_cc",
    "llm",
    oracle=f"""
WITH RECURSIVE {_JACCARD_PAIRS_SQL.strip()}, edges0 AS (
  SELECT doc_a, doc_b FROM pairs WHERE jaccard >= 0.5
), edges AS (
  SELECT doc_a, doc_b FROM edges0
  UNION ALL
  SELECT doc_b, doc_a FROM edges0
), verts AS (
  SELECT DISTINCT doc_a AS doc_id FROM edges
), reach(doc_id, label) AS (
  SELECT doc_id, doc_id FROM verts
  UNION
  SELECT e.doc_b, r.label FROM reach r JOIN edges e ON e.doc_a = r.doc_id
)
SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id
""",
)
def dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the
    near-dup graph, so each group of mutually-similar docs collapses
    to one canonical id (the component's min doc_id) — the step that
    turns pairwise dedup verdicts into keep/drop decisions.

    Edges are the Jaccard ≥ 0.5 pairs from blocked_jaccard_pairs —
    the identical hash-keyed, df-capped posting-list equi-join that
    dedup_ngram_jaccard verifies (pair space bounded by (lang,
    source) blocks and the WORD_DF_CAP ceiling, never n²; the shared
    oracle CTE keeps both queries' semantics pinned to the same
    DuckDB text). Components run as min-label CONTRACTION in label
    space (round 11; the round-10 second decade measured the previous
    edges⋈labels propagation shuffling the full 1.97 GB edge set
    EVERY round). In contracted space a vertex's name IS its label,
    so each round:
    (1) neighbor-min is a plain groupBy(b).min(a) over the contracted
    edges — map-side partial min, so the exchange carries one row per
    distinct endpoint per partition, never the edge volume;
    (2) the strictly-decreasing merge map (b → nm, nm < b) is at most
    vertex-set-sized and shrinks every round — it broadcasts
    (size-gated on the |docs| footer bound), so updating the full
    doc_id→cluster frame and remapping both edge endpoints are
    broadcast joins with NO shuffle;
    (3) remapped intra-cluster edges become self-loops, filtered
    MAP-SIDE before the distinct, so the re-materialized edge set
    shrinks geometrically — near-clique dup graphs collapse almost
    entirely in round 1.
    No stage after the initial edge build touches the full edge
    volume. Fixpoint ⇔ the merge map is empty (any surviving
    symmetric edge (x,y) with x<y hands y a smaller neighbor), read
    off the checkpointed map. Rounds ≤ graph diameter exactly as
    plain propagation (each round every non-minimal contracted
    vertex adjacent to a smaller one merges); dup clusters are
    near-cliques, so 1-2 in practice (CC_MAX_ITERS is a safety
    rail). Per-round frames localCheckpoint: lineage stays O(1) (on
    a cluster this is a reliable checkpoint to object storage).
    Exact-dup sha2 pre-contraction was considered and measured
    useless on this corpus (exactly ONE identical-text pair in 500k
    docs at the 100× rehearsal — its duplicates are near-dups);
    label-space contraction subsumes the clique-collapse benefit for
    every round past the first and needs no df-cap-ordering caveats.
    The oracle is the same graph closed under a recursive CTE."""
    d = load(spark, sf_dir, "documents")
    n_docs = table_row_count(sf_dir, "documents")  # footer, no job
    edges0 = (
        blocked_jaccard_pairs(d)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    cedges = (
        edges0.union(
            edges0.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .toDF("a", "b")
        .localCheckpoint(eager=True)  # the ONE full-volume materialization
    )
    labels = (
        cedges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(CC_MAX_ITERS):
        upd = (
            cedges.groupBy("b")
            .agg(F.min("a").alias("nm"))
            .filter(F.col("nm") < F.col("b"))
            .localCheckpoint(eager=True)  # consumed 3× below + isEmpty
        )
        if upd.isEmpty():
            converged = True
            break
        labels = (
            labels.join(
                broadcast_if_fits(upd, n_docs, 64),
                F.col("cluster_id") == F.col("b"),
                "left",
            )
            .select("doc_id", F.coalesce("nm", "cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        ua = upd.toDF("ka", "va")
        ub = upd.toDF("kb", "vb")
        cedges = (
            cedges.join(
                broadcast_if_fits(ua, n_docs, 64), F.col("a") == F.col("ka"), "left"
            )
            .join(
                broadcast_if_fits(ub, n_docs, 64), F.col("b") == F.col("kb"), "left"
            )
            .select(
                F.coalesce("va", "a").alias("a"),
                F.coalesce("vb", "b").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))  # self-loops drop map-side
            .distinct()
            .localCheckpoint(eager=True)
        )
    if not converged:
        # Contraction merges one adjacency hop per round, so a
        # component with graph diameter > CC_MAX_ITERS would exit the
        # loop with labels that LOOK valid but disagree with the
        # recursive-CTE oracle — fail loudly instead of returning a
        # silently-wrong clustering (round-5 review).
        raise RuntimeError(
            f"dedup_clusters_cc: no fixpoint after {CC_MAX_ITERS} rounds "
            "(a component's diameter exceeds the iteration rail); raise "
            "CC_MAX_ITERS"
        )
    return labels


# ------------------------------------------------- corpus n-gram stats


@register(
    "text_ngram_topk",
    "llm",
    oracle="""
WITH w AS (
  SELECT string_split(text, ' ') AS ws FROM documents
), b AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS bigram
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) u
)
SELECT bigram, count(*) AS n
FROM b
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""",
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams — the vocabulary/ngram-frequency pass of
    a tokenizer-training pipeline. explode → hash-aggregate (map-side
    partial combine shrinks the shuffle to distinct bigrams per task)
    → orderBy().limit(20) which Spark plans as TakeOrderedAndProject:
    per-partition 20-row heaps merged on the driver, no global sort.
    Deterministic tie-break on the bigram string."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(word_shingles(words("text"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


# Tokenizer-vocabulary size. The synthetic corpus holds only 31
# distinct tokens at every shipped scale factor, so the ceiling must
# sit BELOW that for the ORDER BY ... LIMIT truncation — and the
# cross-engine tie-break at the cutoff boundary — to actually bind in
# the oracle comparison (round-3 advice: 200 never truncated anything).
VOCAB_SIZE = 20

# RAG-style chunking geometry: 64-token chunks, 48-token stride
# (16-token overlap between consecutive chunks).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


@register(
    "vocab_build",
    "llm",
    oracle=f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), c AS (
  SELECT token, count(*) AS n FROM w GROUP BY token
  ORDER BY n DESC, token LIMIT {VOCAB_SIZE}
)
SELECT token, n,
       row_number() OVER (ORDER BY n DESC, token) - 1 AS token_id
FROM c
""",
)
def vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary construction: count every corpus token,
    keep the VOCAB_SIZE most frequent, assign contiguous ids by
    (count desc, token) rank. The token count is explode → hash-agg
    with map-side partial combine (shuffle carries distinct tokens per
    task, not corpus positions); truncation is orderBy().limit(K) →
    TakeOrderedAndProject (per-partition K-row heaps, no global sort).
    Only the K surviving rows — a driver-bounded constant — flow into
    the single-partition row_number window, so the id-assignment stage
    is O(VOCAB_SIZE) regardless of corpus size."""
    d = load(spark, sf_dir, "documents")
    topk = (
        d.select(F.explode(words("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(VOCAB_SIZE)
    )
    w = Window.orderBy(F.col("n").desc(), "token")
    return topk.withColumn("token_id", (F.row_number().over(w) - 1).cast("long"))


@register(
    "doc_chunk",
    "llm",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), s AS (
  SELECT doc_id, ws, i AS tok_start,
         CAST(least({CHUNK_TOKENS}, len(ws) - i) AS BIGINT) AS tok_len,
         CAST(i // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx
  FROM t, LATERAL (
    SELECT unnest(range(0, len(ws), {CHUNK_STRIDE})) AS i
  ) u
)
SELECT doc_id, chunk_idx, tok_start, tok_len,
       array_to_string(ws[tok_start + 1 : tok_start + tok_len], ' ') AS chunk_text
FROM s
""",
)
def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking (RAG / context-window prep):
    every CHUNK_STRIDE tokens starts a CHUNK_TOKENS-token chunk, the
    final chunk truncated at the document end. Chunk starts come from
    F.sequence(0, len-1, stride) + posexplode and the chunk text from
    F.slice — all JVM-side array expressions inside one codegen stage;
    no shuffle at all (pure per-row flatMap), so the operator is
    map-side even at 100 TB and output partitioning follows the scan.
    Note string_split('', ' ') = [''] on both engines, so empty docs
    yield exactly one empty chunk rather than disappearing."""
    d = load(spark, sf_dir, "documents")
    ws = words("text")
    starts = F.sequence(F.lit(0), F.greatest(F.size(ws) - 1, F.lit(0)), F.lit(CHUNK_STRIDE))
    e = d.select(
        "doc_id",
        ws.alias("ws"),
        F.explode(starts).alias("tok_start"),
    )
    tok_len = F.least(F.lit(CHUNK_TOKENS), F.size("ws") - F.col("tok_start")).cast("long")
    return e.select(
        "doc_id",
        (F.col("tok_start") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.col("tok_start").cast("long").alias("tok_start"),
        tok_len.alias("tok_len"),
        F.concat_ws(" ", F.slice("ws", F.col("tok_start") + 1, tok_len)).alias("chunk_text"),
    )


# ------------------------------------------- end-to-end corpus prep

# Quality gate for the prep funnel: binds on ~10% of the synthetic
# corpus (score distribution 0.39–0.61, threshold at the p10 shoulder)
# so every funnel stage is actually exercised by the oracle compare.
QUALITY_MIN = 0.48


@register(
    "pipeline_corpus_prep",
    "llm",
    oracle=f"""
WITH x AS (
  SELECT doc_id, lang, source, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         (( CAST(n_chars - (CAST(len(string_split(text, ' ')) AS BIGINT) - 1) AS DOUBLE)
            / CAST(len(string_split(text, ' ')) AS BIGINT)) * 0.1
          + CAST(len(list_filter(string_split(text, ' '),
                     w -> w IN ({", ".join(f"'{s}'" for s in STOPWORDS)}))) AS DOUBLE)
            / CAST(len(string_split(text, ' ')) AS BIGINT)) >= {QUALITY_MIN} AS passed
  FROM documents
), blocks AS (
  SELECT lang, source, count(*) AS n_docs,
         count(*) FILTER (WHERE NOT passed) AS n_low_quality
  FROM x GROUP BY 1, 2
), groups AS (
  SELECT lang, source,
         array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS nk,
         count(*) AS grp_n,
         min_by(n_words, doc_id) AS rep_tokens
  FROM x WHERE passed GROUP BY 1, 2, 3
), kept AS (
  SELECT lang, source, count(*) AS n_kept,
         CAST(sum(grp_n) - count(*) AS BIGINT) AS n_dups_dropped,
         CAST(sum(rep_tokens) AS BIGINT) AS kept_tokens
  FROM groups GROUP BY 1, 2
)
SELECT b.lang, b.source, b.n_docs, b.n_low_quality,
       coalesce(k.n_dups_dropped, 0) AS n_dups_dropped,
       coalesce(k.n_kept, 0) AS n_kept,
       coalesce(k.kept_tokens, 0) AS kept_tokens
FROM blocks b LEFT JOIN kept k ON b.lang = k.lang AND b.source = k.source
""",
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-prep funnel in ONE declarative plan: quality
    gate (text_quality_score's exact expression) → normalized exact
    dedup (sorted-distinct-word key, keep min doc_id) → per-block
    accounting (docs in, low-quality dropped, dups dropped, docs kept,
    kept tokens). This is the integration shape a training-data
    pipeline runs nightly; every stage is a built-in expression. The
    only full-volume shuffle is the dedup groupBy, keyed on
    sha2(norm_text) (32 bytes, never documents, NULL for failed docs so
    the quality-gated rows collapse to one group per block); the
    quality gate is map-side, and the funnel is ONE aggregation chain —
    group at (lang, source, passed, nk), then a conditional rollup to
    (lang, source) — so the corpus is scanned and word-split exactly
    once (round-14: previously the blocks/kept branches each rebuilt
    the scan→score subtree; 2 corpus passes + a join → 1 pass, 2 hash
    exchanges, no join). The oracle groups the raw normalized string —
    identical partitions, hash-free SQL."""
    d = load(spark, sf_dir, "documents")
    ws = words("text")
    x = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(ws).cast("long").alias("n_words"),
        F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS))).alias("n_stop"),
        "n_chars",
    )
    awl = (F.col("n_chars") - (F.col("n_words") - 1)).cast("double") / F.col("n_words")
    qs = awl * 0.1 + F.col("n_stop").cast("double") / F.col("n_words")
    scored = x.withColumn("passed", qs >= QUALITY_MIN)
    norm_key = F.sha2(
        F.array_join(F.array_sort(F.array_distinct(words("text"))), " "), 256
    )
    # sha2 + sort only on passed rows (the when-guard short-circuits);
    # failed rows ride the shuffle as one NULL-key group per block.
    g1 = scored.groupBy(
        "lang", "source", "passed", F.when(F.col("passed"), norm_key).alias("nk")
    ).agg(
        F.count("*").alias("grp_n"),
        F.min_by("n_words", "doc_id").alias("rep_tokens"),
    )
    p = F.col("passed")
    zero = F.lit(0).cast("long")
    return g1.groupBy("lang", "source").agg(
        F.sum("grp_n").alias("n_docs"),
        F.coalesce(F.sum(F.when(~p, F.col("grp_n"))), zero).alias("n_low_quality"),
        F.coalesce(
            F.sum(F.when(p, F.col("grp_n"))) - F.count_if(p), zero
        ).alias("n_dups_dropped"),
        F.count_if(p).alias("n_kept"),
        F.coalesce(F.sum(F.when(p, F.col("rep_tokens"))), zero).alias("kept_tokens"),
    )


# --------------------------------------------------------- mix planning


@register(
    "corpus_mix_rebalance",
    "llm",
    oracle="""
WITH s AS (
  SELECT lang, source, count(*) AS n_docs
  FROM documents GROUP BY lang, source
), t AS (
  SELECT CAST(ceil(CAST(sum(n_docs) AS DOUBLE) / count(*)) AS BIGINT) AS target
  FROM s)
SELECT lang, source, n_docs, target,
       CASE WHEN n_docs <= target THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(target AS DOUBLE) / n_docs END AS sample_rate,
       CASE WHEN n_docs <= target THEN n_docs ELSE target END AS kept_docs
FROM s CROSS JOIN t
""",
)
def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mix planner: per-(lang, source) downsampling rates that
    flatten the corpus toward an equal-share target (ceil(total /
    n_strata)). This is the step that turns "we want 30% code, equal
    language mix" policy into the per-stratum keep-rates a sampler
    (sample_stratified's exact-rank filter) then applies.

    Scale shape: one count aggregate over the stratum key, a 1-row
    broadcast of the global target, and columnar rate arithmetic —
    cost is |strata|, independent of corpus bytes. The rate division
    CAST(target AS DOUBLE)/n is a single IEEE op on both engines, and
    the n<=target branch pins the rate to exactly 1.0, so the hash
    compare is stable."""
    # |strata| rows — bounded. Lazy localCheckpoint: `s` feeds both the
    # 1-row target scalar and the output join; left lazy, the corpus-
    # sized stratum count executed twice (round-14 plan audit).
    s = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    t = s.agg(
        F.ceil(F.sum("n_docs").cast("double") / F.count("*"))
        .cast("long")
        .alias("target")
    )
    rate = F.when(F.col("n_docs") <= F.col("target"), F.lit(1.0)).otherwise(
        F.col("target").cast("double") / F.col("n_docs")
    )
    kept = F.when(F.col("n_docs") <= F.col("target"), F.col("n_docs")).otherwise(
        F.col("target")
    )
    return (
        s.join(F.broadcast(t))
        .select(
            "lang",
            "source",
            "n_docs",
            "target",
            rate.alias("sample_rate"),
            kept.alias("kept_docs"),
        )
    )


# Temperature exponent for multilingual sampling (the p^α / Σ p^α
# re-weighting used to up-sample low-resource languages when building
# a training mix). 0.3 is the published mBERT/XLM-R operating point;
# the literal parses to the identical double in Spark and DuckDB, so
# both engines raise to exactly the same exponent.
SAMPLING_TEMPERATURE_ALPHA = "0.3"

_TEMP_TERM6 = round6_away_sql(f"pow(p_raw, {SAMPLING_TEMPERATURE_ALPHA})")
_TEMP_WEIGHT6 = round6_away_sql("term6 / z")


@register(
    "corpus_temperature_sample",
    "llm",
    oracle=f"""
WITH s AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
), t AS (
  SELECT sum(n_docs) AS total_docs FROM s
), p AS (
  SELECT lang, n_docs, total_docs,
         CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE) AS p_raw
  FROM s CROSS JOIN t
), w AS (
  SELECT *, {_TEMP_TERM6} AS term6 FROM p
), z AS (
  SELECT CAST(sum(CAST(term6 AS DECIMAL(25,6))) AS DOUBLE) AS z FROM w
), ws AS (
  SELECT lang, n_docs, p_raw, total_docs, {_TEMP_WEIGHT6} AS samp_weight
  FROM w CROSS JOIN z
)
SELECT lang, n_docs, p_raw, samp_weight,
       CAST(floor(samp_weight * CAST(total_docs AS DOUBLE) + 0.5) AS BIGINT)
         AS expected_epoch_docs
FROM ws
""",
)
def corpus_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling weights: w_l = p_l^α / Σ_m
    p_m^α with α = 0.3 — the multilingual-pretraining re-weighting
    that up-samples low-resource languages without discarding the
    high-resource ones (α=1 keeps the natural mix, α→0 flattens it).
    Output is the per-lang weight plus the expected docs drawn per
    epoch, i.e. the numbers a sampler daemon actually consumes.

    Scale shape: one count aggregate over lang (map-side partial,
    |langs| rows out), two 1-row broadcasts (corpus total, partition
    normalizer) — cost is |langs|, independent of corpus bytes.
    Float parity: p_raw is a single IEEE division; pow() is libm vs
    JVM so the term is rounded half-away at 6 digits BEFORE the
    normalizer sum, which accumulates in DECIMAL(25,6) (exact,
    order-free — compat.py failure mode 2); the final weight is one
    IEEE division of identical doubles, rounded once more."""
    # |langs| rows — bounded. Lazy localCheckpoint: `s` feeds the
    # total, the weight frame AND (via w) the normalizer scalar; left
    # lazy, the corpus-sized lang-count aggregate executed 4× (one per
    # consumer subtree — round-14 plan audit: 4 parquet scans for a
    # |langs|-row result).
    s = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    t = s.agg(F.sum("n_docs").alias("total_docs"))
    w = s.join(F.broadcast(t)).selectExpr(
        "lang",
        "n_docs",
        "total_docs",
        "cast(n_docs as double) / cast(total_docs as double) as p_raw",
    ).selectExpr("*", f"{_TEMP_TERM6} as term6")
    z = w.agg(
        F.sum(F.col("term6").cast("decimal(25,6)")).cast("double").alias("z")
    )
    return (
        w.join(F.broadcast(z))
        .selectExpr(
            "lang", "n_docs", "p_raw", "total_docs",
            f"{_TEMP_WEIGHT6} as samp_weight",
        )
        .selectExpr(
            "lang",
            "n_docs",
            "p_raw",
            "samp_weight",
            "cast(floor(samp_weight * cast(total_docs as double) + 0.5) as bigint)"
            " as expected_epoch_docs",
        )
    )


# Shards via md5 hex-prefix range bucketing: shard = Σ (h >= t) over
# evenly spaced hex-prefix thresholds — expressible identically in
# Spark and DuckDB (md5 yields the same lowercase hex in both). The
# thresholds DERIVE from the count (round-6 review: a free-standing
# list let the constant silently lie); power-of-two counts ≤ 16 give
# single-char thresholds, larger counts would use longer prefixes.
N_SHUFFLE_SHARDS = 8
if not (0 < N_SHUFFLE_SHARDS <= 16 and 16 % N_SHUFFLE_SHARDS == 0):
    # a raise, not assert: asserts vanish under `python -O`, and a bad
    # count would silently produce DUPLICATE thresholds — identically
    # wrong shard math on the Spark and oracle sides (hash-green but
    # corrupt). Counts > 16 need multi-char hex prefixes — implement
    # that here before raising the constant past 16.
    raise ValueError(
        f"N_SHUFFLE_SHARDS={N_SHUFFLE_SHARDS} must be a power-of-two divisor of 16"
    )
_SHARD_THRESHOLDS = [
    format(i * 16 // N_SHUFFLE_SHARDS, "x") for i in range(1, N_SHUFFLE_SHARDS)
]


@register(
    "shuffle_shard",
    "llm",
    oracle=f"""
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents
),
s AS (
  SELECT doc_id, hx,
         {' + '.join(f"CAST(hx >= '{t}' AS BIGINT)" for t in _SHARD_THRESHOLDS)} AS shard
  FROM h
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS pos
FROM s
""",
)
def shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle → training shards: the export step
    every training run needs (examples must reach the data loader in a
    reproducible pseudo-random order, sharded for parallel readers).
    md5(doc_id) is the permutation key: shard = hex-prefix range
    bucket (map-side, no shuffle to ASSIGN), position-within-shard =
    one window per shard ordered by the hash — i.e. exactly the
    repartition + sortWithinPartitions plan a file export would run,
    expressed declaratively so the oracle can replay it.

    Scale shape: ONE exchange on shard (8-way here; thousands at
    100 TB) and a per-shard sort — no global sort, no driver
    involvement. Deterministic across cluster sizes because both the
    shard and the order derive from content (md5), not from partition
    layout — the split_train_holdout reproducibility property applied
    to ordering."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = sum(
        (h >= t).cast("long") for t in _SHARD_THRESHOLDS
    )
    w = Window.partitionBy("shard").orderBy("hx", "doc_id")
    return (
        d.select("doc_id", h.alias("hx"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


# Per-language token budget for corpus_budget_trim. Sized to bite at
# every test sf (sf0.001 already carries >5k tokens per lang) so the
# trim is exercised, not vacuously passing everything through.
LANG_TOKEN_BUDGET = 5_000


@register(
    "corpus_budget_trim",
    "llm",
    oracle=f"""
WITH sized AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS hx
  FROM documents
), running AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY hx, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM sized
)
SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM running WHERE cum_tokens <= {LANG_TOKEN_BUDGET}
""",
)
def corpus_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus trim: keep a deterministic pseudo-random
    sample of each language until its token budget is spent — the
    data-mixing primitive behind 'N billion tokens of lang X' recipe
    lines (corpus_mix_rebalance plans per-stratum RATES; this enforces
    an absolute token CEILING). md5(doc_id) is the priority order, so
    the kept set is reproducible across runs and cluster sizes
    (split_train_holdout's property applied to a running sum).

    Scale shape (round-7 review): a Window.partitionBy(lang) running
    sum would be |langs| tasks each sequentially scanning corpus/|langs|
    rows — a 5-task bottleneck at 100 TB. This is instead the
    cust_rfm_segments two-phase distributed prefix sum: range-
    repartition on (lang, hx, doc_id) spreads every language across
    many partitions in priority order; the running sum is then a
    PER-PARTITION window (partitioned by (_pid, lang) — fully
    parallel) plus a broadcast per-(partition, lang) cumulative token
    offset computed from a ≤ parts×|langs|-row frame (bounded by
    construction, never corpus-sized). The checkpoint pins partition
    contents so the offsets subplan and the window see identical
    range bounds (the _exact_ntile lifecycle note applies). The
    inclusive running sum ≤ budget is the standard take-until-budget
    contract (never overshoots; may undershoot by less than one
    document)."""
    from linux_logs_spark.session import default_parallelism

    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        "lang",
        F.size(words("text")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("hx"),
    )
    parts = min(default_parallelism(), 32)
    ranked = (
        sized.repartitionByRange(parts, "lang", "hx", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # per-(partition, lang) token totals: ≤ parts × |langs| rows, so
    # the cross-partition running offset is a bounded-frame window
    # and the join side always fits a broadcast.
    pl = ranked.groupBy("_pid", "lang").agg(F.sum("n_tokens").alias("_tok"))
    cum = (
        Window.partitionBy("lang")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # offset side carries RENAMED keys: offsets shares ranked's
    # lineage, so joining on same-named attributes would rely on
    # Spark's self-join disambiguation (it warns 'trivially true
    # equals predicate' — round-8 rehearsal); distinct names make the
    # condition unambiguous by construction.
    offsets = pl.select(
        F.col("_pid").alias("o_pid"),
        F.col("lang").alias("o_lang"),
        F.coalesce(F.sum("_tok").over(cum), F.lit(0)).alias("_off"),
    )
    w = (
        Window.partitionBy("_pid", "lang")
        .orderBy("hx", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # eqNullSafe on lang: NULL is a valid language group under both
    # the old partitionBy(lang) window and the DuckDB oracle's
    # PARTITION BY — a null-unsafe equi-join would silently drop
    # every NULL-lang document (round-8 review).
    loc = ranked.withColumn("_local", F.sum("n_tokens").over(w))
    return (
        loc.join(
            F.broadcast(offsets),
            (F.col("_pid") == F.col("o_pid"))
            & F.col("lang").eqNullSafe(F.col("o_lang")),
        )
        .withColumn("cum_tokens", F.col("_local") + F.col("_off"))
        .filter(F.col("cum_tokens") <= LANG_TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


# Merge count for bpe_train_merges: enough rounds to produce real
# multi-char subwords on the test corpus while keeping the iterative
# driver loop cheap (each round is ~2 vocab-sized jobs).
N_BPE_MERGES = 16


@register("bpe_train_merges", "llm", oracle=None)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL byte-pair-encoding merge training (closing the round-6
    verdict's 'a real BPE tokenizer' gap): learn the first
    N_BPE_MERGES merges from the corpus exactly as the BPE algorithm
    defines them — count adjacent symbol pairs weighted by word
    frequency, merge the most frequent pair everywhere (greedy
    left-to-right), repeat.

    Scale shape (the textbook BPE split): the ONE corpus-sized pass is
    the word-frequency aggregate; every iteration after that operates
    on the |vocab|-sized symbol table (Heaps-sublinear in the corpus),
    with per-round driver traffic of exactly ONE row (the argmax pair
    — the dedup_clusters_cc / emb_pca_power bounded-collect rule).
    Pair counting is a higher-order transform + explode + hash agg;
    merge application is a JVM higher-order fold (no Python worker in
    the loop — measured 5.75→4.2 s vs the mapInPandas form at
    sf0.01); each round localCheckpoints so lineage stays O(1) (the
    Pregel discipline). Ties break (count desc, left asc, right asc)
    — fully deterministic, so the pin test (tests/test_bpe.py)
    asserts EXACT equality against an independent single-process
    reference. No SQL oracle: iterative argmax loops are the declared
    rows-only class (SURVEY §2 contract)."""
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    syms = vocab.select(
        "freq", F.split("word", "").alias("syms")
    ).localCheckpoint(eager=True)

    def pair_counts(frame: DataFrame) -> DataFrame:
        idx = F.when(
            F.size("syms") >= 2, F.sequence(F.lit(0), F.size("syms") - 2)
        ).otherwise(F.array().cast("array<int>"))
        pairs = F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(F.col("syms"), i + 1).alias("l"),
                F.element_at(F.col("syms"), i + 2).alias("r"),
            ),
        )
        return (
            frame.select("freq", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("n"))
        )

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, N_BPE_MERGES + 1):
        top = (
            pair_counts(syms)
            .orderBy(F.col("n").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0].n < 2:
            break
        l, r, n = top[0].l, top[0].r, int(top[0].n)
        merges.append((rank, l, r, n))

        # Greedy left-to-right merge application as a JVM fold: push
        # each symbol; when the top of the accumulator is `l` and the
        # incoming symbol is `r`, replace the top with the merged
        # token. Non-overlap falls out of token VALUES (after merging
        # (a,a)→'aa' the top is 'aa', not 'a', so the next 'a' cannot
        # re-merge) — exactly the textbook greedy pass. A JVM
        # higher-order fold over the tiny vocab frame beats the
        # Arrow/Python worker round-trip an equivalent mapInPandas
        # paid per round (UDFs are the slow path; measured below).
        mtok = F.lit(l + r)
        apply_merge = F.aggregate(
            "syms",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(l))
                & (x == F.lit(r)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(mtok)
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        # LAZY checkpoint: the next round's argmax action materializes
        # it, so each round runs ONE job; lineage still truncates to
        # O(1) per round (the Pregel discipline).
        syms = syms.select("freq", apply_merge.alias("syms")).localCheckpoint(
            eager=False
        )

    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, pair_count long"
    )


# FFD shard sizing: each applyInPandas group carries at most ~TARGET
# docs, so per-task memory is bounded by the shard — NOT by the
# source — and the task count grows with the corpus (n_docs/TARGET ×
# |sources| groups) instead of being capped at |sources| (the round-8
# verdict's "20 tasks carry the whole corpus" defect). The count is
# derived from the parquet footer (zero jobs), the zorder/SemDeDup
# sizing-rule convention.
PACK_FFD_TARGET_DOCS = 20_000


@register("pack_sequences_ffd", "llm", oracle=None)  # sequential per-group algorithm → rows-only; exact pin in tests/test_packing.py
def pack_sequences_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing BIN PACKING of whole documents into
    PACK_BUDGET-token training sequences — the no-split counterpart of
    pack_sequences (which streams docs contiguously and SPLITS them at
    chunk boundaries). No-split packing is what instruction-tuning /
    contrastive batches need (a split example is a corrupted example),
    and FFD is the standard near-optimal (11/9 OPT + 1) heuristic:
    sort docs longest-first, drop each into the first bin it fits.

    Scale shape: packing is inherently sequential WITHIN a bin stream,
    so the parallel unit is the group — applyInPandas over
    (source, shard), where shard = md5(doc_id) bucket and the shard
    count grows with the corpus (footer row count // TARGET_DOCS, the
    SemDeDup/zorder sizing-rule convention). Each pandas group is
    therefore ~memory-sized at ANY corpus size and the task count
    scales with data volume, not with |sources|. FFD stays EXACT
    within each shard (bin_id is shard-local; a global bin id would
    serialize the packing); the fill-efficiency price of sharding is
    at most one under-filled bin per shard — asymptotically free at
    TARGET_DOCS ≫ 1. Docs longer than the budget get a singleton
    oversize bin (flagged) rather than being dropped silently.
    Deterministic: the md5 shard key and the (n_tokens desc, doc_id)
    tie-break make the assignment a pure function of the corpus —
    pinned EXACTLY against an independent single-process FFD per
    (source, shard) in tests/test_packing.py (the bpe_train_merges
    evidence pattern), which also measures the fill-efficiency edge
    over closing bins in arrival order and pins the >|sources| task
    grain."""
    import pandas as pd

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bins: list[int] = []  # remaining capacity per bin
        assign = []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > PACK_BUDGET:
                # oversize: singleton bin, capacity exhausted (an
                # exact-fit doc is NOT oversize — it packs its own
                # full bin through the normal path below)
                bins.append(0)
                assign.append(len(bins) - 1)
                continue
            for i, rem in enumerate(bins):
                if n <= rem:
                    bins[i] = rem - n
                    assign.append(i)
                    break
            else:
                bins.append(PACK_BUDGET - n)
                assign.append(len(bins) - 1)
        out = pdf[["source", "shard", "doc_id", "n_tokens"]].copy()
        out["bin_id"] = pd.array(assign, dtype="int64")
        out["oversize"] = out["n_tokens"] > PACK_BUDGET
        return out

    n_shards = max(
        1, table_row_count(sf_dir, "documents") // PACK_FFD_TARGET_DOCS
    )
    d = load(spark, sf_dir, "documents").selectExpr(
        "source",
        # the sample_weighted_priority md5-prefix convention: uniform,
        # deterministic, engine-portable
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)"
        f" as bigint) % {n_shards} AS shard",
        "doc_id",
        "cast(size(split(text, ' ')) as long) as n_tokens",
    )
    return d.groupBy("source", "shard").applyInPandas(
        ffd,
        "source string, shard long, doc_id long, n_tokens long,"
        " bin_id long, oversize boolean",
    )


# Weighted-sampling knobs: K docs per language, salted two-phase
# top-k fan-in. The salt count bounds phase-2 input at SALT×K rows
# per lang regardless of corpus size.
WEIGHTED_SAMPLE_K = 10
WEIGHTED_SAMPLE_SALTS = 32

# A-Res priority: u^(1/w) with u hash-uniform in (0,1]. u is EXACT in
# double ((h32+1)/2^32 — integer numerator, power-of-two denominator),
# so only pow() needs the round6 half-away convention.
_ARES_U_SPARK = (
    "(cast(cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)"
    " as bigint) + 1 as double) / 4294967296.0)"
)
_ARES_U_DUCK = (
    "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1"
    " AS DOUBLE) / 4294967296.0)"
)


def _ares_priority(u_sql: str) -> str:
    return round6_away_sql(f"pow({u_sql}, 1.0 / cast(n_chars as double))")


@register(
    "sample_weighted_priority",
    "llm",
    oracle=f"""
WITH p AS (
  SELECT lang, doc_id, {_ares_priority(_ARES_U_DUCK)} AS priority
  FROM documents WHERE n_chars > 0
)
SELECT lang, doc_id, priority, CAST(rn AS BIGINT) AS sample_rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY priority DESC, doc_id) AS rn
  FROM p
) WHERE rn <= {WEIGHTED_SAMPLE_K}
""",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis-Spirtsis
    A-Res): each doc draws priority u^(1/w) — u hash-uniform from
    md5(doc_id), w = n_chars — and the top-K priorities per language
    ARE a w-weighted sample without replacement. The
    quality/length-weighted cousin of sample_stratified's uniform
    exact-rank filter, and fully REPRODUCIBLE: the hash replaces
    rand(), so the same corpus always yields the same sample on any
    cluster layout.

    Scale shape: priority is one codegen'd map-side projection (u is
    exact in double — integer numerator over 2^32 — so only pow()
    needs the round6 convention); selection is TWO-PHASE top-K — a
    ranking window over (lang, salt) keeps every sort partition at
    corpus/|langs|/32 rows, then the finalist window ranks ≤ 32·K rows
    per lang. A single per-lang window would funnel the whole corpus
    through |langs| tasks (the corpus_budget_trim lesson); two-phase
    top-K is exact (any global top-K member is top-K within its
    salt), so the single-window oracle replays it verbatim. Ties on
    the rounded priority break by doc_id in both engines."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    pr = d.selectExpr(
        "lang",
        "doc_id",
        f"{_ares_priority(_ARES_U_SPARK)} as priority",
    ).withColumn(
        "salt",
        F.pmod(F.xxhash64("doc_id"), F.lit(WEIGHTED_SAMPLE_SALTS)).cast("int"),
    )
    w1 = Window.partitionBy("lang", "salt").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    finalists = (
        pr.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= WEIGHTED_SAMPLE_K)
        .drop("rn1", "salt")
    )
    w2 = Window.partitionBy("lang").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    return (
        finalists.withColumn("sample_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("sample_rank") <= WEIGHTED_SAMPLE_K)
        .select("lang", "doc_id", "priority", "sample_rank")
    )


# Feature-hashing dimensionality: buckets for the hashing trick. 64
# keeps the demonstration's collision structure visible at test scale;
# production HashingTF defaults to 2^18 — the plan is identical.
HASHING_TF_DIM = 64


@register(
    "text_hashing_tf",
    "llm",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT doc_id,
       ('0x' || substr(md5(word), 1, 8))::BIGINT % {HASHING_TF_DIM} AS bucket,
       CAST(count(*) AS BIGINT) AS tf
FROM w
GROUP BY doc_id, bucket
""",
)
def text_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (HashingTF): project every document onto a
    FIXED bucket dimension with a stateless hash — the vectorizer a
    100 TB featurization pipeline uses precisely because it needs NO
    vocabulary pass, no dictionary broadcast, and no coordination:
    bucket = h(word) % D is computed map-side on each executor, so the
    whole operator is explode → hash → one (doc, bucket) aggregate
    (vocab_build's two-pass dictionary is the contrast). Collisions
    are the accepted trade (D=64 here makes them visible; 2^18 in
    production). Cross-engine hash = first 8 hex chars of md5 as an
    integer — the split_train_holdout md5-threshold convention
    extended to bucket arithmetic, exact in both engines. Long-format
    (doc_id, bucket, tf) output: sparse by construction, no map/array
    columns for the driver canonicalizer to choke on."""
    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(words("text")).alias("word"))
    bucket = (
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
        % HASHING_TF_DIM
    )
    return (
        w.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )
