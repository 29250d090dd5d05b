"""Oracle-checked queries for the training-data-pipeline extensions:
text analysis, deduplication (exact / normalized / Jaccard / MinHash-LSH
/ SimHash), and embedding similarity search.

All signatures are md5-derived so the DuckDB oracle reproduces them
bit-for-bit; cosine values are rounded to 6 decimals to absorb
summation-order ulps (see functions.similarity docstring).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pipe_s_spark.functions import dedup as D
from pipe_s_spark.functions import exact as E
from pipe_s_spark.functions import shared as SH
from pipe_s_spark.functions import similarity as S
from pipe_s_spark.functions import text as X
from pipe_s_spark.sources import load_table

#: DuckDB fragment: whitespace tokens of lowered text, empties removed.
TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"


# --- text analysis -------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.transform(X.with_text_stats()).select(
        "doc_id", "n_chars_calc", "n_tokens", "n_bpe_tokens", "n_stopwords", "quality", "lang_pred"
    )


SQL_TEXT_STATS = f"""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
       CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(lower(text), '{X.BPE_ISH_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(lower(text), '\\b({"|".join(X.EN_STOPWORDS)})\\b')) AS BIGINT) AS n_stopwords,
       {X.quality_score_sql('text')} AS quality,
       CASE WHEN CAST(len(regexp_extract_all(lower(text), '\\b({"|".join(X.EN_STOPWORDS)})\\b')) AS DOUBLE)
                 / GREATEST(CAST(len({TOKS_SQL}) AS DOUBLE), 1.0) > 0.05
            THEN 'en' ELSE 'other' END AS lang_pred
FROM documents
"""


def q_text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion counts of the stopword-ratio
    classifier against the gold ``lang`` label — the quality-report
    half every heuristic classifier in a curation pipeline needs. One
    narrow classify pass + one tiny groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.transform(X.with_text_stats())
        .groupBy(F.col("lang").alias("gold_lang"), "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SQL_TEXT_LANGID_EVAL = f"""
WITH pred AS (
    SELECT lang AS gold_lang,
           CASE WHEN CAST(len(regexp_extract_all(lower(text), '\\b({"|".join(X.EN_STOPWORDS)})\\b')) AS DOUBLE)
                     / GREATEST(CAST(len({TOKS_SQL}) AS DOUBLE), 1.0) > 0.05
                THEN 'en' ELSE 'other' END AS lang_pred
    FROM documents
)
SELECT gold_lang, lang_pred, COUNT(*) AS n_docs
FROM pred GROUP BY gold_lang, lang_pred
"""


def q_text_lang_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, source) corpus summary. avg_chars is emitted as
    BIGINT micro-units (exact.davg_int): the float formulations lost
    the driver's hash comparison three rounds running while the
    bit-exact local replica passed them, so the column is now integer
    end-to-end — immune to any float-hashing policy by construction.

    total_chars is CAST(... AS BIGINT) in the oracle: DuckDB's
    SUM(BIGINT) returns HUGEINT, which fetchdf() materializes as
    float64, while Spark returns int64 — a dtype-sensitive hash sees
    123456.0 vs 123456 and rejects. The cast pins both engines to
    int64 (same pattern as text_inverted_index's oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        E.davg_int("n_chars").alias("avg_chars_x1m"),
    )


SQL_TEXT_LANG_SUMMARY = f"""
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       {E.davg_int_sql('n_chars')} AS avg_chars_x1m
FROM documents
GROUP BY lang, source
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.fingerprint("text").alias("fp"))


SQL_TEXT_FINGERPRINT = f"""
SELECT doc_id, {X.fingerprint_sql('text')} AS fp
FROM documents
"""


def q_text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality gate: per-doc keep/drop decision with the first
    failing rule as the reason — the actual filter step a training-data
    pipeline runs on top of the raw stats (narrow expressions, no
    shuffle; the decision column is what a 100 TB filter pushes into its
    scan)."""
    docs = load_table(spark, sf_dir, "documents").transform(X.with_text_stats())
    too_short = F.col("n_tokens") < 10
    low_stop = (F.col("n_stopwords").cast("double") / F.col("n_tokens")) < 0.01
    long_tok = (F.col("n_chars_calc").cast("double") / F.col("n_tokens")) > 12.0
    reason = (
        F.when(too_short, "too_short")
        .when(low_stop, "low_stopword_ratio")
        .when(long_tok, "long_tokens")
        .otherwise("keep")
    )
    return docs.select(
        "doc_id",
        reason.alias("decision"),
        (reason == "keep").alias("keep"),
    )


SQL_TEXT_QUALITY_FILTER = f"""
WITH s AS (
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
           CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(lower(text), '\\b({"|".join(X.EN_STOPWORDS)})\\b')) AS BIGINT) AS n_stopwords
    FROM documents
),
d AS (
    SELECT doc_id,
           CASE WHEN n_tokens < 10 THEN 'too_short'
                WHEN CAST(n_stopwords AS DOUBLE) / n_tokens < 0.01 THEN 'low_stopword_ratio'
                WHEN CAST(n_chars_calc AS DOUBLE) / n_tokens > 12.0 THEN 'long_tokens'
                ELSE 'keep' END AS decision
    FROM s
)
SELECT doc_id, decision, decision = 'keep' AS keep FROM d
"""


def q_text_quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality CALIBRATION: absolute thresholds (the
    text_quality_filter gate) misfire when domains have different
    baseline styles, so production pipelines keep the top X% WITHIN
    each source. Score is integer fixed-point stopword-density
    (deterministic, no floats until the final rounded percent_rank);
    the window is PARTITIONED by source — per-domain parallel, never a
    global sort."""
    docs = load_table(spark, sf_dir, "documents").transform(X.with_text_stats())
    scored = docs.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "source",
        F.expr("CAST((n_stopwords * 1000000) DIV n_tokens AS BIGINT)").alias("score_x1m"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("score_x1m"), F.asc("doc_id"))
    return scored.select(
        "doc_id",
        "source",
        "score_x1m",
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
    ).withColumn("keep", F.col("pct_rank") <= 0.5)


SQL_TEXT_QUALITY_CALIBRATED = f"""
WITH s AS (
    SELECT doc_id, source,
           CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(lower(text), '\\b({"|".join(X.EN_STOPWORDS)})\\b')) AS BIGINT) AS n_stopwords
    FROM documents
),
scored AS (
    SELECT doc_id, source,
           CAST((n_stopwords * 1000000) // n_tokens AS BIGINT) AS score_x1m
    FROM s WHERE n_tokens > 0
)
SELECT doc_id, source, score_x1m,
       ROUND(PERCENT_RANK() OVER (
           PARTITION BY source ORDER BY score_x1m DESC, doc_id ASC), 8) AS pct_rank,
       ROUND(PERCENT_RANK() OVER (
           PARTITION BY source ORDER BY score_x1m DESC, doc_id ASC), 8) <= 0.5 AS keep
FROM scored
"""


#: Docs kept per (lang, source) stratum by the composite pipeline.
PIPELINE_CAP = 10


def q_text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite curation pipeline a real corpus run chains:
    C4-style quality gate -> exact dedup (min-id survivor per digest)
    -> deterministic per-(lang, source) cap. One registered query so
    the WHOLE chain is oracle-checked end-to-end, not just its stages.

    Plan shape: the quality gate is narrow (pushed into the scan); the
    dedup window and the stratum window are the only two shuffles, each
    on a key the next stage doesn't disturb."""
    docs = load_table(spark, sf_dir, "documents").transform(X.with_text_stats())
    keep = ~(
        (F.col("n_tokens") < 10)
        | ((F.col("n_stopwords").cast("double") / F.col("n_tokens")) < 0.01)
        | ((F.col("n_chars_calc").cast("double") / F.col("n_tokens")) > 12.0)
    )
    kept = docs.filter(keep)
    w_digest = Window.partitionBy(F.md5("text"))
    deduped = kept.withColumn("keep_id", F.min("doc_id").over(w_digest)).filter(
        F.col("doc_id") == F.col("keep_id")
    )
    w_stratum = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        deduped.withColumn("rk", F.row_number().over(w_stratum).cast("long"))
        .filter(F.col("rk") <= PIPELINE_CAP)
        .select("doc_id", "lang", "source", "rk")
    )


SQL_TEXT_CURATION_PIPELINE = f"""
WITH s AS (
    SELECT doc_id, lang, source, text,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
           CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(lower(text), '\\b({{stops}})\\b')) AS BIGINT) AS n_stopwords
    FROM documents
),
kept AS (
    SELECT * FROM s
    WHERE NOT (n_tokens < 10
               OR CAST(n_stopwords AS DOUBLE) / n_tokens < 0.01
               OR CAST(n_chars_calc AS DOUBLE) / n_tokens > 12.0)
),
deduped AS (
    SELECT * FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM kept
    ) WHERE doc_id = keep_id
)
SELECT doc_id, lang, source, rk FROM (
    SELECT doc_id, lang, source,
           CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
                                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                AS BIGINT) AS rk
    FROM deduped
) WHERE rk <= {PIPELINE_CAP}
""".format(stops="|".join(X.EN_STOPWORDS))


def q_text_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation YIELD FUNNEL: how many documents survive each stage of
    the composite pipeline (raw -> C4 quality gate -> exact dedup ->
    per-stratum cap) — the one-table answer to "where did my corpus
    go?", read next to text_curation_pipeline's row-level output. Two
    aggregates produce all four numbers (stage 3/4 share one
    stratum-grain rollup: survivors per stratum = distinct digests
    among quality-passing docs, cap stage = LEAST(cap, survivors));
    the 4-row report is a unionByName of the two — no scalar
    cross-joins, no windows."""
    docs = load_table(spark, sf_dir, "documents").transform(X.with_text_stats())
    keep = ~(
        (F.col("n_tokens") < 10)
        | ((F.col("n_stopwords").cast("double") / F.col("n_tokens")) < 0.01)
        | ((F.col("n_chars_calc").cast("double") / F.col("n_tokens")) > 12.0)
    )
    a1 = docs.agg(
        F.count(F.lit(1)).alias("raw"),
        F.sum(keep.cast("long")).alias("quality_gate"),
    )
    strat = (
        docs.filter(keep)
        .groupBy("lang", "source")
        .agg(F.count_distinct(F.md5("text")).alias("nd"))
    )
    a2 = strat.agg(
        F.sum("nd").alias("exact_dedup"),
        F.sum(F.least(F.col("nd"), F.lit(PIPELINE_CAP))).alias("stratum_cap"),
    )
    s1 = a1.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("stage"), F.lit("raw").alias("name"),
                         F.col("raw").alias("n_docs")),
                F.struct(F.lit(2).alias("stage"), F.lit("quality_gate").alias("name"),
                         F.col("quality_gate").alias("n_docs")),
            )
        ).alias("s")
    ).select("s.stage", "s.name", "s.n_docs")
    s2 = a2.select(
        F.explode(
            F.array(
                F.struct(F.lit(3).alias("stage"), F.lit("exact_dedup").alias("name"),
                         F.col("exact_dedup").alias("n_docs")),
                F.struct(F.lit(4).alias("stage"), F.lit("stratum_cap").alias("name"),
                         F.col("stratum_cap").alias("n_docs")),
            )
        ).alias("s")
    ).select("s.stage", "s.name", "s.n_docs")
    return s1.unionByName(s2)


SQL_TEXT_CURATION_FUNNEL = """
WITH s AS (
    SELECT doc_id, lang, source, text,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
           CAST(len({toks}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(lower(text), '\\b({stops})\\b')) AS BIGINT)
               AS n_stopwords
    FROM documents
),
flagged AS (
    SELECT *,
           NOT (n_tokens < 10
                OR CAST(n_stopwords AS DOUBLE) / n_tokens < 0.01
                OR CAST(n_chars_calc AS DOUBLE) / n_tokens > 12.0) AS keep
    FROM s
),
strat AS (
    SELECT lang, source, COUNT(DISTINCT md5(text)) AS nd
    FROM flagged WHERE keep GROUP BY lang, source
)
SELECT 1 AS stage, 'raw' AS name, COUNT(*) AS n_docs FROM flagged
UNION ALL
SELECT 2, 'quality_gate', CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
FROM flagged
UNION ALL
SELECT 3, 'exact_dedup', CAST(SUM(nd) AS BIGINT) FROM strat
UNION ALL
SELECT 4, 'stratum_cap', CAST(SUM(LEAST(nd, {cap})) AS BIGINT) FROM strat
""".format(toks=TOKS_SQL, stops="|".join(X.EN_STOPWORDS), cap=PIPELINE_CAP)


def q_text_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: hash the doc id into
    100 buckets (md5-based, engine-independent, stable across runs and
    cluster sizes — the property random() splits lack), 96/2/2."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    split = (
        F.when(bucket < 96, "train").when(bucket < 98, "val").otherwise("test")
    )
    return docs.select("doc_id", bucket.alias("bucket").cast("int"), split.alias("split"))


SQL_TEXT_SPLIT = """
SELECT doc_id,
       CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS INTEGER) AS bucket,
       CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 96 THEN 'train'
            WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 98 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (64-token buckets): the distribution scan
    every data pipeline runs before choosing packing/truncation lengths."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = X.token_count("text")
    return (
        docs.select((F.floor(n_tokens / 64) * 64).cast("long").alias("bucket_lo"))
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SQL_TEXT_LENGTH_HIST = f"""
SELECT CAST(FLOOR(CAST(len({TOKS_SQL}) AS BIGINT) / 64) * 64 AS BIGINT) AS bucket_lo,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
"""


#: Shard count for the packing window (same md5 bucketing as
#: text_split_assign). Each shard packs independently; global pack ids
#: come from a driver-side prefix-sum over the PACK_SHARDS per-shard
#: pack counts — O(shards) driver work, never O(docs).
PACK_SHARDS = 100


def _doc_shard() -> F.Column:
    """md5(doc_id) % PACK_SHARDS — the same engine-independent bucket
    expression text_split_assign uses."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % PACK_SHARDS
    )


def q_text_pack_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to fixed-budget packs of 2048
    tokens by exclusive running token count — the layout step before
    writing training shards.

    Shard-local formulation (the 100 TB path): docs hash into
    PACK_SHARDS md5 shards; the running-count window is PARTITIONED by
    shard (parallel, no global sort — a global ORDER BY window would
    serialize the corpus through one reducer); per-shard pack counts
    (<= PACK_SHARDS rows) are prefix-summed on the driver to offset
    each shard's local pack ids into a disjoint global range. The
    narrow projection is localCheckpoint'ed so the corpus is scanned
    once, not once per the count-collect and once for the result."""
    docs = load_table(spark, sf_dir, "documents")
    n = X.token_count("text")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = (
        docs.select("doc_id", n.alias("n_tokens"), _doc_shard().alias("shard"))
        .withColumn(
            "local_pack",
            F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 2048).cast("long"),
        )
        .localCheckpoint(eager=True)
    )
    counts = local.groupBy("shard").agg((F.max("local_pack") + 1).alias("n_packs")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["shard"]):
        offsets[r["shard"]] = acc
        acc += r["n_packs"]
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("shard")
    )
    return local.select(
        "doc_id", "n_tokens", (F.col("local_pack") + off).cast("long").alias("pack_id")
    )


SQL_TEXT_PACK = f"""
WITH base AS (
    SELECT doc_id,
           CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % {PACK_SHARDS} AS shard
    FROM documents
),
w AS (
    SELECT doc_id, n_tokens, shard,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048) AS BIGINT) AS local_pack
    FROM base
),
np AS (SELECT shard, MAX(local_pack) + 1 AS n_packs FROM w GROUP BY shard),
offs AS (
    SELECT shard, CAST(COALESCE(SUM(n_packs) OVER (
        ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
    FROM np
)
SELECT w.doc_id, w.n_tokens, CAST(w.local_pack + offs.off AS BIGINT) AS pack_id
FROM w JOIN offs USING (shard)
"""


# --- dedup ---------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the text digest, keep min doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("digest")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS digest, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup on normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(D.normalize_text("text")).alias("digest")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


SQL_DEDUP_NORMALIZED = f"""
SELECT md5({D.NORMALIZE_SQL.format(expr='text')}) AS digest,
       MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


SQL_SHINGLES = f"""
tok AS (
    SELECT doc_id,
           unnest({TOKS_SQL}) AS tok,
           generate_subscripts({TOKS_SQL}, 1) AS ord
    FROM documents
),
sh_raw AS (
    SELECT doc_id,
           tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
),
sh AS (
    SELECT DISTINCT doc_id, shingle FROM sh_raw WHERE shingle IS NOT NULL
)"""


def q_text_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: the 20 most frequent token
    trigrams (shingle relation reused; count + deterministic top-k)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(docs, "doc_id", "text", k=3)
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), "shingle")
        .limit(20)
    )


SQL_TEXT_TOP_TRIGRAMS = f"""
WITH {SQL_SHINGLES}
SELECT shingle, COUNT(*) AS n_docs
FROM sh GROUP BY shingle
ORDER BY n_docs DESC, shingle
LIMIT 20
"""


#: Max document frequency for a shingle to stay in the jaccard index.
#: A boilerplate 3-gram shared by 1M docs would otherwise create a
#: quadratic collision group on one skewed join key; dropping
#: stop-shingles from the representation (index AND sizes, both
#: engines) bounds per-shingle join fan-out at DF_CAP^2.
JACCARD_DF_CAP = 100


def _posting_counts_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-materialized (d1, n1, d2, n2, c) candidate-pair counts —
    the narrow table jaccard AND containment dedup both read. A cluster
    job persists this once (it is pair-volume sized, bounded by the
    df-cap) and every overlap measure consumes it; in-session the
    functions.shared memo plays that role."""

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        sh = D.shingles(docs, "doc_id", "text", k=3)
        return D.pair_counts(sh, "doc_id", df_cap=JACCARD_DF_CAP)

    return SH.materialized(spark, ("posting_counts", sf_dir, 3, JACCARD_DF_CAP), build)


#: df cap / rounded-cosine threshold for the TF-IDF sparse-vector pairs.
TFIDF_DF_CAP = 100
TFIDF_COS_MIN = 0.3


def q_dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted cosine near-dup pairs over distinct-shingle sets —
    the SPARSE-vector similarity leg between plain set overlap
    (dedup_jaccard_pairs, every shingle equal) and dense embeddings
    (dedup_embedding): shared RARE shingles dominate the score, shared
    boilerplate contributes almost nothing. Same df-capped inverted
    posting-list shape as the Jaccard query (two shuffles, narrow pair
    generation); idf is quantized to integer milli-nats once per
    shingle so dots and norms are exact BIGINT sums. The inverted
    index is session-materialized (functions.shared) like the jaccard
    posting counts — at scale it is the persisted artifact."""
    inv = _tfidf_inv_cached(spark, sf_dir)
    return D.tfidf_pairs_from_inverted(inv, threshold=TFIDF_COS_MIN)


def _tfidf_inv_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        sh = D.shingles(docs, "doc_id", "text", k=3)
        return D.tfidf_inverted(sh, n_docs, df_cap=TFIDF_DF_CAP)

    return SH.materialized(spark, ("tfidf_inv", sf_dir, 3, TFIDF_DF_CAP), build)


SQL_DEDUP_TFIDF_COSINE = f"""
WITH {{sh}},
nd AS (SELECT COUNT(*) AS n FROM documents),
dfr AS (SELECT shingle, COUNT(*) AS dfc FROM sh GROUP BY shingle),
terms AS (
    SELECT shingle,
           CAST(ROUND(LN(CAST(n AS DOUBLE) / CAST(dfc AS DOUBLE)) * 1000) AS BIGINT)
               AS idf_x1k
    FROM dfr CROSS JOIN nd WHERE dfc <= {TFIDF_DF_CAP}
),
w AS (
    SELECT sh.doc_id, sh.shingle, idf_x1k, idf_x1k * idf_x1k AS idf2
    FROM sh JOIN terms USING (shingle)
),
norms AS (
    SELECT doc_id, SUM(idf2) AS nrm2 FROM w GROUP BY doc_id HAVING SUM(idf2) > 0
),
dots AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, SUM(a.idf_x1k * b.idf_x1k) AS dot
    FROM w a JOIN w b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2,
       ROUND(CAST(dot AS DOUBLE)
             / (sqrt(CAST(n1.nrm2 AS DOUBLE)) * sqrt(CAST(n2.nrm2 AS DOUBLE))),
             6) AS cos_sim
FROM dots
JOIN norms n1 ON n1.doc_id = d1
JOIN norms n2 ON n2.doc_id = d2
WHERE ROUND(CAST(dot AS DOUBLE)
            / (sqrt(CAST(n1.nrm2 AS DOUBLE)) * sqrt(CAST(n2.nrm2 AS DOUBLE))),
            6) >= {TFIDF_COS_MIN}
""".replace("{sh}", SQL_SHINGLES)


def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup pairs via a df-capped inverted posting
    list (see functions.dedup.jaccard_pairs — no self-join, bounded
    per-shingle fan-out). Pair counts come from the shared materialized
    posting-counts table (functions.shared)."""
    return D.jaccard_from_counts(_posting_counts_cached(spark, sf_dir), threshold=0.15)


SQL_DEDUP_JACCARD = f"""
WITH {SQL_SHINGLES},
shc AS (
    SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
    ) WHERE df <= {JACCARD_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
    FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2,
       ROUND(CAST(c AS DOUBLE) / (s1.n + s2.n - c), 6) AS jaccard
FROM common
JOIN sizes s1 ON s1.doc_id = d1
JOIN sizes s2 ON s2.doc_id = d2
WHERE ROUND(CAST(c AS DOUBLE) / (s1.n + s2.n - c), 6) >= 0.15
"""

def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (Broder 1997): |A∩B|/|A| catches a
    short doc embedded verbatim in a long one — the excerpt/quote case
    where Jaccard stays low. Same two-shuffle posting-list core as
    dedup_jaccard_pairs (functions.dedup.containment_pairs), read from
    the same shared materialized posting-counts table."""
    return D.containment_from_counts(_posting_counts_cached(spark, sf_dir), threshold=0.5)


SQL_DEDUP_CONTAINMENT = f"""
WITH {SQL_SHINGLES},
shc AS (
    SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
    ) WHERE df <= {JACCARD_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
    FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2, containment_1in2, containment_2in1 FROM (
    SELECT d1, d2,
           ROUND(CAST(c AS DOUBLE) / s1.n, 6) AS containment_1in2,
           ROUND(CAST(c AS DOUBLE) / s2.n, 6) AS containment_2in1
    FROM common
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
) WHERE containment_1in2 >= 0.5 OR containment_2in1 >= 0.5
"""


_MINHASH_N = 16
_MINHASH_BANDS = 4

#: Canonical cap lives in functions.dedup (shared with the streaming
#: index's default); re-exported here for the oracle SQL f-strings and
#: existing importers. Same bounded-fan-out argument as JACCARD_DF_CAP;
#: exact duplicates are already handled upstream by dedup_exact, so
#: dropping oversized groups loses only candidates the cheaper exact
#: pass finds anyway.
from pipe_s_spark.functions.dedup import LSH_BAND_CAP  # noqa: E402


def _minhash_sig_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-materialized MinHash signature table (doc_id + 16 ints).

    The signature table feeds MANY consumers — banding, both sides of
    the est-jaccard verify join, cross-corpus decontamination. At
    cluster scale every MinHash pipeline writes this narrow table to
    parquet ONCE before the band join; in-session the functions.shared
    memo is that persisted table, so the corpus + shingle kernel runs
    once per (sf_dir, family) no matter how many dedup queries run."""

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        sh = D.shingles(docs, "doc_id", "text", k=3)
        return D.minhash_signature(sh, "doc_id", _MINHASH_N)

    return SH.materialized(spark, ("minhash_sig", sf_dir, 3, _MINHASH_N), build)


def _minhash_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-materialized MinHash-LSH candidate pairs with estimated
    Jaccard — the table cluster resolution, keep-policy and fuzzy-verify
    queries all consume (pair-volume sized, bounded by LSH_BAND_CAP
    fan-out, so safe to persist)."""

    def build() -> DataFrame:
        sig = _minhash_sig_cached(spark, sf_dir)
        bands = D.cap_group_size(
            D.lsh_bands(sig, "doc_id", _MINHASH_N, _MINHASH_BANDS),
            ["band_id", "band_sig"],
            LSH_BAND_CAP,
        )
        a = bands.alias("a")
        b = bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_sig") == F.col("b.band_sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
            .distinct()
        )
        sa = sig.alias("sa")
        sb = sig.alias("sb")
        matches = sum(
            F.when(F.col(f"sa.h{i}") == F.col(f"sb.h{i}"), 1).otherwise(0)
            for i in range(_MINHASH_N)
        )
        return (
            cand.join(sa, F.col("d1") == F.col("sa.doc_id"))
            .join(sb, F.col("d2") == F.col("sb.doc_id"))
            .select(
                "d1", "d2", F.round(matches / F.lit(float(_MINHASH_N)), 6).alias("est_jaccard")
            )
        )

    return SH.materialized(
        spark, ("minhash_pairs", sf_dir, 3, _MINHASH_N, _MINHASH_BANDS, LSH_BAND_CAP), build
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs with estimated Jaccard (= matching
    signature fraction). Banding turns near-dup search into an
    equi-join — the path that survives 100 TB. Band groups larger than
    LSH_BAND_CAP are dropped before the join (bounded fan-out); the
    signature and pair tables are session-materialized
    (functions.shared) exactly like the persisted intermediate tables a
    production MinHash pipeline writes."""
    return _minhash_pairs_cached(spark, sf_dir)


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold TUNING table for lexical dedup: candidate-pair counts
    in estimated-Jaccard bands of 0.1 plus the cumulative pair count
    at-or-above each band floor — the one table you read before
    pinning CLUSTER_EDGE_MIN ("how many pairs does each threshold
    admit?"), the lexical sibling of sim_pair_histogram. One pass over
    the session-materialized pair table; the cumulative count comes
    from a NARROW <= 11x threshold explode per pair (a pair at
    est_jaccard e qualifies for every floor <= e), not from a global
    ordered window — the checker bans that shape and the explode
    keeps the whole computation map-side until one band-grain
    aggregate."""
    pairs = _minhash_pairs_cached(spark, sf_dir)
    eband = F.floor(F.col("est_jaccard") * 10).cast("int")
    ex = pairs.select(
        eband.alias("eb"),
        F.explode(F.sequence(F.lit(0), eband)).alias("tb"),
    )
    return (
        ex.groupBy("tb")
        .agg(
            F.sum((F.col("tb") == F.col("eb")).cast("long")).alias("n_pairs"),
            F.count(F.lit(1)).alias("n_pairs_at_or_above"),
        )
        .select(
            (F.col("tb") / 10.0).alias("band_lo"),
            "n_pairs",
            "n_pairs_at_or_above",
        )
        .filter(F.col("n_pairs") > 0)
    )


def _sql_dedup_threshold_sweep() -> str:
    return f"""
WITH {_MINHASH_SIMS_CTES},
ex AS (
    SELECT CAST(FLOOR(est_jaccard * 10) AS INTEGER) AS eb,
           unnest(generate_series(0, CAST(FLOOR(est_jaccard * 10) AS INTEGER))) AS tb
    FROM sims
)
SELECT CAST(tb AS DOUBLE) / 10.0 AS band_lo,
       CAST(SUM(CASE WHEN tb = eb THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
       COUNT(*) AS n_pairs_at_or_above
FROM ex GROUP BY tb
HAVING SUM(CASE WHEN tb = eb THEN 1 ELSE 0 END) > 0
"""


def _minhash_sig_sql() -> str:
    aggs = ",\n           ".join(
        "MIN(({a} * h + {b}) % {p}) AS h{i}".format(
            a=D.minhash_params(i)[0], b=D.minhash_params(i)[1], p=D.MINHASH_PRIME, i=i
        )
        for i in range(_MINHASH_N)
    )
    return (
        "sigbase AS (\n"
        "    SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) AS h FROM sh\n"
        "),\n"
        f"sig AS (\n    SELECT doc_id, {aggs}\n    FROM sigbase GROUP BY doc_id\n)"
    )


def _bands_sql() -> str:
    rows = _MINHASH_N // _MINHASH_BANDS
    parts = []
    for bnd in range(_MINHASH_BANDS):
        cols = " || '|' || ".join(
            f"CAST(h{i} AS VARCHAR)" for i in range(bnd * rows, (bnd + 1) * rows)
        )
        parts.append(f"SELECT doc_id, {bnd} AS band_id, {cols} AS band_sig FROM sig")
    return "bands AS (\n" + "\nUNION ALL\n".join(parts) + "\n)"


_MINHASH_SIMS_CTES = f"""{SQL_SHINGLES},
{_minhash_sig_sql()},
{_bands_sql()},
bands_c AS (
    SELECT doc_id, band_id, band_sig FROM (
        SELECT doc_id, band_id, band_sig,
               COUNT(*) OVER (PARTITION BY band_id, band_sig) AS gs
        FROM bands
    ) WHERE gs <= {LSH_BAND_CAP}
),
cand AS (
    SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
    FROM bands_c a JOIN bands_c b
      ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
sims AS (
    SELECT d1, d2,
           ROUND(({" + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(_MINHASH_N))})
                 / {float(_MINHASH_N)}, 6) AS est_jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = d1
    JOIN sig sb ON sb.doc_id = d2
)"""

SQL_DEDUP_MINHASH = f"""
WITH {_MINHASH_SIMS_CTES}
SELECT d1, d2, est_jaccard FROM sims
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup: candidate pairs for an ARRIVING BATCH
    (doc_id % 5 == 4 plays the new-arrivals role) against the existing
    corpus — only pairs touching at least one new document. The batch
    band table equi-joins the full band table (in production the
    corpus side is the PERSISTED band/signature parquet this session's
    materialized tables stand in for), so per-ingest cost scales with
    the batch, never the corpus — the shape that makes continuous
    dedup affordable at 100 TB. The oracle is the full-recompute pair
    table restricted to new-doc pairs: incremental must be
    result-identical to recompute."""
    sig = _minhash_sig_cached(spark, sf_dir)
    bands = D.cap_group_size(
        D.lsh_bands(sig, "doc_id", _MINHASH_N, _MINHASH_BANDS),
        ["band_id", "band_sig"],
        LSH_BAND_CAP,
    )
    new_bands = bands.filter(F.col("doc_id") % 5 == 4).alias("a")
    all_bands = bands.alias("b")
    cand = (
        new_bands.join(
            all_bands,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("d1"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("d2"),
        )
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.h{i}") == F.col(f"sb.h{i}"), 1).otherwise(0)
        for i in range(_MINHASH_N)
    )
    return (
        cand.join(sa, F.col("d1") == F.col("sa.doc_id"))
        .join(sb, F.col("d2") == F.col("sb.doc_id"))
        .select(
            "d1", "d2", F.round(matches / F.lit(float(_MINHASH_N)), 6).alias("est_jaccard")
        )
    )


SQL_DEDUP_INCREMENTAL = f"""
WITH {_MINHASH_SIMS_CTES}
SELECT d1, d2, est_jaccard FROM sims
WHERE d1 % 5 = 4 OR d2 % 5 = 4
"""


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus VERSION DIFF: classify every document across two corpus
    snapshots as added / removed / changed / unchanged by comparing
    content digests through one full-outer join on the document key —
    the audit a dataset-versioning layer (lakeFS / DVC / Delta time
    travel) runs between releases, and the input to incremental
    retraining decisions ("how much actually changed?").

    Snapshot construction is deterministic from the documents table:
    v1 lacks doc_id % 7 == 3 (those are ADDED in v2), v2 lacks
    doc_id % 11 == 5 (REMOVED), and v2 rewrites the text of
    doc_id % 5 == 2 (CHANGED).

    At 100 TB: each side reduces to (key, 16-byte digest, lang) before
    the join — the shuffle moves digests, never documents; with both
    snapshots bucketed by doc_id (sources.layout.write_bucketed) the
    full-outer join runs zero-shuffle. One join + one vocabulary-sized
    rollup, nothing else."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 7 != 3).select(
        "doc_id", F.md5(F.col("text")).alias("dig1"), F.col("lang").alias("lang1")
    )
    v2 = (
        docs.filter(F.col("doc_id") % 11 != 5)
        .withColumn(
            "text2",
            F.when(
                F.col("doc_id") % 5 == 2, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text")),
        )
        .select("doc_id", F.md5(F.col("text2")).alias("dig2"), F.col("lang").alias("lang2"))
    )
    j = v1.join(v2, "doc_id", "full_outer")
    status = (
        F.when(F.col("dig1").isNull(), F.lit("added"))
        .when(F.col("dig2").isNull(), F.lit("removed"))
        .when(F.col("dig1") != F.col("dig2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(status.alias("status"), F.coalesce("lang2", "lang1").alias("lang"))
        .groupBy("status", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SQL_CORPUS_SNAPSHOT_DIFF = """
WITH v1 AS (
    SELECT doc_id, md5(text) AS dig1, lang AS lang1
    FROM documents WHERE doc_id % 7 <> 3
),
v2 AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % 5 = 2 THEN text || ' [rev2]' ELSE text END) AS dig2,
           lang AS lang2
    FROM documents WHERE doc_id % 11 <> 5
),
j AS (
    SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           dig1, dig2, COALESCE(lang2, lang1) AS lang
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT CASE WHEN dig1 IS NULL THEN 'added'
            WHEN dig2 IS NULL THEN 'removed'
            WHEN dig1 <> dig2 THEN 'changed'
            ELSE 'unchanged' END AS status,
       lang, COUNT(*) AS n_docs
FROM j GROUP BY 1, 2
"""


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup verify stage: MinHash-LSH candidate pairs verified
    by TRUE edit distance (JVM-native levenshtein on both engines) over
    a 128-char normalized prefix — the standard two-phase shape
    (cheap sketch recall, exact verify precision). The prefix cap
    matters at scale: levenshtein is O(L1*L2) per pair, so an uncapped
    verify on book-length docs is quadratic in document size; 128 chars
    bounds every comparison at constant cost. Pairs are broadcast
    against the corpus (two narrow corpus scans, zero shuffle — the
    candidate set is bounded by LSH_BAND_CAP fan-out)."""
    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring(F.lower("text"), 1, 128).alias("prefix")
    )
    da = docs.alias("da")
    db = docs.alias("db")
    return (
        F.broadcast(pairs)
        .join(da, F.col("d1") == F.col("da.doc_id"))
        .join(db, F.col("d2") == F.col("db.doc_id"))
        .select(
            "d1",
            "d2",
            "est_jaccard",
            F.levenshtein(F.col("da.prefix"), F.col("db.prefix")).cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 48)
    )


SQL_DEDUP_EDIT_DISTANCE = f"""
WITH {_MINHASH_SIMS_CTES}
SELECT s.d1, s.d2, s.est_jaccard,
       CAST(levenshtein(substr(lower(da.text), 1, 128),
                        substr(lower(db.text), 1, 128)) AS INTEGER) AS edit_dist
FROM sims s
JOIN documents da ON da.doc_id = s.d1
JOIN documents db ON db.doc_id = s.d2
WHERE levenshtein(substr(lower(da.text), 1, 128),
                  substr(lower(db.text), 1, 128)) <= 48
"""


def q_dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level decontamination: flag TRAIN documents that share any
    MinHash-LSH band with a BENCHMARK document (held-out split =
    doc_id % 10 == 7 here; in production the benchmark side is the
    eval-suite corpus). The asymmetric variant of the self-join dedup:
    candidate generation is a train-side x bench-side equi-join on
    (band_id, band_sig) — bench side is tiny and broadcastable at real
    scale, band groups capped (LSH_BAND_CAP) before the join exactly
    like the self-join path. Complements text_contamination (n-gram
    overlap): LSH catches near-verbatim docs wholesale, n-grams catch
    embedded spans."""
    sig = _minhash_sig_cached(spark, sf_dir)
    bands = D.cap_group_size(
        D.lsh_bands(sig, "doc_id", _MINHASH_N, _MINHASH_BANDS),
        ["band_id", "band_sig"],
        LSH_BAND_CAP,
    )
    train = bands.filter(F.col("doc_id") % 10 != 7).alias("a")
    bench = bands.filter(F.col("doc_id") % 10 == 7).alias("b")
    pairs = (
        train.join(
            bench,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig")),
        )
        .select(F.col("a.doc_id").alias("train_id"), F.col("b.doc_id").alias("bench_id"))
        .distinct()
    )
    return pairs.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.min("bench_id").alias("sample_bench_id"),
    )


SQL_DEDUP_CROSS_CORPUS = f"""
WITH {SQL_SHINGLES},
{_minhash_sig_sql()},
{_bands_sql()},
bands_c AS (
    SELECT doc_id, band_id, band_sig FROM (
        SELECT doc_id, band_id, band_sig,
               COUNT(*) OVER (PARTITION BY band_id, band_sig) AS gs
        FROM bands
    ) WHERE gs <= {LSH_BAND_CAP}
),
pairs AS (
    SELECT DISTINCT a.doc_id AS train_id, b.doc_id AS bench_id
    FROM bands_c a JOIN bands_c b
      ON a.band_id = b.band_id AND a.band_sig = b.band_sig
    WHERE a.doc_id % 10 <> 7 AND b.doc_id % 10 = 7
)
SELECT train_id, COUNT(*) AS n_bench_hits, MIN(bench_id) AS sample_bench_id
FROM pairs GROUP BY train_id
"""


#: Min estimated jaccard for a candidate pair to become a cluster edge.
CLUSTER_EDGE_MIN = 0.5


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution: MinHash candidate pairs above
    CLUSTER_EDGE_MIN become edges; connected components (iterative
    min-label propagation, see functions.dedup.connected_components)
    assign each clustered doc its canonical group = min doc_id. The
    oracle replays the same graph via a recursive CTE. The labels table
    is session-materialized: every downstream keep/drop policy consumes
    the SAME clusters table instead of re-running CC (the persisted
    clusters table of a production curation job, see functions.shared)."""

    def build() -> DataFrame:
        pairs = _minhash_pairs_cached(spark, sf_dir).filter(
            F.col("est_jaccard") >= CLUSTER_EDGE_MIN
        )
        return D.connected_components(pairs).select(
            F.col("v").alias("doc_id"), "component"
        )

    return SH.materialized(spark, ("dedup_clusters", sf_dir, CLUSTER_EDGE_MIN), build)


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_MINHASH_SIMS_CTES},
edges AS (SELECT d1, d2 FROM sims WHERE est_jaccard >= {CLUSTER_EDGE_MIN}),
und AS (SELECT d1 AS a, d2 AS b FROM edges UNION SELECT d2, d1 FROM edges),
verts AS (SELECT DISTINCT a AS v FROM und),
reach(a, b) AS (
    SELECT v, v FROM verts
    UNION
    SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
)
SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster resolution policy: within each near-dup cluster keep the
    HIGHEST-QUALITY member (ties by doc_id) — the curation step that
    turns dedup clusters into a keep/drop decision, rather than the
    naive keep-min-id. quality_score rounds to 6 on both engines so the
    ordering key is bit-identical; output is all-integer.

    Scale shape: clusters (a small fraction of the corpus) join docs on
    doc_id, then a window PARTITIONED by component — parallel across
    clusters, and cluster sizes are bounded by the same LSH_BAND_CAP
    fan-out cap that bounds the candidate join.

    Consumes the session-materialized clusters table (q_dedup_clusters
    memoizes its labels via functions.shared) — the in-session form of
    the checkpointed clusters table a real curation job writes once and
    every policy (keep-best, keep-min-id, drop-all-dups) reads."""
    clusters = q_dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", X.quality_score("text").alias("__q")
    )
    w = Window.partitionBy("component").orderBy(F.col("__q").desc(), "doc_id")
    return (
        clusters.join(docs, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "component",
            (F.col("rk") == 1).cast("int").alias("keep"),
        )
    )


SQL_DEDUP_KEEP_BEST = f"""
WITH RECURSIVE {_MINHASH_SIMS_CTES},
edges AS (SELECT d1, d2 FROM sims WHERE est_jaccard >= {CLUSTER_EDGE_MIN}),
und AS (SELECT d1 AS a, d2 AS b FROM edges UNION SELECT d2, d1 FROM edges),
verts AS (SELECT DISTINCT a AS v FROM und),
reach(a, b) AS (
    SELECT v, v FROM verts
    UNION
    SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
),
comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a),
ranked AS (
    SELECT c.doc_id, c.component,
           ROW_NUMBER() OVER (
               PARTITION BY c.component
               ORDER BY {X.quality_score_sql('d.text')} DESC, c.doc_id
           ) AS rk
    FROM comp c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT doc_id, component, CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM ranked
"""


def _semantic_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-materialized embedding-cosine threshold pairs (blocked
    exact kernel, cosine >= 0.45) — the semantic edge list both
    dedup_embedding and dedup_ensemble consume; pair-volume sized, so
    it is exactly the persisted candidate table a production semantic
    dedup writes."""

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        return S.threshold_pairs_blocked(emb, threshold=0.45)

    return SH.materialized(spark, ("semantic_pairs", sf_dir, 0.45), build)


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup with cluster resolution: exact
    threshold pairs (cosine >= 0.45 via the blocked numpy kernel — full
    recall, no driver collect), connected components over the pair
    graph, keep = the min-id member of each cluster. The semantic
    counterpart of dedup_clusters with embedding distance instead of
    MinHash-estimated Jaccard; at corpus scale the candidate stage
    swaps to the LSH-bucketed path (sim_lsh_buckets' plan) with the
    identical downstream CC + keep policy."""
    pairs = _semantic_pairs_cached(spark, sf_dir)
    comp = D.connected_components(pairs, src="id1", dst="id2")
    return comp.select(
        F.col("v").alias("vec_id"),
        "component",
        (F.col("v") == F.col("component")).cast("int").alias("keep"),
    )


SQL_DEDUP_EMBEDDING = f"""
WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
edges AS (
    SELECT a.vec_id AS id1, b.vec_id AS id2
    FROM e a, e b
    WHERE a.vec_id < b.vec_id
      AND ROUND({{cos}}, 6) >= 0.45
),
und AS (SELECT id1 AS a, id2 AS b FROM edges UNION SELECT id2, id1 FROM edges),
verts AS (SELECT DISTINCT a AS v FROM und),
reach(a, b) AS (
    SELECT v, v FROM verts
    UNION
    SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
)
SELECT a AS vec_id, MIN(b) AS component,
       CAST(CASE WHEN a = MIN(b) THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM reach GROUP BY a
""".format(cos=S.cosine_sql("a.v", "b.v"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signature per document (bit-majority voting)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash16(docs, "doc_id", "text")


def _simhash_ctes() -> str:
    """CTE chain ending in ``sims(doc_id, simhash)`` — shared by the
    signature query and the banded-pairs query."""
    votes = ",\n           ".join(
        f"SUM(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(16)
    )
    bits = " + ".join(f"(CASE WHEN s{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(16))
    return f"""toks AS (
    SELECT DISTINCT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
),
hashed AS (
    SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) AS h FROM toks
),
voted AS (
    SELECT doc_id, {votes}
    FROM hashed GROUP BY doc_id
),
sims AS (
    SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM voted
)"""


SQL_DEDUP_SIMHASH = f"""
WITH {_simhash_ctes()}
SELECT doc_id, simhash FROM sims
"""

#: SimHash banding: 2 bands x 8 bits. Pigeonhole: any pair with
#: hamming distance 0 or 1 shares at least one full band, so the band
#: equi-join is a guaranteed-recall candidate generator for ham <= 1
#: and a heuristic one up to SIMHASH_HAM_MAX. 256 values per band at
#: 16 signature bits — the same planes-vs-n caveat as LSH_PLANES: a
#: wider signature (64-bit, 4 bands) is the corpus-scale setting.
SIMHASH_BANDS = 2
SIMHASH_HAM_MAX = 3
#: Bounded-fan-out cap on band groups (dedup.cap_group_size rationale).
SIMHASH_BAND_CAP = 500


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band the 16-bit signature into 2x8-bit
    bands, equi-join on (band_id, band_val) — candidates, not a cross
    join — then verify true Hamming distance <= SIMHASH_HAM_MAX via
    bit_count(xor). The banded-LSH plan shape (Charikar'02 signatures,
    MMDS ch.3 banding) that survives 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    sig = D.simhash16(docs, "doc_id", "text")
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255)).alias("band_val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_val").alias("band_val"),
    )
    bands = D.cap_group_size(bands, ["band_id", "band_val"], SIMHASH_BAND_CAP)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("CAST(bit_count(s1 ^ s2) AS INT)"))
        .filter(F.col("hamming") <= SIMHASH_HAM_MAX)
        .select("d1", "d2", "hamming")
    )


SQL_DEDUP_SIMHASH_PAIRS = f"""
WITH {_simhash_ctes()},
bands AS (
    SELECT doc_id, simhash, CAST(b AS INTEGER) AS band_id,
           (simhash >> (8 * b)) & 255 AS band_val
    FROM sims, generate_series(0, {SIMHASH_BANDS - 1}) AS t(b)
),
bc AS (
    SELECT doc_id, simhash, band_id, band_val FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band_id, band_val) AS gs FROM bands
    ) WHERE gs <= {SIMHASH_BAND_CAP}
),
cand AS (
    SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
           a.simhash AS s1, b.simhash AS s2
    FROM bc a JOIN bc b
      ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(s1, s2)) <= {SIMHASH_HAM_MAX}
"""


#: 5-gram shingle CTE chain (DuckDB) ending in sh5(doc_id, shingle) —
#: longer shingles than the k=3 dedup index: contamination checks use
#: long n-grams so chance collisions are negligible (standard eval-
#: decontamination practice).
SQL_SHINGLES5 = f"""
tok5 AS (
    SELECT doc_id,
           unnest({TOKS_SQL}) AS tok,
           generate_subscripts({TOKS_SQL}, 1) AS ord
    FROM documents
),
sh5_raw AS (
    SELECT doc_id,
           tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w
               || ' ' || LEAD(tok, 3) OVER w || ' ' || LEAD(tok, 4) OVER w AS shingle
    FROM tok5 WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
),
sh5 AS (
    SELECT DISTINCT doc_id, shingle FROM sh5_raw WHERE shingle IS NOT NULL
)"""


def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for every training document, how
    many of its distinct 5-gram shingles also appear in the held-out
    eval set (docs with doc_id % 10 == 7 stand in for a benchmark).

    Scale shape: the eval set is tiny by definition, so its distinct
    shingles BROADCAST and the training corpus never shuffles — one
    broadcast semi-join + one groupBy(doc). The score is integer
    micro-units (exact.davg_int policy: no floats to hash)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(docs, "doc_id", "text", k=5)
    is_eval = F.col("doc_id") % 10 == 7
    eval_sh = sh.filter(is_eval).select("shingle").distinct()
    train = sh.filter(~is_eval)
    shared = (
        train.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = train.groupBy("doc_id").agg(F.max("n").alias("n_shingles"))
    return (
        sizes.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_shared"), F.lit(0).cast("long")).alias("n_shared"),
        )
        .withColumn(
            "contamination_x1m",
            F.expr("CAST((n_shared * 1000000) DIV n_shingles AS BIGINT)"),
        )
    )


SQL_TEXT_CONTAMINATION = f"""
WITH {SQL_SHINGLES5},
ev AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % 10 = 7),
tr AS (SELECT doc_id, shingle FROM sh5 WHERE doc_id % 10 <> 7),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id),
shared AS (
    SELECT t.doc_id, COUNT(*) AS n_shared
    FROM tr t JOIN ev USING (shingle) GROUP BY t.doc_id
)
SELECT s.doc_id,
       CAST(s.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
       CAST((COALESCE(sh.n_shared, 0) * 1000000) // s.n_shingles AS BIGINT) AS contamination_x1m
FROM sizes s LEFT JOIN shared sh USING (doc_id)
"""


def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty scoring for data curation: per document, the fraction of
    its distinct 3-gram shingles that occur in NO other document
    (corpus df = 1) — high-novelty docs are up-weighted, boilerplate
    down-weighted. One groupBy(shingle) for df + one groupBy(doc);
    integer micro-units, no floats."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(docs, "doc_id", "text", k=3)
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(dfc, "shingle")
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_total"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
        .withColumn(
            "novelty_x1m", F.expr("CAST((n_unique * 1000000) DIV n_total AS BIGINT)")
        )
    )


SQL_TEXT_NGRAM_NOVELTY = f"""
WITH {SQL_SHINGLES},
dfc AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
per AS (
    SELECT s.doc_id, COUNT(*) AS n_total,
           SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS n_unique
    FROM sh s JOIN dfc d USING (shingle) GROUP BY s.doc_id
)
SELECT doc_id, CAST(n_total AS BIGINT) AS n_total,
       CAST(n_unique AS BIGINT) AS n_unique,
       CAST((n_unique * 1000000) // n_total AS BIGINT) AS novelty_x1m
FROM per
"""


#: Exact-substring dedup span length (tokens). Lee et al. 2022
#: ("Deduplicating Training Data Makes Language Models Better") use 50
#: tokens on web corpora; 8 is the test-scale pin for these short
#: synthetic docs — the plan is length-independent.
DUP_NGRAM_K = 8


def q_text_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring deduplication (Lee et al. 2022 style): per
    document, the fraction of its distinct 8-token spans that occur
    verbatim in at least one OTHER place in the corpus — the signal
    used to cut duplicated passages out of training data.

    Scale shape: shingling is a zero-shuffle Arrow kernel; span
    multiplicity is a count-window over the span hash (shuffle #1,
    map-side combinable); the per-doc rollup is shuffle #2. Linear in
    corpus size — no pair blowup, unlike similarity dedup: a span
    shared by a million docs costs a million counter rows, never a
    million-squared join."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingles(docs, "doc_id", "text", k=DUP_NGRAM_K)
    nd = F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    return (
        sh.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_dup"),
        )
        .withColumn(
            "dup_frac_x1m", F.expr("CAST((n_dup * 1000000) DIV n_grams AS BIGINT)")
        )
    )


#: 8-gram shingle CTE (DuckDB) ending in sh8(doc_id, shingle).
SQL_SHINGLES8 = f"""
tok8 AS (
    SELECT doc_id,
           unnest({TOKS_SQL}) AS tok,
           generate_subscripts({TOKS_SQL}, 1) AS ord
    FROM documents
),
sh8_raw AS (
    SELECT doc_id,
           tok || ' ' || {" || ' ' || ".join(f"LEAD(tok, {i}) OVER w" for i in range(1, 8))} AS shingle
    FROM tok8 WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
),
sh8 AS (
    SELECT DISTINCT doc_id, shingle FROM sh8_raw WHERE shingle IS NOT NULL
)"""


SQL_TEXT_DUP_NGRAMS = f"""
WITH {SQL_SHINGLES8},
m AS (
    SELECT doc_id, COUNT(*) OVER (PARTITION BY shingle) AS nd FROM sh8
)
SELECT doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS dup_frac_x1m
FROM m GROUP BY doc_id
"""


#: Docs kept per (lang, source) stratum by the deterministic sampler.
STRATUM_SAMPLE_K = 20


def q_text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep the STRATUM_SAMPLE_K
    docs per (lang, source) stratum with the smallest md5(doc_id) —
    stable across runs, engines and cluster sizes (the property
    rand()-based sampling lacks), via a PARTITIONED rank window."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", "source")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= STRATUM_SAMPLE_K)
    )


SQL_TEXT_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source, CAST(rk AS INTEGER) AS rk FROM (
    SELECT doc_id, lang, source,
           ROW_NUMBER() OVER (PARTITION BY lang, source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents
) WHERE rk <= {STRATUM_SAMPLE_K}
"""


#: Misra-Gries k: report tokens with frequency > 1/k of all tokens.
HH_K = 50


def q_text_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus HEAVY-HITTER tokens (frequency > 1/{k} of all token
    occurrences) with EXACT counts but WITHOUT a full-vocabulary
    groupBy — the Misra-Gries two-phase shape
    (functions.sketches.heavy_hitters): bounded k-counter summaries
    per task (Arrow kernel), counter-sum merge (mergeable-summaries
    guarantee: every true heavy hitter survives), then exact counts
    for the candidate set only via a broadcast semi-join. The
    stopword-discovery / skew-probe op: at 100 TB the full token
    exchange (the naive formulation) is the single biggest shuffle a
    text pipeline can emit, and this shape never pays it. Oracle =
    the naive exact groupBy filtered to the same threshold: the
    bounded-state rewrite must be result-identical."""
    from pipe_s_spark.functions.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(X.tokens("text")).alias("tok"))
    return heavy_hitters(toks, "tok", k=HH_K, out_count="n")


SQL_TEXT_HEAVY_TOKENS = f"""
WITH toks AS (SELECT unnest({TOKS_SQL}) AS tok FROM documents),
tot AS (SELECT COUNT(*) AS n_total FROM toks)
SELECT tok, COUNT(*) AS n
FROM toks GROUP BY tok
HAVING COUNT(*) * {HH_K} > (SELECT n_total FROM tot)
"""


#: Sample size for the weighted priority sample.
WEIGHTED_SAMPLE_K = 50


def q_text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement
    (Efraimidis-Spirakis 2006 priority sampling): each doc draws a
    deterministic uniform u from md5(doc_id) and gets priority
    ln(u)/w with w = n_chars, and the WEIGHTED_SAMPLE_K largest
    priorities win — docs are included with probability proportional
    to weight, yet the sample is bit-stable across runs, engines and
    cluster sizes (the property rand()-based sampling lacks, and the
    weighted generalization of the md5-rank stratified sample). The
    top-k is a TakeOrderedAndProject (no global sort, no global
    window); one narrow pass over (doc_id, n_chars)."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(float(2**28 + 1))
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "n_chars", F.round(key, 12).alias("priority"))
        .orderBy(F.desc("priority"), "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
    )


SQL_TEXT_WEIGHTED_SAMPLE = f"""
SELECT doc_id, n_chars,
       ROUND(LN((CAST(from_hex_to_int AS DOUBLE) + 1.0) / {float(2**28 + 1)})
             / CAST(n_chars AS DOUBLE), 12) AS priority
FROM (
    SELECT doc_id, n_chars,
           CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
               AS from_hex_to_int
    FROM documents WHERE n_chars > 0
)
ORDER BY priority DESC, doc_id
LIMIT {WEIGHTED_SAMPLE_K}
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter (Gopher-style, Rae et al. 2021 table A1): per
    doc, the share of tokens taken by the single most frequent token
    and the share of duplicate 2-gram occurrences — both in integer
    micro-units. Repetition is a per-doc property, so the counters come
    from a ZERO-SHUFFLE Arrow kernel (text.repetition_stats) — a
    groupBy(doc, token) formulation would pay a corpus-sized exchange
    at 100 TB for what each row can compute about itself."""
    docs = load_table(spark, sf_dir, "documents")
    return X.repetition_stats(docs, "doc_id", "text").select(
        "doc_id",
        "n_tokens",
        F.expr("CAST((top_tok_cnt * 1000000) DIV n_tokens AS BIGINT)").alias(
            "top_token_x1m"
        ),
        F.expr(
            "CAST(((n_2grams - n_2grams_distinct) * 1000000) DIV n_2grams AS BIGINT)"
        ).alias("dup_2gram_x1m"),
    )


SQL_TEXT_REPETITION = f"""
WITH toks AS (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
),
per_tok AS (
    SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
),
tok_stats AS (
    SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_tok_cnt
    FROM per_tok GROUP BY doc_id
),
tok2 AS (
    SELECT doc_id,
           unnest({TOKS_SQL}) AS tok,
           generate_subscripts({TOKS_SQL}, 1) AS ord
    FROM documents
),
gr2 AS (
    SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS shingle
    FROM tok2
),
g2_stats AS (
    SELECT doc_id, COUNT(shingle) AS n_2grams, COUNT(DISTINCT shingle) AS n_2grams_distinct
    FROM gr2 WHERE shingle IS NOT NULL GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST((t.top_tok_cnt * 1000000) // t.n_tokens AS BIGINT) AS top_token_x1m,
       CAST(((g.n_2grams - g.n_2grams_distinct) * 1000000) // g.n_2grams AS BIGINT) AS dup_2gram_x1m
FROM tok_stats t JOIN g2_stats g USING (doc_id)
"""


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction pass: per-pattern match counts and the
    md5 of the scrubbed text — all narrow expressions, so at 100 TB the
    scrub runs inside the scan projection with zero shuffle. The
    synthetic corpus carries no PII, which this query PROVES corpus-wide
    (zero counts, scrub hash = identity hash); the kernels match on
    crafted PII rows in tests/test_scale_guards.py."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.pii_count("text", "email").alias("n_emails"),
        X.pii_count("text", "phone").alias("n_phones"),
        X.pii_count("text", "ipv4").alias("n_ips"),
        F.md5(X.pii_scrub("text")).alias("scrubbed_md5"),
    )


SQL_TEXT_PII_SCRUB = f"""
SELECT doc_id,
       {X.pii_count_sql('text', 'email')} AS n_emails,
       {X.pii_count_sql('text', 'phone')} AS n_phones,
       {X.pii_count_sql('text', 'ipv4')} AS n_ips,
       md5({X.pii_scrub_sql('text')}) AS scrubbed_md5
FROM documents
"""


def q_text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 salient terms, TF-IDF-shaped but integer-exact:
    rank by (tf DESC, df ASC, term ASC) — higher in-doc frequency wins,
    rarer corpus-wide wins ties, lexicographic breaks the rest. Using
    the raw (tf, df) pair instead of tf*log(N/df) keeps every value
    BIGINT, so the ranking is bit-identical on any engine (the log
    weight is monotone in -df for fixed tf, so top-k by (tf, -df)
    equals top-k by tf*idf whenever tf ties break by df).

    Scale: tf = groupBy(doc, term) with map-side partial agg; df is a
    vocab-sized groupBy(term); the tf⋈df join shuffles on term (vocab
    can exceed broadcast size at corpus scale, so a shuffle join is the
    right default and AQE may downgrade it to broadcast when small);
    top-k is a window partitioned by doc_id — never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(X.tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(df_tab, "term")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "rnk")
    )


SQL_TEXT_TFIDF = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
r AS (
    SELECT tf.doc_id, tf.term, tf.tf, dft.df,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf DESC, dft.df ASC, tf.term ASC
           ) AS BIGINT) AS rnk
    FROM tf JOIN dft USING (term)
)
SELECT doc_id, term, tf, df, rnk FROM r WHERE rnk <= 3
"""


def q_text_domain_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift: chi-square divergence of
    each source's token distribution vs the corpus-wide one — the
    corpus-QA metric that flags a domain whose language shifted
    (scraper drift, template takeover) without reading any documents
    twice.

    Determinism: every per-term value (p, q, the chi-square term) is a
    chain of single IEEE ops — each correctly rounded, so bit-identical
    on any engine — then rounded to 12 decimals and summed as
    DECIMAL(38,12), which is EXACT and order-independent; only the
    final scalar arithmetic happens in doubles, in the same literal
    order on both sides. Absent terms (in corpus, not in source)
    contribute q each; their total is 1 - sum(q over present terms), so
    they are never materialized — no source x vocab blow-up.

    Scale: two token-count groupBys with map-side combine, one
    vocab-sized join on term, a broadcast 1-row corpus total, one final
    per-source fold. Nothing is ever data-sized except the token
    explode that every distribution metric pays."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(X.tokens("text")).alias("term"))
    sc = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").alias("tot"))
    cc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("ccnt"))
    ct = cc.agg(F.sum("ccnt").alias("ctot"))
    terms = (
        sc.join(st, "source")
        .join(cc, "term")
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            (F.col("c").cast("double") / F.col("tot").cast("double")).alias("p"),
            (F.col("ccnt").cast("double") / F.col("ctot").cast("double")).alias("q"),
        )
    )
    chi_term = F.round(
        (F.col("p") - F.col("q")) * (F.col("p") - F.col("q")) / (F.col("p") + F.col("q")),
        12,
    ).cast("decimal(38,12)")
    q_term = F.round(F.col("q"), 12).cast("decimal(38,12)")
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.sum(chi_term).cast("double")
            + (F.lit(1.0) - F.sum(q_term).cast("double")),
            6,
        ).alias("chi2"),
    )


SQL_TEXT_DOMAIN_DIVERGENCE = f"""
WITH toks AS (SELECT source, unnest({TOKS_SQL}) AS term FROM documents),
sc AS (SELECT source, term, COUNT(*) AS c FROM toks GROUP BY source, term),
st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM sc GROUP BY source),
cc AS (SELECT term, COUNT(*) AS ccnt FROM toks GROUP BY term),
ct AS (SELECT CAST(SUM(ccnt) AS BIGINT) AS ctot FROM cc),
terms AS (
    SELECT s.source,
           CAST(s.c AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p,
           CAST(c2.ccnt AS DOUBLE) / CAST(ct.ctot AS DOUBLE) AS q
    FROM sc s JOIN st t USING (source) JOIN cc c2 USING (term) CROSS JOIN ct
)
SELECT source, COUNT(*) AS n_terms,
       ROUND(CAST(SUM(CAST(ROUND((p - q) * (p - q) / (p + q), 12) AS DECIMAL(38,12))) AS DOUBLE)
             + (1.0 - CAST(SUM(CAST(ROUND(q, 12) AS DECIMAL(38,12))) AS DOUBLE)), 6) AS chi2
FROM terms GROUP BY source
"""


INVINDEX_POSTING_CAP = 8


def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term -> document frequency, total term
    frequency, and the first ``INVINDEX_POSTING_CAP`` doc_ids as a CSV
    posting sample. The cap is enforced BEFORE collection via a
    row_number window partitioned by term, so a stop-word's posting
    list never materializes on one task — the unbounded
    ``collect_list`` formulation is exactly the hot-key OOM the LSH
    caps exist to prevent. Window and groupBy share the term
    partitioning, so the whole build is ONE shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(X.tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    return (
        tf.withColumn("rn", F.row_number().over(w))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") <= INVINDEX_POSTING_CAP, F.col("doc_id")
                            )
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
    )


SQL_TEXT_INVINDEX = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
r AS (
    SELECT doc_id, term, tf,
           ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
    FROM tf
)
SELECT term,
       COUNT(*) AS n_docs,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       string_agg(
           CASE WHEN rn <= {INVINDEX_POSTING_CAP} THEN CAST(doc_id AS VARCHAR) END,
           ',' ORDER BY doc_id
       ) AS postings
FROM r GROUP BY term
"""


CHUNK_LEN = 128
CHUNK_STRIDE = 64


def q_text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking for training: sliding token windows of
    ``CHUNK_LEN`` with stride ``CHUNK_STRIDE``, emitting per chunk its
    position and the md5 of its joined tokens (the key you'd dedup or
    shard chunks by downstream). Pure narrow map — sequence +
    posexplode + slice inside the scan projection, ZERO shuffle, linear
    in tokens: the only formulation that survives 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.select("doc_id", X.tokens("text").alias("toks"))
        .withColumn("n_tokens", F.size("toks").cast("bigint"))
        .filter(F.col("n_tokens") > 0)
    )
    ch = base.select(
        "doc_id",
        "n_tokens",
        "toks",
        F.posexplode(
            F.sequence(F.lit(0), F.col("n_tokens") - 1, F.lit(CHUNK_STRIDE))
        ).alias("chunk_idx", "start_tok"),
    )
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.least(F.lit(CHUNK_LEN), F.col("n_tokens") - F.col("start_tok"))
        .cast("bigint")
        .alias("chunk_len"),
        F.md5(
            F.concat_ws(
                " ", F.slice("toks", F.col("start_tok") + 1, F.lit(CHUNK_LEN))
            )
        ).alias("chunk_md5"),
    )


SQL_TEXT_CHUNKS = f"""
WITH base AS (
    SELECT doc_id, {TOKS_SQL} AS toks,
           CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens
    FROM documents
),
starts AS (
    SELECT doc_id, n_tokens, toks,
           unnest(generate_series(0, n_tokens - 1, {CHUNK_STRIDE})) AS start_tok
    FROM base WHERE n_tokens > 0
)
SELECT doc_id,
       CAST(start_tok // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(LEAST({CHUNK_LEN}, n_tokens - start_tok) AS BIGINT) AS chunk_len,
       md5(array_to_string(
           toks[CAST(start_tok + 1 AS INT) : CAST(start_tok + {CHUNK_LEN} AS INT)],
           ' ')) AS chunk_md5
FROM starts
"""


#: Target language mixture in micro-shares (sums to 1_000_000) —
#: the DoReMi-style domain-mixing spec a training pipeline resamples to.
MIX_TARGET_X1M = {
    "en": 500_000,
    "de": 150_000,
    "es": 150_000,
    "fr": 100_000,
    "zh": 100_000,
}


def q_text_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: downsample each language to the
    largest corpus that respects ``MIX_TARGET_X1M`` exactly. Per-lang
    keep-rates come from integer micro-unit arithmetic (feasible total
    T = min over langs of count*1e6 DIV target), and the keep decision
    is md5(doc_id)-uniform < rate — deterministic across runs, engines
    and cluster sizes, unlike rand()-based sampling.

    Scale: ONE tiny groupBy(lang) agg (cardinality = languages, O(100)
    for any real corpus — the bounded driver collect is metadata, not
    data), then a pure narrow filter over the scan. Langs outside the
    spec map to a null rate and drop."""
    docs = load_table(spark, sf_dir, "documents")
    counts = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    feasible = min(
        (counts.get(lang, 0) * 1_000_000) // t for lang, t in MIX_TARGET_X1M.items()
    )
    rates = {
        lang: (((feasible * t) // 1_000_000) * 1_000_000) // counts[lang]
        if counts.get(lang)
        else 0
        for lang, t in MIX_TARGET_X1M.items()
    }
    rate = F.element_at(
        F.create_map(*[F.lit(x) for kv in rates.items() for x in kv]), F.col("lang")
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % 1_000_000
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("u_x1m", u)
        .filter(F.col("u_x1m") < rate)
    )


_MIX_SPEC_SQL = ", ".join(f"('{k}', {v})" for k, v in MIX_TARGET_X1M.items())

SQL_TEXT_MIX_SAMPLE = f"""
WITH spec(lang, t_x1m) AS (VALUES {_MIX_SPEC_SQL}),
cnts AS (
    SELECT s.lang, s.t_x1m, COALESCE(c.cnt, 0) AS cnt
    FROM spec s LEFT JOIN (
        SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ) c USING (lang)
),
t AS (SELECT MIN(cnt * 1000000 // t_x1m) AS feasible FROM cnts),
rates AS (
    SELECT lang,
           CASE WHEN cnt = 0 THEN 0
                ELSE ((feasible * t_x1m // 1000000) * 1000000) // cnt
           END AS rate_x1m
    FROM cnts, t
)
SELECT d.doc_id, d.lang, d.u_x1m
FROM (
    SELECT doc_id, lang,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               % 1000000 AS u_x1m
    FROM documents
) d
JOIN rates r USING (lang)
WHERE d.u_x1m < r.rate_x1m
"""


SHUFFLE_SALT = "shuf1:"
SHUFFLE_DOCS_PER_FILE = 256


def q_text_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle for training order: every
    doc gets a unique position in the md5(salt || doc_id) permutation,
    plus the training-file id it lands in. Semantically a global
    ORDER BY — executed as the scalable two-phase form: RANGE-shard on
    the key's first hex nibble (md5 is uniform, so shards balance),
    rank inside each shard with a PARTITIONED window, then add the
    driver-side prefix-sum of the 16 shard counts. No global window
    ever exists in the plan (tests/test_plan_quality.py would reject
    one); this is exactly the range-partitioned sort Spark's orderBy
    performs physically, made explicit and engine-reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit(SHUFFLE_SALT), F.col("doc_id").cast("string")))
    base = docs.select("doc_id", key.alias("k")).withColumn(
        "shard", F.conv(F.substring("k", 1, 1), 16, 10).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    local = base.withColumn("rk", F.row_number().over(w)).localCheckpoint(eager=True)
    counts = {
        r["shard"]: r["n"]
        for r in local.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for s in range(16):
        offsets[s] = acc
        acc += counts.get(s, 0)
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("shard")
    )
    return (
        local.select("doc_id", (off + F.col("rk") - 1).cast("long").alias("pos"))
        .withColumn(
            "file_id", F.expr(f"pos div {SHUFFLE_DOCS_PER_FILE}").cast("long")
        )
    )


SQL_TEXT_GLOBAL_SHUFFLE = f"""
WITH p AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5('{SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
           ) - 1 AS BIGINT) AS pos
    FROM documents
)
SELECT doc_id, pos, pos // {SHUFFLE_DOCS_PER_FILE} AS file_id FROM p
"""


# --- similarity search ---------------------------------------------------


def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 cosine neighbors for query vecs (id<10)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5).select(
        "query_id", "neighbor_id", "cos_sim", "rk"
    )


SQL_SIM_TOPK = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 10),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROUND({S.cosine_sql('q.v', 'e.v')}, 6) AS cos_sim
    FROM q, e WHERE q.vec_id <> e.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rk
    FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= 5
"""


def q_sim_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: all (a<b) with cosine >= 0.45, via the
    blocked numpy kernel (Arrow batches x broadcast matrix)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.threshold_pairs_blocked(emb, threshold=0.45)


SQL_SIM_THRESHOLD = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       ROUND({S.cosine_sql('a.v', 'b.v')}, 6) AS cos_sim
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND ROUND({S.cosine_sql('a.v', 'b.v')}, 6) >= 0.45
"""


#: Max vectors sharing one LSH bucket before the bucket is dropped from
#: candidate generation — same bounded-fan-out guard as LSH_BAND_CAP
#: (a mass-duplicate embedding cluster hashes into ONE bucket and the
#: self-join goes quadratic on it). Sized not to bite at test SFs;
#: at corpus scale it backstops the planes-vs-n sizing rule documented
#: on functions.similarity.LSH_PLANES.
SIM_BUCKET_CAP = 1000


def q_sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN: candidates share a bucket (equi-join,
    the 100 TB path); verify candidates with exact cosine >= 0.3.
    Buckets larger than SIM_BUCKET_CAP are dropped before the join."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        S.as_double_array("embedding").alias("v"),
    ).withColumn("bucket", S.lsh_bucket(F.col("v")))
    e = D.cap_group_size(e, ["bucket"], SIM_BUCKET_CAP)
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            F.col("a.bucket").alias("bucket"),
            F.round(S.cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )


SQL_SIM_LSH = f"""
WITH e0 AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           {S.lsh_bucket_sql('CAST(embedding AS DOUBLE[])')} AS bucket
    FROM embeddings
),
e AS (
    SELECT vec_id, v, bucket FROM (
        SELECT vec_id, v, bucket, COUNT(*) OVER (PARTITION BY bucket) AS gs FROM e0
    ) WHERE gs <= {SIM_BUCKET_CAP}
)
SELECT a.vec_id AS id1, b.vec_id AS id2, a.bucket AS bucket,
       ROUND({S.cosine_sql('a.v', 'b.v')}, 6) AS cos_sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE ROUND({S.cosine_sql('a.v', 'b.v')}, 6) >= 0.3
"""


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: narrow argmax-centroid assignment, query
    probes its nprobe best cells, candidates via cell equi-join, exact
    re-rank. The scale path where even LSH bucket joins are too wide:
    the corpus is partitioned by cell once and probes touch nprobe/IVF
    of the data."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, nprobe=2).select(
        "query_id", "neighbor_id", "cos_sim", "rk"
    )


SQL_SIM_IVF = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cd AS (
    SELECT e.vec_id, cells.cell,
           list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * cells.cv[i])) AS d
    FROM e CROSS JOIN {S.ivf_cells_values_sql()}
),
assign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd) WHERE r = 1
),
probes AS (
    SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd WHERE vec_id < 10) WHERE r <= 2
),
scored AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           ROUND({S.cosine_sql('q.v', 'c.v')}, 6) AS cos_sim
    FROM probes p
    JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
    JOIN e q ON q.vec_id = p.query_id
    JOIN e c ON c.vec_id = a.vec_id
)
SELECT query_id, neighbor_id, cos_sim,
       CAST(rk AS INTEGER) AS rk
FROM (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
    FROM scored
) WHERE rk <= 5
"""


# --- sketches ------------------------------------------------------------


def q_sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k sketch: per-event-type approximate distinct users,
    deterministic (md5-based) so the estimate itself oracle-checks —
    the verifiable sibling of approx_count_distinct (HLL) at 100 TB."""
    from pipe_s_spark.functions.sketches import kmv_distinct_estimate

    ev = load_table(spark, sf_dir, "events")
    return kmv_distinct_estimate(ev, "user_id", ["event_type"], k=64)


def _sql_sketch_kmv() -> str:
    from pipe_s_spark.functions.sketches import kmv_distinct_estimate_sql

    return kmv_distinct_estimate_sql("events", "user_id", ["event_type"], k=64)


def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates: build a deterministic
    4x256 CMS over events.user_id (shuffle payload bounded by the
    sketch size via map-side combine), then point-query every distinct
    user against the broadcast sketch and compare with the exact count.
    est_cnt >= exact_cnt always (CMS overestimates under collisions) —
    the oracle replays both sides cell-for-cell. All-integer output
    (exact.davg_int float policy)."""
    from pipe_s_spark.functions import sketches as K

    ev = load_table(spark, sf_dir, "events")
    sketch = K.cms_build(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = K.cms_estimate(exact.select("user_id"), sketch, "user_id")
    return exact.join(est, "user_id").select("user_id", "exact_cnt", "est_cnt")


def _sql_sketch_countmin() -> str:
    from pipe_s_spark.functions import sketches as K

    probe_rows = "\nUNION ALL\n".join(
        f"SELECT user_id, {r} AS row_id, {K.cms_bucket_sql('user_id', r)} AS bucket FROM ukeys"
        for r in range(K.CMS_DEPTH)
    )
    return f"""
WITH cells AS (
    SELECT row_id, bucket, COUNT(*) AS cnt FROM (
        {probe_rows.replace('ukeys', 'events')}
    ) GROUP BY row_id, bucket
),
ukeys AS (SELECT DISTINCT user_id FROM events),
probes AS (
    {probe_rows}
),
est AS (
    SELECT p.user_id, MIN(c.cnt) AS est_cnt
    FROM probes p JOIN cells c USING (row_id, bucket)
    GROUP BY p.user_id
),
exact AS (SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id)
SELECT user_id, exact_cnt, est_cnt FROM exact JOIN est USING (user_id)
"""


def q_sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram quantile sketch over lineitem prices, by
    return flag: single-pass, mergeable, bounded state (~110 cells per
    group at $1000 bins) — the deterministic, oracle-checkable analog
    of approx_percentile. See functions.sketches.histogram_quantiles
    for the scale/merge argument."""
    from pipe_s_spark.functions import sketches as K

    li = load_table(spark, sf_dir, "lineitem")
    return K.histogram_quantiles(li, "l_extendedprice", ["l_returnflag"])


def _sql_sketch_histogram() -> str:
    from pipe_s_spark.functions import sketches as K

    return K.histogram_quantiles_sql("lineitem", "l_extendedprice", ["l_returnflag"])


def q_sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog (Flajolet et al. 2007): per-event-type
    approximate distinct users from md5-derived registers, joined with
    the exact count for self-auditing error. Unlike the built-in
    approx_count_distinct, every register — and the estimate itself —
    is reproduced bit-for-bit by the DuckDB oracle (exact-integer
    harmonic sum, string-derived rho; see functions.sketches). THE
    mergeable distinct-count structure at 100 TB: shuffle payload per
    group is m=64 rows, never data-sized."""
    from pipe_s_spark.functions.sketches import hll_estimate

    ev = load_table(spark, sf_dir, "events")
    est = hll_estimate(ev, "user_id", ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_zero_registers", "est_distinct", "exact_distinct"
    )


def _sql_sketch_hll() -> str:
    from pipe_s_spark.functions.sketches import hll_estimate_sql

    inner = hll_estimate_sql("events", "user_id", ["event_type"])
    return f"""
WITH est AS ({inner}),
exact AS (
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
    FROM events GROUP BY event_type
)
SELECT event_type, n_zero_registers, est_distinct, exact_distinct
FROM est JOIN exact USING (event_type)
"""


def q_text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted priority sampling (the curation step that
    subsamples a corpus with probability proportional to a per-doc
    weight — here length-biased via n_chars+1): priority = md5-uniform
    h / weight, keep the global smallest-50. h uses 13 hex digits (52
    bits) so it is EXACTLY representable as a double and the single
    division is correctly rounded to the identical bits in both
    engines — rank order is engine-independent by construction.
    Scale shape: narrow expression + TakeOrderedAndProject (per-
    partition top-k then driver merge of k*partitions rows — no global
    sort materialization)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    pri = h / (F.col("n_chars") + F.lit(1))
    # priority is emitted UNROUNDED: the single int/int division is
    # correctly rounded to the same bits in both engines, whereas
    # ROUND(x, 4) at 1e12 magnitude straddles the double grid (~1e-4
    # spacing there) and the engines' rounding algorithms disagree
    return (
        docs.select("doc_id", "n_chars", pri.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(50)
    )


SQL_TEXT_WEIGHTED_SAMPLE = """
WITH pri AS (
    SELECT doc_id, n_chars,
           CAST(CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT)
                AS DOUBLE) / (n_chars + 1) AS p
    FROM documents
)
SELECT doc_id, n_chars, p AS priority
FROM pri ORDER BY p, doc_id LIMIT 50
"""


def q_dedup_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble dedup: union of LEXICAL edges (MinHash est_jaccard >=
    CLUSTER_EDGE_MIN) and SEMANTIC edges (embedding cosine >= 0.45,
    vec_id == doc_id in this corpus), one connected-components pass over
    the merged graph — the production pattern where near-dup families
    are caught by whichever signal fires (boilerplate by shingles,
    paraphrase by embeddings). Both edge generators keep their own
    fan-out caps; CC cost is driven by the union's component sizes."""
    lex = q_dedup_minhash_lsh(spark, sf_dir).filter(
        F.col("est_jaccard") >= CLUSTER_EDGE_MIN
    ).select("d1", "d2")
    sem = _semantic_pairs_cached(spark, sf_dir).select(
        F.col("id1").alias("d1"), F.col("id2").alias("d2")
    )
    edges = lex.unionByName(sem)
    return D.connected_components(edges).select(F.col("v").alias("doc_id"), "component")


SQL_DEDUP_ENSEMBLE = f"""
WITH RECURSIVE {{minhash_ctes}},
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sem_edges AS (
    SELECT a.vec_id AS d1, b.vec_id AS d2
    FROM emb a, emb b
    WHERE a.vec_id < b.vec_id AND ROUND({{cos}}, 6) >= 0.45
),
edges AS (
    SELECT d1, d2 FROM sims WHERE est_jaccard >= {CLUSTER_EDGE_MIN}
    UNION SELECT d1, d2 FROM sem_edges
),
und AS (SELECT d1 AS a, d2 AS b FROM edges UNION SELECT d2, d1 FROM edges),
verts AS (SELECT DISTINCT a AS v FROM und),
reach(a, b) AS (
    SELECT v, v FROM verts
    UNION
    SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
)
SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a
""".format(minhash_ctes=_MINHASH_SIMS_CTES, cos=S.cosine_sql("a.v", "b.v"))


def q_sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-screen: build a deterministic
    4096-bit / 3-hash filter over BUILDING-segment customer keys (build
    shuffle bounded by the filter size), then probe every distinct
    orders.o_custkey with a NARROW inlined-literal check — no join, no
    shuffle on the probe side. Output is the summary a join-prescreen
    cares about: probes / filter-maybes / true members / false
    positives (false negatives are impossible by construction; the
    oracle replays the filter bit-for-bit, so the FP count is exact)."""
    from pipe_s_spark.functions import sketches as K

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    bits = K.bloom_bit_array(K.bloom_build(building, "k"))
    probes = orders.select(F.col("o_custkey").alias("k")).distinct()
    flagged = probes.withColumn(
        "maybe", K.bloom_might_contain(F.col("k"), bits)
    ).join(
        F.broadcast(building.withColumn("hit", F.lit(True))), "k", "left"
    ).withColumn("hit", F.coalesce("hit", F.lit(False)))
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.when(F.col("maybe"), 1).otherwise(0)).alias("n_maybe"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_true"),
        F.sum(F.when(F.col("maybe") & ~F.col("hit"), 1).otherwise(0)).alias("n_false_pos"),
    )


def _sql_sketch_bloom() -> str:
    from pipe_s_spark.functions import sketches as K

    pos = [K.bloom_position_sql("k", i) for i in range(K.BLOOM_HASHES)]
    build_rows = "\nUNION ALL\n".join(f"SELECT {p} AS pos FROM bkeys" for p in pos)
    maybe = " AND ".join(f"{p} IN (SELECT pos FROM bits)" for p in pos)
    return f"""
WITH bkeys AS (
    SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
),
bits AS (SELECT DISTINCT pos FROM ({build_rows})),
probes AS (SELECT DISTINCT o_custkey AS k FROM orders),
flagged AS (
    SELECT k, ({maybe}) AS maybe, (k IN (SELECT k FROM bkeys)) AS hit FROM probes
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
       CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN maybe AND NOT hit THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM flagged
"""


# --- multimodal (oracle-checked via the deterministic fake codecs) -------


def q_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-asset decode pipeline, end-to-end oracle-checked: binary
    assets synthesized from documents, mapInPandas decode kernel
    (deterministic sha256 fake standing in for PIL/torchvision), scalar
    outputs + a float64 checksum over the 16-dim feature vector. The
    plumbing (blob-free pruning, Arrow batch bounds, kernel schema) is
    the production path; only the codec body is the documented fake."""
    from pipe_s_spark.functions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    assets = M.synthesize_assets(docs)
    feats = M.extract_image_features(assets)
    return feats.select(
        "asset_id",
        "width",
        "height",
        "n_channels",
        F.round(
            F.aggregate("features", F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("feat_sum"),
    )


def _mm_byte(i: int) -> str:
    """DuckDB: i-th byte (0-based) of the sha256 hex digest of the fake
    asset content (= repeat(md5(text), 8) as utf-8)."""
    return f"CAST(('0x' || substr(h, {2 * i + 1}, 2)) AS INTEGER)"


SQL_MULTIMODAL_IMAGE = f"""
WITH assets AS (
    SELECT doc_id AS asset_id, sha256(repeat(md5(text), 8)) AS h
    FROM documents WHERE doc_id % 3 = 0
)
SELECT asset_id,
       CAST(64 + {_mm_byte(0)} % 192 AS INTEGER) AS width,
       CAST(64 + {_mm_byte(1)} % 192 AS INTEGER) AS height,
       3 AS n_channels,
       ROUND(list_sum(list_transform(generate_series(0, 15),
             i -> CAST(CAST(CAST(('0x' || substr(h, 2*i+1, 2)) AS INTEGER) / 255.0 - 0.5 AS REAL) AS DOUBLE))), 6) AS feat_sum
FROM assets
"""


def q_multimodal_frame_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling pipeline (one row -> N frames through
    mapInPandas), oracle-checked on per-frame md5 digests."""
    from pipe_s_spark.functions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    assets = M.synthesize_assets(docs)
    frames = M.sample_video_frames(assets, n_frames=4)
    return frames.select("asset_id", "frame_idx", F.md5("frame_bytes").alias("digest"))


SQL_MULTIMODAL_FRAMES = """
WITH assets AS (
    SELECT doc_id AS asset_id, repeat(md5(text), 8) AS content
    FROM documents WHERE doc_id % 3 = 2
)
SELECT asset_id, CAST(i AS INTEGER) AS frame_idx,
       md5(substr(content, i * 64 + 1, 64)) AS digest
FROM assets, generate_series(0, 3) AS t(i)
"""


def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-asset decode pipeline with a REAL codec: deterministic PCM
    WAV blobs are synthesized per audio-modality document (seeded by
    md5(text)), then ``parse_wav_header`` — a genuine RIFF chunk walker,
    pure Python, no codec dependency — recovers sample rate / channels /
    bit depth / frame count and computes RMS loudness over the int16
    samples. The oracle predicts every field ANALYTICALLY from the
    synthesis formula, so any parsing bug (chunk offsets, pad bytes,
    little-endian fields, sample decode) breaks parity; samples are
    exact multiples of 2^-7 so the RMS is bit-identical on both sides."""
    from pipe_s_spark.functions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    assets = M.synthesize_audio_assets(docs)
    feats = M.extract_audio_features(assets)
    return feats.select(
        "asset_id",
        "sample_rate",
        "n_channels",
        "bits_per_sample",
        "n_frames",
        "duration_ms",
        F.round("rms", 6).alias("rms"),
    )


SQL_MULTIMODAL_AUDIO = """
WITH p AS (
    SELECT doc_id AS asset_id,
           md5(text) AS h,
           CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) AS b0,
           CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) AS b1
    FROM documents WHERE doc_id % 3 = 1
), d AS (
    SELECT asset_id, h,
           (ARRAY[8000, 16000, 22050, 44100])[(b0 % 4) + 1] AS rate,
           8 * (1 + b1 % 32) AS nf
    FROM p
)
SELECT asset_id,
       CAST(rate AS INTEGER) AS sample_rate,
       CAST(CASE WHEN h IS NULL THEN NULL ELSE 1 END AS INTEGER) AS n_channels,
       CAST(CASE WHEN h IS NULL THEN NULL ELSE 16 END AS INTEGER) AS bits_per_sample,
       CAST(nf AS BIGINT) AS n_frames,
       CAST((nf * 1000) // rate AS BIGINT) AS duration_ms,
       ROUND(sqrt(list_sum(list_transform(generate_series(0, 7),
             i -> pow((CAST(('0x' || substr(h, 2*i+1, 2)) AS INTEGER) - 128) / 128.0, 2))) / 8), 6) AS rms
FROM d
"""


def q_sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact kNN graph (top-3 cosine neighbors per vector)
    via the block-matrix kernel — the semantic-dedup / graph-clustering
    primitive (no corpus broadcast, no cross-product node; candidates
    are n*B*k rows and the rank window is partitioned per node)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_graph_blocked(emb, k=3)


SQL_SIM_KNN = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
    SELECT a.vec_id AS node_id, b.vec_id AS neighbor_id,
           ROUND({S.cosine_sql('a.v', 'b.v')}, 6) AS cos_sim
    FROM e a, e b WHERE a.vec_id <> b.vec_id
)
SELECT node_id, neighbor_id, cos_sim, CAST(rk AS INTEGER) AS rk
FROM (
    SELECT node_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY node_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rk
    FROM scored
) WHERE rk <= 3
"""


def q_text_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: corpus share, exact-duplicate
    pressure, and language spread by domain — the first report a
    curation run produces when deciding per-source sampling weights.
    One groupBy on the (already low-cardinality) source key; the
    duplicate count is a distinct-agg on the md5 digest, all-integer
    output (the davg_int float policy)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        E.davg_int("n_chars").alias("avg_chars_x1m"),
    )


SQL_TEXT_DOMAIN_STATS = f"""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       {E.davg_int_sql('n_chars')} AS avg_chars_x1m
FROM documents
GROUP BY source
"""


# --- round-6 additions: neighbor ranking, graph audit, chunk dedup,
# --- sketch set algebra, centroid classification ------------------------


def q_dedup_topk_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nearest near-dup neighbors per document from the MinHash
    pair table — the per-doc view a curation UI or manual-audit
    sampler reads ("show me what this doc nearly duplicates").
    Symmetrize the (d1 < d2) pair list, then one window PARTITIONED by
    doc (parallel across docs, group size bounded by the LSH band-cap
    fan-out). Consumes the session-materialized pair table."""
    pairs = _minhash_pairs_cached(spark, sf_dir)
    sym = pairs.select(
        F.col("d1").alias("doc_id"), F.col("d2").alias("neighbor_id"), "est_jaccard"
    ).unionByName(
        pairs.select(
            F.col("d2").alias("doc_id"), F.col("d1").alias("neighbor_id"), "est_jaccard"
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("est_jaccard"), "neighbor_id")
    return (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", F.col("rk").cast("bigint").alias("rk"), "neighbor_id", "est_jaccard")
    )


SQL_DEDUP_TOPK_NEIGHBORS = f"""
WITH {_MINHASH_SIMS_CTES},
sym AS (
    SELECT d1 AS doc_id, d2 AS neighbor_id, est_jaccard FROM sims
    UNION ALL
    SELECT d2, d1, est_jaccard FROM sims
), ranked AS (
    SELECT doc_id, neighbor_id, est_jaccard,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY est_jaccard DESC, neighbor_id
           ) AS rk
    FROM sym
)
SELECT doc_id, CAST(rk AS BIGINT) AS rk, neighbor_id, est_jaccard
FROM ranked WHERE rk <= 3
"""


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph audit: vertex/edge/degree/triangle counts over
    the cluster-edge graph (est_jaccard >= CLUSTER_EDGE_MIN). Triangle
    density distinguishes true duplicate cliques from chains of
    borderline matches — a cheap structural health check before
    trusting connected components. The edge list is pair-volume sized
    (band-cap bounded), the oriented d1<d2 form makes each triangle
    count exactly once via two equi-joins; degrees come from one
    groupBy of the symmetrized list."""
    e = (
        _minhash_pairs_cached(spark, sf_dir)
        .filter(F.col("est_jaccard") >= CLUSTER_EDGE_MIN)
        .select("d1", "d2")
    )
    deg = (
        e.select(F.col("d1").alias("v"))
        .unionByName(e.select(F.col("d2").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.d2") == F.col("e2.d1"))
        .join(
            e.alias("e3"),
            (F.col("e1.d1") == F.col("e3.d1")) & (F.col("e2.d2") == F.col("e3.d2")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        (F.sum("deg") / 2).cast("bigint").alias("n_edges"),
        F.max("deg").alias("max_degree"),
    )
    return summary.crossJoin(tri)


SQL_GRAPH_TRIANGLES = f"""
WITH {_MINHASH_SIMS_CTES},
e AS (SELECT d1, d2 FROM sims WHERE est_jaccard >= {CLUSTER_EDGE_MIN}),
deg AS (
    SELECT v, COUNT(*) AS deg FROM (
        SELECT d1 AS v FROM e UNION ALL SELECT d2 FROM e
    ) GROUP BY v
),
tri AS (
    SELECT COUNT(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.d2 = e2.d1
    JOIN e e3 ON e1.d1 = e3.d1 AND e2.d2 = e3.d2
)
SELECT (SELECT COUNT(*) FROM deg)                     AS n_vertices,
       (SELECT CAST(SUM(deg) / 2 AS BIGINT) FROM deg) AS n_edges,
       (SELECT MAX(deg) FROM deg)                     AS max_degree,
       tri.n_triangles
FROM tri
"""


def q_text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level (near-line-level) dedup stats: for every document, how
    many of its context-window chunks also occur verbatim in OTHER
    documents — the C4/RefinedWeb-style sub-document duplication signal
    that doc-level dedup misses (boilerplate headers, repeated
    license blocks). One groupBy on chunk_md5 (uniform key, map-side
    combine) + a join back on the same key; the dup share is integer
    micro-units so the output is all-BIGINT."""
    ch = q_text_chunk_windows(spark, sf_dir).select("doc_id", "chunk_md5")
    docs_per_chunk = ch.groupBy("chunk_md5").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    return (
        ch.join(docs_per_chunk, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("nd") > 1).cast("bigint")).alias("n_shared_chunks"),
        )
        .withColumn(
            "shared_x1m",
            F.expr("CAST(n_shared_chunks * 1000000 DIV n_chunks AS BIGINT)"),
        )
    )


SQL_TEXT_CHUNK_DEDUP = f"""
WITH ch AS ({SQL_TEXT_CHUNKS}),
dpc AS (
    SELECT chunk_md5, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk_md5
)
SELECT ch.doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN dpc.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
       CAST(SUM(CASE WHEN dpc.nd > 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS shared_x1m
FROM ch JOIN dpc USING (chunk_md5)
GROUP BY ch.doc_id
"""


#: KMV sketch size for the set-algebra query.
KMV_SETOPS_K = 64


def q_sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra (Beyer et al., SIGMOD'07): estimate
    |A|, |B|, |A∪B| and |A∩B| for two corpus halves from two k-min-value
    sketches alone — the mergeable-sketch path for "how much would
    corpus B add to corpus A?" without a corpus-sized distinct. Union
    sketch = bottom-k of the two sketches' hash union (KMV closure
    under union); intersection via the Jaccard of the union sketch.
    Per-side bottom-k uses the salted two-level rank (no hot
    partition); everything after operates on <= 2k rows aggregated
    into arrays — bounded state, no global window."""
    from pipe_s_spark.functions import sketches as K

    k = KMV_SETOPS_K
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        F.when(F.col("doc_id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias("side"),
        K.kmv_hash("text").alias("h"),
    ).distinct()
    n_salts = 16
    w1 = Window.partitionBy("side", "salt").orderBy("h")
    pre = (
        hashed.withColumn("salt", F.pmod(F.hash("h"), F.lit(n_salts)))
        .withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") <= k)
        .drop("rk", "salt")
    )
    w2 = Window.partitionBy("side").orderBy("h")
    bottom = pre.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= k)
    sketches = bottom.groupBy("side").agg(F.array_sort(F.collect_list("h")).alias("arr"))
    a = sketches.filter(F.col("side") == "a").select(F.col("arr").alias("arr_a"))
    b = sketches.filter(F.col("side") == "b").select(F.col("arr").alias("arr_b"))

    def est(arr):
        n = F.size(arr)
        return F.round(
            F.when(n < k, n.cast("double")).otherwise(
                F.lit(float(k - 1)) / F.element_at(arr, k)
            ),
            4,
        )

    merged = F.expr(f"slice(array_sort(array_union(arr_a, arr_b)), 1, {k})")
    out = (
        a.crossJoin(b)
        .withColumn("arr_u", merged)
        .withColumn("n_union_hashes", F.size("arr_u").cast("bigint"))
        .withColumn(
            "n_both",
            F.size(
                F.expr("filter(arr_u, x -> array_contains(arr_a, x) AND array_contains(arr_b, x))")
            ).cast("bigint"),
        )
        .withColumn("est_a", est(F.col("arr_a")))
        .withColumn("est_b", est(F.col("arr_b")))
        .withColumn("est_union", est(F.col("arr_u")))
    )
    return out.select(
        F.size("arr_a").cast("bigint").alias("n_a_hashes"),
        F.size("arr_b").cast("bigint").alias("n_b_hashes"),
        "n_union_hashes",
        "est_a",
        "est_b",
        "est_union",
        F.round(
            F.col("n_both").cast("double") / F.col("n_union_hashes") * F.col("est_union"),
            4,
        ).alias("est_intersection"),
    )


def _sql_sketch_kmv_setops() -> str:
    from pipe_s_spark.functions import sketches as K

    k = KMV_SETOPS_K
    return f"""
WITH hashed AS (
    SELECT DISTINCT CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS side,
           {K.kmv_hash_sql('text')} AS h
    FROM documents
),
bottom AS (
    SELECT side, h FROM (
        SELECT side, h, ROW_NUMBER() OVER (PARTITION BY side ORDER BY h) AS rk
        FROM hashed
    ) WHERE rk <= {k}
),
sk AS (
    SELECT side, list_sort(list(h)) AS arr FROM bottom GROUP BY side
),
ab AS (
    SELECT (SELECT arr FROM sk WHERE side = 'a') AS arr_a,
           (SELECT arr FROM sk WHERE side = 'b') AS arr_b
),
m AS (
    SELECT arr_a, arr_b,
           list_sort(list_distinct(list_concat(arr_a, arr_b)))[1:{k}] AS arr_u
    FROM ab
),
est AS (
    SELECT len(arr_a) AS n_a, len(arr_b) AS n_b, len(arr_u) AS n_u,
           len(list_filter(arr_u,
               x -> list_contains(arr_a, x) AND list_contains(arr_b, x))) AS n_both,
           ROUND(CASE WHEN len(arr_a) < {k} THEN CAST(len(arr_a) AS DOUBLE)
                      ELSE {float(k - 1)!r} / arr_a[{k}] END, 4) AS est_a,
           ROUND(CASE WHEN len(arr_b) < {k} THEN CAST(len(arr_b) AS DOUBLE)
                      ELSE {float(k - 1)!r} / arr_b[{k}] END, 4) AS est_b,
           ROUND(CASE WHEN len(arr_u) < {k} THEN CAST(len(arr_u) AS DOUBLE)
                      ELSE {float(k - 1)!r} / arr_u[{k}] END, 4) AS est_union
    FROM m
)
SELECT CAST(n_a AS BIGINT) AS n_a_hashes,
       CAST(n_b AS BIGINT) AS n_b_hashes,
       CAST(n_u AS BIGINT) AS n_union_hashes,
       est_a, est_b, est_union,
       ROUND(CAST(n_both AS DOUBLE) / n_u * est_union, 4) AS est_intersection
FROM est
"""


def q_text_quality_dup_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SIGNAL diagnostic: quality statistics of near-duplicated
    vs clean documents — the two-row table that answers "are my
    near-dups also my junk?" (if yes, dedup doubles as a quality
    filter; if no, the two gates prune independently and both are
    worth running). Dup membership comes from the session-materialized
    MinHash pair table (est_jaccard >= CLUSTER_EDGE_MIN, either side);
    quality is the standard heuristic rounded to 6 and quantized to
    integer micro-units per row, so the group means are exact BIGINT
    arithmetic (order-independent, engine-identical); the
    medians are order statistics. One narrow corpus pass + one
    vocabulary-sized (2-group) rollup."""
    pairs = _minhash_pairs_cached(spark, sf_dir).filter(
        F.col("est_jaccard") >= CLUSTER_EDGE_MIN
    )
    dup_ids = (
        pairs.select(F.col("d1").alias("doc_id"))
        .unionByName(pairs.select(F.col("d2").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", X.quality_score("text").alias("q")
    )
    flagged = docs.join(F.broadcast(dup_ids), "doc_id", "left").withColumn(
        "is_dup", F.coalesce("is_dup", F.lit(False))
    )
    return flagged.groupBy("is_dup").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(
            "CAST(SUM(CAST(ROUND(q * 1000000) AS BIGINT)) DIV COUNT(1) AS BIGINT)"
        ).alias("mean_quality_x1m"),
        F.round(F.expr("percentile(q, 0.5)"), 6).alias("p50_quality"),
    )


def _sql_text_quality_dup_link() -> str:
    return f"""
WITH {_MINHASH_SIMS_CTES},
dup_ids AS (
    SELECT DISTINCT doc_id FROM (
        SELECT d1 AS doc_id FROM sims WHERE est_jaccard >= {CLUSTER_EDGE_MIN}
        UNION ALL
        SELECT d2 FROM sims WHERE est_jaccard >= {CLUSTER_EDGE_MIN}
    )
),
scored AS (
    SELECT d.doc_id, {X.quality_score_sql('d.text')} AS q,
           d.doc_id IN (SELECT doc_id FROM dup_ids) AS is_dup
    FROM documents d
)
SELECT is_dup, COUNT(*) AS n_docs,
       CAST(SUM(CAST(ROUND(q * 1000000) AS BIGINT)) // COUNT(*) AS BIGINT)
           AS mean_quality_x1m,
       ROUND(quantile_cont(q, 0.5), 6) AS p50_quality
FROM scored GROUP BY is_dup
"""


def q_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram of the near-dup graph — the one-look
    audit that catches boilerplate explosions (a 10k-doc cluster means
    a template, not prose) before a keep-policy runs. Two tiny
    aggregations over the session-materialized clusters table."""
    clusters = q_dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size")).cast("bigint").alias("n_docs"),
    )


SQL_DEDUP_CLUSTER_STATS = f"""
WITH RECURSIVE {_MINHASH_SIMS_CTES},
edges AS (SELECT d1, d2 FROM sims WHERE est_jaccard >= {CLUSTER_EDGE_MIN}),
und AS (SELECT d1 AS a, d2 AS b FROM edges UNION SELECT d2, d1 FROM edges),
verts AS (SELECT DISTINCT a AS v FROM und),
reach(a, b) AS (
    SELECT v, v FROM verts
    UNION
    SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
),
comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a),
sizes AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
SELECT cluster_size, COUNT(*) AS n_clusters,
       CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size
"""


#: Min bigram count / result size for the PMI collocation report.
PMI_MIN_COUNT = 5
PMI_TOP_K = 20


def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLOCATION mining: the top-{k} token bigrams by pointwise
    mutual information, PMI = ln(c12·N / (c1·c2)) (Church & Hanks
    1990) with a min-count floor — the multi-word-expression detector
    (tokenizer vocab candidates, stopword-pair screens) every corpus
    toolkit ships. Reuses the session-materialized bigram-TYPE table
    (kn_counts); marginals are two unordered partition windows over it
    (vocabulary-sized); N is one scalar collect; PMI is ln of an exact
    integer ratio quantized once to milli-nats, and the top-k is a
    TakeOrderedAndProject — no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    inst = D.shingles(docs, "doc_id", "text", k=2, distinct=False).select(
        "doc_id", "shingle"
    )

    def build_counts() -> DataFrame:
        return (
            inst.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("c12"))
            .withColumn("w1", F.split_part(F.col("shingle"), F.lit(" "), F.lit(1)))
            .withColumn("w2", F.split_part(F.col("shingle"), F.lit(" "), F.lit(2)))
        )

    counts = SH.materialized(spark, ("kn_counts", sf_dir, 2), build_counts)
    n_total = counts.agg(F.sum("c12")).collect()[0][0]
    marg = (
        counts.withColumn("c1", F.sum("c12").over(Window.partitionBy("w1")))
        .withColumn("c2", F.sum("c12").over(Window.partitionBy("w2")))
        .filter(F.col("c12") >= PMI_MIN_COUNT)
    )
    pmi = F.log(
        (F.col("c12").cast("double") * F.lit(float(n_total)))
        / (F.col("c1").cast("double") * F.col("c2").cast("double"))
    )
    return (
        marg.select(
            "shingle",
            "c12",
            F.round(pmi * 1000).cast("long").alias("pmi_x1k"),
        )
        .orderBy(F.desc("pmi_x1k"), "shingle")
        .limit(PMI_TOP_K)
    )


SQL_TEXT_COLLOCATIONS = f"""
WITH tok AS (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok,
           generate_subscripts({TOKS_SQL}, 1) AS ord
    FROM documents
),
bi AS (
    SELECT tok || ' ' || LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord)
               AS shingle,
           tok AS w1,
           LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
    FROM tok
),
counts AS (
    SELECT shingle, w1, w2, COUNT(*) AS c12
    FROM bi WHERE shingle IS NOT NULL GROUP BY shingle, w1, w2
),
tot AS (SELECT SUM(c12) AS n FROM counts),
marg AS (
    SELECT shingle, c12,
           SUM(c12) OVER (PARTITION BY w1) AS c1,
           SUM(c12) OVER (PARTITION BY w2) AS c2
    FROM counts
)
SELECT shingle, c12,
       CAST(ROUND(LN(CAST(c12 AS DOUBLE) * CAST((SELECT n FROM tot) AS DOUBLE)
                     / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) * 1000) AS BIGINT)
           AS pmi_x1k
FROM marg WHERE c12 >= {PMI_MIN_COUNT}
ORDER BY pmi_x1k DESC, shingle
LIMIT {PMI_TOP_K}
"""


#: Absolute discount for the interpolated Kneser-Ney bigram model.
KN_DISCOUNT = 0.75


def q_text_kn_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM score per document (Kneser &
    Ney 1995; Chen & Goodman 1999) — the fluency scorer a step up from
    unigram surprisal (text_surprisal): P(w2|w1) = max(c12-δ,0)/c1 +
    δ·N1+(w1·)/c1 · N1+(·w2)/D, self-trained on the corpus.

    Scale shape: bigram INSTANCES come from the zero-shuffle shingle
    kernel (k=2, with multiplicity); the model lives entirely on the
    bigram-TYPE table (groupBy + two unordered partition windows for
    the context/continuation counts — vocabulary-sized, not
    corpus-sized); per-type surprisal is quantized to integer
    micro-nats ONCE, so the per-doc aggregation is an exact BIGINT
    mean, order-independent under any partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    inst = D.shingles(docs, "doc_id", "text", k=2, distinct=False).select(
        "doc_id", "shingle"
    )

    def build_counts() -> DataFrame:
        return (
            inst.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("c12"))
            .withColumn("w1", F.split_part(F.col("shingle"), F.lit(" "), F.lit(1)))
            .withColumn("w2", F.split_part(F.col("shingle"), F.lit(" "), F.lit(2)))
        )

    # bigram-TYPE table: vocabulary-sized, feeds the model windows AND
    # the type-count scalar — the persisted LM-counts table of a real
    # pipeline (safe to materialize; the instance relation is not)
    counts = SH.materialized(spark, ("kn_counts", sf_dir, 2), build_counts)
    w1w = Window.partitionBy("w1")
    w2w = Window.partitionBy("w2")
    typed = (
        counts.withColumn("c1", F.sum("c12").over(w1w))
        .withColumn("n1_w1", F.count(F.lit(1)).over(w1w))
        .withColumn("n1c_w2", F.count(F.lit(1)).over(w2w))
    )
    n_types = counts.count()
    d = F.lit(KN_DISCOUNT)
    p = (
        F.greatest(F.col("c12") - d, F.lit(0.0))
        + d * F.col("n1_w1") * (F.col("n1c_w2") / F.lit(float(n_types)))
    ) / F.col("c1")
    model = typed.select(
        "shingle",
        (-F.log(p) * 1_000_000).alias("_s_raw"),
    ).select(
        "shingle",
        F.expr("CAST(ROUND(_s_raw) AS BIGINT)").alias("s_x1m"),
    )
    return (
        inst.join(model, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("CAST(SUM(s_x1m) DIV COUNT(1) AS BIGINT)").alias(
                "mean_kn_surprisal_x1m"
            ),
        )
    )


def _sql_text_kn_bigram_score() -> str:
    return f"""
WITH tok AS (
    SELECT doc_id,
           unnest({TOKS_SQL}) AS tok,
           generate_subscripts({TOKS_SQL}, 1) AS ord
    FROM documents
),
bg AS (
    SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w AS bigram
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
),
inst AS (SELECT doc_id, bigram FROM bg WHERE bigram IS NOT NULL),
counts AS (
    SELECT bigram,
           split_part(bigram, ' ', 1) AS w1,
           split_part(bigram, ' ', 2) AS w2,
           COUNT(*) AS c12
    FROM inst GROUP BY bigram
),
typed AS (
    SELECT bigram, c12,
           SUM(c12) OVER (PARTITION BY w1)  AS c1,
           COUNT(*) OVER (PARTITION BY w1)  AS n1_w1,
           COUNT(*) OVER (PARTITION BY w2)  AS n1c_w2
    FROM counts
),
d_total AS (SELECT COUNT(*) AS nt FROM counts),
model AS (
    SELECT bigram,
           CAST(ROUND(-LN(
               (GREATEST(CAST(c12 AS DOUBLE) - {KN_DISCOUNT}, 0.0)
                + {KN_DISCOUNT} * n1_w1 * (CAST(n1c_w2 AS DOUBLE) / nt))
               / c1) * 1000000) AS BIGINT) AS s_x1m
    FROM typed CROSS JOIN d_total
)
SELECT i.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(m.s_x1m) // COUNT(*) AS BIGINT) AS mean_kn_surprisal_x1m
FROM inst i JOIN model m ON i.bigram = m.bigram
GROUP BY i.doc_id
"""


def q_sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN QUALITY EVAL as an oracle-checked query: per probe, the
    recall@5 of the hyperplane-LSH bucket candidates against the exact
    brute-force top-5 — the eval harness every approximate index needs
    before it replaces the exact path, runnable as one query per
    parameter setting. Exact side = broadcast brute force over 10
    probes (the allowlisted baseline pattern); candidate side = the
    capped bucket equi-join; recall is an integer micro-ratio."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, probes, k=5).select("query_id", "neighbor_id")
    e = emb.select(
        "vec_id", S.as_double_array("embedding").alias("v")
    ).withColumn("bucket", S.lsh_bucket(F.col("v")))
    e = D.cap_group_size(e, ["bucket"], SIM_BUCKET_CAP)
    p = e.filter(F.col("vec_id") < 10).alias("p")
    c = e.alias("c")
    cand = (
        p.join(
            c,
            (F.col("p.bucket") == F.col("c.bucket"))
            & (F.col("p.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("p.vec_id").alias("query_id"), F.col("c.vec_id").alias("neighbor_id")
        )
        .distinct()
    )
    n_cand = cand.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_candidates"))
    hits = (
        exact.join(cand.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"),
        )
    )
    return (
        hits.join(n_cand, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
            "n_hits",
            F.expr("CAST(n_hits * 1000000 DIV n_exact AS BIGINT)").alias("recall_x1m"),
        )
    )


SQL_SIM_LSH_RECALL = f"""
WITH e0 AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           {S.lsh_bucket_sql('CAST(embedding AS DOUBLE[])')} AS bucket
    FROM embeddings
),
ec AS (
    SELECT vec_id, v, bucket FROM (
        SELECT vec_id, v, bucket, COUNT(*) OVER (PARTITION BY bucket) AS gs FROM e0
    ) WHERE gs <= {SIM_BUCKET_CAP}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 10),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROUND({S.cosine_sql('q.v', 'e.v')}, 6) AS cos_sim
    FROM q, e WHERE q.vec_id <> e.vec_id
),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM scored
    ) WHERE rk <= 5
),
cand AS (
    SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM ec p JOIN ec c ON p.bucket = c.bucket AND p.vec_id <> c.vec_id
    WHERE p.vec_id < 10
),
n_cand AS (
    SELECT query_id, COUNT(*) AS n_candidates FROM cand GROUP BY query_id
),
hits AS (
    SELECT x.query_id,
           COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits
    FROM exact x
    LEFT JOIN cand c ON c.query_id = x.query_id AND c.neighbor_id = x.neighbor_id
    GROUP BY x.query_id
)
SELECT h.query_id, h.n_exact,
       CAST(COALESCE(n.n_candidates, 0) AS BIGINT) AS n_candidates,
       h.n_hits,
       CAST(h.n_hits * 1000000 // h.n_exact AS BIGINT) AS recall_x1m
FROM hits h LEFT JOIN n_cand n USING (query_id)
"""


def q_sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF counterpart of sim_lsh_recall: recall@5 of the
    nprobe=2 cell candidates against the exact brute-force top-5, per
    probe — together the two queries make the standard ANN
    index-tuning report (bucketed LSH vs partitioned IVF) an
    oracle-checked artifact."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, probes, k=5).select("query_id", "neighbor_id")
    v = S.as_double_array("embedding")
    corpus = emb.select("vec_id", S.ivf_assign(v).alias("cell"))
    pr = probes.select(
        F.col("vec_id").alias("query_id"),
        F.explode(S.ivf_probes(v, nprobe=2)).alias("cell"),
    )
    cand = (
        F.broadcast(pr)
        .join(corpus, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    n_cand = cand.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_candidates"))
    hits = (
        exact.join(cand.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"),
        )
    )
    return (
        hits.join(n_cand, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
            "n_hits",
            F.expr("CAST(n_hits * 1000000 DIV n_exact AS BIGINT)").alias("recall_x1m"),
        )
    )


SQL_SIM_IVF_RECALL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cd AS (
    SELECT e.vec_id, cells.cell,
           list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * cells.cv[i])) AS d
    FROM e CROSS JOIN {S.ivf_cells_values_sql()}
),
assign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd) WHERE r = 1
),
probes AS (
    SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd WHERE vec_id < 10) WHERE r <= 2
),
q AS (SELECT * FROM e WHERE vec_id < 10),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROUND({S.cosine_sql('q.v', 'e.v')}, 6) AS cos_sim
    FROM q, e WHERE q.vec_id <> e.vec_id
),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM scored
    ) WHERE rk <= 5
),
cand AS (
    SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
    FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
),
n_cand AS (
    SELECT query_id, COUNT(*) AS n_candidates FROM cand GROUP BY query_id
),
hits AS (
    SELECT x.query_id,
           COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits
    FROM exact x
    LEFT JOIN cand c ON c.query_id = x.query_id AND c.neighbor_id = x.neighbor_id
    GROUP BY x.query_id
)
SELECT h.query_id, h.n_exact,
       CAST(COALESCE(n.n_candidates, 0) AS BIGINT) AS n_candidates,
       h.n_hits,
       CAST(h.n_hits * 1000000 // h.n_exact AS BIGINT) AS recall_x1m
FROM hits h LEFT JOIN n_cand n USING (query_id)
"""


def q_sim_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF TUNING CURVE: corpus-level recall@5 and candidate volume at
    nprobe = 1, 2, 3 in ONE query — the actual decision table for the
    recall-vs-cost knob (sim_ivf_recall fixes nprobe=2 and reports
    per-probe; this sweeps the knob). Each candidate carries the MIN
    probe rank that discovers it, then a narrow <= 3x arm explode
    aggregates every nprobe setting from the same single
    candidate-generation pass — the index is probed once, not once
    per arm."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, probes, k=5).select("query_id", "neighbor_id")
    v = S.as_double_array("embedding")
    corpus = emb.select("vec_id", S.ivf_assign(v).alias("cell"))
    pr = probes.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(S.ivf_probes(v, nprobe=3)).alias("rank0", "cell"),
    )
    cand = (
        F.broadcast(pr)
        .join(corpus, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg((F.min("rank0") + 1).alias("r_min"))
    )
    arms = F.explode(F.sequence(F.lit(1), F.lit(3))).alias("nprobe")
    hit_rows = (
        exact.join(cand, ["query_id", "neighbor_id"], "left")
        .select("query_id", "r_min", arms)
        .groupBy("nprobe")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(
                (F.coalesce(F.col("r_min"), F.lit(99)) <= F.col("nprobe")).cast("long")
            ).alias("n_hits"),
        )
    )
    cand_rows = (
        cand.select("r_min", arms)
        .filter(F.col("r_min") <= F.col("nprobe"))
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).alias("n_candidates"))
    )
    return (
        hit_rows.join(cand_rows, "nprobe", "left")
        .select(
            F.col("nprobe").cast("int").alias("nprobe"),
            "n_exact",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            "n_hits",
            F.expr("CAST(n_hits * 1000000 DIV n_exact AS BIGINT)").alias("recall_x1m"),
        )
    )


def _sql_sim_ivf_nprobe_curve() -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cd AS (
    SELECT e.vec_id, cells.cell,
           list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * cells.cv[i])) AS d
    FROM e CROSS JOIN {S.ivf_cells_values_sql()}
),
assign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd) WHERE r = 1
),
probes AS (
    SELECT vec_id AS query_id, cell, r FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd WHERE vec_id < 10) WHERE r <= 3
),
cand AS (
    SELECT p.query_id, a.vec_id AS neighbor_id, MIN(p.r) AS r_min
    FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
    GROUP BY p.query_id, a.vec_id
),
q AS (SELECT * FROM e WHERE vec_id < 10),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROUND({S.cosine_sql('q.v', 'e.v')}, 6) AS cos_sim
    FROM q, e WHERE q.vec_id <> e.vec_id
),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM scored
    ) WHERE rk <= 5
),
arms AS (SELECT unnest(generate_series(1, 3)) AS nprobe),
hit_rows AS (
    SELECT arms.nprobe,
           COUNT(*) AS n_exact,
           CAST(SUM(CASE WHEN COALESCE(c.r_min, 99) <= arms.nprobe
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
    FROM exact x
    LEFT JOIN cand c ON c.query_id = x.query_id AND c.neighbor_id = x.neighbor_id
    CROSS JOIN arms
    GROUP BY arms.nprobe
),
cand_rows AS (
    SELECT arms.nprobe, COUNT(*) AS n_candidates
    FROM cand CROSS JOIN arms
    WHERE cand.r_min <= arms.nprobe
    GROUP BY arms.nprobe
)
SELECT CAST(h.nprobe AS INTEGER) AS nprobe, h.n_exact,
       CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates,
       h.n_hits,
       CAST(h.n_hits * 1000000 // h.n_exact AS BIGINT) AS recall_x1m
FROM hit_rows h LEFT JOIN cand_rows c USING (nprobe)
"""


def q_sim_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8 SCALAR QUANTIZATION eval: recall@5 of top-5-by-quantized-
    dot-product against the exact brute-force cosine top-5, per probe —
    the third leg of the ANN tuning report (LSH buckets / IVF cells /
    compressed codes). Per-dimension global min/max "train" the
    quantizer (an O(dim) metadata collect, like the IVF centroid
    matrix); each vector becomes 64 one-byte codes — 8x smaller than
    float64, which at corpus scale is the difference between an in-RAM
    and a spilled index. The quantized ranking is PURE int64 dot
    products: no float comparisons anywhere in the candidate order, so
    the top-5 is deterministic by construction."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, probes, k=5).select("query_id", "neighbor_id")
    lo, hi = S.sq8_bounds(emb)
    e = emb.select("vec_id", S.sq8_quantize(S.as_double_array("embedding"), lo, hi).alias("qv"))
    p = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("pv")
    )
    scored = (
        e.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            S.int_dot(F.col("qv"), F.col("pv")).alias("qdot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), "neighbor_id")
    approx = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id")
    )
    return (
        exact.join(approx.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hits",
            F.expr("CAST(n_hits * 1000000 DIV n_exact AS BIGINT)").alias("recall_x1m"),
        )
    )


SQL_SIM_SQ8_RECALL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dims AS (
    SELECT i, MIN(v[i]) AS lo, MAX(v[i]) AS hi
    FROM e, LATERAL (SELECT unnest(range(1, 65)) AS i)
    GROUP BY i
),
dimsc AS (
    SELECT i, lo, CASE WHEN hi > lo THEN 255.0 / (hi - lo) ELSE 0.0 END AS sc
    FROM dims
),
qe AS (
    SELECT e.vec_id, d.i,
           CAST(FLOOR((e.v[d.i] - d.lo) * d.sc + 0.5) AS BIGINT) AS q
    FROM e CROSS JOIN dimsc d
),
scores AS (
    SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(p.q * c.q) AS qdot
    FROM qe p JOIN qe c ON p.i = c.i AND p.vec_id <> c.vec_id
    WHERE p.vec_id < 10
    GROUP BY p.vec_id, c.vec_id
),
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY qdot DESC, neighbor_id) AS rk
        FROM scores
    ) WHERE rk <= 5
),
q AS (SELECT * FROM e WHERE vec_id < 10),
exact_scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           ROUND({{cos}}, 6) AS cos_sim
    FROM q, e WHERE q.vec_id <> e.vec_id
),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM exact_scored
    ) WHERE rk <= 5
)
SELECT x.query_id,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS recall_x1m
FROM exact x
LEFT JOIN approx a ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
GROUP BY x.query_id
""".replace("{cos}", S.cosine_sql("q.v", "e.v"))


#: Candidate pool size for the SQ8 serving path (re-ranked exactly).
SQ8_CAND_K = 50


def q_sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 SERVING path: candidates = top-SQ8_CAND_K by int8 quantized
    dot product (pure int64 ranking — deterministic with no float
    anywhere), then EXACT cosine re-rank of only those candidates to
    top-5. This is the standard compressed-index serving shape
    (quantized scan for recall, exact re-rank for precision): the full
    corpus is touched only through 64-byte codes; the 512-byte float
    vectors are fetched for SQ8_CAND_K rows per query via an equi-join
    — at corpus scale that is the difference between streaming the
    whole corpus and reading k rows per probe."""
    emb = load_table(spark, sf_dir, "embeddings")
    lo, hi = S.sq8_bounds(emb)
    e = emb.select("vec_id", S.sq8_quantize(S.as_double_array("embedding"), lo, hi).alias("qv"))
    p = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("pv")
    )
    scored = (
        e.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            S.int_dot(F.col("qv"), F.col("pv")).alias("qdot"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qdot"), "neighbor_id")
    cand = (
        scored.withColumn("crk", F.row_number().over(wq))
        .filter(F.col("crk") <= SQ8_CAND_K)
        .select("query_id", "neighbor_id")
    )
    ev = emb.select("vec_id", S.as_double_array("embedding").alias("v"))
    rer = (
        cand.join(ev.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv")), "query_id")
        .join(ev.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(S.cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        rer.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


SQL_SIM_SQ8_TOPK = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dims AS (
    SELECT i, MIN(v[i]) AS lo, MAX(v[i]) AS hi
    FROM e, LATERAL (SELECT unnest(range(1, 65)) AS i)
    GROUP BY i
),
dimsc AS (
    SELECT i, lo, CASE WHEN hi > lo THEN 255.0 / (hi - lo) ELSE 0.0 END AS sc
    FROM dims
),
qe AS (
    SELECT e.vec_id, d.i,
           CAST(FLOOR((e.v[d.i] - d.lo) * d.sc + 0.5) AS BIGINT) AS q
    FROM e CROSS JOIN dimsc d
),
scores AS (
    SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(p.q * c.q) AS qdot
    FROM qe p JOIN qe c ON p.i = c.i AND p.vec_id <> c.vec_id
    WHERE p.vec_id < 10
    GROUP BY p.vec_id, c.vec_id
),
cand AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY qdot DESC, neighbor_id) AS crk
        FROM scores
    ) WHERE crk <= {SQ8_CAND_K}
),
rer AS (
    SELECT cand.query_id, cand.neighbor_id,
           ROUND({{cos}}, 6) AS cos_sim
    FROM cand
    JOIN e q ON q.vec_id = cand.query_id
    JOIN e c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rk AS INTEGER) AS rk
FROM (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rk
    FROM rer
) WHERE rk <= 5
""".replace("{cos}", S.cosine_sql("q.v", "c.v"))


def q_text_corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus duplication dashboard: document count, exact-dup
    share, near-dup cluster count and coverage, and the corpus-mean
    shared-chunk density — the summary a curation run prints before
    and after every pass. Stitches the session-materialized clusters
    table and the chunk-dedup stats into four scalar aggregates (each
    side is one row; the cross joins combine O(1) rows)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5("text"))).alias("n_exact_dup_docs"),
    )
    cl = q_dedup_clusters(spark, sf_dir).agg(
        F.count_distinct("component").alias("n_near_dup_clusters"),
        F.count(F.lit(1)).alias("n_clustered_docs"),
    )
    ch = q_text_chunk_dedup(spark, sf_dir).agg(
        F.expr(
            "CAST(SUM(n_shared_chunks) * 1000000 DIV SUM(n_chunks) AS BIGINT)"
        ).alias("shared_chunk_x1m")
    )
    return exact.crossJoin(cl).crossJoin(ch)


SQL_TEXT_CORPUS_HEALTH = f"""
WITH RECURSIVE {_MINHASH_SIMS_CTES},
edges AS (SELECT d1, d2 FROM sims WHERE est_jaccard >= {CLUSTER_EDGE_MIN}),
und AS (SELECT d1 AS a, d2 AS b FROM edges UNION SELECT d2, d1 FROM edges),
verts AS (SELECT DISTINCT a AS v FROM und),
reach(a, b) AS (
    SELECT v, v FROM verts
    UNION
    SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
),
comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a),
cl AS (
    SELECT COUNT(DISTINCT component) AS n_near_dup_clusters,
           COUNT(*) AS n_clustered_docs
    FROM comp
),
exact AS (
    SELECT COUNT(*) AS n_docs,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dup_docs
    FROM documents
),
ch AS ({SQL_TEXT_CHUNKS}),
dpc AS (
    SELECT chunk_md5, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk_md5
),
chs AS (
    SELECT CAST(SUM(CASE WHEN dpc.nd > 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS shared_chunk_x1m
    FROM ch JOIN dpc USING (chunk_md5)
)
SELECT exact.n_docs, exact.n_exact_dup_docs,
       cl.n_near_dup_clusters, CAST(cl.n_clustered_docs AS BIGINT) AS n_clustered_docs,
       chs.shared_chunk_x1m
FROM exact CROSS JOIN cl CROSS JOIN chs
"""


#: Head sizes for the vocabulary coverage curve.
VOCAB_COVERAGE_KS = (10, 100, 1000)


def _vocab_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term-frequency table ``(term, c)`` — vocabulary-sized,
    session-materialized so every vocabulary consumer (coverage curve,
    BPE merge counting) tokenizes the corpus exactly once."""

    def _build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        tok = docs.select(F.explode(X.tokens("text")).alias("term"))
        return tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))

    return SH.materialized(spark, ("vocab_tf", sf_dir), _build)


def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary compression curve: the share of all token instances
    covered by the top-K most frequent tokens, for K in
    VOCAB_COVERAGE_KS — the Zipf-head summary that sizes tokenizer
    vocabularies and stopword lists. Each head is a TakeOrdered top-K
    (no global window) over the vocabulary-sized frequency table; the
    output is |Ks| rows of integer micro-shares.

    The corpus is tokenized ONCE: tf is the vocabulary-sized narrow
    table functions.shared exists for, so the three heads and the
    total all read the same checkpointed table instead of four full
    corpus scans."""
    tf = _vocab_tf(spark, sf_dir)
    total = tf.agg(F.sum("c")).collect()[0][0]
    heads = []
    for k in VOCAB_COVERAGE_KS:
        head = (
            tf.orderBy(F.desc("c"), "term")
            .limit(k)
            .agg(
                F.lit(k).cast("long").alias("k"),
                F.count(F.lit(1)).alias("n_terms"),
                F.sum("c").cast("bigint").alias("covered"),
            )
        )
        heads.append(head)
    out = heads[0]
    for h in heads[1:]:
        out = out.unionByName(h)
    return out.withColumn(
        "coverage_x1m", F.expr(f"CAST(covered * 1000000 DIV {total} AS BIGINT)")
    )


def _sql_text_vocab_coverage() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT CAST({k} AS BIGINT) AS k, COUNT(*) AS n_terms,
       CAST(SUM(c) AS BIGINT) AS covered
FROM (SELECT c FROM tf ORDER BY c DESC, term LIMIT {k})"""
        for k in VOCAB_COVERAGE_KS
    )
    return f"""
WITH tok AS (
    SELECT unnest({TOKS_SQL}) AS term FROM documents
),
tf AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
total AS (SELECT SUM(c) AS t FROM tf),
heads AS (
{arms}
)
SELECT k, n_terms, covered,
       CAST(covered * 1000000 // MAX(total.t) AS BIGINT) AS coverage_x1m
FROM heads CROSS JOIN total
GROUP BY k, n_terms, covered
"""


def q_text_bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, step one: the 20 adjacent CHARACTER
    pairs with the highest corpus frequency — exactly the candidate
    table byte-pair-encoding's first merge rule is chosen from (Sennrich
    et al. 2016: count symbol pairs over word frequencies, merge the
    max). Runs entirely over the session-materialized vocabulary-sized
    tf table — pair generation is a narrow explode of word POSITIONS
    weighted by word frequency, so the corpus itself is never
    re-tokenized and nothing here scales with corpus rows, only with
    vocabulary size."""
    tf = _vocab_tf(spark, sf_dir)
    x = tf.filter(F.length("term") >= 2).select(
        "term", "c", F.explode(F.sequence(F.lit(1), F.length("term") - 1)).alias("i")
    )
    pairs = x.select(
        "c",
        F.expr("substr(term, i, 1)").alias("c1"),
        F.expr("substr(term, i + 1, 1)").alias("c2"),
    )
    return (
        pairs.groupBy("c1", "c2")
        .agg(F.sum("c").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "c1", "c2")
        .limit(20)
    )


SQL_TEXT_BPE_FIRST_MERGES = f"""
WITH tok AS (
    SELECT unnest({{toks}}) AS term FROM documents
),
tf AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
pairs AS (
    SELECT substr(term, i, 1) AS c1, substr(term, i + 1, 1) AS c2, c
    FROM tf, LATERAL (SELECT unnest(range(1, length(term))) AS i)
    WHERE length(term) >= 2
)
SELECT c1, c2, CAST(SUM(c) AS BIGINT) AS n_occurrences
FROM pairs
GROUP BY c1, c2
ORDER BY n_occurrences DESC, c1, c2
LIMIT 20
""".replace("{toks}", TOKS_SQL)


def q_text_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture weights: per source,
    w(alpha) = n^alpha / sum(n^alpha) for alpha in {1, 0.5, 0.25} —
    the standard smoothing family for corpus sampling (alpha=1 is
    proportional, lower alpha up-weights small domains; the same
    exponent family multilingual-corpus samplers use). Determinism per
    the exact.py float policy: alpha=1 is pure integer DIV; the sqrt
    arms go through DECIMAL(30,12) partial sums (order-independent)
    with one final IEEE division, so both engines agree bit-exactly.
    One groupBy over a domain-count table of O(sources) rows."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    n = F.col("n_docs").cast("double")
    arms = counts.select(
        "source",
        "n_docs",
        F.sqrt(n).cast("decimal(30,12)").alias("w50"),
        F.sqrt(F.sqrt(n)).cast("decimal(30,12)").alias("w25"),
    )
    tot = arms.agg(
        F.sum("n_docs").alias("t1"),
        F.sum("w50").alias("t50"),
        F.sum("w25").alias("t25"),
    )
    return (
        arms.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.expr("CAST(n_docs * 1000000 DIV t1 AS BIGINT)").alias("w_prop_x1m"),
            F.round(
                F.col("w50").cast("double") / F.col("t50").cast("double") * 1e6, 0
            ).cast("bigint").alias("w_sqrt_x1m"),
            F.round(
                F.col("w25").cast("double") / F.col("t25").cast("double") * 1e6, 0
            ).cast("bigint").alias("w_qrt_x1m"),
        )
    )


SQL_TEXT_MIX_WEIGHTS = """
WITH counts AS (
    SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
arms AS (
    SELECT source, n_docs,
           CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(30,12)) AS w50,
           CAST(sqrt(sqrt(CAST(n_docs AS DOUBLE))) AS DECIMAL(30,12)) AS w25
    FROM counts
),
tot AS (SELECT SUM(n_docs) AS t1, SUM(w50) AS t50, SUM(w25) AS t25 FROM arms)
SELECT source, n_docs,
       CAST(n_docs * 1000000 // t1 AS BIGINT) AS w_prop_x1m,
       CAST(ROUND(CAST(w50 AS DOUBLE) / CAST(t50 AS DOUBLE) * 1e6, 0) AS BIGINT)
           AS w_sqrt_x1m,
       CAST(ROUND(CAST(w25 AS DOUBLE) / CAST(t25 AS DOUBLE) * 1e6, 0) AS BIGINT)
           AS w_qrt_x1m
FROM arms CROSS JOIN tot
"""


def q_text_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix diversity per source: Shannon entropy of the lang
    distribution in integer micro-nats (each (source, lang) cell's
    -p·ln(p) contribution is quantized once, so the per-source total is
    an exact BIGINT sum) — sources feeding one language score 0,
    balanced multilingual feeds score ln(k). The mixture-monitoring
    stat a multilingual curation run tracks per crawl."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("source")
    with_tot = cells.withColumn("t", F.sum("c").over(w))
    contrib = with_tot.withColumn(
        "e_x1m",
        F.expr(
            "CAST(ROUND(-LN(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))"
            " * (CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000) AS BIGINT)"
        ),
    )
    return contrib.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_langs"),
        F.max("t").alias("n_docs"),
        F.sum("e_x1m").cast("bigint").alias("lang_entropy_x1m"),
    )


SQL_TEXT_SOURCE_DIVERSITY = """
WITH cells AS (
    SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY source, lang
),
with_tot AS (
    SELECT source, lang, c, SUM(c) OVER (PARTITION BY source) AS t FROM cells
)
SELECT source,
       COUNT(*) AS n_langs,
       CAST(MAX(t) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(ROUND(-LN(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                           * (CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                           * 1000000) AS BIGINT)) AS BIGINT) AS lang_entropy_x1m
FROM with_tot
GROUP BY source
"""


def q_text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical novelty per document: the share of token INSTANCES that
    are corpus hapax legomena (corpus frequency 1) — high hapax density
    flags OCR noise / mojibake / random strings, near-zero flags
    templated text; a vocabulary-level companion to the shingle-based
    ngram novelty. One token groupBy builds the (vocabulary-sized)
    frequency table; the per-doc roll-up is an integer micro-ratio."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.tokens("text")).alias("term"))
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    return (
        tok.join(tf, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("c") == 1).cast("bigint")).alias("n_hapax"),
            F.expr(
                "CAST(SUM(CAST(c = 1 AS BIGINT)) * 1000000 DIV COUNT(1) AS BIGINT)"
            ).alias("hapax_x1m"),
        )
    )


SQL_TEXT_HAPAX_RATIO = f"""
WITH tok AS (
    SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents
),
tf AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
           AS hapax_x1m
FROM tok JOIN tf USING (term)
GROUP BY doc_id
"""


#: Ensemble-gate thresholds (integer micro-units; pinned so both
#: engines evaluate the identical literals).
ENSEMBLE_SURPRISAL_LO = 3_000_000
ENSEMBLE_SURPRISAL_HI = 8_000_000
ENSEMBLE_MIN_STOPWORD_X1M = 10_000
ENSEMBLE_MIN_TOKENS = 10


def q_text_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality gate: the keep/drop decision a production
    curation run makes from SEVERAL weak signals at once — unigram-LM
    surprisal inside a sane band (too low = boilerplate, too high =
    noise), stopword density above a floor, and a minimum length. All
    three signals are integer micro-units, so the gate is a pure
    integer predicate — bit-identical on any engine, no float
    thresholds to drift. One join between the surprisal view and the
    narrow stats pass."""
    surp = q_text_surprisal(spark, sf_dir)
    stats = (
        load_table(spark, sf_dir, "documents")
        .transform(X.with_text_stats())
        .filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            F.expr("CAST((n_stopwords * 1000000) DIV n_tokens AS BIGINT)").alias(
                "stopword_x1m"
            ),
        )
    )
    j = surp.join(stats, "doc_id")
    keep = (
        F.col("mean_surprisal_x1m").between(
            ENSEMBLE_SURPRISAL_LO, ENSEMBLE_SURPRISAL_HI
        )
        & (F.col("stopword_x1m") >= ENSEMBLE_MIN_STOPWORD_X1M)
        & (F.col("n_tokens") >= ENSEMBLE_MIN_TOKENS)
    )
    return j.select(
        "doc_id",
        "n_tokens",
        "mean_surprisal_x1m",
        "stopword_x1m",
        keep.cast("int").alias("keep"),
    )


def _sql_text_quality_ensemble() -> str:
    stops = "|".join(X.EN_STOPWORDS)
    return f"""
WITH tok AS (
    SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents
),
tf AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
total AS (SELECT SUM(c) AS t FROM tf),
terms AS (
    SELECT term,
           CAST(ROUND(-LN(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000) AS BIGINT)
               AS s_x1m
    FROM tf CROSS JOIN total
),
surp AS (
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(s_x1m) // COUNT(*) AS BIGINT) AS mean_surprisal_x1m
    FROM tok JOIN terms USING (term)
    GROUP BY doc_id
),
stats AS (
    SELECT doc_id,
           CAST((CAST(len(regexp_extract_all(lower(text), '\\b({stops})\\b')) AS BIGINT)
                 * 1000000) // CAST(len({TOKS_SQL}) AS BIGINT) AS BIGINT) AS stopword_x1m
    FROM documents
    WHERE len({TOKS_SQL}) > 0
)
SELECT s.doc_id, s.n_tokens, s.mean_surprisal_x1m, st.stopword_x1m,
       CAST(CASE WHEN s.mean_surprisal_x1m BETWEEN {ENSEMBLE_SURPRISAL_LO} AND {ENSEMBLE_SURPRISAL_HI}
                  AND st.stopword_x1m >= {ENSEMBLE_MIN_STOPWORD_X1M}
                  AND s.n_tokens >= {ENSEMBLE_MIN_TOKENS}
                 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM surp s JOIN stats st USING (doc_id)
"""


#: Fixed synchronous LPA iterations (unrolled identically in the
#: oracle SQL — a convergence loop would not be SQL-expressible).
LPA_ITERS = 3


def q_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the near-dup graph
    (Raghavan et al. 2007), deterministic variant: LPA_ITERS
    synchronous rounds, each vertex adopting its neighbors' most
    frequent label with ties broken toward the smaller label — the
    soft-clustering complement to connected components (CC merges
    everything reachable; LPA splits chains bridged by a single weak
    edge). Per round: one join on the vertex + one grouped count + one
    per-vertex window — all keyed on the vertex, so the partitioning
    is reused; the graph is the band-cap-bounded candidate edge list."""
    e = (
        _minhash_pairs_cached(spark, sf_dir)
        .filter(F.col("est_jaccard") >= CLUSTER_EDGE_MIN)
        .select("d1", "d2")
    )
    und = (
        e.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .unionByName(e.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("a").alias("v")).distinct().withColumn(
        "label", F.col("v")
    )
    w = Window.partitionBy("v").orderBy(F.desc("c"), "nl")
    for _ in range(LPA_ITERS):
        labels = (
            und.join(labels, und["b"] == labels["v"])
            .select(F.col("a").alias("v"), F.col("label").alias("nl"))
            .groupBy("v", "nl")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("v", F.col("nl").alias("label"))
        )
    return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("community"))


def _sql_graph_communities() -> str:
    steps = []
    prev = "l0"
    for i in range(1, LPA_ITERS + 1):
        steps.append(
            f"""l{i} AS (
    SELECT v, nl AS label FROM (
        SELECT u.a AS v, l.label AS nl, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY u.a
                                  ORDER BY COUNT(*) DESC, l.label) AS rk
        FROM und u JOIN {prev} l ON u.b = l.v
        GROUP BY u.a, l.label
    ) WHERE rk = 1
)"""
        )
        prev = f"l{i}"
    joined = ",\n".join(steps)
    return f"""
WITH {_MINHASH_SIMS_CTES},
e AS (SELECT d1, d2 FROM sims WHERE est_jaccard >= {CLUSTER_EDGE_MIN}),
und AS (SELECT d1 AS a, d2 AS b FROM e UNION SELECT d2, d1 FROM e),
verts AS (SELECT DISTINCT a AS v FROM und),
l0 AS (SELECT v, v AS label FROM verts),
{joined}
SELECT v AS doc_id, label AS community FROM {prev}
"""


def q_sim_pair_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-threshold tuning data: the distribution of semantic
    pair cosines in 0.05 bands (from the materialized >= 0.45 pair
    table) with per-band same-label agreement — the two columns you
    plot to pick a dedup threshold (volume vs purity per band)."""
    pairs = _semantic_pairs_cached(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    l1 = emb.select(F.col("vec_id").alias("id1"), F.col("label").alias("label1"))
    l2 = emb.select(F.col("vec_id").alias("id2"), F.col("label").alias("label2"))
    j = pairs.join(F.broadcast(l1), "id1").join(F.broadcast(l2), "id2")
    band = F.floor(F.col("cos_sim") * 20).cast("long")  # 0.05-wide bands
    return (
        j.withColumn("band", band)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr(
                "CAST(SUM(CAST(label1 = label2 AS BIGINT)) * 1000000"
                " DIV COUNT(1) AS BIGINT)"
            ).alias("same_label_x1m"),
        )
        .select(
            "band",
            F.round(F.col("band") / 20.0, 2).alias("band_lo"),
            "n_pairs",
            "same_label_x1m",
        )
    )


def _sql_sim_pair_histogram() -> str:
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
    SELECT a.vec_id AS id1, a.label AS label1, b.vec_id AS id2, b.label AS label2,
           ROUND({S.cosine_sql('a.v', 'b.v')}, 6) AS cos
    FROM e a, e b
    WHERE a.vec_id < b.vec_id
      AND ROUND({S.cosine_sql('a.v', 'b.v')}, 6) >= 0.45
)
SELECT CAST(FLOOR(cos * 20) AS BIGINT) AS band,
       ROUND(CAST(FLOOR(cos * 20) AS BIGINT) / 20.0, 2) AS band_lo,
       COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN label1 = label2 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS same_label_x1m
FROM pairs
GROUP BY band
"""


def q_sim_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table HEALTH PROFILE per label: vector count,
    dimension consistency (distinct dims — anything but 1 means a
    broken encoder batch), zero-vector count (failed inference rows),
    and the norm distribution (min / exact-decimal mean / max of the
    L2 norm) — the ANALYZE pass for a vector column, run before any
    index build trusts the data. One narrow pass: per-vector norm is a
    fold over the array (no explode, no shuffle until the tiny
    per-label rollup); norms are rounded to 6 then summed through
    DECIMAL(18,6) so the mean is order-independent and bit-identical
    across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm2 = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    v = emb.select(
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(norm2), 6).alias("nrm"),
    )
    return v.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.count_distinct(F.col("dim")).alias("n_dims"),
        F.sum((F.col("nrm") == 0).cast("long")).alias("n_zero"),
        F.min("nrm").alias("min_norm"),
        F.round(
            F.sum(F.col("nrm").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_norm"),
        F.max("nrm").alias("max_norm"),
    )


SQL_SIM_EMBEDDING_PROFILE = """
WITH v AS (
    SELECT label, len(embedding) AS dim,
           ROUND(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
    FROM embeddings
)
SELECT label,
       COUNT(*) AS n_vecs,
       COUNT(DISTINCT dim) AS n_dims,
       CAST(COUNT(*) FILTER (WHERE nrm = 0) AS BIGINT) AS n_zero,
       MIN(nrm) AS min_norm,
       ROUND(CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
           AS avg_norm,
       MAX(nrm) AS max_norm
FROM v GROUP BY label
"""


def q_sim_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding statistics: mean and variance of every
    vector coordinate (plus its min/max), exact — the feature-health
    view behind whitening decisions, dead-dimension detection (var ~ 0
    = the encoder never uses the coordinate) and the diagonal of the
    covariance a PCA/whitening step starts from. One posexplode ->
    one 64-group aggregate; sums go through DECIMAL(38,12) (float32
    coordinates are exact in 12 fractional digits), so mean and
    variance are order-independent and engine-identical; the final
    two divisions are scalar IEEE on identical operands, rounded 9."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("dim", "x")).select(
        "dim", F.col("x").cast("double").alias("x")
    )
    agg = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,12)")).cast("double").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).cast("double").alias("sxx"),
        F.round(F.min("x"), 6).alias("min_x"),
        F.round(F.max("x"), 6).alias("max_x"),
    )
    return agg.select(
        "dim",
        "n",
        F.round(F.col("sx") / F.col("n"), 9).alias("mean_x"),
        F.round(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n"), 9
        ).alias("var_x"),
        "min_x",
        "max_x",
    )


SQL_SIM_DIMENSION_STATS = """
WITH ex AS (
    SELECT generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
),
agg AS (
    SELECT dim, COUNT(*) AS n,
           CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
           ROUND(MIN(x), 6) AS min_x,
           ROUND(MAX(x), 6) AS max_x
    FROM ex GROUP BY dim
)
SELECT CAST(dim AS INTEGER) AS dim, n,
       ROUND(sx / n, 9) AS mean_x,
       ROUND((sxx - sx * sx / n) / n, 9) AS var_x,
       min_x, max_x
FROM agg
"""


def q_sim_domain_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift by document source: cosine of each
    source's mean embedding against the global mean — the one-query
    probe for "which domain's vectors sit away from the corpus center"
    (domain shift / contamination triage on the semantic side,
    complementing text_domain_divergence's token-level chi-square).
    Vectors join documents on doc_id (= vec_id in this corpus); both
    centroid levels come from one posexplode + groupBy with
    DECIMAL-exact component sums, so every centroid is bit-stable
    under any partitioning; the final cosine is O(sources x dim)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ex = emb.join(docs, emb["vec_id"] == docs["doc_id"]).select(
        "source", F.posexplode(S.as_double_array("embedding")).alias("pos", "x")
    )
    per_src = ex.groupBy("source", "pos").agg(
        F.sum(F.col("x").cast("decimal(30,12)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    comp = per_src.select(
        "source",
        "pos",
        (F.col("s").cast("double") / F.col("n")).alias("c"),
        "n",
    )
    # global centroid: 64 rows — bounded metadata collect, inlined as a
    # literal array so the per-source cosine is a sequential array fold
    # (deterministic evaluation order; a groupBy SUM of doubles would
    # be partition-order sensitive)
    glob_rows = (
        per_src.groupBy("pos")
        .agg((F.sum("s").cast("double") / F.sum("n")).alias("g"))
        .collect()
    )
    g_sorted = [r["g"] for r in sorted(glob_rows, key=lambda r: r["pos"])]
    g_arr = F.array(*[F.lit(v) for v in g_sorted])
    src_arr = comp.groupBy("source").agg(
        F.max("n").alias("n_vecs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda st: st["c"]
        ).alias("cv"),
    )
    return src_arr.select(
        "source",
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        F.round(S.cosine(F.col("cv"), g_arr), 6).alias("cos_to_global"),
    )


SQL_SIM_DOMAIN_DRIFT = f"""
WITH ex AS (
    SELECT d.source,
           CAST(unnest(e.embedding) AS DOUBLE) AS x,
           generate_subscripts(e.embedding, 1) AS pos
    FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
),
per_src AS (
    SELECT source, pos,
           SUM(CAST(x AS DECIMAL(30,12))) AS s,
           COUNT(*) AS n
    FROM ex GROUP BY source, pos
),
comp AS (
    SELECT source, pos, CAST(s AS DOUBLE) / n AS c, n FROM per_src
),
srcarr AS (
    SELECT source, CAST(MAX(n) AS BIGINT) AS n_vecs,
           list(c ORDER BY pos) AS cv
    FROM comp GROUP BY source
),
globarr AS (
    SELECT list(g ORDER BY pos) AS gv FROM (
        SELECT pos, CAST(SUM(s) AS DOUBLE) / SUM(n) AS g
        FROM per_src GROUP BY pos
    )
)
SELECT s.source, s.n_vecs,
       ROUND({S.cosine_sql('s.cv', 'ga.gv')}, 6) AS cos_to_global
FROM srcarr s CROSS JOIN globarr ga
"""


def q_sketch_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY as an oracle-checked property: two
    independently-built per-half histogram sketches (order-key parity
    split) merge by cellwise addition, and the quantile estimates read
    off the MERGED sketch — the distributed-combine contract every
    bounded-state sketch rests on (build per partition/day/shard, merge
    cheaply, estimate once). Windows are partitioned by order status;
    every shuffle payload is bounded by bins-per-group, never rows."""
    from pyspark.sql.window import Window as W

    bw = 1000.0
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        (F.col("o_orderkey") % 2).alias("half"),
        F.floor(F.col("o_totalprice") / F.lit(bw)).cast("long").alias("bin"),
    )
    # per-half sketches built separately, then cellwise merge
    halves = orders.groupBy("o_orderstatus", "half", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    merged = halves.groupBy("o_orderstatus", "bin").agg(F.sum("cnt").alias("cnt"))
    wc = W.partitionBy("o_orderstatus").orderBy("bin")
    wt = W.partitionBy("o_orderstatus")
    h2 = merged.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "total", F.sum("cnt").over(wt)
    )
    aggs = [F.max("total").alias("n_rows")]
    for q in (0.5, 0.95, 0.99):
        t = F.lit(q) * F.col("total")
        est = F.round(
            F.col("bin") * F.lit(bw)
            + F.lit(bw) * (t - (F.col("cum") - F.col("cnt"))) / F.col("cnt"),
            6,
        )
        sel = ((F.col("cum") - F.col("cnt")) < t) & (t <= F.col("cum"))
        aggs.append(F.max(F.when(sel, est)).alias(f"p{int(q * 100)}_est"))
    return h2.groupBy("o_orderstatus").agg(*aggs)


SQL_SKETCH_HISTOGRAM_MERGE = """
WITH halves AS (
    SELECT o_orderstatus, o_orderkey % 2 AS half,
           CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS bin,
           COUNT(*) AS cnt
    FROM orders GROUP BY o_orderstatus, half, bin
),
merged AS (
    SELECT o_orderstatus, bin, CAST(SUM(cnt) AS BIGINT) AS cnt
    FROM halves GROUP BY o_orderstatus, bin
),
h2 AS (
    SELECT o_orderstatus, bin, cnt,
           CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus ORDER BY bin) AS BIGINT) AS cum,
           CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS total
    FROM merged
)
SELECT o_orderstatus, CAST(MAX(total) AS BIGINT) AS n_rows,
       MAX(CASE WHEN ((cum - cnt) < (0.5 * total) AND (0.5 * total) <= cum)
           THEN ROUND(bin * 1000.0 + 1000.0 * ((0.5 * total) - (cum - cnt)) / cnt, 6) END) AS p50_est,
       MAX(CASE WHEN ((cum - cnt) < (0.95 * total) AND (0.95 * total) <= cum)
           THEN ROUND(bin * 1000.0 + 1000.0 * ((0.95 * total) - (cum - cnt)) / cnt, 6) END) AS p95_est,
       MAX(CASE WHEN ((cum - cnt) < (0.99 * total) AND (0.99 * total) <= cum)
           THEN ROUND(bin * 1000.0 + 1000.0 * ((0.99 * total) - (cum - cnt)) / cnt, 6) END) AS p99_est
FROM h2 GROUP BY o_orderstatus
"""


def q_sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive training: per anchor
    vector, the top-3 most-similar vectors carrying a DIFFERENT gold
    label — the "close but wrong" examples a contrastive or reranker
    trainer needs most (easy negatives teach nothing; in-batch random
    negatives are mostly easy). Mined from the session-materialized
    cosine-threshold pair table (only pairs >= 0.45 qualify as hard),
    so the cost beyond the cached kernel is: direction-doubling
    (narrow), two broadcast label joins, and a per-anchor rank window
    — parallel across anchors, never global."""
    pairs = _semantic_pairs_cached(spark, sf_dir)
    both = pairs.select(
        F.col("id1").alias("anchor_id"), F.col("id2").alias("negative_id"), "cos_sim"
    ).unionByName(
        pairs.select(
            F.col("id2").alias("anchor_id"), F.col("id1").alias("negative_id"), "cos_sim"
        )
    )
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    la = emb.select(F.col("vec_id").alias("anchor_id"), F.col("label").alias("anchor_label"))
    ln = emb.select(
        F.col("vec_id").alias("negative_id"), F.col("label").alias("negative_label")
    )
    hard = (
        both.join(F.broadcast(la), "anchor_id")
        .join(F.broadcast(ln), "negative_id")
        .filter(F.col("anchor_label") != F.col("negative_label"))
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos_sim"), "negative_id")
    return (
        hard.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select(
            "anchor_id", "negative_id", "anchor_label", "negative_label", "cos_sim", "rk"
        )
    )


def _sql_sim_hard_negatives() -> str:
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cand AS (
    SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
           a.label AS anchor_label, b.label AS negative_label,
           ROUND({S.cosine_sql('a.v', 'b.v')}, 6) AS cos_sim
    FROM e a, e b
    WHERE a.vec_id <> b.vec_id AND a.label <> b.label
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                 ORDER BY cos_sim DESC, negative_id) AS rk
    FROM cand WHERE cos_sim >= 0.45
)
SELECT anchor_id, negative_id, anchor_label, negative_label, cos_sim,
       CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 3
"""


def q_sim_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIPLET MINING: one (anchor, positive, negative) row per anchor
    that has both — positive = its most-similar SAME-label vector,
    negative = its most-similar DIFFERENT-label vector (both from the
    cached >= 0.45 pair table, so the negative is hard by
    construction), plus the margin (pos_cos - neg_cos) in integer
    micro-units: the margin distribution is exactly what you inspect
    to set a triplet-loss margin. Anchors whose hardest negative beats
    their best positive show up with a NEGATIVE margin — the
    label-noise suspects. Same cached-kernel + broadcast-label +
    per-anchor-window shape as sim_hard_negatives; the extra cost is
    one self-join of two one-row-per-anchor tables."""
    pairs = _semantic_pairs_cached(spark, sf_dir)
    both = pairs.select(
        F.col("id1").alias("anchor_id"), F.col("id2").alias("other_id"), "cos_sim"
    ).unionByName(
        pairs.select(
            F.col("id2").alias("anchor_id"), F.col("id1").alias("other_id"), "cos_sim"
        )
    )
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    la = emb.select(F.col("vec_id").alias("anchor_id"), F.col("label").alias("anchor_label"))
    lo = emb.select(F.col("vec_id").alias("other_id"), F.col("label").alias("other_label"))
    lab = both.join(F.broadcast(la), "anchor_id").join(F.broadcast(lo), "other_id")
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos_sim"), "other_id")
    pos = (
        lab.filter(F.col("anchor_label") == F.col("other_label"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "anchor_id",
            "anchor_label",
            F.col("other_id").alias("positive_id"),
            F.col("cos_sim").alias("pos_cos"),
        )
    )
    neg = (
        lab.filter(F.col("anchor_label") != F.col("other_label"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "anchor_id",
            F.col("other_id").alias("negative_id"),
            F.col("cos_sim").alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "anchor_label",
        "positive_id",
        "negative_id",
        "pos_cos",
        "neg_cos",
        F.expr("CAST(ROUND((pos_cos - neg_cos) * 1000000) AS BIGINT)").alias(
            "margin_x1m"
        ),
    )


def _sql_sim_triplets() -> str:
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cand AS (
    SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
           b.vec_id AS other_id, b.label AS other_label,
           ROUND({S.cosine_sql('a.v', 'b.v')}, 6) AS cos_sim
    FROM e a, e b WHERE a.vec_id <> b.vec_id
),
hard AS (SELECT * FROM cand WHERE cos_sim >= 0.45),
pos AS (
    SELECT anchor_id, anchor_label, other_id AS positive_id, cos_sim AS pos_cos
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                       ORDER BY cos_sim DESC, other_id) AS rk
          FROM hard WHERE anchor_label = other_label)
    WHERE rk = 1
),
neg AS (
    SELECT anchor_id, other_id AS negative_id, cos_sim AS neg_cos
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                       ORDER BY cos_sim DESC, other_id) AS rk
          FROM hard WHERE anchor_label <> other_label)
    WHERE rk = 1
)
SELECT anchor_id, anchor_label, positive_id, negative_id, pos_cos, neg_cos,
       CAST(ROUND((pos_cos - neg_cos) * 1000000) AS BIGINT) AS margin_x1m
FROM pos JOIN neg USING (anchor_id)
"""


def q_sim_pair_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space homogeneity audit: of all cosine-threshold
    pairs, how many connect vectors with the SAME gold label — the
    pair-level purity number that tells you whether a similarity
    threshold is tight enough to drive semantic dedup before any
    clustering runs. Consumes the session-materialized semantic pair
    table; two broadcast label lookups; one global count row."""
    pairs = _semantic_pairs_cached(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    l1 = emb.select(F.col("vec_id").alias("id1"), F.col("label").alias("label1"))
    l2 = emb.select(F.col("vec_id").alias("id2"), F.col("label").alias("label2"))
    joined = pairs.join(F.broadcast(l1), "id1").join(F.broadcast(l2), "id2")
    return joined.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("label1") == F.col("label2")).cast("bigint")).alias("n_same_label"),
        F.expr(
            "CAST(SUM(CAST(label1 = label2 AS BIGINT)) * 1000000 DIV COUNT(1) AS BIGINT)"
        ).alias("agreement_x1m"),
    )


def _sql_sim_pair_label_agreement() -> str:
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
    SELECT a.vec_id AS id1, a.label AS label1, b.vec_id AS id2, b.label AS label2
    FROM e a, e b
    WHERE a.vec_id < b.vec_id
      AND ROUND({S.cosine_sql('a.v', 'b.v')}, 6) >= 0.45
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN label1 = label2 THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label,
       CAST(SUM(CASE WHEN label1 = label2 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS agreement_x1m
FROM pairs
"""


#: Bounded per-(session, sf_dir) centroid cache: FIFO-capped so a
#: long-lived driver process cycling many sessions/sf_dirs cannot
#: accumulate stale entries, and wired into SH.clear() so session
#: teardown reclaims it alongside the DataFrame memo.
_CENTROID_MEMO_MAX = 8
_centroid_memo: "OrderedDict[tuple, dict[int, list[float]]]" = OrderedDict()
SH.on_clear(_centroid_memo.clear)


def _label_centroids_cached(spark: SparkSession, sf_dir: str) -> dict[int, list[float]]:
    """Per-label mean centroid vectors, computed once per (session,
    sf_dir) — the "trained model" of the nearest-centroid classifier.
    DECIMAL-exact component sums make each component deterministic
    under any partitioning; the O(labels x dim) result is a bounded
    metadata collect (the same driver-side literal-matrix pattern as
    IVF's centroids)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _centroid_memo:
        return _centroid_memo[key]
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(S.as_double_array("embedding")).alias("pos", "x")
    )
    cen_rows = (
        ex.groupBy("label", "pos")
        .agg(F.sum(F.col("x").cast("decimal(30,12)")).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_label: dict[int, dict[int, float]] = {}
    for r in cen_rows:
        by_label.setdefault(r["label"], {})[r["pos"]] = float(r["s"]) / r["n"]
    cents = {
        lab: [by_label[lab][p] for p in range(len(by_label[lab]))]
        for lab in sorted(by_label)
    }
    _centroid_memo[key] = cents
    while len(_centroid_memo) > _CENTROID_MEMO_MAX:
        _centroid_memo.popitem(last=False)
    return cents


def q_sim_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification audit over the embedding corpus:
    per-label mean centroids (DECIMAL-exact component sums, so the
    centroid is bit-identical under any partitioning), then every
    vector is assigned to its max-cosine centroid and counted against
    its gold label — the confusion matrix that turns "are my embedding
    clusters any good" into one query.

    Scale shape: the centroid aggregation is a posexplode + groupBy
    (label, dim) — map-side combinable, output O(labels x dim). The
    tiny centroid table is collected driver-side (bounded metadata
    collect, same pattern as IVF's literal centroid matrix) and inlined
    as literals, so the assignment pass is a NARROW map over the corpus
    — zero shuffle, no per-row join."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _label_centroids_cached(spark, sf_dir)
    labels = sorted(cents)
    v = S.as_double_array("embedding")
    scored = F.array(
        *[
            F.struct(
                F.round(S.cosine(v, F.array(*[F.lit(w) for w in cents[lab]])), 6).alias(
                    "cos"
                ),
                F.lit(-lab).alias("neg_label"),
            )
            for lab in labels
        ]
    )
    assigned = emb.select(
        "label", (-F.array_max(scored)["neg_label"]).cast("int").alias("assigned_label")
    )
    return assigned.groupBy(
        F.col("label").alias("gold_label"), "assigned_label"
    ).agg(F.count(F.lit(1)).alias("n_vecs"))


def _sql_sim_centroid_confusion() -> str:
    dim = 64
    return f"""
WITH ex AS (
    SELECT label,
           CAST(unnest(embedding) AS DOUBLE) AS x,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
),
cen AS (
    SELECT label, pos,
           CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS c
    FROM ex GROUP BY label, pos
),
cenarr AS (
    SELECT label AS c_label, list(c ORDER BY pos) AS cvec FROM cen GROUP BY label
),
scored AS (
    SELECT e.vec_id, e.label, c.c_label,
           ROUND(
               list_sum(list_transform(range(1, {dim + 1}),
                   i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i]))
               / (sqrt(list_sum(list_transform(range(1, {dim + 1}),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, {dim + 1}),
                      i -> c.cvec[i] * c.cvec[i])))),
               6) AS cos
    FROM embeddings e CROSS JOIN cenarr c
),
assigned AS (
    SELECT vec_id, label, c_label,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_label) AS rk
    FROM scored
)
SELECT label AS gold_label,
       CAST(c_label AS INTEGER) AS assigned_label,
       COUNT(*) AS n_vecs
FROM assigned WHERE rk = 1
GROUP BY label, c_label
"""


def q_text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal score per document — the CCNet-style
    perplexity proxy curation pipelines bucket corpora by (docs whose
    tokens are globally rare read as noise; ultra-low surprisal reads
    as boilerplate). Per-TERM surprisal -ln(c/T) is quantized to
    integer micro-nats once on the (small) vocabulary table, so the
    per-doc aggregation is an exact BIGINT sum — order-independent,
    no float accumulation over the corpus. Shape: one token groupBy
    (map-side combine), a broadcast scalar total, one join back on the
    term, one doc groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.tokens("text")).alias("term"))
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = tf.agg(F.sum("c").alias("t"))
    terms = tf.crossJoin(F.broadcast(total)).select(
        "term",
        F.expr("CAST(ROUND(-LN(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000) AS BIGINT)")
        .alias("s_x1m"),
    )
    return (
        tok.join(terms, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("CAST(SUM(s_x1m) DIV COUNT(1) AS BIGINT)").alias("mean_surprisal_x1m"),
        )
    )


SQL_TEXT_SURPRISAL = f"""
WITH tok AS (
    SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents
),
tf AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
total AS (SELECT SUM(c) AS t FROM tf),
terms AS (
    SELECT term,
           CAST(ROUND(-LN(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000) AS BIGINT)
               AS s_x1m
    FROM tf CROSS JOIN total
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(s_x1m) // COUNT(*) AS BIGINT) AS mean_surprisal_x1m
FROM tok JOIN terms USING (term)
GROUP BY doc_id
"""


def q_dedup_est_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: MinHash-estimated Jaccard vs TRUE n-gram
    Jaccard on every LSH candidate pair — the calibration report that
    tells you whether 16 hashes are enough before trusting the cheap
    estimate at corpus scale. Joins the two session-materialized pair
    tables (signatures' est_jaccard, posting-counts' exact jaccard);
    candidates without any surviving common shingle score a true
    jaccard of 0. Error stats are integer micro-units (BIGINT sums —
    order-independent)."""
    est = _minhash_pairs_cached(spark, sf_dir)
    true_j = D.jaccard_from_counts(_posting_counts_cached(spark, sf_dir), threshold=0.0)
    joined = est.join(true_j, ["d1", "d2"], "left").select(
        "d1",
        "d2",
        "est_jaccard",
        F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("true_jaccard"),
    )
    err = F.expr("CAST(ROUND(ABS(est_jaccard - true_jaccard) * 1000000) AS BIGINT)")
    return joined.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum((F.col("est_jaccard") >= F.col("true_jaccard")).cast("bigint")).alias(
            "n_overestimates"
        ),
        F.expr(
            "CAST(SUM(CAST(ROUND(ABS(est_jaccard - true_jaccard) * 1000000) AS BIGINT))"
            " DIV COUNT(1) AS BIGINT)"
        ).alias("mean_abs_err_x1m"),
        F.max(err).alias("max_abs_err_x1m"),
    )


SQL_DEDUP_EST_CALIBRATION = f"""
WITH {_MINHASH_SIMS_CTES},
shc AS (
    SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh
    ) WHERE df <= {JACCARD_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
    FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
truej AS (
    SELECT d1, d2,
           ROUND(CAST(c AS DOUBLE) / (s1.n + s2.n - c), 6) AS true_jaccard
    FROM common
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
),
joined AS (
    SELECT s.d1, s.d2, s.est_jaccard, COALESCE(t.true_jaccard, 0.0) AS true_jaccard
    FROM sims s LEFT JOIN truej t ON s.d1 = t.d1 AND s.d2 = t.d2
)
SELECT COUNT(*) AS n_candidates,
       CAST(SUM(CASE WHEN est_jaccard >= true_jaccard THEN 1 ELSE 0 END) AS BIGINT)
           AS n_overestimates,
       CAST(SUM(CAST(ROUND(ABS(est_jaccard - true_jaccard) * 1000000) AS BIGINT))
            // COUNT(*) AS BIGINT) AS mean_abs_err_x1m,
       MAX(CAST(ROUND(ABS(est_jaccard - true_jaccard) * 1000000) AS BIGINT))
           AS max_abs_err_x1m
FROM joined
"""


def q_sim_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over TRAINED cells: the per-label mean centroids
    (decimal-exact, collected once per session — see
    _label_centroids_cached) play the role k-means cluster centers play
    in a production IVF index, replacing sim_ivf_topk's deterministic
    pseudo-random cells. Assignment and probe selection are NARROW
    literal-matrix expressions (zero shuffle over the corpus); probes
    broadcast onto the cell equi-join; exact cosine re-rank per query.
    Ranking ties break toward the smaller cell/neighbor id on both
    engines."""
    cents = _label_centroids_cached(spark, sf_dir)
    labels = sorted(cents)
    emb = load_table(spark, sf_dir, "embeddings")
    v = S.as_double_array("embedding")
    scored = F.array(
        *[
            F.struct(
                S.dot(v, F.array(*[F.lit(w) for w in cents[lab]])).alias("d"),
                F.lit(-lab).alias("nc"),
            )
            for lab in labels
        ]
    )
    corpus = emb.select(
        "vec_id",
        "embedding",
        (-F.array_max(scored)["nc"]).cast("int").alias("cell"),
    )
    top2 = F.slice(F.reverse(F.array_sort(scored)), 1, 2)
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(F.transform(top2, lambda s: (-s["nc"]).cast("int"))).alias("cell"),
    )
    cand = F.broadcast(probes).join(corpus, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    rescored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(S.cosine(S.as_double_array("q_emb"), v), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rk").cast("int").alias("rk"))
    )


def _sql_sim_ivf_trained() -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (
    SELECT label,
           CAST(unnest(embedding) AS DOUBLE) AS x,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
),
cen AS (
    SELECT label, pos,
           CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS c
    FROM ex GROUP BY label, pos
),
cenarr AS (
    SELECT label AS cell, list(c ORDER BY pos) AS cv FROM cen GROUP BY label
),
cd AS (
    SELECT e.vec_id, cells.cell,
           list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * cells.cv[i])) AS d
    FROM e CROSS JOIN cenarr cells
),
assign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd) WHERE r = 1
),
probes AS (
    SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd WHERE vec_id < 10) WHERE r <= 2
),
scored AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           ROUND({S.cosine_sql('q.v', 'c.v')}, 6) AS cos_sim
    FROM probes p
    JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
    JOIN e q ON q.vec_id = p.query_id
    JOIN e c ON c.vec_id = a.vec_id
)
SELECT query_id, neighbor_id, cos_sim,
       CAST(rk AS INTEGER) AS rk
FROM (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
    FROM scored
) WHERE rk <= 5
"""


QUERIES = {
    "text_stats": q_text_stats,
    "text_surprisal": q_text_surprisal,
    "sim_ivf_trained": q_sim_ivf_trained,
    "dedup_est_calibration": q_dedup_est_calibration,
    "text_lang_summary": q_text_lang_summary,
    "text_fingerprint": q_text_fingerprint,
    "text_quality_filter": q_text_quality_filter,
    "text_quality_calibrated": q_text_quality_calibrated,
    "text_split_assign": q_text_split_assign,
    "text_length_histogram": q_text_length_histogram,
    "text_pack_assign": q_text_pack_assign,
    "text_top_trigrams": q_text_top_trigrams,
    "dedup_exact": q_dedup_exact,
    "dedup_normalized": q_dedup_normalized,
    "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
    "dedup_tfidf_cosine": q_dedup_tfidf_cosine,
    "dedup_containment": q_dedup_containment,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_threshold_sweep": q_dedup_threshold_sweep,
    "dedup_incremental": q_dedup_incremental,
    "corpus_snapshot_diff": q_corpus_snapshot_diff,
    "dedup_cross_corpus": q_dedup_cross_corpus,
    "dedup_clusters": q_dedup_clusters,
    "dedup_keep_best": q_dedup_keep_best,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_embedding": q_dedup_embedding,
    "dedup_edit_distance": q_dedup_edit_distance,
    "dedup_ensemble": q_dedup_ensemble,
    "text_weighted_sample": q_text_weighted_sample,
    "text_heavy_tokens": q_text_heavy_tokens,
    "text_contamination": q_text_contamination,
    "text_dup_ngrams": q_text_dup_ngrams,
    "text_langid_eval": q_text_langid_eval,
    "text_curation_pipeline": q_text_curation_pipeline,
    "text_curation_funnel": q_text_curation_funnel,
    "text_ngram_novelty": q_text_ngram_novelty,
    "text_stratified_sample": q_text_stratified_sample,
    "text_weighted_sample": q_text_weighted_sample,
    "text_repetition": q_text_repetition,
    "text_pii_scrub": q_text_pii_scrub,
    "text_tfidf_topterms": q_text_tfidf_topterms,
    "text_domain_divergence": q_text_domain_divergence,
    "text_inverted_index": q_text_inverted_index,
    "text_chunk_windows": q_text_chunk_windows,
    "text_mix_sample": q_text_mix_sample,
    "text_global_shuffle": q_text_global_shuffle,
    "sim_cosine_topk": q_sim_cosine_topk,
    "sim_threshold_pairs": q_sim_threshold_pairs,
    "sim_lsh_buckets": q_sim_lsh_buckets,
    "sim_ivf_topk": q_sim_ivf_topk,
    "sim_knn_graph": q_sim_knn_graph,
    "text_domain_stats": q_text_domain_stats,
    "multimodal_image_features": q_multimodal_image_features,
    "multimodal_frame_digests": q_multimodal_frame_digests,
    "multimodal_audio_features": q_multimodal_audio_features,
    "sketch_kmv_distinct": q_sketch_kmv_distinct,
    "sketch_countmin": q_sketch_countmin,
    "sketch_bloom": q_sketch_bloom,
    "sketch_histogram_quantiles": q_sketch_histogram_quantiles,
    "sketch_hll_distinct": q_sketch_hll_distinct,
    "dedup_topk_neighbors": q_dedup_topk_neighbors,
    "graph_triangles": q_graph_triangles,
    "text_chunk_dedup": q_text_chunk_dedup,
    "sketch_kmv_setops": q_sketch_kmv_setops,
    "sim_centroid_confusion": q_sim_centroid_confusion,
    "dedup_cluster_stats": q_dedup_cluster_stats,
    "text_quality_dup_link": q_text_quality_dup_link,
    "sim_pair_label_agreement": q_sim_pair_label_agreement,
    "sim_hard_negatives": q_sim_hard_negatives,
    "sim_triplets": q_sim_triplets,
    "text_kn_bigram_score": q_text_kn_bigram_score,
    "text_collocations": q_text_collocations,
    "sketch_histogram_merge": q_sketch_histogram_merge,
    "sim_domain_drift": q_sim_domain_drift,
    "sim_embedding_profile": q_sim_embedding_profile,
    "sim_dimension_stats": q_sim_dimension_stats,
    "graph_communities": q_graph_communities,
    "text_quality_ensemble": q_text_quality_ensemble,
    "text_hapax_ratio": q_text_hapax_ratio,
    "text_corpus_health": q_text_corpus_health,
    "sim_lsh_recall": q_sim_lsh_recall,
    "sim_ivf_recall": q_sim_ivf_recall,
    "sim_ivf_nprobe_curve": q_sim_ivf_nprobe_curve,
    "sim_sq8_recall": q_sim_sq8_recall,
    "sim_sq8_topk": q_sim_sq8_topk,
    "sim_pair_histogram": q_sim_pair_histogram,
    "text_source_diversity": q_text_source_diversity,
    "text_vocab_coverage": q_text_vocab_coverage,
    "text_bpe_first_merges": q_text_bpe_first_merges,
    "text_mix_weights": q_text_mix_weights,
}

ORACLES = {
    "text_stats": SQL_TEXT_STATS,
    "text_surprisal": SQL_TEXT_SURPRISAL,
    "sim_ivf_trained": _sql_sim_ivf_trained(),
    "dedup_est_calibration": SQL_DEDUP_EST_CALIBRATION,
    "text_lang_summary": SQL_TEXT_LANG_SUMMARY,
    "text_fingerprint": SQL_TEXT_FINGERPRINT,
    "text_quality_filter": SQL_TEXT_QUALITY_FILTER,
    "text_quality_calibrated": SQL_TEXT_QUALITY_CALIBRATED,
    "text_split_assign": SQL_TEXT_SPLIT,
    "text_length_histogram": SQL_TEXT_LENGTH_HIST,
    "text_pack_assign": SQL_TEXT_PACK,
    "text_top_trigrams": SQL_TEXT_TOP_TRIGRAMS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_normalized": SQL_DEDUP_NORMALIZED,
    "dedup_jaccard_pairs": SQL_DEDUP_JACCARD,
    "dedup_tfidf_cosine": SQL_DEDUP_TFIDF_COSINE,
    "dedup_containment": SQL_DEDUP_CONTAINMENT,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH,
    "dedup_threshold_sweep": _sql_dedup_threshold_sweep(),
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "corpus_snapshot_diff": SQL_CORPUS_SNAPSHOT_DIFF,
    "dedup_cross_corpus": SQL_DEDUP_CROSS_CORPUS,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_simhash_pairs": SQL_DEDUP_SIMHASH_PAIRS,
    "dedup_embedding": SQL_DEDUP_EMBEDDING,
    "dedup_edit_distance": SQL_DEDUP_EDIT_DISTANCE,
    "dedup_ensemble": SQL_DEDUP_ENSEMBLE,
    "text_weighted_sample": SQL_TEXT_WEIGHTED_SAMPLE,
    "text_heavy_tokens": SQL_TEXT_HEAVY_TOKENS,
    "text_contamination": SQL_TEXT_CONTAMINATION,
    "text_dup_ngrams": SQL_TEXT_DUP_NGRAMS,
    "text_langid_eval": SQL_TEXT_LANGID_EVAL,
    "text_curation_pipeline": SQL_TEXT_CURATION_PIPELINE,
    "text_curation_funnel": SQL_TEXT_CURATION_FUNNEL,
    "text_ngram_novelty": SQL_TEXT_NGRAM_NOVELTY,
    "text_stratified_sample": SQL_TEXT_STRATIFIED_SAMPLE,
    "text_weighted_sample": SQL_TEXT_WEIGHTED_SAMPLE,
    "text_repetition": SQL_TEXT_REPETITION,
    "text_pii_scrub": SQL_TEXT_PII_SCRUB,
    "text_tfidf_topterms": SQL_TEXT_TFIDF,
    "text_domain_divergence": SQL_TEXT_DOMAIN_DIVERGENCE,
    "text_inverted_index": SQL_TEXT_INVINDEX,
    "text_chunk_windows": SQL_TEXT_CHUNKS,
    "text_mix_sample": SQL_TEXT_MIX_SAMPLE,
    "text_global_shuffle": SQL_TEXT_GLOBAL_SHUFFLE,
    "sim_cosine_topk": SQL_SIM_TOPK,
    "sim_threshold_pairs": SQL_SIM_THRESHOLD,
    "sim_lsh_buckets": SQL_SIM_LSH,
    "sim_ivf_topk": SQL_SIM_IVF,
    "sim_knn_graph": SQL_SIM_KNN,
    "text_domain_stats": SQL_TEXT_DOMAIN_STATS,
    "multimodal_image_features": SQL_MULTIMODAL_IMAGE,
    "multimodal_frame_digests": SQL_MULTIMODAL_FRAMES,
    "multimodal_audio_features": SQL_MULTIMODAL_AUDIO,
    "sketch_kmv_distinct": _sql_sketch_kmv(),
    "sketch_countmin": _sql_sketch_countmin(),
    "sketch_bloom": _sql_sketch_bloom(),
    "sketch_histogram_quantiles": _sql_sketch_histogram(),
    "sketch_hll_distinct": _sql_sketch_hll(),
    "dedup_topk_neighbors": SQL_DEDUP_TOPK_NEIGHBORS,
    "graph_triangles": SQL_GRAPH_TRIANGLES,
    "text_chunk_dedup": SQL_TEXT_CHUNK_DEDUP,
    "sketch_kmv_setops": _sql_sketch_kmv_setops(),
    "sim_centroid_confusion": _sql_sim_centroid_confusion(),
    "dedup_cluster_stats": SQL_DEDUP_CLUSTER_STATS,
    "text_quality_dup_link": _sql_text_quality_dup_link(),
    "sim_pair_label_agreement": _sql_sim_pair_label_agreement(),
    "sim_hard_negatives": _sql_sim_hard_negatives(),
    "sim_triplets": _sql_sim_triplets(),
    "text_kn_bigram_score": _sql_text_kn_bigram_score(),
    "text_collocations": SQL_TEXT_COLLOCATIONS,
    "sketch_histogram_merge": SQL_SKETCH_HISTOGRAM_MERGE,
    "sim_domain_drift": SQL_SIM_DOMAIN_DRIFT,
    "sim_embedding_profile": SQL_SIM_EMBEDDING_PROFILE,
    "sim_dimension_stats": SQL_SIM_DIMENSION_STATS,
    "graph_communities": _sql_graph_communities(),
    "text_quality_ensemble": _sql_text_quality_ensemble(),
    "text_hapax_ratio": SQL_TEXT_HAPAX_RATIO,
    "text_corpus_health": SQL_TEXT_CORPUS_HEALTH,
    "sim_lsh_recall": SQL_SIM_LSH_RECALL,
    "sim_ivf_recall": SQL_SIM_IVF_RECALL,
    "sim_ivf_nprobe_curve": _sql_sim_ivf_nprobe_curve(),
    "sim_sq8_recall": SQL_SIM_SQ8_RECALL,
    "sim_sq8_topk": SQL_SIM_SQ8_TOPK,
    "sim_pair_histogram": _sql_sim_pair_histogram(),
    "text_source_diversity": SQL_TEXT_SOURCE_DIVERSITY,
    "text_vocab_coverage": _sql_text_vocab_coverage(),
    "text_bpe_first_merges": SQL_TEXT_BPE_FIRST_MERGES,
    "text_mix_weights": SQL_TEXT_MIX_WEIGHTS,
}
