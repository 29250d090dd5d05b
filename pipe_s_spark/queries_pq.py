"""Product-quantization queries: PQ-flat ADC search, the full IVFADC
serving pipeline (coarse cells -> compressed-domain shortlist -> exact
re-rank), the rerank_factor tuning curve, recall evals, and the
codebook-health report. All training/encode/scoring is exact int64
micro-unit arithmetic (functions.similarity.pq_*), replayed
bit-for-bit by unrolled-CTE DuckDB oracles — the kmeans-IVF pattern
extended to sub-codebooks. Split out of queries_sim to keep family
modules under the 2,000-line bar."""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pipe_s_spark.functions import shared as SH
from pipe_s_spark.functions import similarity as S
from pipe_s_spark.sources import load_table

from pipe_s_spark.queries_sim import (
    KMEANS_ITERS,
    _KMEANS_MEMO_MAX,
    _kmeans_index_cached,
)

# --- Product Quantization: PQ-flat ADC and IVF-ADC (the FAISS IVFADC
# --- pipeline, Jegou et al. TPAMI 2011) ------------------------------------

_pq_memo: "OrderedDict[tuple, dict[tuple[int, int], list[int]]]" = OrderedDict()
SH.on_clear(_pq_memo.clear)

#: ADC shortlist size for the IVF-ADC re-rank stage: the compressed-
#: domain scan keeps this many candidates per query before the exact
#: re-rank — the FAISS `k * rerank_factor` convention.
PQ_SHORTLIST = 20


def _pq_books_cached(spark: SparkSession, sf_dir: str) -> dict[tuple[int, int], list[int]]:
    """PQ sub-codebooks (int64 micro-units), trained once per
    (session, sf_dir) by functions.similarity.pq_train_int — the
    in-session stand-in for the persisted codebook table a production
    PQ build ships to every scorer."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _pq_memo:
        return _pq_memo[key]
    emb = load_table(spark, sf_dir, "embeddings")
    books = S.pq_train_int(emb)
    _pq_memo[key] = books
    while len(_pq_memo) > _KMEANS_MEMO_MAX:
        _pq_memo.popitem(last=False)
    return books


def _pq_index_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-materialized PQ-encoded corpus: (vec_id, xq int64
    codes, codes m-byte PQ code, keys per-subspace L2 keys) — the
    encode pass runs once per (session, sf_dir); every consumer
    (ADC scan, recall eval, IVF-ADC, distortion report) reads the
    narrow encoded table, exactly like the persisted code table a
    production index stores (16 codes of 5 bits — ~10 packed bytes —
    vs 256 bytes of float32 here: the compression that makes 100 TB
    of vectors scannable from RAM)."""

    def build() -> DataFrame:
        books = _pq_books_cached(spark, sf_dir)
        emb = load_table(spark, sf_dir, "embeddings")
        return S.pq_encode_table(emb, books)

    return SH.materialized(spark, ("pq_index", sf_dir, S.PQ_ITERS), build)


def q_sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-flat ADC top-k (the FAISS ``IndexPQ`` shape): every corpus
    vector is an m-code product-quantized symbol; each query builds its
    m*k asymmetric-distance LUT ONCE (functions.similarity.pq_lut) and
    scoring a candidate is m integer array lookups — no float math, no
    decode. The crossJoin is the documented compressed-domain scan:
    the broadcast side is the bounded query set (10 LUT rows), the
    corpus side streams map-side over ~10-byte (16x5-bit) codes
    instead of 256-byte vectors. Training/encode/scoring are exact int64, so the unrolled-
    CTE oracle hash-matches bit-for-bit."""
    idx = _pq_index_cached(spark, sf_dir)
    books = _pq_books_cached(spark, sf_dir)
    q = S.pq_lut_table(idx.filter(F.col("vec_id") < 10), books).select(
        F.col("vec_id").alias("query_id"), "lut"
    )
    scored = (
        idx.select("vec_id", "codes")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            S.pq_adc_score(F.col("lut"), F.col("codes")).alias("adc_dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "adc_dot", F.col("rk").cast("int").alias("rk"))
    )


_PQ_ADC_SCORED = f"""
scored AS (
    SELECT qx.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(SUM(list_sum(list_transform(generate_series(1, {S.PQ_SUBDIM}),
                i -> qx.xq[c.sub * {S.PQ_SUBDIM} + i] * b.cv[i]))) AS BIGINT) AS adc_dot
    FROM pq_codes c
    JOIN pq_books b USING (sub, code)
    CROSS JOIN (SELECT vec_id, xq FROM x WHERE vec_id < 10) qx
    WHERE qx.vec_id <> c.vec_id
    GROUP BY 1, 2
)"""


def _sql_sim_pq_topk() -> str:
    return f"""
WITH {S.pq_sql_ctes()},
{_PQ_ADC_SCORED}
SELECT query_id, neighbor_id, adc_dot, CAST(rk AS INTEGER) AS rk FROM (
    SELECT query_id, neighbor_id, adc_dot,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id) AS rk
    FROM scored
) WHERE rk <= 5
"""


def q_sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the PQ-ADC ranking against the exact brute-force
    top-5 — the third leg of the ANN tuning report (LSH buckets / IVF
    cells / PQ codes), quantifying what ~26x compression costs in
    ranking fidelity. The exact side is the same allowlisted broadcast
    brute-force baseline every recall eval here pins."""
    from pipe_s_spark.queries_llm_shared import _exact_topk5_cached

    emb = load_table(spark, sf_dir, "embeddings")
    exact = _exact_topk5_cached(spark, sf_dir)
    adc = q_sim_pq_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(adc, ["query_id", "neighbor_id"], "left")
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


def _sql_sim_pq_recall() -> str:
    return f"""
WITH {S.pq_sql_ctes()},
{_PQ_ADC_SCORED},
adc AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id) AS rk
        FROM scored
    ) WHERE rk <= 5
),
q AS (SELECT * FROM e WHERE vec_id < 10),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ROUND({S.cosine_sql('q.v', 'e.v')}, 6) DESC, e.vec_id) AS rk
        FROM q, e WHERE q.vec_id <> e.vec_id
    ) WHERE rk <= 5
)
SELECT ex.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS recall_x1m
FROM exact ex
LEFT JOIN adc a ON a.query_id = ex.query_id AND a.neighbor_id = ex.neighbor_id
GROUP BY ex.query_id
"""


def q_sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FAISS IVFADC pipeline, oracle-checked end to end:
    k-means coarse cells prune the corpus to the query's nprobe=2
    probed cells (equi-join — never a scan), the PQ-ADC LUT scores the
    survivors in the compressed domain (m integer lookups each), the
    top PQ_SHORTLIST advance, and ONLY the shortlist is re-ranked with
    exact cosine over the full vectors. At 100 TB this is the
    canonical billion-vector serving plan: the index is cells plus
    ~10-byte packed codes (RAM-resident), full-precision vectors are
    touched for k * rerank_factor rows per query, and every stage here
    is the plan-shape the batch queries already pin (narrow
    assignment, broadcast probes, capped windows)."""
    kidx = _kmeans_index_cached(spark, sf_dir)
    pidx = _pq_index_cached(spark, sf_dir)
    books = _pq_books_cached(spark, sf_dir)
    corpus = kidx.select("vec_id", "embedding", "cell").join(
        pidx.select("vec_id", "codes"), "vec_id"
    )
    luts = S.pq_lut_table(pidx.filter(F.col("vec_id") < 10), books)
    queries = (
        kidx.filter(F.col("vec_id") < 10)
        .join(luts, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            "lut",
            F.explode("probe_cells").alias("cell"),
        )
    )
    cand = (
        F.broadcast(queries)
        .join(corpus, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "q_emb",
            F.col("vec_id").alias("neighbor_id"),
            "embedding",
            S.pq_adc_score(F.col("lut"), F.col("codes")).alias("adc_dot"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    short = cand.withColumn("srk", F.row_number().over(w_adc)).filter(
        F.col("srk") <= PQ_SHORTLIST
    )
    rescored = short.select(
        "query_id",
        "neighbor_id",
        F.round(
            S.cosine(S.as_double_array("q_emb"), S.as_double_array("embedding")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rk").cast("int").alias("rk"))
    )


def _sql_sim_ivfpq_topk() -> str:
    return f"""
WITH {S.kmeans_sql_ctes(iters=KMEANS_ITERS)},
{S.pq_sql_ctes(include_base=False)},
assign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd_final) WHERE r = 1
),
probes AS (
    SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd_final WHERE vec_id < 10) WHERE r <= 2
),
adc AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           CAST(SUM(list_sum(list_transform(generate_series(1, {S.PQ_SUBDIM}),
                i -> qx.xq[c.sub * {S.PQ_SUBDIM} + i] * b.cv[i]))) AS BIGINT) AS adc_dot
    FROM probes p
    JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
    JOIN pq_codes c ON c.vec_id = a.vec_id
    JOIN pq_books b USING (sub, code)
    JOIN x qx ON qx.vec_id = p.query_id
    GROUP BY 1, 2
),
short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id) AS srk
        FROM adc
    ) WHERE srk <= {PQ_SHORTLIST}
),
rescored AS (
    SELECT s.query_id, s.neighbor_id,
           ROUND({S.cosine_sql('q.v', 'c.v')}, 6) AS cos_sim
    FROM short s
    JOIN e q ON q.vec_id = s.query_id
    JOIN e c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rk AS INTEGER) AS rk FROM (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
    FROM rescored
) WHERE rk <= 5
"""


#: Shortlist sizes swept by sim_ivfpq_rerank_curve.
PQ_RERANK_LS = (5, 10, 20, 40)


def q_sim_ivfpq_rerank_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC rerank_factor tuning curve: recall@5 vs exact brute
    force as the ADC shortlist grows (5/10/20/40 per query) — the
    report that prices the one serving knob PQ adds (how many
    full-precision rows to touch per query). The recall ceiling is
    the probed cells' candidate recall (nprobe's job, priced by
    sim_ivf_nprobe_curve); this curve shows how fast the compressed-
    domain shortlist reaches that ceiling. One candidate pass + one
    ADC window, the L sweep as a narrow explode over a 4-element
    literal array."""
    kidx = _kmeans_index_cached(spark, sf_dir)
    pidx = _pq_index_cached(spark, sf_dir)
    books = _pq_books_cached(spark, sf_dir)
    from pipe_s_spark.queries_llm_shared import _exact_topk5_cached

    emb = load_table(spark, sf_dir, "embeddings")
    exact = _exact_topk5_cached(spark, sf_dir)
    corpus = kidx.select("vec_id", "cell").join(pidx.select("vec_id", "codes"), "vec_id")
    luts = S.pq_lut_table(pidx.filter(F.col("vec_id") < 10), books)
    queries = (
        kidx.filter(F.col("vec_id") < 10)
        .join(luts, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            "lut",
            F.explode("probe_cells").alias("cell"),
        )
    )
    # compressed-domain pass over ALL probed candidates (codes only —
    # this is the cheap leg), then full-precision vectors are joined
    # for the max(PQ_RERANK_LS) survivors alone: the whole point of
    # the knob this curve prices is that exact cosine never touches
    # more than k * rerank_factor rows per query.
    cand = (
        F.broadcast(queries)
        .join(corpus, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            S.pq_adc_score(F.col("lut"), F.col("codes")).alias("adc_dot"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    short = cand.withColumn("srk", F.row_number().over(w_adc)).filter(
        F.col("srk") <= max(PQ_RERANK_LS)
    )
    q_embs = kidx.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n_embs = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    # r16: broadcast the SHORTLIST side of the full-precision join — it
    # is bounded by design (nq x max(L) = 400 rows at any scale: the
    # whole point of the rerank knob is that exact cosine touches only
    # k x rerank_factor rows per query), while the planner, blind to
    # the window's output size, was broadcasting the CORPUS embedding
    # scan instead (fact-sized broadcast; plans/r15 node 49). The
    # corpus now streams unshuffled past a 400-row hash table — the
    # correct 100 TB shape — and locally two AQE join stages collapse.
    rescored = (
        F.broadcast(short.join(F.broadcast(q_embs), "query_id"))
        .join(n_embs, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "srk",
            F.round(
                S.cosine(S.as_double_array("q_emb"), S.as_double_array("embedding")), 6
            ).alias("cos_sim"),
        )
    )
    swept = rescored.withColumn(
        "shortlist", F.explode(F.array(*[F.lit(x) for x in PQ_RERANK_LS]))
    ).filter(F.col("srk") <= F.col("shortlist"))
    w_cos = Window.partitionBy("shortlist", "query_id").orderBy(
        F.desc("cos_sim"), "neighbor_id"
    )
    got = (
        swept.withColumn("rk", F.row_number().over(w_cos))
        .filter(F.col("rk") <= 5)
        .select("shortlist", "query_id", "neighbor_id")
    )
    return (
        exact.crossJoin(
            F.broadcast(
                spark.createDataFrame(
                    [(int(x),) for x in PQ_RERANK_LS], "shortlist int"
                )
            )
        )
        .join(
            # r16: `got` is bounded (<= |L| x nq x 5 = 200 rows at any
            # scale), but it sits behind windows whose output size the
            # planner cannot estimate, so this tiny left join planned
            # as a SortMergeJoin with TWO exchanges + sorts (plans/r15
            # nodes 5/60/62). Broadcasting the bounded side makes it a
            # BroadcastHashJoin: zero exchanges, two fewer AQE stages.
            F.broadcast(got.withColumn("hit", F.lit(1))),
            ["shortlist", "query_id", "neighbor_id"],
            "left",
        )
        .groupBy("shortlist")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"),
        )
        .select(
            "shortlist",
            "n_exact",
            "n_hits",
            F.expr("CAST(n_hits * 1000000 DIV n_exact AS BIGINT)").alias("recall_x1m"),
        )
    )


def _sql_sim_ivfpq_rerank_curve() -> str:
    ls = ", ".join(f"({x})" for x in PQ_RERANK_LS)
    return f"""
WITH {S.kmeans_sql_ctes(iters=KMEANS_ITERS)},
{S.pq_sql_ctes(include_base=False)},
assign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd_final) WHERE r = 1
),
probes AS (
    SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS r
        FROM cd_final WHERE vec_id < 10) WHERE r <= 2
),
adc AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           CAST(SUM(list_sum(list_transform(generate_series(1, {S.PQ_SUBDIM}),
                i -> qx.xq[c.sub * {S.PQ_SUBDIM} + i] * b.cv[i]))) AS BIGINT) AS adc_dot
    FROM probes p
    JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
    JOIN pq_codes c ON c.vec_id = a.vec_id
    JOIN pq_books b USING (sub, code)
    JOIN x qx ON qx.vec_id = p.query_id
    GROUP BY 1, 2
),
ranked_adc AS (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id) AS srk
    FROM adc
),
ls(shortlist) AS (VALUES {ls}),
got AS (
    SELECT shortlist, query_id, neighbor_id FROM (
        SELECT l.shortlist, r.query_id, r.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY l.shortlist, r.query_id
                   ORDER BY ROUND({S.cosine_sql('q.v', 'c.v')}, 6) DESC, r.neighbor_id) AS rk
        FROM ranked_adc r
        CROSS JOIN ls l
        JOIN e q ON q.vec_id = r.query_id
        JOIN e c ON c.vec_id = r.neighbor_id
        WHERE r.srk <= l.shortlist
    ) WHERE rk <= 5
),
qe AS (SELECT * FROM e WHERE vec_id < 10),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT qe.vec_id AS query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY qe.vec_id
                   ORDER BY ROUND({S.cosine_sql('qe.v', 'e.v')}, 6) DESC, e.vec_id) AS rk
        FROM qe, e WHERE qe.vec_id <> e.vec_id
    ) WHERE rk <= 5
)
SELECT l.shortlist,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN g.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN g.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS recall_x1m
FROM exact ex
CROSS JOIN ls l
LEFT JOIN got g ON g.shortlist = l.shortlist
    AND g.query_id = ex.query_id AND g.neighbor_id = ex.neighbor_id
GROUP BY l.shortlist
"""


def q_sim_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook health report: per (subspace, code) — member count
    and the min/max exact squared-L2 quantization error (int64
    micro-units^2). The ANALYZE you read before trusting a codebook:
    dead codes are missing rows, hot codes (one code absorbing a
    subspace) mean the subspace needs more iterations or more codes,
    and max_sq_dist is the worst-represented vector's bill. Min/max
    instead of mean keeps every value inside int64 at ANY corpus size
    (a mean needs a sum that outgrows int64 around 10^9 rows)."""
    idx = _pq_index_cached(spark, sf_dir)
    subdim = 64 // S.PQ_M
    xsq = F.array(
        *[
            S.int_dot(
                S.subvec(F.col("xq"), s, subdim), S.subvec(F.col("xq"), s, subdim)
            )
            for s in range(S.PQ_M)
        ]
    )
    ex = idx.select(
        F.posexplode(
            F.arrays_zip(
                F.col("codes").alias("code"),
                F.zip_with(xsq, F.col("keys"), lambda a, b: a + b).alias("dist"),
            )
        ).alias("sub", "z")
    ).select(
        F.col("sub").cast("int").alias("sub"),
        F.col("z.code").alias("code"),
        F.col("z.dist").alias("dist"),
    )
    return ex.groupBy("sub", "code").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("dist").alias("min_sq_dist"),
        F.max("dist").alias("max_sq_dist"),
    )


def _sql_sim_pq_distortion() -> str:
    return f"""
WITH {S.pq_sql_ctes()},
dists AS (
    SELECT c.sub, c.code,
           list_sum(list_transform(generate_series(1, {S.PQ_SUBDIM}),
               i -> x.xq[c.sub * {S.PQ_SUBDIM} + i] * x.xq[c.sub * {S.PQ_SUBDIM} + i])) + c.key AS dist
    FROM pq_codes c JOIN x ON x.vec_id = c.vec_id
)
SELECT CAST(sub AS INTEGER) AS sub, code,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(dist) AS BIGINT) AS min_sq_dist,
       CAST(MAX(dist) AS BIGINT) AS max_sq_dist
FROM dists GROUP BY sub, code
"""

QUERIES = {
    "sim_pq_topk": q_sim_pq_topk,
    "sim_pq_recall": q_sim_pq_recall,
    "sim_ivfpq_topk": q_sim_ivfpq_topk,
    "sim_ivfpq_rerank_curve": q_sim_ivfpq_rerank_curve,
    "sim_pq_distortion": q_sim_pq_distortion,
}

ORACLES = {
    "sim_pq_topk": _sql_sim_pq_topk(),
    "sim_pq_recall": _sql_sim_pq_recall(),
    "sim_ivfpq_topk": _sql_sim_ivfpq_topk(),
    "sim_ivfpq_rerank_curve": _sql_sim_ivfpq_rerank_curve(),
    "sim_pq_distortion": _sql_sim_pq_distortion(),
}
