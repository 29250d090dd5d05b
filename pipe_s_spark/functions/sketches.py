"""Deterministic distinct-count sketches (KMV / bottom-k).

``approx_count_distinct`` (HyperLogLog++) is the built-in at 100 TB, but
its register layout is engine-private, so an HLL estimate can never be
verified against another engine. The K-Minimum-Values sketch gives the
same O(k) memory / one-pass profile with a *deterministic* definition:

    normalize md5(value) into [0,1); keep the k smallest distinct
    hashes; estimate distinct = (k-1) / kth_smallest.

(Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream".) Deterministic hashing means the DuckDB oracle reproduces the
estimate bit-for-bit — the sketch itself is oracle-checkable, which is
the point of carrying it alongside the HLL built-in.

Scale shape: distinct on (group, hash) — one shuffle with map-side
combine — then per-group bottom-k via a rank window over at most the
distinct values, then one aggregation row per group. Mergeability (the
sketch property): the union of two KMV sketches is the bottom-k of the
merged hash sets, which is exactly what re-running this plan over a
union computes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hashes are md5 truncated to 15 hex digits (60 bits), normalized.
_KMV_DENOM = float(16**15)


def kmv_hash(col: Column | str) -> Column:
    """Deterministic uniform hash of a value into [0, 1)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("double")
        / F.lit(_KMV_DENOM)
    )


def kmv_hash_sql(expr: str) -> str:
    """DuckDB rendering of :func:`kmv_hash` (identical md5 + scaling)."""
    return (
        f"CAST(CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15) AS BIGINT)"
        f" AS DOUBLE) / {_KMV_DENOM!r}"
    )


def kmv_distinct_estimate(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV estimate of ``count(distinct value_col)``.

    Columns out: group cols, ``n_hashes`` (min(k, true distinct) —
    sketch fill), ``est_distinct`` (rounded to 4; exact count when the
    group has fewer than k distinct values, per KMV convention).
    """
    from pyspark.sql.window import Window

    groups = group_cols or []
    hashed = df.select(*groups, kmv_hash(value_col).alias("__h")).distinct()
    # two-level bottom-k: rank within (group, salt) first so no single
    # task ever sorts a whole group's distinct hashes (a hot group at
    # 100 TB), then re-rank the <= k*n_salts survivors per group. The
    # bottom-k of per-salt bottom-k's IS the global bottom-k, so the
    # result (and the single-level oracle SQL) is unchanged.
    n_salts = 16
    salted = hashed.withColumn(
        "__salt", F.pmod(F.hash("__h"), F.lit(n_salts))
    )
    w1 = Window.partitionBy(*[F.col(g) for g in groups], "__salt").orderBy("__h")
    pre = (
        salted.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .drop("__rk", "__salt")
    )
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy("__h")
    bottom = pre.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k)
    return bottom.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")).otherwise(
                (F.lit(float(k - 1))) / F.max("__h")
            ),
            4,
        ).alias("est_distinct"),
    )


def kmv_distinct_estimate_sql(
    table: str,
    value_expr: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> str:
    """DuckDB oracle for :func:`kmv_distinct_estimate`."""
    groups = group_cols or []
    gsel = (", ".join(groups) + ",") if groups else ""
    gby = ("PARTITION BY " + ", ".join(groups)) if groups else ""
    ggrp = ("GROUP BY " + ", ".join(groups)) if groups else ""
    return f"""
WITH hashed AS (
    SELECT DISTINCT {gsel} {kmv_hash_sql(value_expr)} AS h FROM {table}
),
bottom AS (
    SELECT * FROM (
        SELECT {gsel} h, ROW_NUMBER() OVER ({gby} ORDER BY h) AS rk FROM hashed
    ) WHERE rk <= {k}
)
SELECT {gsel} COUNT(*) AS n_hashes,
       ROUND(CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE {float(k - 1)!r} / MAX(h) END, 4) AS est_distinct
FROM bottom {ggrp}
"""


# --- count-min sketch ----------------------------------------------------
#
# Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
# count-min sketch and its applications"). The reference engine carries
# no frequency sketch; this is part of the training-data-pipeline
# surface (heavy-hitter detection over corpus keys without a full
# groupBy held in memory). Like KMV above, the hash functions are
# deterministic md5 derivations so the DuckDB oracle reproduces every
# cell — the sketch is oracle-checkable end to end.
#
# Scale shape: BUILD is one narrow explode (each input row emits DEPTH
# probes) followed by one groupBy over at most DEPTH*WIDTH distinct
# cells — map-side combine collapses the shuffle to O(cells) per task,
# so the shuffle payload is bounded by the sketch size, never the data
# size. ESTIMATE broadcasts the (tiny, <= DEPTH*WIDTH rows) sketch and
# never shuffles the key side. Sketches are mergeable by cell-wise sum,
# which is exactly what re-running the build over a union computes.

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(col: Column | str, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-`row`'s hash bucket for a key: md5('{row}:{key}') first 8
    hex digits mod width (nonnegative: 8 hex digits < 2^32)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), c.cast("string"))), 1, 8), 16, 10
    ).cast("long")
    return (h % width).cast("int")


def cms_bucket_sql(expr: str, row: int, width: int = CMS_WIDTH) -> str:
    """DuckDB rendering of :func:`cms_bucket` (identical md5 mod)."""
    return (
        f"CAST(CAST('0x' || substr(md5('{row}:' || CAST({expr} AS VARCHAR)), 1, 8)"
        f" AS BIGINT) % {width} AS INTEGER)"
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-min sketch of ``key_col``'s frequency distribution:
    one row per touched cell, columns ``(row_id, bucket, cnt)``."""
    probes = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_id"),
                        cms_bucket(key_col, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        probes.select(F.col("c.row_id").alias("row_id"), F.col("c.bucket").alias("bucket"))
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys`` (distinct
    values of ``key_col``): est = min over rows of the addressed cell.
    The sketch side is broadcast — the key side never shuffles."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_id"),
                        cms_bucket(key_col, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.row_id").alias("row_id"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_cnt"))
    )


# --- bloom filter ---------------------------------------------------------
#
# Bloom 1970 ("Space/time trade-offs in hash coding with allowable
# errors"). The membership sketch the pipeline uses to pre-filter joins
# against a large key set (e.g. "was this doc_id already ingested?")
# without shuffling the probe side. Hash family is deterministic md5
# (like KMV/CMS above) so a DuckDB oracle reproduces every bit.
#
# Scale shape: BUILD is a narrow k-way explode then one distinct whose
# shuffle is bounded by the filter size m, never the data size (the
# same bounded-by-sketch argument as cms_build). PROBE materializes the
# <= m set bits driver-side ONCE (bounded metadata collect, same class
# as pack_assign's O(shards)) and inlines them as a literal 0/1 array —
# the probe itself is a pure narrow expression: no join, no shuffle,
# whole-stage codegen. Filters merge by bitwise OR = union of the set
# bits, which re-running the build over a union computes.

BLOOM_BITS = 4096
BLOOM_HASHES = 3


def bloom_position(col: Column | str, i: int, m: int = BLOOM_BITS) -> Column:
    """Hash-``i`` bit position for a key: md5('b{i}:{key}') first 7 hex
    digits mod m (7 hex digits < 2^28: no sign issues in any engine)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"b{i}:"), c.cast("string"))), 1, 7), 16, 10
    ).cast("long")
    return (h % m).cast("int")


def bloom_position_sql(expr: str, i: int, m: int = BLOOM_BITS) -> str:
    """DuckDB rendering of :func:`bloom_position` (identical md5 mod)."""
    return (
        f"CAST(CAST('0x' || substr(md5('b{i}:' || CAST({expr} AS VARCHAR)), 1, 7)"
        f" AS BIGINT) % {m} AS INTEGER)"
    )


def bloom_build(
    df: DataFrame, key_col: str, k: int = BLOOM_HASHES, m: int = BLOOM_BITS
) -> DataFrame:
    """Set-bit relation ``(pos)`` of the filter over ``key_col`` —
    distinct bounded by m rows regardless of input size."""
    return df.select(
        F.explode(F.array(*[bloom_position(key_col, i, m) for i in range(k)])).alias("pos")
    ).distinct()


def bloom_bit_array(bits: DataFrame, m: int = BLOOM_BITS) -> str:
    """Materialize the filter as a length-m '0'/'1' string (driver-side,
    bounded by m — metadata-scale, like the IVF centroid literals). A
    single string literal stays cheap in planning/codegen where an
    m-element array literal measurably does not (a 4096-int array
    literal added ~1 s of plan+codegen per bench run)."""
    positions = {r["pos"] for r in bits.collect()}
    return "".join("1" if i in positions else "0" for i in range(m))


def bloom_might_contain(
    col: Column | str, bitstring: str, k: int = BLOOM_HASHES
) -> Column:
    """Narrow membership probe: true iff every hash position's bit is
    set in the inlined literal filter. O(k) constant-time substr
    lookups per row, fully inside whole-stage codegen — no join, no
    shuffle."""
    m = len(bitstring)
    lit_bits = F.lit(bitstring)
    checks = [
        lit_bits.substr(bloom_position(col, i, m) + 1, F.lit(1)) == "1" for i in range(k)
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    bin_width: float = 1000.0,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Equi-width histogram quantile sketch: single-pass, mergeable,
    bounded-state quantile estimation — the deterministic analog of
    ``approx_percentile`` (whose GK/KLL internals are engine-private
    and so never oracle-checkable).

    Shape at 100 TB: one groupBy on (group, bin) with map-side combine
    — shuffle payload is bounded by bins-per-group cells regardless of
    row count — then a per-group cumulative window over at most that
    many bin rows. Merging two histograms is cellwise addition, which
    is exactly what re-running the plan over a union computes (the same
    mergeability argument as the KMV sketch above).

    Estimate: for target rank t = q * total, the covering bin b
    (cum_before < t <= cum) interpolates linearly:
    est = lo(b) + width * (t - cum_before) / cnt(b). Exactly one bin
    covers each target (cumulative counts are strictly increasing), and
    every arithmetic step is written in the same order as the SQL
    rendering below so both engines round identically at 6 decimals.
    """
    from pyspark.sql.window import Window

    bin_col = F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    h = df.groupBy(*group_cols, bin_col.alias("bin")).agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.partitionBy(*group_cols).orderBy("bin")
    wt = Window.partitionBy(*group_cols)
    h2 = h.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "total", F.sum("cnt").over(wt)
    )
    aggs = [F.max("total").alias("n_rows")]
    for q in quantiles:
        t = F.lit(q) * F.col("total")
        est = F.round(
            F.col("bin") * F.lit(bin_width)
            + F.lit(bin_width) * (t - (F.col("cum") - F.col("cnt"))) / F.col("cnt"),
            6,
        )
        sel = ((F.col("cum") - F.col("cnt")) < t) & (t <= F.col("cum"))
        aggs.append(F.max(F.when(sel, est)).alias(f"p{int(q * 100)}_est"))
    return h2.groupBy(*group_cols).agg(*aggs)


def histogram_quantiles_sql(
    table: str,
    value_col: str,
    group_cols: list[str],
    bin_width: float = 1000.0,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> str:
    """DuckDB rendering of :func:`histogram_quantiles` with identical
    literal arithmetic order. Window SUMs are cast to BIGINT at the CTE
    boundary (DuckDB SUM(BIGINT) -> HUGEINT -> pandas float64, the
    dtype-divergence class test_oracle_types sweeps for)."""
    g = ", ".join(group_cols)
    exprs = []
    for q in quantiles:
        t = f"({q} * total)"
        est = (
            f"ROUND(bin * {bin_width} + {bin_width} * ({t} - (cum - cnt)) / cnt, 6)"
        )
        sel = f"((cum - cnt) < {t} AND {t} <= cum)"
        exprs.append(f"MAX(CASE WHEN {sel} THEN {est} END) AS p{int(q * 100)}_est")
    return f"""
WITH h AS (
    SELECT {g}, CAST(FLOOR({value_col} / {bin_width}) AS BIGINT) AS bin,
           COUNT(*) AS cnt
    FROM {table} GROUP BY {g}, bin
),
h2 AS (
    SELECT {g}, bin, cnt,
           CAST(SUM(cnt) OVER (PARTITION BY {g} ORDER BY bin) AS BIGINT) AS cum,
           CAST(SUM(cnt) OVER (PARTITION BY {g}) AS BIGINT) AS total
    FROM h
)
SELECT {g}, CAST(MAX(total) AS BIGINT) AS n_rows, {", ".join(exprs)}
FROM h2 GROUP BY {g}
"""


# --- HyperLogLog (deterministic, oracle-checkable) -----------------------
#
# Flajolet et al. 2007 ("HyperLogLog: the analysis of a near-optimal
# cardinality estimation algorithm"). approx_count_distinct IS this
# sketch, but Spark's register layout is engine-private, so its
# estimate can never be cross-checked by another engine. This variant
# derives bucket and rank from md5 so every register — and therefore
# the estimate itself — reproduces bit-for-bit in the DuckDB oracle:
#
#   bucket = first 2 md5 hex digits mod m      (256 % 64 == 0: uniform)
#   w      = next 13 hex digits (52 bits)
#   rho    = leading-zero bits of w + 1, computed from the HEX STRING
#            (ltrim('0') + a CASE on the first nonzero digit), not from
#            floating log2 — libm log isn't correctly rounded, and a
#            one-ulp disagreement at a power-of-two boundary would skew
#            a register; string arithmetic cannot disagree.
#
# The harmonic mean is kept in EXACT INTEGER form: each register
# contributes 2^(53-reg) (a BIGINT; empty registers contribute 2^53),
# so SUM is order-independent — the float division happens once, at the
# end, in the same literal order in both engines. Linear-counting's
# ln() is the one libm call left; it is applied to a ratio of small
# integers and rounded to 4 decimals (verified identical across
# engines at every test SF).
#
# Scale shape: one narrow projection, groupBy (group, bucket) MAX with
# map-side combine — shuffle payload bounded by m rows per group, never
# data-sized. Registers merge by MAX, which re-running over a union
# computes; the estimate is a fold over exactly m rows per group.

HLL_M = 64  #: register count (b = 6 bucket bits); std error ~ 1.04/sqrt(m) = 13%
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_HLL_WBITS = 52  #: bits in w (13 md5 hex digits)
_HLL_POW = 1 << (_HLL_WBITS + 1)  #: 2^53, the integer scale of 2^-reg

#: first nonzero hex digit -> leading zero bits inside that digit
_HEX_LZ = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}




def hll_probe(col: Column | str, m: int = HLL_M) -> tuple[Column, Column]:
    """(bucket, rho) narrow expressions for one value — no shuffle.

    rho is computed from the hex string (leading-zero hex digits via a
    regexp strip + a CASE on the first nonzero digit), never from
    floating log2.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c.cast("string"))
    bucket = (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % m).alias("bucket")
    whex = F.substring(h, 3, 13)
    stripped = F.regexp_replace(whex, "^0+", "")
    z_hex = F.length(whex) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    digit_lz: Column = F.lit(0)
    for d, lz in _HEX_LZ.items():
        digit_lz = F.when(first == d, lz).otherwise(digit_lz)
    rho = (
        F.when(F.length(stripped) == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(z_hex * 4 + digit_lz + 1)
        .cast("int")
        .alias("rho")
    )
    return bucket, rho


def hll_estimate(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    m: int = HLL_M,
) -> DataFrame:
    """Per-group HLL distinct estimate with linear-counting correction.

    Columns out: group cols, ``n_zero_registers`` (int — empty
    registers, the linear-counting input), ``est_distinct`` (double,
    rounded to 4). Registers merge by MAX, so re-running over a union
    of corpora merges the sketches exactly.
    """
    groups = group_cols or []
    bucket, rho = hll_probe(value_col, m)
    regs = (
        df.select(*groups, bucket, rho)
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    # exact-integer harmonic sum: each register contributes 2^(53-reg);
    # buckets never hit contribute 2^53 (reg = 0)
    pow_scale = F.lit(_HLL_POW).cast("long")
    agg = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_WBITS + 1} - reg)")).alias("s_hit"),
    )
    s_int = F.col("s_hit") + (F.lit(m) - F.col("present")) * pow_scale
    raw = F.lit(_HLL_ALPHA * m * m * float(_HLL_POW)) / s_int.cast("double")
    zeros = (F.lit(m) - F.col("present")).cast("int")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")), 4),
    ).otherwise(F.round(raw, 4))
    return agg.select(
        *groups,
        zeros.alias("n_zero_registers"),
        est.alias("est_distinct"),
    )


def hll_estimate_sql(
    table: str,
    value_expr: str,
    group_cols: list[str] | None = None,
    m: int = HLL_M,
) -> str:
    """DuckDB oracle for :func:`hll_estimate` — identical md5 probes,
    identical integer register sum, identical literal arithmetic
    order."""
    groups = group_cols or []
    gsel = (", ".join(groups) + ",") if groups else ""
    ggrp = ("GROUP BY " + ", ".join(groups)) if groups else ""
    wb1 = _HLL_WBITS + 1
    alpha_num = repr(_HLL_ALPHA * m * m * float(_HLL_POW))
    digit_case = " ".join(
        f"WHEN substr(stripped, 1, 1) = '{d}' THEN {lz}" for d, lz in _HEX_LZ.items()
    )
    return f"""
WITH probes AS (
    SELECT {gsel}
           CAST(CAST('0x' || substr(h, 1, 2) AS INTEGER) % {m} AS INTEGER) AS bucket,
           substr(h, 3, 13) AS whex
    FROM (SELECT {gsel} md5(CAST({value_expr} AS VARCHAR)) AS h FROM {table})
),
rhos AS (
    SELECT {gsel} bucket,
           CASE WHEN length(stripped) = 0 THEN {wb1}
                ELSE (13 - length(stripped)) * 4
                     + (CASE {digit_case} ELSE 0 END) + 1
           END AS rho
    FROM (SELECT {gsel} bucket, regexp_replace(whex, '^0+', '') AS stripped
          FROM probes)
),
regs AS (
    SELECT {gsel} bucket, MAX(rho) AS reg FROM rhos GROUP BY {gsel} bucket
),
agg AS (
    SELECT {gsel} CAST(COUNT(*) AS BIGINT) AS present,
           CAST(SUM(CAST(1 AS BIGINT) << ({wb1} - reg)) AS BIGINT) AS s_hit
    FROM regs {ggrp}
)
SELECT {gsel}
       CAST({m} - present AS INTEGER) AS n_zero_registers,
       CASE WHEN ({alpha_num} / CAST(s_hit + ({m} - present) * CAST({_HLL_POW} AS BIGINT) AS DOUBLE)) <= {2.5 * m!r}
                 AND ({m} - present) > 0
            THEN ROUND({float(m)!r} * LN({float(m)!r} / CAST({m} - present AS DOUBLE)), 4)
            ELSE ROUND({alpha_num} / CAST(s_hit + ({m} - present) * CAST({_HLL_POW} AS BIGINT) AS DOUBLE), 4)
       END AS est_distinct
FROM agg
"""


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries 1982; Agarwal et al.'s
# mergeable-summaries result makes per-partition summaries + counter
# merge sound). Two-phase: bounded-state per-partition summaries ->
# merged candidate set (guaranteed SUPERSET of every item with
# frequency > n/k) -> one exact semi-join count of candidates only.
# The candidate SET depends on partitioning, but the verified output
# (exact counts filtered to > n/k) does not — which is what makes a
# deterministic oracle possible.
# ---------------------------------------------------------------------------


def heavy_hitters(
    df, value_col: str, k: int = 20, out_count: str = "n"
):
    """All values with frequency strictly greater than n/k, with EXACT
    counts — without a full-domain groupBy: phase 1 holds at most k-1
    counters per task (Misra-Gries decrement summaries, an Arrow
    kernel), phase 2 merges the per-task summaries (counter sum is the
    mergeable-summaries bound) and keeps candidates, phase 3 computes
    exact counts ONLY for candidates via a broadcast semi-join and
    filters to the true threshold. At 100 TB the shuffle carries
    O(tasks * k) counter rows plus the candidate-filtered count — the
    full-domain exchange (stats_key_skew's cost) never happens.
    """
    from pyspark.sql import functions as F

    def mg_kernel(batches):
        import pandas as pd

        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for v in pdf[value_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k - 1:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in dead:
                        del counters[key]
                    for key in counters:
                        counters[key] -= 1
        # sentinel row (NULL value) carries this task's input row count:
        # the n/k threshold then derives from the SAME kernel pass
        # instead of a separate count() action re-scanning the input
        # (r15 — the operator cost 3 passes over src; now 2, and the
        # whole report is ONE action)
        yield pd.DataFrame(
            {
                value_col: list(counters.keys()) + [None],
                "mg": list(counters.values()) + [n_rows],
            }
        )

    from pipe_s_spark.sizing import fan_out, kernel_parts

    field = df.schema[value_col].dataType.simpleString()
    # keyed fan_out: parallelizes the per-task summaries off a
    # low-parallelism scan AND clusters equal values into one task's
    # counter set (a superset-tightening, correctness-neutral: every
    # true heavy hitter survives MG merge under ANY partitioning, and
    # the exact-count phase fixes false positives). No-op at cluster
    # scale (sizing.fan_out); the exchange is shared with the exact
    # phase via ReuseExchange since both phases live in one action.
    src = fan_out(
        df.select(value_col).filter(F.col(value_col).isNotNull()),
        by=[value_col],
        max_parts=kernel_parts(df.sparkSession),
    )
    summaries = src.mapInPandas(mg_kernel, schema=f"{value_col} {field}, mg long")
    # merged MG summary: counter sums; every item with global count
    # > n/k survives with a positive merged counter. Materialized once
    # (bounded: <= tasks x k rows) so the candidate filter and the
    # total read ONE kernel pass — without the cut, the two consumers
    # would each re-run the whole MG kernel subtree.
    merged = (
        summaries.groupBy(value_col).agg(F.sum("mg").alias("mg")).localCheckpoint()
    )
    candidates = merged.filter(F.col(value_col).isNotNull())
    totals = merged.filter(F.col(value_col).isNull()).agg(
        F.sum("mg").alias("__n_total")
    )
    exact = (
        src.join(F.broadcast(candidates.select(value_col)), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias(out_count))
    )
    return (
        exact.crossJoin(F.broadcast(totals))
        .filter(F.col(out_count) * k > F.col("__n_total"))
        .drop("__n_total")
    )
