"""Iterative graph algorithms beyond connected components (which lives
with the dedup family in functions.dedup): deterministic PageRank.

PageRank (Page et al. 1999) in INTEGER FIXED-POINT: ranks are BIGINTs
in units of 1e-12, per-edge shares are precomputed in parts-per-million,
and every step is integer multiply / truncating divide / integer sum —
all order-independent — so a fixed iteration count yields bit-identical
ranks on any engine, and the DuckDB oracle replays the whole iteration
by unrolled CTEs. (Float PageRank can never be oracle-checked exactly:
the contribution SUM is order-dependent.)

Scale shape per iteration: one shuffle join of the edge shares with the
rank table on src, one groupBy dst with map-side combine — the classic
distributed PageRank step. The rank table is |V|-sized and is
checkpointed each round (same lineage-cut policy as
functions.dedup.connected_components). Truncation notes: a dangling
node (no out-edges) leaks its damped mass — the standard simplification
— and each DIV truncates, so ranks are a deterministic lower bound
within iters * (|in-edges| + 1) units of 1e-12 of the rational value.

Overflow bounds (BIGINT-safe by construction): rank <= SCALE = 1e12,
share <= SHARE_SCALE = 1e6, so rank * share <= 1e18 < 2^63 regardless
of weight magnitude; contributions sum over in-degree — at in-degree
above ~9e6 switch SHARE_SCALE down a decade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
SHARE_SCALE = 10**6


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank over an edge list; returns (v, rank) with rank
    a BIGINT in units of 1e-12. Fixed ``iters`` power iterations.

    Lineage policy (r15): ``nodes`` and ``shares`` stay eagerly
    checkpointed — each is consumed by EVERY iteration, so without a
    cut each iteration would rescan+redistinct the edge list. The rank
    table is checkpointed only every ``checkpoint_every`` iterations:
    each intermediate rank relation has exactly ONE consumer (the next
    iteration), so an eager per-iteration checkpoint materialized |V|
    rows iters times and ran iters extra jobs for nothing (profiled at
    sf0.1: 38 jobs, 2.1 s wall, ~0.5 s of task time) — the un-cut
    chain executes the same joins ONCE inside the final action. The
    periodic cut keeps plan depth (and recovery cost at cluster scale)
    bounded for large ``iters``, the same policy as
    functions.dedup.connected_components."""
    # r15: cut the edge lineage FIRST — ``edges`` is consumed 4-5x
    # below (both union arms of nodes, the weight aggregate, the share
    # join), and when the edge list is itself a derived relation (the
    # bench's event-transition graph: scan + lag window + groupBy)
    # every consumer re-ran that whole pipeline (profiled: ~2 s of the
    # query's wall was edge re-derivation). One materialization, four
    # cheap reads; at cluster scale a pagerank input is persisted
    # before iterating for exactly this reason.
    edges = edges.select(
        F.col(src).alias(src), F.col(dst).alias(dst), F.col(weight).alias(weight)
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col(src).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # scalar: drives the integer base-rank literal
    base = ((damping_den - damping_num) * SCALE) // (damping_den * n)
    wt = edges.groupBy(src).agg(F.sum(weight).alias("wtot"))
    shares = (
        edges.join(wt, src)
        .select(
            F.col(src).alias("e_src"),
            F.col(dst).alias("e_dst"),
            F.expr(f"({weight} * {SHARE_SCALE}) DIV wtot").alias("share"),
        )
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("v", F.lit(SCALE // n).cast("long").alias("r"))
    for it in range(1, iters + 1):
        contrib = (
            shares.join(ranks, shares.e_src == ranks.v)
            .select("e_dst", F.expr(f"(r * share) DIV {SHARE_SCALE}").alias("c"))
            .groupBy("e_dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contrib, nodes.v == contrib.e_dst, "left").select(
            "v",
            F.expr(
                f"CAST({base} + ({damping_num} * COALESCE(contrib, 0))"
                f" DIV {damping_den} AS BIGINT)"
            ).alias("r"),
        )
        if it < iters and it % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("v", F.col("r").alias("rank"))


def pagerank_int_sql(
    edges_sql: str,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """DuckDB oracle: unrolled power iteration over ``edges_sql`` (a
    query producing columns src, dst, w) with identical integer
    arithmetic. n and base are computed in-SQL (HUGEINT-safe casts)."""
    steps = []
    prev = "r0"
    for k in range(1, iters + 1):
        steps.append(
            f"""r{k} AS (
    SELECT nd.v,
           CAST(((({damping_den} - {damping_num}) * {SCALE}) // ({damping_den} * nn.n))
                + ({damping_num} * COALESCE(c.contrib, 0)) // {damping_den} AS BIGINT) AS r
    FROM nodes nd CROSS JOIN nn
    LEFT JOIN (
        SELECT sh.dst AS v, CAST(SUM((p.r * sh.share) // {SHARE_SCALE}) AS BIGINT) AS contrib
        FROM sh JOIN {prev} p ON sh.src = p.v GROUP BY sh.dst
    ) c USING (v)
)"""
        )
        prev = f"r{k}"
    joined = ",\n".join(steps)
    return f"""
WITH edges AS ({edges_sql}),
nodes AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
wt AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wtot FROM edges GROUP BY src),
sh AS (SELECT e.src, e.dst, CAST((e.w * {SHARE_SCALE}) // wt.wtot AS BIGINT) AS share
       FROM edges e JOIN wt USING (src)),
r0 AS (SELECT v, CAST({SCALE} // nn.n AS BIGINT) AS r FROM nodes CROSS JOIN nn),
{joined}
SELECT v, r AS rank FROM {prev}
"""
