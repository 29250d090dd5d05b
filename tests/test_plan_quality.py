"""Plan-quality guardrails over the whole query surface.

Asserts, for every registered query's physical plan:

- no ``BatchEvalPython`` (row-at-a-time Python UDF) — Python touches
  data only through Arrow (``mapInPandas``/``applyInPandas``/pandas
  UDAF), which shows as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas;
- no cartesian/broadcast-nested-loop joins outside the explicit
  allowlist of intentionally cross-product baselines;
- no UNPARTITIONED ordered window (``Window.orderBy`` without
  ``partitionBy``): a global ordered window serializes the whole
  input through one reducer — the textbook scale-killer.

This keeps "the plan you'd want at 100 TB" an enforced property, not a
one-time review.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

#: Queries whose cross product is the documented intent (broadcast
#: query-side baselines where the corpus streams map-side).
CROSS_OK = {
    "sim_cosine_topk",
    # recall evals' exact side is the same broadcast brute-force baseline
    "sim_lsh_recall",
    "sim_ivf_recall",
    # nprobe sweep: same broadcast brute-force exact baseline
    "sim_ivf_nprobe_curve",
    # sq8 eval: quantized ranking is the same broadcast brute-force
    # baseline (the compressed-codes leg of the ANN tuning report)
    "sim_sq8_recall",
    "sim_sq8_topk",
    # PQ-flat ADC scan: the broadcast side is the bounded query LUT
    # set (10 rows); the corpus side streams ~10-byte (16x5-bit)
    # codes map-side —
    # the FAISS IndexPQ compressed-domain scan, cross by design
    "sim_pq_topk",
    # recall eval: inherits sim_pq_topk's scan plus the same broadcast
    # brute-force exact baseline as every recall eval
    "sim_pq_recall",
    # rerank_factor sweep: same broadcast brute-force exact baseline,
    # plus a crossJoin with the 4-row shortlist literal
    "sim_ivfpq_rerank_curve",
}

#: Scalar-subquery shapes: the nested-loop join's build side is a
#: broadcast SINGLE-ROW global aggregate (verified in plan) — the
#: correct plan for `col > (SELECT agg FROM ...)` at any scale.
SCALAR_OK = {
    "q11_important_parts",
    # zero-discount baseline: broadcast SINGLE-ROW aggregate (the
    # lift denominator every band divides by)
    "lineitem_discount_response",
    "q22_idle_customers",
    "cdc_snapshot_asof",
    "cdc_lag_metrics",
    # corpus token total: crossJoin(broadcast(1-row agg)) — the scalar
    # denominator every relative-frequency term divides by
    "text_domain_divergence",
    # same shape: vocabulary surprisal divides by the corpus token total
    "text_surprisal",
    # inherits text_surprisal's scalar token-total crossJoin
    "text_quality_ensemble",
    # 1-row degree summary x 1-row triangle count: both sides are
    # single-row global aggregates, so the nested-loop join is a
    # broadcast of one row
    "graph_triangles",
    # 1-row sketch x 1-row sketch: each side is one k-element KMV
    # array, the cross join combines exactly two rows
    "sketch_kmv_setops",
    # corpus dashboard: three single-row scalar aggregates cross-joined
    "text_corpus_health",
    # basket total: crossJoin(broadcast(1-row count)) — the lift
    # denominator, derived from the same reused basket exchange
    "orders_market_basket",
    # mixture-weight denominators: crossJoin(broadcast(1-row sums))
    "text_mix_weights",
    # heavy-hitter threshold: crossJoin(broadcast(1-row total)) read
    # from the checkpointed MG summary — replaced the operator's
    # separate count() action over the token stream (r15)
    "text_heavy_tokens",
    # global-centroid array: crossJoin(broadcast(1-row collect_list
    # rollup of the 64 component means)) — replaced the mid-build
    # collect() that re-derived the per-source aggregate twice (r15)
    "sim_domain_drift",
}

_QUERIES = sorted(entrymod.queries().items())


def _bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a plan-node argument string
    (window exprs contain nested brackets, so a regex split on
    ``], [`` is not safe)."""
    groups: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def unpartitioned_windows(plan: str) -> list[str]:
    """Window nodes with an ORDER spec but no PARTITION spec.

    WindowExec renders as ``Window [exprs], [partSpec], [orderSpec]``
    with empty specs omitted: 3 groups = partitioned+ordered, 2 groups
    whose last holds ASC/DESC = ordered UNPARTITIONED (the global-sort
    single-reducer shape), 2 groups otherwise = partitioned unordered.
    """
    bad = []
    for line in plan.splitlines():
        m = re.search(r"(?<![A-Za-z])Window (\[.*)$", line)
        if not m:
            continue
        groups = _bracket_groups(m.group(1))
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[1]):
            bad.append(line.strip())
    return bad


@pytest.mark.parametrize("name,fn", _QUERIES, ids=[n for n, _ in _QUERIES])
def test_plan_has_no_row_python_and_no_stray_cross_join(spark, name, fn):
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    if name not in CROSS_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
        if name not in SCALAR_OK:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name}: nested-loop join in plan"
            )
    bad = unpartitioned_windows(plan)
    assert not bad, f"{name}: unpartitioned ordered window in plan: {bad}"
