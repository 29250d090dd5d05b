"""Distributed EXACT interpolated quantiles with bounded memory.

Spark's built-in ``percentile()`` aggregate is exact but buffers every
value of a group in executor memory (an ObjectHashAggregate over an
OpenHashMap) — fine at bench scale, an OOM at 100 TB where one group
can hold billions of rows. This module computes the SAME interpolated
order statistic out of two shuffles whose per-task state is bounded:

1. ``groupBy(keys, value)`` — per-distinct-value counts (map-side
   combine collapses each task's contribution before the shuffle; the
   shuffled relation is one row per DISTINCT value, not per row);
2. a ``partitionBy(keys)`` ordered window computes cumulative counts
   (sort-based, spillable), after which the row covering each target
   rank is selected with a narrow filter and one final ``groupBy(keys)``
   interpolates ``v_lo + frac * (v_hi - v_lo)`` — the formula both
   Spark ``percentile`` and DuckDB ``quantile_cont`` use, so results
   are bit-compatible with the in-memory builtin (asserted in
   tests/test_operators.py and by the ``percentiles_distributed``
   oracle, whose DuckDB side is the plain ``quantile_cont``).

This is the quantile analog of operators.skew.salted_agg: a
scale-hardened rewrite whose output must be indistinguishable from the
naive form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dquantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    qs: Sequence[float],
    aliases: Sequence[str] | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """Per-``keys`` exact interpolated quantiles of ``value_col`` at
    each q in ``qs``, one output row per key group.

    Null values are ignored (matching ``percentile()``); a group with
    only nulls is dropped from the output (the builtin would emit a
    null-estimate row — filter upstream if that distinction matters). ``aliases`` names the output
    columns (default ``p{int(q*100)}``); ``round_to`` applies
    ``ROUND(est, round_to)`` so cross-engine comparisons are stable.
    """
    keys = list(keys)
    if aliases is None:
        aliases = [f"p{int(q * 100)}" for q in qs]
    if len(aliases) != len(qs):
        raise ValueError("aliases must match qs")

    vc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_ord = Window.partitionBy(*keys).orderBy(value_col)
    w_all = Window.partitionBy(*keys)
    vc = vc.withColumn("_cum", F.sum("_c").over(w_ord)).withColumn(
        "_n", F.sum("_c").over(w_all)
    )

    # Row r covers the 0-based sorted ranks [_cum - _c, _cum - 1]; the
    # target position for q is pos = q * (n - 1), bracketed by ranks
    # floor(pos) and ceil(pos). Exactly one row covers each rank, so a
    # conditional max per (q, side) pulls v_lo / v_hi through one
    # final groupBy without materializing ranks row-by-row.
    aggs: list[Column] = []
    for q, name in zip(qs, aliases):
        pos = F.lit(float(q)) * (F.col("_n") - 1).cast("double")
        lo = F.floor(pos).cast("long")
        hi = F.ceil(pos).cast("long")
        covers_lo = (F.col("_cum") - F.col("_c") <= lo) & (lo < F.col("_cum"))
        covers_hi = (F.col("_cum") - F.col("_c") <= hi) & (hi < F.col("_cum"))
        v = F.col(value_col).cast("double")
        v_lo = F.max(F.when(covers_lo, v))
        v_hi = F.max(F.when(covers_hi, v))
        frac = F.max(F.when(covers_lo, pos - lo.cast("double")))
        est = v_lo + frac * (v_hi - v_lo)
        if round_to is not None:
            est = F.round(est, round_to)
        aggs.append(est.alias(name))
    return vc.groupBy(*keys).agg(*aggs)
