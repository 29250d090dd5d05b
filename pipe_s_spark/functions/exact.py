"""Order-independent (exact) floating aggregates.

Summing doubles is order-dependent: Spark's partial aggregation tree
and DuckDB's sequential scan add in different orders, so raw
``SUM(double)`` differs in the last ulps between engines — enough to
break bit-exact oracle comparison. The fix: the source values are
fixed-decimal (prices with 2 decimals, products of 2-decimal values
have 4/6 decimals), so cast each row to DECIMAL before aggregating —
decimal addition is exact and associative — and cast the final result
back to double. Both engines then produce the identical double.

This also matters beyond testing: at 100 TB, money aggregates through
doubles silently drift; decimal partial aggregation keeps results
reproducible across partitionings and AQE re-plans.

Policy for float-emitting oracle queries (in precedence order):

1. If the value can be integral, make it integral: averages of integer
   measures emit fixed-point micro-units via :func:`davg_int` — a
   BIGINT cannot diverge under ANY downstream float-hashing policy.
2. Money sums over fixed-decimal inputs: :func:`dsum` / :func:`davg`
   (decimal partial aggregation, one final IEEE division).
3. Genuinely real-valued outputs (cosines, ratios): ``ROUND(.., 6)``
   on BOTH engines to absorb summation-order ulps.

Raw double division and bare ``ROUND`` over double sums are outlawed:
both lost driver-gate hash comparisons (rounds 1-3) that the
bit-exact local replica passed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact sum of fixed-decimal doubles, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact-numerator average: SUM(decimal)::double / COUNT(*).

    The single double division is IEEE-deterministic, so both engines
    agree bit-exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(F.lit(1))


def davg_int(expr: str, scale_up: int = 1_000_000) -> Column:
    """Fixed-point integer average: ``(SUM(expr) * scale_up) DIV COUNT(*)``
    as BIGINT — an average in micro-units (scale_up=1e6).

    For non-negative integer measures this is the strongest determinism
    tier: no double ever exists, so no float-hashing policy can diverge
    on it. Spark's ``DIV`` and DuckDB's ``//`` agree for non-negative
    operands (both truncate); callers must not feed negative measures.
    Overflow bound: ``SUM(expr) * scale_up`` must fit int64.
    """
    return F.expr(f"CAST((SUM({expr}) * {scale_up}) DIV COUNT(1) AS BIGINT)")


def davg_int_sql(expr: str, scale_up: int = 1_000_000) -> str:
    """DuckDB-side rendering of :func:`davg_int` (``//`` = integer div;
    DuckDB's SUM(BIGINT) is HUGEINT so the product cannot overflow
    before the final BIGINT cast)."""
    return f"CAST((SUM({expr}) * {scale_up}) // COUNT(*) AS BIGINT)"


def dsum_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB-side rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB-side rendering of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE) / COUNT(*)"
