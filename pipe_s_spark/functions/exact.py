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


def dsum_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB-side rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB-side rendering of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE) / COUNT(*)"
