"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine implementation lives in ``pipe_s_spark/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: derive a deterministic
    change stream, filter it, compact it to net effect per key, and
    apply it to a base snapshot — the reference pipeline's essence
    (binlog -> filter -> batch-compact -> upsert) as one batch plan."""
    from pipe_s_spark.queries_cdc import q_cdc_merge_apply

    return q_cdc_merge_apply(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    from pipe_s_spark import (
        queries_advanced,
        queries_analytics,
        queries_cdc,
        queries_llm,
        queries_tpch2,
        queries_tpch3,
    )

    out.update(queries_cdc.QUERIES)
    out.update(queries_analytics.QUERIES)
    out.update(queries_llm.QUERIES)
    out.update(queries_advanced.QUERIES)
    out.update(queries_tpch2.QUERIES)
    out.update(queries_tpch3.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same column aliases)."""
    out: dict[str, str] = {}
    from pipe_s_spark import (
        queries_advanced,
        queries_analytics,
        queries_cdc,
        queries_llm,
        queries_tpch2,
        queries_tpch3,
    )

    out.update(queries_cdc.ORACLES)
    out.update(queries_analytics.ORACLES)
    out.update(queries_llm.ORACLES)
    out.update(queries_advanced.ORACLES)
    out.update(queries_tpch2.ORACLES)
    out.update(queries_tpch3.ORACLES)
    return out
