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
    from pipe_s_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same column aliases)."""
    from pipe_s_spark.registry import all_oracles

    return all_oracles()
