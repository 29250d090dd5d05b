"""Unit tests for the scale-guard helpers added in round 4:

- ``exact.davg_int``: integer micro-unit average agrees between Spark
  and DuckDB bit-for-bit (it's a BIGINT — no float ever exists);
- ``dedup.cap_group_size``: oversized groups are dropped whole,
  smaller groups untouched;
- ``test_plan_quality.unpartitioned_windows``: the plan parser
  distinguishes global ordered windows (scale-killer) from partitioned
  and unordered ones.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from pipe_s_spark.functions import exact as E
from pipe_s_spark.functions.dedup import cap_group_size


def test_davg_int_matches_duckdb_bit_for_bit(spark):
    # engineered awkward division: 2279/7-style ties broke ROUND(..,6)
    data = [("a", v) for v in (325, 325, 325, 325, 326, 326, 327)] + [
        ("b", v) for v in (1, 2, 4)
    ]
    df = spark.createDataFrame(data, "g string, n long")
    got = {
        r["g"]: r["avg_x1m"]
        for r in df.groupBy("g").agg(E.davg_int("n").alias("avg_x1m")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", data)
    want = dict(
        con.execute(
            f"SELECT g, {E.davg_int_sql('n')} AS a FROM t GROUP BY g"
        ).fetchall()
    )
    assert got == want
    assert all(isinstance(v, int) for v in got.values())
    assert got["a"] == (2279 * 1_000_000) // 7


def test_cap_group_size_drops_oversized_groups_whole(spark):
    rows = [("hot", i) for i in range(10)] + [("warm", i) for i in range(3)] + [("cold", 0)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = cap_group_size(df, ["k"], cap=3)
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert [k for k, _ in got] == ["cold"] + ["warm"] * 3
    assert out.columns == ["k", "v"]  # helper column dropped


def test_unpartitioned_window_detector(spark):
    from pyspark.sql.window import Window

    from tests.test_plan_quality import unpartitioned_windows

    df = spark.range(10).withColumn("g", F.col("id") % 2)
    plan_global = (
        df.withColumn("s", F.sum("id").over(Window.orderBy("id")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert unpartitioned_windows(plan_global), "global ordered window must be flagged"
    plan_part = (
        df.withColumn("s", F.sum("id").over(Window.partitionBy("g").orderBy("id")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not unpartitioned_windows(plan_part)
    plan_unordered = (
        df.withColumn("c", F.count("*").over(Window.partitionBy("g")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not unpartitioned_windows(plan_unordered)


def test_pack_assign_semantics(spark):
    """Pack ids start at 0, stay within the allocated global range, and
    no pack exceeds the 2048-token budget by more than one doc's
    overhang (a doc larger than the budget legitimately overflows its
    own pack; pack ids may skip where a huge doc spans several)."""
    from pipe_s_spark.queries_llm import q_text_pack_assign

    out = q_text_pack_assign(spark, "/root/testdata/sf0.001").collect()
    assert out, "non-empty"
    packs: dict[int, int] = {}
    biggest: dict[int, int] = {}
    for r in out:
        packs[r["pack_id"]] = packs.get(r["pack_id"], 0) + r["n_tokens"]
        biggest[r["pack_id"]] = max(biggest.get(r["pack_id"], 0), r["n_tokens"])
    assert min(packs) == 0
    multi_doc_over = [p for p, tot in packs.items() if tot > 2048 + biggest[p]]
    assert not multi_doc_over
