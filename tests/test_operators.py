"""Operator-level unit tests, mirroring the reference's own unit suite
(SURVEY.md §5.1): construct tiny frames, apply the operator, assert the
transformed payload. The compaction property test replays random op
sequences through a naive row-by-row applier — the reference's
integrity-loop idea, done cheaply in memory."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from pipe_s_spark.operators import (
    catch_table_name,
    check_consistency,
    compact_changelog,
    filter_dml,
    map_actions,
    map_names,
    merge_apply,
    value_map,
)


def test_filter_dml_regex_and_ops(spark):
    df = spark.createDataFrame(
        [("sbtest1", "insert"), ("sbtest2", "delete"), ("other", "insert")],
        "table_name string, op string",
    )
    out = df.transform(filter_dml(r"^sbtest\d+$", ["insert"])).collect()
    assert [(r.table_name, r.op) for r in out] == [("sbtest1", "insert")]


def test_map_actions_swaps_rows_on_delete_to_insert(spark):
    """dbchange.go:239-269 semantics: remapping delete->insert moves
    OldRow into NewRow."""
    df = spark.createDataFrame(
        [
            Row(op="delete", old_row=Row(id=1, v="x"), new_row=None),
            Row(op="insert", old_row=None, new_row=Row(id=2, v="y")),
        ]
    )
    out = {r.op: r for r in df.transform(map_actions({"delete": "insert"})).collect()}
    assert set(out) == {"insert"}
    rows = df.transform(map_actions({"delete": "insert"})).collect()
    swapped = [r for r in rows if r.new_row and r.new_row.id == 1][0]
    assert swapped.old_row is None and swapped.new_row.v == "x"
    untouched = [r for r in rows if r.new_row and r.new_row.id == 2][0]
    assert untouched.new_row.v == "y"


def test_map_actions_insert_to_delete_moves_new_to_old(spark):
    df = spark.createDataFrame(
        [("insert", None, (7, "z"))],
        "op string, old_row struct<id:long,v:string>, new_row struct<id:long,v:string>",
    )
    r = df.transform(map_actions({"insert": "delete"})).collect()[0]
    assert r.op == "delete" and r.new_row is None and r.old_row.id == 7


def test_map_names_and_value_map(spark):
    df = spark.createDataFrame([("app", "sbtest3", 5)], "db string, table_name string, k int")
    out = (
        df.transform(map_names(db_map={"app": "dw"}, column_map={"k": "kk"}))
        .transform(catch_table_name(r"^(sbtest)\d+$"))
        .transform(value_map({"sbtest": "t_sb"}, "logical_table", "topic", "dflt"))
        .collect()[0]
    )
    assert (out.db, out.kk, out.logical_table, out.topic) == ("dw", 5, "sbtest", "t_sb")


def _naive_apply(ops):
    """Row-by-row reference applier for one key: returns final row or
    None (absent)."""
    state = None
    for op, payload in ops:
        if op == "insert" or op == "update":
            state = payload
        elif op == "delete":
            state = None
    return state


def test_compaction_matches_naive_replay_random_sequences(spark):
    """Property test: for random per-key op sequences, batch compaction
    + merge-apply onto the correct base equals naive sequential replay."""
    rng = random.Random(42)
    rows = []
    expected = {}
    base_rows = []
    seq = 0
    for key in range(60):
        in_db = rng.random() < 0.5
        if in_db:
            base_rows.append((key, -1))  # pre-existing row, payload -1
        # well-formed CDC sequence: insert only when absent,
        # update/delete only when present (the invariant the reference's
        # inDB inference relies on, batchmessage.go:25-57)
        exists = in_db
        ops = []
        for i in range(rng.randint(1, 6)):
            op = "insert" if not exists else rng.choice(["update", "delete"])
            exists = op != "delete"
            payload = key * 100 + i
            ops.append((op, payload))
            rows.append((seq, key, op, payload))
            seq += 1
        base_state = [("insert", -1)] if in_db else []
        final = _naive_apply(base_state + ops)
        if final is not None:
            expected[key] = final
    cl = spark.createDataFrame(rows, "seq long, pk long, op string, payload long")
    base = spark.createDataFrame(base_rows or [(None, None)], "pk long, payload long").filter(
        F.col("pk").isNotNull()
    )
    compacted = compact_changelog(cl, key_cols=("pk",), payload_cols=("payload",))
    result = merge_apply(base, compacted, ("pk",), ("payload",))
    got = {r.pk: r.payload for r in result.collect()}
    assert got == expected


def test_compaction_annihilates_insert_delete(spark):
    cl = spark.createDataFrame(
        [(0, 1, "insert", 10), (1, 1, "delete", 10), (2, 2, "insert", 20)],
        "seq long, pk long, op string, payload long",
    )
    out = compact_changelog(cl, key_cols=("pk",), payload_cols=("payload",))
    rows = {r.pk: r.net_op for r in out.collect()}
    assert rows == {2: "insert"}


def test_compaction_delete_insert_becomes_update(spark):
    cl = spark.createDataFrame(
        [(0, 1, "delete", 0), (1, 1, "insert", 42)],
        "seq long, pk long, op string, payload long",
    )
    r = compact_changelog(cl, key_cols=("pk",), payload_cols=("payload",)).collect()[0]
    assert r.net_op == "update" and r.payload == 42


def test_checker_classifies_miss_and_diff(spark):
    src = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    tgt = spark.createDataFrame([(1, "a"), (3, "X")], "id long, v string")
    out = {(r.id, r.diff_type) for r in check_consistency(src, tgt, ["id"], ["v"]).collect()}
    assert out == {(2, "row_miss"), (3, "row_diff")}
