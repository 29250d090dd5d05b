"""streaming.quarantine: the gate must split every row exactly once
(good + quarantined = input), tag quarantined rows with the precise
failed-check list, and ledger per-batch violation counts — including
FK checks running as stream-static broadcast joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipe_s_spark.operators.expectations import ExpectationSuite
from pipe_s_spark.streaming.quarantine import run_quarantine_gate


def test_gate_splits_and_tags(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        (1, "A", 5.0),     # clean
        (2, None, 3.0),    # not_null:cat
        (3, "Z", -1.0),    # in_set:cat + in_range:v + satisfies:v_positive
        (4, "B", 2.0),     # clean
        (5, "B", None),    # satisfies:v_positive (null predicate)
    ]
    spark.createDataFrame(rows, "id long, cat string, v double").coalesce(1).write.parquet(
        str(src / "batch0")
    )
    suite = (
        ExpectationSuite("t")
        .not_null("cat")
        .in_set("cat", ["A", "B"])
        .in_range("v", lo=0.0)
        .satisfies("v_positive", F.col("v") > 0)
    )
    stream = spark.readStream.schema("id long, cat string, v double").parquet(
        str(src / "batch0")
    )
    good_p, bad_p, met_p, ckpt = (
        str(tmp_path / "good"),
        str(tmp_path / "bad"),
        str(tmp_path / "metrics"),
        str(tmp_path / "ckpt"),
    )
    run_quarantine_gate(stream, suite, good_p, bad_p, met_p, ckpt, await_seconds=120)

    good = spark.read.parquet(good_p)
    bad = spark.read.parquet(bad_p)
    assert sorted(r["id"] for r in good.collect()) == [1, 4]
    assert "_violated" not in good.columns
    tags = {r["id"]: r["_violated"] for r in bad.collect()}
    assert tags[2] == "not_null:cat"
    assert tags[3] == "in_range:v,in_set:cat,satisfies:v_positive"
    assert tags[5] == "satisfies:v_positive"
    met = {r["check"]: (r["violations"], r["batch_rows"]) for r in spark.read.parquet(met_p).collect()}
    assert met["not_null:cat"] == (1, 5)
    assert met["in_set:cat"] == (1, 5)
    assert met["in_range:v"] == (1, 5)
    assert met["satisfies:v_positive"] == (2, 5)


def test_gate_fk_stream_static_join(spark, tmp_path):
    src = tmp_path / "src2"
    src.mkdir()
    spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id long, fk long"
    ).coalesce(1).write.parquet(str(src / "b0"))
    dim = spark.createDataFrame([(10,), (20,)], "pk long")
    suite = ExpectationSuite("t").foreign_key("fk", dim, "pk")
    stream = spark.readStream.schema("id long, fk long").parquet(str(src / "b0"))
    good_p, bad_p, met_p, ckpt = (
        str(tmp_path / "g2"),
        str(tmp_path / "b2"),
        str(tmp_path / "m2"),
        str(tmp_path / "c2"),
    )
    run_quarantine_gate(stream, suite, good_p, bad_p, met_p, ckpt, await_seconds=120)
    good = sorted(r["id"] for r in spark.read.parquet(good_p).collect())
    bad = sorted(r["id"] for r in spark.read.parquet(bad_p).collect())
    # null FK is not a violation; 99 misses the dim
    assert good == [1, 3] and bad == [2]


def test_unique_rejected_for_row_tagging(spark):
    import pytest

    df = spark.range(3)
    with pytest.raises(ValueError):
        ExpectationSuite("t").unique("id").tag(df)
