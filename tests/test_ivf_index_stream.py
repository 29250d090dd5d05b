"""streaming.ivf_index: the continuously-maintained IVF vector index
must assign cells exactly like the batch literal-matrix path, stamp
gap-free per-cell arrival ranks from the O(#cells) ledger, bound
SEARCHABLE membership at cell_cap by construction, emit for the final
arrival wave exactly the top-k a batch probe-join over the full corpus
produces, and stay byte-identical under epoch replay (including replay
of an OLD epoch after newer epochs landed) and under compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pipe_s_spark.functions import similarity as S
from pipe_s_spark.streaming.ivf_index import (
    IVF_CELL_CAP,
    apply_ivf_batch,
    run_ivf_index_stream,
)

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def cents(spark):
    return S.kmeans_train_int(_vectors(spark), iters=2)


def _batch_assign(spark, cents):
    xq = S.quantize_vec(S.as_double_array("embedding"))
    probes = S.kmeans_probes_int(xq, cents, nprobe=2)
    return _vectors(spark).select(
        "vec_id", "embedding", F.element_at(probes, 1).alias("cell"), probes.alias("probe_cells")
    )


def _expected_topk(spark, cents, query_pred, k=5):
    """Batch probe-join top-k over the FULL corpus — what the stream's
    final wave must reproduce exactly (by then everything is indexed)."""
    assigned = _batch_assign(spark, cents)
    queries = assigned.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode("probe_cells").alias("cell"),
    )
    cand = queries.join(assigned.select("vec_id", "embedding", "cell"), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    rescored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(S.cosine(S.as_double_array("q_emb"), S.as_double_array("embedding")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def _write_two_waves(spark, tmp_path):
    vecs = _vectors(spark)
    src = tmp_path / "vec_src"
    vecs.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(str(src / "w1"))
    vecs.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(str(src / "w2"))
    return src


def _stream(spark, src):
    return (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )


def test_stream_matches_batch_assignment_and_final_topk(spark, tmp_path, cents):
    src = _write_two_waves(spark, tmp_path)
    stream = _stream(spark, src)
    idx, tk, ck = str(tmp_path / "index"), str(tmp_path / "topk"), str(tmp_path / "ck")
    run_ivf_index_stream(stream, cents, idx, tk, ck, await_seconds=240)

    index = spark.read.parquet(idx)
    vecs = _vectors(spark)
    assert index.select("vec_id").distinct().count() == vecs.count()

    # cell assignment identical to the batch literal-matrix path
    want = {r["vec_id"]: r["cell"] for r in _batch_assign(spark, cents).collect()}
    got = {r["vec_id"]: r["cell"] for r in index.select("vec_id", "cell").collect()}
    assert got == want

    # per-cell arrival ranks are gap-free and unique across epochs
    for row in (
        index.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("cell_rank").alias("d"),
            F.max("cell_rank").alias("mx"),
            F.min("cell_rank").alias("mn"),
        )
        .collect()
    ):
        assert (row["mn"], row["mx"], row["d"]) == (1, row["n"], row["n"])
    # tiny corpus: nothing exceeds the default cap
    assert index.filter(~F.col("searchable")).count() == 0

    # the SECOND wave arrived last, so its queries saw the full corpus:
    # exact equality with the batch probe-join
    want_tk = {
        (r["query_id"], r["neighbor_id"], r["rk"])
        for r in _expected_topk(spark, cents, F.col("vec_id") % 2 == 1).collect()
    }
    got_tk = {
        (r["query_id"], r["neighbor_id"], r["rk"])
        for r in spark.read.parquet(tk).filter(F.col("batch_id") == 1).collect()
    }
    assert got_tk == want_tk and len(want_tk) > 0

    # restart on the same checkpoint: no new data -> nothing re-emitted
    n_tk, n_ix = spark.read.parquet(tk).count(), index.count()
    stream2 = _stream(spark, src)  # same src dir, same files
    run_ivf_index_stream(stream2, cents, idx, tk, ck, await_seconds=240)
    assert spark.read.parquet(tk).count() == n_tk
    assert spark.read.parquet(idx).count() == n_ix


def test_old_epoch_replay_is_idempotent(spark, tmp_path, cents):
    """Replaying epoch 0 AFTER epoch 1 landed (the zombie-writer probe
    that caught real bugs elsewhere) must rewrite epoch 0's partitions
    to identical content: strictly-earlier reads everywhere."""
    vecs = _vectors(spark)
    b0 = vecs.filter(F.col("vec_id") % 2 == 0)
    b1 = vecs.filter(F.col("vec_id") % 2 == 1)
    idx, tk = str(tmp_path / "index"), str(tmp_path / "topk")

    apply_ivf_batch(b0, 0, cents, idx, tk)
    apply_ivf_batch(b1, 1, cents, idx, tk)

    def snap(path):
        return sorted(
            map(tuple, spark.read.parquet(path).drop("embedding").collect())
        )

    before_ix, before_tk = snap(idx), snap(tk)
    apply_ivf_batch(b0, 0, cents, idx, tk)  # zombie replay of epoch 0
    assert snap(idx) == before_ix
    assert snap(tk) == before_tk


def test_cell_cap_bounds_searchable_membership(spark, tmp_path, cents):
    """With a tiny cap, every cell keeps at most ``cap`` searchable
    members ACROSS epochs (ranks continue through the ledger), and no
    unsearchable vector is ever emitted as a neighbor."""
    cap = 3
    vecs = _vectors(spark)
    b0 = vecs.filter(F.col("vec_id") % 2 == 0)
    b1 = vecs.filter(F.col("vec_id") % 2 == 1)
    idx, tk = str(tmp_path / "index"), str(tmp_path / "topk")

    apply_ivf_batch(b0, 0, cents, idx, tk, cell_cap=cap)
    apply_ivf_batch(b1, 1, cents, idx, tk, cell_cap=cap)

    index = spark.read.parquet(idx)
    per_cell = index.filter(F.col("searchable")).groupBy("cell").count().collect()
    assert per_cell and all(r["count"] <= cap for r in per_cell)
    # the cap actually bit (cells hold > cap members on this corpus)
    assert index.filter(~F.col("searchable")).count() > 0
    blocked = {r["vec_id"] for r in index.filter(~F.col("searchable")).collect()}
    emitted = {r["neighbor_id"] for r in spark.read.parquet(tk).collect()}
    assert not (blocked & emitted)
    assert IVF_CELL_CAP == 1000  # default mirrors SIM_BUCKET_CAP


def test_compaction_preserves_results(spark, tmp_path, cents):
    """compact_every folds committed epochs of index, ledger, and topk;
    the surviving row SETS (ignoring batch_id) must equal an
    uncompacted run's, and later epochs must still rank correctly."""
    vecs = _vectors(spark)
    src = tmp_path / "vec_src"
    for i in range(4):
        vecs.filter(F.col("vec_id") % 4 == i).coalesce(1).write.parquet(
            str(src / f"w{i}")
        )

    def start(sub, compact_every):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        p = tmp_path / sub
        run_ivf_index_stream(
            stream,
            cents,
            str(p / "index"),
            str(p / "topk"),
            str(p / "ck"),
            compact_every=compact_every,
            await_seconds=240,
        )
        return p

    plain = start("plain", None)
    comp = start("comp", 2)

    def rows(p, name):
        return sorted(
            map(
                tuple,
                spark.read.parquet(str(p / name)).drop("embedding", "batch_id").collect(),
            )
        )

    assert rows(comp, "index") == rows(plain, "index")
    assert rows(comp, "topk") == rows(plain, "topk")
    # compaction actually folded partitions away
    import os

    parts = [e for e in os.listdir(str(comp / "index")) if e.startswith("batch_id=")]
    assert len(parts) < 4


def test_runner_bootstrap_then_stream(spark, tmp_path, cents):
    """Config-driven form: a batch 'ivf-index' output bootstraps the
    corpus' even half as epoch 0 (training centroids from trainPath),
    then the streaming output ingests the odd half — whose queries
    must see the full corpus, matching the batch probe-join exactly."""
    import json as _json

    from pipe_s_spark.plans.runner import run_pipeline
    from pipe_s_spark.streaming.ivf_index import apply_ivf_batch

    vecs = _vectors(spark)
    train = tmp_path / "train"
    vecs.write.parquet(str(train))  # offline training corpus = full set
    base = tmp_path / "base"
    vecs.filter(F.col("vec_id") % 2 == 0).write.parquet(str(base))
    idx, tk = str(tmp_path / "idx"), str(tmp_path / "tk")
    spec = {
        "Input": {"Type": "parquet", "Config": {"path": str(base)}},
        "Output": {
            "Type": "ivf-index",
            "Config": {"indexPath": idx, "topkPath": tk, "trainPath": str(train)},
        },
    }
    _json.dumps(spec)  # spec must stay JSON-serializable (config-file form)
    run_pipeline(spark, spec)
    assert spark.read.parquet(idx).count() == vecs.filter(F.col("vec_id") % 2 == 0).count()

    # second wave as a later epoch via the direct API (a deployment's
    # stream checkpoint continues past the bootstrap epoch)
    apply_ivf_batch(
        vecs.filter(F.col("vec_id") % 2 == 1), 1, cents, idx, tk
    )
    want_tk = {
        (r["query_id"], r["neighbor_id"], r["rk"])
        for r in _expected_topk(spark, cents, F.col("vec_id") % 2 == 1).collect()
    }
    got_tk = {
        (r["query_id"], r["neighbor_id"], r["rk"])
        for r in spark.read.parquet(tk).filter(F.col("batch_id") == 1).collect()
    }
    assert got_tk == want_tk and len(want_tk) > 0


def test_merge_local_topk_equals_window_merge(spark):
    """The r13 epoch replaced the global per-query row_number
    sort-window with a hash-aggregate merge (_merge_local_topk).
    Property-pin the equivalence directly on adversarial data — score
    ties (the kernel emits 1e-6-rounded cosines, so ties are routine),
    signed zeros (negation must preserve the desc-score order), fewer
    than k candidates, and int64 scores (the ADC path) — so a future
    edit to either form trips here, not in a bench."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pipe_s_spark.streaming.ivf_index import _merge_local_topk

    rnd = random.Random(7)
    rows = []
    for q in range(60):
        n = rnd.randrange(1, 12)
        for _ in range(n):
            score = rnd.choice([0.0, -0.0, 0.5, 0.5, 0.25, 1.0, -0.125])
            rows.append((q, rnd.randrange(1000), float(score)))
    local = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cos_sim double"
    )
    k = 5
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    win = (
        local.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rk").cast("int").alias("rk"))
    )
    agg = _merge_local_topk(local, "cos_sim", k)
    assert sorted(map(tuple, win.collect())) == sorted(map(tuple, agg.collect()))

    # int64 scores (ADC mode) incl. negatives and ties
    rows_i = [
        (q, nid, s)
        for q in range(40)
        for nid, s in [(rnd.randrange(100), rnd.choice([-(2**40), 0, 7, 7, 2**41]))
                       for _ in range(rnd.randrange(1, 9))]
    ]
    local_i = spark.createDataFrame(
        rows_i, "query_id long, neighbor_id long, adc_dot long"
    )
    wq_i = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    win_i = (
        local_i.withColumn("rk", F.row_number().over(wq_i))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc_dot", F.col("rk").cast("int").alias("rk"))
    )
    agg_i = _merge_local_topk(local_i, "adc_dot", k)
    assert sorted(map(tuple, win_i.collect())) == sorted(map(tuple, agg_i.collect()))
    assert dict(agg_i.dtypes)["adc_dot"] == "bigint"
