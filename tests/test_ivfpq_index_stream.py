"""streaming.ivf_index COMPRESSED (pq_books) mode: the continuous
IVFADC index must persist PQ codes only (never the vector — the ~26x
state compression is the point of the mode), emit for the final
arrival wave exactly the ADC top-k a batch probe-join over the full
corpus produces, and stay byte-identical under out-of-order epoch
replay — all integer arithmetic, so determinism needs no rounding
convention."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pipe_s_spark.functions import similarity as S
from pipe_s_spark.streaming.ivf_index import apply_ivf_batch, run_ivf_index_stream

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def cents(spark):
    return S.kmeans_train_int(_vectors(spark), iters=2)


@pytest.fixture(scope="module")
def books(spark):
    return S.pq_train_int(_vectors(spark))


def _expected_adc_topk(spark, cents, books, query_pred, k=5, nprobe=2):
    """Batch IVF-ADC probe-join over the FULL corpus — what the
    stream's final wave must reproduce exactly."""
    xq = S.quantize_vec(S.as_double_array("embedding"))
    probes = S.kmeans_probes_int(xq, cents, nprobe=nprobe)
    assigned = S.pq_encode_table(
        _vectors(spark).select(
            "vec_id",
            "embedding",
            F.element_at(probes, 1).alias("cell"),
            probes.alias("probe_cells"),
        ),
        books,
        carry_cols={"cell": "int", "probe_cells": "array<int>"},
    )
    luts = S.pq_lut_table(
        assigned.filter(query_pred).select("vec_id", "xq"), books
    ).withColumnRenamed("vec_id", "query_id")
    queries = (
        assigned.filter(query_pred)
        .select(F.col("vec_id").alias("query_id"), F.explode("probe_cells").alias("cell"))
        .join(luts, "query_id")
    )
    cand = queries.join(assigned.select("vec_id", "codes", "cell"), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        S.pq_adc_score(F.col("lut"), F.col("codes")).alias("adc_dot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc_dot", "rk")
    )


def test_compressed_stream_stores_codes_and_matches_batch_adc(spark, tmp_path, cents, books):
    vecs = _vectors(spark)
    src = tmp_path / "vec_src"
    vecs.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(str(src / "w1"))
    vecs.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(str(src / "w2"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    idx, tk, ck = str(tmp_path / "index"), str(tmp_path / "topk"), str(tmp_path / "ck")
    run_ivf_index_stream(stream, cents, idx, tk, ck, await_seconds=240, pq_books=books)

    index = spark.read.parquet(idx)
    # the compression claim, structurally: codes in, vectors OUT
    assert "codes" in index.columns and "embedding" not in index.columns
    assert index.select("vec_id").distinct().count() == vecs.count()

    # second wave saw the full corpus: exact equality with batch ADC
    want = {
        (r["query_id"], r["neighbor_id"], r["adc_dot"], r["rk"])
        for r in _expected_adc_topk(
            spark, cents, books, F.col("vec_id") % 2 == 1
        ).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["adc_dot"], r["rk"])
        for r in spark.read.parquet(tk).filter(F.col("batch_id") == 1).collect()
    }
    assert got == want and len(want) > 0

    # restart on the same checkpoint: no new data -> nothing re-emitted
    n_tk, n_ix = spark.read.parquet(tk).count(), index.count()
    stream2 = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    run_ivf_index_stream(stream2, cents, idx, tk, ck, await_seconds=240, pq_books=books)
    assert spark.read.parquet(tk).count() == n_tk
    assert spark.read.parquet(idx).count() == n_ix


def test_compressed_old_epoch_replay_is_idempotent(spark, tmp_path, cents, books):
    """Zombie replay of epoch 0 after epoch 1 landed must rewrite
    byte-identical partitions (strictly-earlier reads everywhere —
    the same probe every incremental index here must survive)."""
    vecs = _vectors(spark)
    b0 = vecs.filter(F.col("vec_id") % 2 == 0)
    b1 = vecs.filter(F.col("vec_id") % 2 == 1)
    idx, tk = str(tmp_path / "index"), str(tmp_path / "topk")

    apply_ivf_batch(b0, 0, cents, idx, tk, pq_books=books)
    apply_ivf_batch(b1, 1, cents, idx, tk, pq_books=books)

    def snap(path):
        df = spark.read.parquet(path)
        cols = [c for c in df.columns if c != "codes"] + (
            [F.col("codes").cast("string").alias("codes_s")]
            if "codes" in df.columns
            else []
        )
        return sorted(map(tuple, df.select(*cols).collect()))

    before_ix, before_tk = snap(idx), snap(tk)
    apply_ivf_batch(b0, 0, cents, idx, tk, pq_books=books)  # zombie replay
    assert snap(idx) == before_ix
    assert snap(tk) == before_tk


def test_runner_compressed_bootstrap_then_stream(spark, tmp_path, cents, books):
    """Config-driven compressed form ('pq': true): the batch
    'ivf-index' output bootstraps the even half as epoch 0 — codebook
    AND centroids trained from trainPath — then a later epoch ingests
    the odd half; its ADC top-k must match the batch IVFADC probe-join
    over the full corpus."""
    import json as _json

    from pipe_s_spark.plans.runner import run_pipeline

    vecs = _vectors(spark)
    train = tmp_path / "train"
    vecs.write.parquet(str(train))
    base = tmp_path / "base"
    vecs.filter(F.col("vec_id") % 2 == 0).write.parquet(str(base))
    idx, tk = str(tmp_path / "idx"), str(tmp_path / "tk")
    spec = {
        "Input": {"Type": "parquet", "Config": {"path": str(base)}},
        "Output": {
            "Type": "ivf-index",
            "Config": {
                "indexPath": idx,
                "topkPath": tk,
                "trainPath": str(train),
                "pq": True,
            },
        },
    }
    _json.dumps(spec)  # config-file form must stay JSON-serializable
    run_pipeline(spark, spec)
    index = spark.read.parquet(idx)
    assert "codes" in index.columns and "embedding" not in index.columns

    apply_ivf_batch(
        vecs.filter(F.col("vec_id") % 2 == 1), 1, cents, idx, tk, pq_books=books
    )
    want = {
        (r["query_id"], r["neighbor_id"], r["adc_dot"], r["rk"])
        for r in _expected_adc_topk(
            spark, cents, books, F.col("vec_id") % 2 == 1
        ).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["adc_dot"], r["rk"])
        for r in spark.read.parquet(tk).filter(F.col("batch_id") == 1).collect()
    }
    assert got == want and len(want) > 0


def test_runner_inline_pq_books_parse(spark):
    """The runner's inline `pqBooks` form ({sub: {code: [components]}},
    the JSON-config shape for pinned deployments) must parse to the
    exact trainer dict, surviving a JSON round-trip (string keys)."""
    import json as _json

    from pipe_s_spark.plans.runner import _ivf_pq_books

    books = {(0, 1): [3, -4], (1, 0): [-7, 9]}
    cfg_books = {"0": {"1": [3, -4]}, "1": {"0": [-7, 9]}}
    cfg = _json.loads(_json.dumps({"pq": True, "pqBooks": cfg_books}))
    assert _ivf_pq_books(spark, cfg) == books
    assert _ivf_pq_books(spark, {"pq": False}) is None


def test_runner_inline_pq_books_geometry_validated(spark):
    """Pinned pqM/pqK that disagree with the inline books' geometry
    must be REJECTED at parse time: a code >= pqK scatters ADC LUT
    entries into the next subspace's slots (silently wrong scores for
    every subspace but the last, which IndexErrors), so the spec error
    has to fire before any batch runs. Inconsistent codeword widths
    are the same class of config rot."""
    import pytest as _pytest

    from pipe_s_spark.plans.runner import PipelineSpecError, _ivf_pq_books

    # code 2 out of range for pqK=2
    bad_code = {"pq": True, "pqM": 1, "pqK": 2, "pqBooks": {"0": {"2": [1, 2]}}}
    with _pytest.raises(PipelineSpecError, match="codes out of range"):
        _ivf_pq_books(spark, bad_code)
    # subspace 1 out of range for pqM=1
    bad_sub = {"pq": True, "pqM": 1, "pqK": 4, "pqBooks": {"1": {"0": [1, 2]}}}
    with _pytest.raises(PipelineSpecError, match="subspaces out of range"):
        _ivf_pq_books(spark, bad_sub)
    # ragged codeword widths
    ragged = {
        "pq": True,
        "pqM": 2,
        "pqK": 4,
        "pqBooks": {"0": {"0": [1, 2]}, "1": {"0": [1]}},
    }
    with _pytest.raises(PipelineSpecError, match="inconsistent widths"):
        _ivf_pq_books(spark, ragged)
    # UNPINNED geometry: a consistent codebook with non-default shape
    # (32 subspaces > module PQ_M) must still parse — downstream
    # derives m/k from the books when the config doesn't pin them
    wide = {
        "pq": True,
        "pqBooks": {str(s): {"0": [1, 2]} for s in range(32)},
    }
    assert len(_ivf_pq_books(spark, wide)) == 32
