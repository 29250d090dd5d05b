"""streaming.dedup_index: the continuously-maintained LSH band index
must yield EXACTLY the candidate-pair set a batch recompute over the
full corpus produces, with per-ingest work bounded by the batch; a
restart with the same checkpoint must not re-emit or duplicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipe_s_spark.functions.dedup import lsh_bands, minhash_signature, shingles
from pipe_s_spark.streaming.dedup_index import run_dedup_index_stream

SF = "/root/testdata/sf0.001"


def _batch_pairs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    sh = shingles(docs, "doc_id", "text", k=3)
    bands = lsh_bands(minhash_signature(sh, "doc_id"), "doc_id")
    a, b = bands.alias("a"), bands.alias("b")
    return {
        (r["d1"], r["d2"])
        for r in a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
        .collect()
    }


def test_streaming_index_matches_batch_recompute(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    src = tmp_path / "docs_src"
    # two arrival waves -> two micro-batches (maxFilesPerTrigger=1)
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(str(src / "w1"))
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(str(src / "w2"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    idx_p, pr_p, ck = str(tmp_path / "index"), str(tmp_path / "pairs"), str(tmp_path / "ck")
    run_dedup_index_stream(stream, idx_p, pr_p, ck, await_seconds=240)

    got = {
        (r["d1"], r["d2"])
        for r in spark.read.parquet(pr_p).select("d1", "d2").collect()
    }
    want = _batch_pairs(spark)
    assert got == want and len(want) > 0
    # every pair exactly once across batch partitions
    n_rows = spark.read.parquet(pr_p).count()
    assert n_rows == len(got)
    # the index now covers the whole corpus
    n_indexed = spark.read.parquet(idx_p).select("doc_id").distinct().count()
    assert n_indexed == docs.count()

    # restart on the same checkpoint: no new data -> nothing re-emitted
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    run_dedup_index_stream(stream2, idx_p, pr_p, ck, await_seconds=240)
    assert spark.read.parquet(pr_p).count() == n_rows
