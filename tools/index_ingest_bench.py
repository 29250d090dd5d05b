"""Continuous-index ingest throughput at one corpus scale: the
streaming IVF index (vector mode) and the streaming MinHash-LSH dedup
index each ingest the given corpus in 4 epochs (each epoch probing /
banding against everything indexed earlier — the steady-state shape),
and the wall time prints as one JSON line.

Run by tools/stream_scaling.py at sf0.1 and the amplified x10 corpus
(20x documents/embeddings) in SEPARATE subprocesses, so each scale gets
a fresh JVM/session — same protocol as the CDC legs. Centroid training
is the offline once-per-corpus step every production IVF does and is
excluded from the timed window.

Usage: python tools/index_ingest_bench.py <corpus_dir>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from pipe_s_spark.session import get_spark

    spark = get_spark(
        app_name="index_ingest_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the Python workers so epoch 0 measures the operator
    spark.range(256).repartition(
        int(spark.sparkContext.defaultParallelism)
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict = {"corpus": corpus, "legs": {}}
    tmp = tempfile.mkdtemp(prefix="index_ingest_")
    try:
        from pipe_s_spark.functions.similarity import kmeans_train_int
        from pipe_s_spark.streaming.ivf_index import apply_ivf_batch

        emb = (
            spark.read.parquet(f"{corpus}/embeddings.parquet")
            .select("vec_id", "embedding")
            .localCheckpoint()
        )
        n_vec = emb.count()
        cents = kmeans_train_int(emb, iters=2)
        # operator warmup (untimed, throwaway index): JIT the assign /
        # grouped-topk pipelines so the timed epochs measure the
        # steady-state ingest rate, not whole-stage-codegen compilation
        # (see tools/stream_bench.py — same protocol)
        apply_ivf_batch(
            emb.filter(F.pmod(F.col("vec_id"), F.lit(37)) == 0),
            0,
            cents,
            f"{tmp}/warm_index",
            f"{tmp}/warm_topk",
        )
        for d in ("warm_index", "warm_index.cells", "warm_topk"):
            shutil.rmtree(f"{tmp}/{d}", ignore_errors=True)
        # drain the warmup epoch's garbage (see tools/stream_bench.py)
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
        t0 = time.time()
        for i in range(4):
            apply_ivf_batch(
                emb.filter(F.pmod(F.col("vec_id"), F.lit(4)) == i),
                i,
                cents,
                f"{tmp}/ivf_index",
                f"{tmp}/ivf_topk",
            )
        dt = time.time() - t0
        out["legs"]["ivf_ingest"] = {
            "sec": round(dt, 2),
            "rows": n_vec,
            "rows_per_sec": int(n_vec / dt),
        }

        # compressed (IVFADC) ingest leg — ask of the r10 brief: the
        # x10 scaling study covered the vector-mode and dedup indexes
        # only; this gives `ivfpq_ingest` the same fresh-session
        # two-scale protocol. Codebook training is the same offline
        # once-per-corpus step as centroid training (untimed), and the
        # ADC kernels get their own throwaway warmup epoch (they share
        # nothing JIT-wise with the vector probe).
        from pipe_s_spark.functions.similarity import pq_train_int

        books = pq_train_int(emb)
        apply_ivf_batch(
            emb.filter(F.pmod(F.col("vec_id"), F.lit(37)) == 0),
            0,
            cents,
            f"{tmp}/warm_pq_index",
            f"{tmp}/warm_pq_topk",
            pq_books=books,
        )
        for d in ("warm_pq_index", "warm_pq_index.cells", "warm_pq_topk"):
            shutil.rmtree(f"{tmp}/{d}", ignore_errors=True)
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
        t0 = time.time()
        for i in range(4):
            apply_ivf_batch(
                emb.filter(F.pmod(F.col("vec_id"), F.lit(4)) == i),
                i,
                cents,
                f"{tmp}/ivfpq_index",
                f"{tmp}/ivfpq_topk",
                pq_books=books,
            )
        dt = time.time() - t0
        out["legs"]["ivfpq_ingest"] = {
            "sec": round(dt, 2),
            "rows": n_vec,
            "rows_per_sec": int(n_vec / dt),
        }

        from pipe_s_spark.streaming.dedup_index import apply_index_batch

        docs = (
            spark.read.parquet(f"{corpus}/documents.parquet")
            .select("doc_id", "text")
            .localCheckpoint()
        )
        n_doc = docs.count()
        t0 = time.time()
        for i in range(4):
            apply_index_batch(
                docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i),
                i,
                f"{tmp}/dedup_index",
                f"{tmp}/dedup_pairs",
            )
        dt = time.time() - t0
        out["legs"]["dedup_index_ingest"] = {
            "sec": round(dt, 2),
            "rows": n_doc,
            "rows_per_sec": int(n_doc / dt),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
