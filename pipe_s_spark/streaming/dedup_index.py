"""CONTINUOUS dedup-index maintenance: a document stream keeps a
persisted MinHash-LSH band index up to date and emits candidate pairs
for every arriving batch against everything indexed before it — the
operational form of `queries_llm.q_dedup_incremental` (there the
"arriving batch" is simulated; here it actually arrives).

Per micro-batch, inside one ``foreachBatch``:

1. shingle -> MinHash signature -> band rows for the batch documents
   (functions.dedup — identical family constants to the batch queries,
   so the streaming index is interchangeable with a batch-built one);
2. equi-join the batch bands against the EXISTING index (band_id,
   band_sig) plus the batch itself -> new candidate pairs, appended to
   ``pairs_path``;
3. append the batch bands to the index.

Exactly-once on replay: both the index and the pairs table are
partitioned by ``batch_id`` and written with dynamic partition
OVERWRITE, and the index side of the join admits STRICTLY EARLIER
epochs only (batch ids are monotone) — a replayed epoch therefore
sees exactly the index it saw the first time and rewrites its own
partitions to identical content, even if later epochs already landed
(the layout-level idempotence the merge_apply sink gets from its
epoch fence; proven by tests/test_dedup_index_stream.py's
out-of-order replay test).

At 100 TB: per-ingest cost is O(batch x matching bands), never
O(corpus); the index is the persisted narrow band table (doc_id,
band_id, band_sig — bytes per doc, not the doc), and the band
equi-join is the same bounded-fan-out shape the batch LSH queries cap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipe_s_spark.functions.dedup import lsh_bands, minhash_signature, shingles


def run_dedup_index_stream(
    doc_stream: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    band_cap: int | None = None,
    await_seconds: int | None = None,
):
    """Start (and optionally await) the index maintainer on
    ``doc_stream``. The index holds (doc_id, band_id, band_sig,
    batch_id); pairs hold (d1, d2, batch_id) with d1 < d2.

    ``band_cap`` bounds the per-(band_id, band_sig) group size of the
    ARRIVING batch before the join (functions.dedup.cap_group_size —
    the same guard the batch LSH queries run): at corpus scale a
    boilerplate band key would otherwise fan a single batch out
    quadratically. Capping the batch side only keeps the incremental
    result a superset-per-batch of what a capped batch recompute
    yields; leave None to match the uncapped recompute exactly (the
    e2e test's contract)."""
    os.makedirs(index_path, exist_ok=True)
    os.makedirs(pairs_path, exist_ok=True)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        apply_index_batch(
            batch_df,
            batch_id,
            index_path,
            pairs_path,
            id_col=id_col,
            text_col=text_col,
            k=k,
            num_hashes=num_hashes,
            bands=bands,
            band_cap=band_cap,
        )

    q = (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_seconds is not None:
        q.awaitTermination(await_seconds)
    return q


def apply_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    pairs_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    band_cap: int | None = None,
) -> None:
    """One epoch of index maintenance — the foreachBatch body, exposed
    so replay/recovery paths are directly testable: calling this twice
    with the same (batch, batch_id) rewrites the same partitions to
    identical content (exactly what a post-crash Structured Streaming
    replay does)."""
    spark = batch_df.sparkSession
    sh = shingles(batch_df.select(id_col, text_col), id_col, text_col, k=k)
    sig = minhash_signature(sh, id_col, num_hashes=num_hashes)
    new_bands = lsh_bands(sig, id_col, num_hashes=num_hashes, bands=bands)
    if band_cap is not None:
        from pipe_s_spark.functions.dedup import cap_group_size

        new_bands = cap_group_size(new_bands, ["band_id", "band_sig"], band_cap)
    new_bands = new_bands.persist()
    try:
        try:
            # STRICTLY EARLIER epochs only: batch ids are monotone, so
            # a replayed epoch must see exactly the index it saw the
            # first time — filtering only its own id would let a zombie
            # replay of epoch N join against epoch N+1's bands and
            # write pairs epoch N+1's partition already owns
            existing = spark.read.parquet(index_path).filter(
                F.col("batch_id") < batch_id
            )
        except Exception:
            existing = None
        a = new_bands.alias("a")
        sides = [new_bands.alias("b")]
        if existing is not None:
            sides.append(existing.select(id_col, "band_id", "band_sig").alias("b"))
        pair_parts = []
        for side in sides:
            pair_parts.append(
                a.join(
                    side,
                    (F.col("a.band_id") == F.col("b.band_id"))
                    & (F.col("a.band_sig") == F.col("b.band_sig"))
                    & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
                ).select(
                    F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("d1"),
                    F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("d2"),
                )
            )
        pairs = pair_parts[0]
        for p in pair_parts[1:]:
            pairs = pairs.unionByName(p)
        (
            pairs.distinct()
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(pairs_path)
        )
        (
            new_bands.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(index_path)
        )
    finally:
        new_bands.unpersist()
