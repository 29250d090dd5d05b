"""Streaming data-quality gate with dead-letter routing: every
micro-batch is tagged by an ExpectationSuite's row-level checks, clean
rows flow to the main sink, violating rows land in a QUARANTINE sink
carrying the list of failed checks, and a per-batch metrics ledger
records violation counts per check — the Delta-Live-Tables
"expectations" semantics (warn / drop / quarantine) on plain
Structured Streaming.

Reference parity: the streaming sibling of
`pkg/output/mysql/checkoutput.go:293-445` — where MysqlCheckOutput
verifies landed rows after the fact, the gate verifies them in-flight
and refuses to land the bad ones.

At-scale notes: the tag pass is narrow (conditional expressions plus
broadcast stream-static joins for FK checks); each batch is persisted
once so the good/bad split and the metrics rollup read one
materialization, not three recomputes; the metrics ledger appends one
row per (batch, check) — vocabulary-sized, never row-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipe_s_spark.operators.expectations import ExpectationSuite
from pipe_s_spark.streaming.dedup_index import DEFAULT_COMPACT_EVERY


def run_quarantine_gate(
    stream: DataFrame,
    suite: ExpectationSuite,
    good_path: str,
    quarantine_path: str,
    metrics_path: str,
    checkpoint: str,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
    await_seconds: int | None = None,
):
    """Start (and optionally await) the gate on ``stream``.

    Clean rows (no violated checks) land in ``good_path`` without the
    tag column; violating rows go to ``quarantine_path`` with
    ``_violated`` rendered as a sorted comma-joined string (stable for
    downstream grouping); ``metrics_path`` accrues one row per
    (batch_id, check) with that batch's violation count and row total.
    All three sinks are PARTITIONED BY batch_id and written with
    dynamic partition overwrite, so a replayed epoch (restart after a
    crash between sink write and stream commit) rewrites its own
    partitions to identical content instead of duplicating rows — the
    same layout-level idempotence the dedup-index maintainer and the
    merge sink's epoch fence provide.

    ``compact_every``: every N epochs, fold committed per-batch
    partitions of all three sinks into one
    (streaming.dedup_index.compact_index_partitions with
    ``dedupe=False`` — ledger rows may legitimately repeat, and the
    intent-log protocol gives exactly-once folding without relying on
    dedup) so a long-running gate keeps O(1) partitions instead of
    O(#batches). DEFAULT-ON at streaming.dedup_index.
    DEFAULT_COMPACT_EVERY (None opts out). Safe inside foreachBatch:
    epochs are sequential, so watermark = the current epoch id only
    touches committed epochs.
    """
    for p in (good_path, quarantine_path, metrics_path):
        os.makedirs(p, exist_ok=True)

    def _write(df: DataFrame, path: str) -> None:
        (
            df.write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        tagged = suite.tag(batch_df).persist()
        try:
            n_total = tagged.count()
            bid = F.lit(batch_id).cast("long").alias("batch_id")
            good = tagged.filter(F.size("_violated") == 0).drop("_violated")
            bad = tagged.filter(F.size("_violated") > 0).withColumn(
                "_violated", F.array_join(F.array_sort("_violated"), ",")
            )
            _write(good.withColumn("batch_id", bid), good_path)
            _write(bad.withColumn("batch_id", bid), quarantine_path)
            metrics = (
                tagged.select(F.explode("_violated").alias("check"))
                .groupBy("check")
                .agg(F.count(F.lit(1)).alias("violations"))
                .select(
                    bid,
                    # epoch duplicates batch_id as a DATA column: the
                    # partition column is layout (rewritten when old
                    # partitions are folded by compaction), but per-
                    # batch attribution is the metric ledger's CONTENT
                    # — it must survive a fold
                    F.lit(batch_id).cast("long").alias("epoch"),
                    "check",
                    "violations",
                    F.lit(n_total).cast("long").alias("batch_rows"),
                )
            )
            _write(metrics, metrics_path)
            if compact_every and batch_id > 0 and batch_id % compact_every == 0:
                from pipe_s_spark.streaming.dedup_index import (
                    compact_index_partitions,
                )

                spark = batch_df.sparkSession
                for p in (good_path, quarantine_path, metrics_path):
                    compact_index_partitions(
                        spark, p, watermark=batch_id, dedupe=False
                    )
        finally:
            tagged.unpersist()

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_seconds is not None:
        q.awaitTermination(await_seconds)
    return q
