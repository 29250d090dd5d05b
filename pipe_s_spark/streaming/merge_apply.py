"""Streaming CDC apply: changelog stream -> compacted upsert into a
target table, resumable from checkpoints.

This is the Spark restatement of the reference's whole runtime
(/root/reference/pkg/task/task.go + pkg/pipeline/simple/disruptor.go +
pkg/output/mysql/batch/*):

- source offsets + restart         -> Structured Streaming checkpoint
  (binloginput.go SetState/GetState)   (offset log, automatic)
- ring-buffer micro-batching,      -> micro-batch trigger
  flush every 3000 rows / 100 ms       (trigger availableNow/processingTime)
- per-PK hash routing for ordered  -> compaction collapses order inside
  apply (batchoutput.go:164-190)      the batch; cross-batch order from
                                      sequential epochs
- changelog compaction + multi-row -> operators.compaction.compact_changelog
  upsert (batchmessage.go)            + merge_apply inside foreachBatch
- at-least-once + idempotent SQL   -> exactly-once *effects*: epoch
  (utils/mysql.go:197-218)            replays re-run merge_apply, which
                                      is idempotent (upsert semantics)

The target here is a parquet directory swapped atomically per epoch
(no Delta in this environment); on a cluster the same foreachBatch body
targets Delta MERGE or JDBC upsert unchanged.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pipe_s_spark.operators.compaction import compact_changelog, merge_apply

#: Flat changelog schema for JSON file streams (model.changelog_from_events
#: shape). Heterogeneous streams would carry JSON payloads instead.
FLAT_CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("db", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("pk", T.LongType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def stream_changelog_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType = FLAT_CHANGELOG_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source change stream (the self-contained stand-in for a
    Kafka/Debezium topic; swap format('kafka') + from_json in prod)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


class MergeApplyTarget:
    """Key-hash-bucketed parquet upsert target: the Delta-MERGE-shaped
    alternative when no transactional table format is available.

    Layout: ``<path>/bucket=K/`` with ``K = pmod(hash(key_cols), N)``.
    Per epoch only buckets containing touched keys are read, merged and
    swapped — untouched bucket directories are not rewritten (at 100 TB
    a micro-batch touches a small key set, so the rewrite is
    O(touched-buckets), not O(table)). On a cluster the same foreachBatch
    body targets Delta MERGE or JDBC upsert unchanged.

    Crash safety: each touched bucket is swapped by rename via an
    ``.old-<epoch>`` sibling; ``_recover`` runs before every read and
    rolls a half-finished swap back (bucket dir missing + .old present)
    or forward (both present -> drop .old). A replayed epoch then
    recomputes the same merge from the same inputs — merge_apply is an
    idempotent upsert, so effects stay exactly-once, matching the
    reference's idempotent-SQL story (utils/mysql.go:197-218).
    """

    def __init__(
        self,
        path: str,
        key_cols: Sequence[str] = ("table_name", "pk"),
        payload_cols: Sequence[str] = ("k", "value"),
        seq_col: str = "seq",
        op_col: str = "op",
        num_buckets: int = 16,
    ):
        self.path = path
        self.key_cols = list(key_cols)
        self.payload_cols = list(payload_cols)
        self.seq_col = seq_col
        self.op_col = op_col
        self.num_buckets = num_buckets

    def _bucket(self, df: DataFrame):
        from pyspark.sql import functions as F

        return F.pmod(F.hash(*[F.col(c) for c in self.key_cols]), F.lit(self.num_buckets))

    def _bucket_dir(self, k: int) -> str:
        return os.path.join(self.path, f"bucket={k}")

    def _recover(self) -> None:
        """Roll dangling bucket swaps back or forward (ADVICE: a crash
        between the two renames must not read as an empty bucket)."""
        if not os.path.isdir(self.path):
            return
        for entry in os.listdir(self.path):
            # ".old-<epoch>-bucket=K": dot-prefixed so Spark's partition
            # discovery ignores it even if a crash leaves it behind
            if not entry.startswith(".old-") or "-bucket=" not in entry:
                continue
            bucket_name = "bucket=" + entry.split("-bucket=", 1)[1]
            live = os.path.join(self.path, bucket_name)
            old = os.path.join(self.path, entry)
            if os.path.isdir(live):
                shutil.rmtree(old, ignore_errors=True)  # swap completed
            else:
                os.rename(old, live)  # swap half-done: roll back

    def read_current(self, spark: SparkSession, buckets: Sequence[int] | None = None) -> DataFrame:
        from pyspark.sql import functions as F

        self._recover()
        cols = self.key_cols + self.payload_cols
        import glob as _glob

        has_data = os.path.isdir(self.path) and bool(
            _glob.glob(os.path.join(self.path, "bucket=*", "*.parquet"))
        )
        if not has_data:
            fields = [f for f in FLAT_CHANGELOG_SCHEMA.fields if f.name in cols]
            return spark.createDataFrame([], T.StructType(fields))
        df = spark.read.option("basePath", self.path).parquet(self.path)
        if buckets is not None:
            # partition pruning: only the touched bucket dirs are scanned
            df = df.filter(F.col("bucket").isin(list(buckets)))
        return df.select(*cols)

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        compacted = compact_changelog(
            batch,
            key_cols=self.key_cols,
            seq_col=self.seq_col,
            op_col=self.op_col,
            payload_cols=self.payload_cols,
        ).cache()
        try:
            # touched buckets: bounded driver-side metadata (<= num_buckets)
            touched = sorted(
                r["b"] for r in compacted.select(self._bucket(compacted).alias("b")).distinct().collect()
            )
            if not touched:
                return
            merged = merge_apply(
                self.read_current(spark, buckets=touched),
                compacted,
                self.key_cols,
                self.payload_cols,
            )
            merged = merged.withColumn("bucket", self._bucket(merged))
            stage = f"{self.path}.stage-{epoch_id}"
            merged.write.mode("overwrite").partitionBy("bucket").parquet(stage)
            os.makedirs(self.path, exist_ok=True)
            for k in touched:
                staged = os.path.join(stage, f"bucket={k}")
                if not os.path.isdir(staged):
                    os.makedirs(staged)  # bucket fully deleted -> empty dir
                live = self._bucket_dir(k)
                old = os.path.join(self.path, f".old-{epoch_id}-bucket={k}")
                if os.path.isdir(live):
                    os.rename(live, old)
                os.rename(staged, live)
                shutil.rmtree(old, ignore_errors=True)
            shutil.rmtree(stage, ignore_errors=True)
        finally:
            compacted.unpersist()


def run_merge_apply_stream(
    changes: DataFrame,
    target: MergeApplyTarget,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the apply query. With ``available_now`` the query drains
    the backlog and stops (bounded job, like the reference's scan mode,
    scaninput.go done-flag); otherwise it runs continuously."""
    writer = (
        changes.writeStream.foreachBatch(target.apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
