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
    """Parquet-directory upsert target with epoch-atomic swap.

    Write protocol per epoch: read current -> merge -> write to
    ``<path>.epoch-<n>`` -> atomic rename over ``<path>``. A replayed
    epoch (crash between commit points) recomputes the same merge from
    the same inputs — idempotent, so effects are exactly-once, matching
    the reference's idempotent-SQL story (utils/mysql.go:197-218).
    """

    def __init__(
        self,
        path: str,
        key_cols: Sequence[str] = ("table_name", "pk"),
        payload_cols: Sequence[str] = ("k", "value"),
        seq_col: str = "seq",
        op_col: str = "op",
    ):
        self.path = path
        self.key_cols = list(key_cols)
        self.payload_cols = list(payload_cols)
        self.seq_col = seq_col
        self.op_col = op_col

    def read_current(self, spark: SparkSession) -> DataFrame:
        cols = self.key_cols + self.payload_cols
        if os.path.isdir(self.path):
            return spark.read.parquet(self.path).select(*cols)
        fields = [f for f in FLAT_CHANGELOG_SCHEMA.fields if f.name in cols]
        return spark.createDataFrame([], T.StructType(fields))

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        compacted = compact_changelog(
            batch,
            key_cols=self.key_cols,
            seq_col=self.seq_col,
            op_col=self.op_col,
            payload_cols=self.payload_cols,
        )
        merged = merge_apply(
            self.read_current(spark), compacted, self.key_cols, self.payload_cols
        )
        tmp = f"{self.path}.epoch-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.old-{epoch_id}"
        if os.path.isdir(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)


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
