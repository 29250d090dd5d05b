"""Kafka changelog source — the reference's primary transport.

Parity: ``KafkaInput`` (/root/reference/pkg/input/kafka/kafkainput.go:
16-28): consume a topic of JSON change events, track offsets, hand each
event to the pipeline. In Spark the consumer loop, offset tracking and
restart-resume are the built-in ``kafka`` streaming source + the query
checkpoint — the code that remains is the envelope decode, shared with
every other transport.

No broker (or spark-sql-kafka connector jar) exists in this test
environment, so ``read_kafka_changelog`` is constructed but not
e2e-tested here; ``decode_changelog_frame`` — the entire transform
surface — is unit-tested against statically-built frames with the
connector's exact output schema (key/value binary, topic, partition,
offset, timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipe_s_spark.model import CHANGE_EVENT_JSON_SCHEMA


def decode_changelog_frame(
    frame: DataFrame,
    schema: T.StructType = CHANGE_EVENT_JSON_SCHEMA,
    value_col: str = "value",
    keep_source_cols: tuple[str, ...] = ("topic", "partition", "offset"),
) -> DataFrame:
    """Decode Kafka wire frames into typed change events.

    ``value`` (binary JSON) -> from_json(envelope schema), flattened;
    source coordinates (topic/partition/offset) are kept for lineage /
    dedup — the offset is the transport-level sequence the reference
    stores as its input state (kafkainput.go SetState). Narrow,
    codegen'd, no shuffle.
    """
    keep = [c for c in keep_source_cols if c in frame.columns]
    ev = F.from_json(F.col(value_col).cast("string"), schema).alias("ev")
    return frame.select(*keep, ev).select(*keep, "ev.*")


def read_kafka_changelog(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    schema: T.StructType = CHANGE_EVENT_JSON_SCHEMA,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Streaming change-event source from Kafka.

    Offset persistence/resume comes from the checkpoint of the query
    this stream feeds (the ``FileStateStore``/``ZKStateStore`` analog);
    ``maxOffsetsPerTrigger`` bounds micro-batch size like the
    reference's ring-buffer batching. Topic-partitions map 1:1 to input
    partitions, so parallelism scales with the topic and no repartition
    is needed before a keyed stateful stage (Spark shuffles on the
    grouping key there anyway).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return decode_changelog_frame(reader.load(), schema)
