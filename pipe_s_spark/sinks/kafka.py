"""Kafka sink shaping — parity with the reference's KafkaOutput
(/root/reference/pkg/output/kafka/kafkaoutput.go): topic and partition
key from per-message variables, hash partitioning iff a key is set
(kafkaoutput.go:96-100), ordered delivery.

Spark's Kafka connector handles the producer mechanics (and its
idempotent producer + checkpointing strictly beats the reference's
retries-disabled ordering compromise, kafkaoutput.go:89). What remains
here is the frame shaping — key/value/topic columns — which is pure
DataFrame code and unit-testable without a broker. ``write_kafka_stream``
is the thin, env-gated launcher (no broker in this container).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kafka_sink_frame(
    df: DataFrame,
    value_cols: Sequence[str] | None = None,
    key_col: str | Column | None = None,
    topic: str | None = None,
    topic_col: str | None = None,
    max_value_bytes: int | None = None,
) -> DataFrame:
    """Shape a DataFrame into the Kafka sink contract: ``key`` (nullable
    -> round-robin, mirroring the reference's partitioner switch),
    ``value`` (JSON), and optionally a per-row ``topic`` column.

    ``max_value_bytes`` drops oversized messages (parity:
    kafkaoutput.go:222-226's skip option).
    """
    use = list(value_cols) if value_cols is not None else df.columns
    out = df.withColumn("value", F.to_json(F.struct(*[F.col(c) for c in use])))
    if key_col is not None:
        k = F.col(key_col) if isinstance(key_col, str) else key_col
        out = out.withColumn("key", k.cast("string"))
    else:
        out = out.withColumn("key", F.lit(None).cast("string"))
    if topic_col is not None:
        out = out.withColumn("topic", F.col(topic_col))
    elif topic is not None:
        out = out.withColumn("topic", F.lit(topic))
    if max_value_bytes is not None:
        out = out.filter(F.octet_length(F.col("value")) <= max_value_bytes)
    cols = ["key", "value"] + (["topic"] if (topic or topic_col) else [])
    return out.select(*cols)


def write_kafka_stream(
    shaped: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    topic: str | None = None,
):
    """Start the Kafka streaming write (requires a broker + the
    spark-sql-kafka package on the classpath; not available in this
    test environment — the shaping above is the tested part)."""
    w = (
        shaped.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
    )
    if topic:
        w = w.option("topic", topic)
    return w.start()
