from pipe_s_spark.sinks.jdbc_upsert import (
    UpsertStatements,
    build_upsert_statements,
    jdbc_upsert_writer,
)
from pipe_s_spark.sinks.kafka import kafka_sink_frame, write_kafka_stream

__all__ = [
    "UpsertStatements",
    "build_upsert_statements",
    "jdbc_upsert_writer",
    "kafka_sink_frame",
    "write_kafka_stream",
]
