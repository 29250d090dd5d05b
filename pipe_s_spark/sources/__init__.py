from pipe_s_spark.sources.readers import TABLES, load_table, load_tables, scan_tables
from pipe_s_spark.sources.kafka import decode_changelog_frame, read_kafka_changelog

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "scan_tables",
    "decode_changelog_frame",
    "read_kafka_changelog",
]
