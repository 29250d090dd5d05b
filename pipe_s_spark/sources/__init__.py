from pipe_s_spark.sources.readers import TABLES, load_table, load_tables, scan_tables

__all__ = ["TABLES", "load_table", "load_tables", "scan_tables"]
