from pipe_s_spark.functions.exact import davg, dsum

__all__ = ["davg", "dsum"]
