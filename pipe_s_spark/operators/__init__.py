from pipe_s_spark.operators.filters import filter_dml
from pipe_s_spark.operators.converter import (
    SchemaRegistry,
    apply_ddl_events,
    apply_schema,
    fan_out_tables,
)
from pipe_s_spark.operators.mapping import map_actions, map_names
from pipe_s_spark.operators.values import catch_table_name, column_value, value_map
from pipe_s_spark.operators.jsonio import marshal_json, unmarshal_json
from pipe_s_spark.operators.compaction import compact_changelog, merge_apply
from pipe_s_spark.operators.checker import check_consistency
from pipe_s_spark.operators.history import scd2_history, snapshot_asof
from pipe_s_spark.operators.skew import salted_agg, salted_join

__all__ = [
    "salted_agg",
    "salted_join",
    "filter_dml",
    "SchemaRegistry",
    "apply_ddl_events",
    "apply_schema",
    "fan_out_tables",
    "map_actions",
    "map_names",
    "catch_table_name",
    "column_value",
    "value_map",
    "marshal_json",
    "unmarshal_json",
    "compact_changelog",
    "merge_apply",
    "check_consistency",
    "scd2_history",
    "snapshot_asof",
]
