"""Variable-extraction processors -> derived columns.

The reference threads a ``map[string]interface{}`` of "custom
variables" through each message's MetaMap; Spark rows are immutable, so
each variable becomes a derived column:

- ``DBTableNameCatcher`` (/root/reference/pkg/processor/value/
  dbtablename.go:62-87): regex sub-match extraction of a logical
  db/table from sharded physical names (sbtest1..N -> sbtest).
- ``ColumnValueProcessor`` (value/columnvalue.go:38-52): lift one
  payload column's value out (typically the Kafka partition key).
- ``ValueMapper`` (value/valuemapper.go:38-47): dictionary lookup
  variable -> variable (e.g. logical table -> topic name).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipe_s_spark.operators.mapping import _dict_lookup


def catch_table_name(
    pattern: str,
    src_col: str = "table_name",
    out_col: str = "logical_table",
    group: int = 1,
) -> Callable[[DataFrame], DataFrame]:
    """``withColumn(out, regexp_extract(src, pattern, group))``.

    With no capture-group match, yields '' (same as Go's no-submatch
    behavior leaving the variable unset -> treat '' as unset).
    """

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(out_col, F.regexp_extract(F.col(src_col), pattern, group))

    return _apply


def column_value(
    src: str | Column,
    out_col: str = "partition_key",
) -> Callable[[DataFrame], DataFrame]:
    """Lift a payload column/expression into a named column (e.g. the
    sink partition key). Accepts dotted paths for struct payloads
    ("new_row.id")."""

    def _apply(df: DataFrame) -> DataFrame:
        col = F.col(src) if isinstance(src, str) else src
        return df.withColumn(out_col, col)

    return _apply


def value_map(
    mapping: Mapping[str, str],
    in_col: str,
    out_col: str,
    default: str | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Dictionary lookup as a literal-map expression; unmatched values
    get ``default`` (or null). For large dictionaries prefer a broadcast
    join; literal maps are constant-folded and shuffle-free."""

    def _apply(df: DataFrame) -> DataFrame:
        dflt = F.lit(default) if default is not None else F.lit(None).cast("string")
        return df.withColumn(out_col, _dict_lookup(F.col(in_col), mapping, dflt))

    return _apply
