"""Predicate filter over a change stream.

Parity: ``MysqlDMLFilter`` (/root/reference/pkg/processor/filter/
mysqldml.go:50-63) keeps a row iff its fully-qualified table name
matches a regex AND its operation is in the allowed set. Here it is a
single Catalyst filter expression — pushed down to the source scan when
possible, and usable identically in batch and streaming plans.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_dml(
    table_regex: str | None = None,
    ops: Iterable[str] | None = None,
    table_col: str = "table_name",
    op_col: str = "op",
    db_col: str | None = None,
    db_regex: str | None = None,
    full_name_regex: str | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Build a composable filter: ``df.transform(filter_dml(...))``.

    ``table_regex`` is matched against the table name (use
    ``db_col``/``db_regex`` for a separate database predicate);
    ``full_name_regex`` matches the reference's
    ``FullTableNamePattern`` semantics — the regex runs against
    ``db.table`` (`pkg/processor/filter/mysqldml.go:50-63`);
    ``ops`` restricts operations (insert/update/delete).
    """

    def _apply(df: DataFrame) -> DataFrame:
        cond: Column = F.lit(True)
        if table_regex is not None:
            cond = cond & F.col(table_col).rlike(table_regex)
        if db_regex is not None and db_col is not None:
            cond = cond & F.col(db_col).rlike(db_regex)
        if full_name_regex is not None:
            full = F.concat_ws(".", F.col(db_col or "db"), F.col(table_col))
            cond = cond & full.rlike(full_name_regex)
        if ops is not None:
            cond = cond & F.col(op_col).isin(list(ops))
        return df.filter(cond)

    return _apply
