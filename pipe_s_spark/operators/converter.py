"""Schema application & per-table fan-out.

Parity: ``MysqlDMLToDBChangeConverter`` (/root/reference/pkg/processor/
converter/dml_to_dbchange.go:30-74) zips positional row arrays with the
cached table schema into a named map, erroring on arity mismatch. In
Spark, rows are named from the start; the remaining real work is
applying a concrete schema to a JSON payload — ``from_json`` enforces
the schema (mismatched fields become null, the declarative analog of
the arity check).

``fan_out_tables`` handles the heterogeneous multi-table stream: the
envelope keeps payloads as JSON strings; after splitting by table the
per-table schema is applied. This mirrors the reference's late
schema-zip and is the standard Structured-Streaming answer to
"schema varies by table" (per-query schemas must be static).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def apply_schema(
    schema: T.StructType,
    json_col: str = "new_row",
    out_col: str | None = None,
    flatten: bool = False,
) -> Callable[[DataFrame], DataFrame]:
    """Parse a JSON payload column into a typed struct (or flat columns).

    ``df.transform(apply_schema(schema, "new_row"))``
    """
    out = out_col or json_col

    def _apply(df: DataFrame) -> DataFrame:
        parsed = df.withColumn(out, F.from_json(F.col(json_col), schema))
        if flatten:
            keep = [c for c in parsed.columns if c != out]
            return parsed.select(*keep, F.col(f"{out}.*"))
        return parsed

    return _apply


def fan_out_tables(
    df: DataFrame,
    schemas: Mapping[str, T.StructType],
    table_col: str = "table_name",
    json_cols: tuple[str, ...] = ("old_row", "new_row"),
) -> dict[str, DataFrame]:
    """Split a heterogeneous change stream by table and type each branch.

    Returns ``{table: typed DataFrame}``. Each branch is an independent
    lazy plan over the same scan; Catalyst pushes the table predicate
    into the source, so at scale each branch reads only its partitions
    (partition the upstream store by table for full pruning).
    """
    out: dict[str, DataFrame] = {}
    for table, schema in schemas.items():
        branch = df.filter(F.col(table_col) == table)
        for jc in json_cols:
            if jc in branch.columns:
                branch = branch.withColumn(jc, F.from_json(F.col(jc), schema))
        out[table] = branch
    return out
