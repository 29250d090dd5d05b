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
    schema: "T.StructType | str",
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


class SchemaRegistry:
    """Mutable per-table schema store with DDL invalidation.

    Parity: ``SimpleSchemaStore`` (/root/reference/pkg/schema/simple.go:
    72-166) caches table schemas and **invalidates on DDL events**
    (simple.go:92-103, driven from the binlog reader's query-event path,
    binloginput.go:477-502). Here the cache is a plain dict; the
    streaming driver calls :func:`apply_ddl_events` per micro-batch
    BEFORE fanning out, so an ALTER TABLE flowing through the changelog
    re-types every subsequent batch — per-query Spark schemas are
    static, so batch granularity is the Structured-Streaming-correct
    invalidation point.
    """

    def __init__(
        self,
        schemas: Mapping[str, T.StructType] | None = None,
        fetcher: "Callable[[str], T.StructType | None] | None" = None,
    ):
        self._schemas: dict[str, T.StructType] = dict(schemas or {})
        #: lazy source-of-truth lookup (the SHOW COLUMNS / JDBC-metadata
        #: equivalent, simple.go:106-166); injected so tests use a fake
        #: and production wires a JDBC metadata query
        self._fetcher = fetcher
        self.version = 0

    def get(self, table: str) -> T.StructType | None:
        return self._schemas.get(table)

    def get_or_fetch(
        self,
        table: str,
        fetcher: "Callable[[str], T.StructType | None] | None" = None,
    ) -> T.StructType | None:
        """Cached schema, lazily refetched from the source of truth on
        a miss — the reference's invalidate-then-refetch pair
        (``SimpleSchemaStore.GetTable``, simple.go:72-103: consult the
        cache, else re-SELECT INFORMATION_SCHEMA and repopulate).

        ``fetcher`` overrides the registry-level one for this call;
        with neither configured a miss just returns None (pure in-band
        mode). A fetch result is cached, so repeated misses cost one
        source round-trip."""
        cached = self._schemas.get(table)
        if cached is not None:
            return cached
        f = fetcher or self._fetcher
        if f is None:
            return None
        fetched = f(table)
        if fetched is not None:
            self.set(table, fetched)
        return fetched

    def tables(self) -> list[str]:
        return sorted(self._schemas)

    def set(self, table: str, schema: T.StructType) -> None:
        self._schemas[table] = schema
        self.version += 1

    def invalidate(self, table: str) -> None:
        """Drop the cached schema WITHOUT forgetting the table existed:
        the next :meth:`get_or_fetch` repopulates from the source —
        the DDL-invalidation half of the reference's protocol
        (simple.go:92-103)."""
        if self._schemas.pop(table, None) is not None:
            self.version += 1

    def drop(self, table: str) -> None:
        if self._schemas.pop(table, None) is not None:
            self.version += 1

    def snapshot(self) -> dict[str, T.StructType]:
        return dict(self._schemas)


def apply_ddl_events(
    registry: SchemaRegistry,
    batch: DataFrame,
    op_col: str = "op",
    table_col: str = "table_name",
    ddl_col: str = "new_row",
    seq_col: str = "seq",
) -> DataFrame:
    """Consume DDL events from a batch, mutating ``registry``; return
    the batch with DDL rows removed (only DML flows on to fan-out).

    A DDL event is ``op == 'ddl'`` whose payload (``ddl_col``, JSON)
    carries ``{"action": "alter"|"drop", "columns": {name: typeDDL}}``
    — e.g. ``{"action": "alter", "columns": {"k": "int", "note":
    "string"}}`` re-types the table to those columns. An "alter" (or
    "invalidate") WITHOUT columns only invalidates the cached schema,
    to be lazily refetched via :meth:`SchemaRegistry.get_or_fetch` —
    the reference's invalidate-then-rebuild (it re-SELECTs
    INFORMATION_SCHEMA, simple.go:92-166; a self-contained stream may
    instead carry the new shape in-band).

    DDL rows are driver-collected — they are rare control events (one
    per ALTER), not data — and applied in ``seq_col`` order: collect()
    returns rows in partition order, so without the sort two ALTERs of
    the same table inside one batch could apply in arbitrary order and
    leave the registry on the older shape.
    """
    import json

    ddl = batch.filter(F.col(op_col) == "ddl")
    if seq_col in batch.columns:
        ddl = ddl.orderBy(seq_col)
    ddl_rows = ddl.select(table_col, ddl_col).collect()
    for r in ddl_rows:
        spec = json.loads(r[ddl_col]) if r[ddl_col] else {}
        table = r[table_col]
        if spec.get("action") == "drop":
            registry.drop(table)
            continue
        cols = spec.get("columns")
        if not cols:
            registry.invalidate(table)
            continue
        registry.set(
            table,
            T.StructType([T.StructField(n, _parse_type(t), True) for n, t in cols.items()]),
        )
    return batch.filter(F.col(op_col) != "ddl")


def _parse_type(type_ddl: str) -> T.DataType:
    return T._parse_datatype_string(type_ddl)


def fan_out_tables(
    df: DataFrame,
    schemas: "Mapping[str, T.StructType] | SchemaRegistry",
    table_col: str = "table_name",
    json_cols: tuple[str, ...] = ("old_row", "new_row"),
) -> dict[str, DataFrame]:
    """Split a heterogeneous change stream by table and type each branch.

    Returns ``{table: typed DataFrame}``. Each branch is an independent
    lazy plan over the same scan; Catalyst pushes the table predicate
    into the source, so at scale each branch reads only its partitions
    (partition the upstream store by table for full pruning).
    """
    if isinstance(schemas, SchemaRegistry):
        schemas = schemas.snapshot()
    out: dict[str, DataFrame] = {}
    for table, schema in schemas.items():
        branch = df.filter(F.col(table_col) == table)
        for jc in json_cols:
            if jc in branch.columns:
                branch = branch.withColumn(jc, F.from_json(F.col(jc), schema))
        out[table] = branch
    return out
