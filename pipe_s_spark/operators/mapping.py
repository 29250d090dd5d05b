"""Name/action remapping of change events.

Parity: ``DBChangeMappingProcessor`` (/root/reference/pkg/processor/
mapping/dbchange.go:166-269): rename source->target database, table and
columns, and remap operations (e.g. ``delete -> insert``) shuffling the
row payload between OldRow/NewRow accordingly (action semantics at
dbchange.go:239-269). All of it is ``when()``/map-literal expressions —
constant-folded by Catalyst, zero shuffle.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dict_lookup(col: Column, mapping: Mapping[str, str], default: Column) -> Column:
    """Literal-map lookup with passthrough default (broadcast-free)."""
    if not mapping:
        return default
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    return F.coalesce(F.element_at(m, col), default)


def map_names(
    db_map: Mapping[str, str] | None = None,
    table_map: Mapping[str, str] | None = None,
    column_map: Mapping[str, str] | None = None,
    db_col: str = "db",
    table_col: str = "table_name",
) -> Callable[[DataFrame], DataFrame]:
    """Rename databases / tables / payload columns.

    ``column_map`` renames top-level columns (flat payload mode). For
    struct payloads, rename inside the struct with ``withField`` before
    calling, or operate post-flatten.
    """

    def _apply(df: DataFrame) -> DataFrame:
        if db_map:
            df = df.withColumn(db_col, _dict_lookup(F.col(db_col), db_map, F.col(db_col)))
        if table_map:
            df = df.withColumn(
                table_col, _dict_lookup(F.col(table_col), table_map, F.col(table_col))
            )
        if column_map:
            for src, dst in column_map.items():
                if src in df.columns:
                    df = df.withColumnRenamed(src, dst)
        return df

    return _apply


def map_actions(
    action_map: Mapping[str, str],
    op_col: str = "op",
    old_col: str = "old_row",
    new_col: str = "new_row",
) -> Callable[[DataFrame], DataFrame]:
    """Remap operations, moving the payload between old/new rows.

    Semantics (dbchange.go:239-269): when an event's operation is
    remapped, the surviving row payload follows the *target* operation's
    convention — a delete's OldRow becomes the NewRow of an
    insert/update, and an insert/update's NewRow becomes the OldRow of
    a delete. Unmapped operations pass through unchanged.
    """
    items = list(action_map.items())

    def _remap(col: Column) -> Column:
        out = col
        for src, dst in items:
            out = F.when(col == src, F.lit(dst)).otherwise(out)
        return out

    def _apply(df: DataFrame) -> DataFrame:
        has_rows = old_col in df.columns and new_col in df.columns
        new_op = _remap(F.col(op_col))
        if not has_rows:
            return df.withColumn(op_col, new_op)
        was_delete = F.col(op_col) == "delete"
        to_delete = new_op == "delete"
        changed = new_op != F.col(op_col)
        # payload moves ONLY for remapped events (dbchange.go:239-269);
        # pass-through events keep both pre- and post-images untouched
        # (an update keeps OldRow AND NewRow)
        payload = F.when(was_delete, F.col(old_col)).otherwise(F.col(new_col))
        return df.select(
            *[c for c in df.columns if c not in (op_col, old_col, new_col)],
            new_op.alias(op_col),
            F.when(~changed, F.col(old_col))
            .otherwise(F.when(to_delete, payload))
            .alias(old_col),
            F.when(~changed, F.col(new_col))
            .otherwise(F.when(~to_delete, payload))
            .alias(new_col),
        )

    return _apply
