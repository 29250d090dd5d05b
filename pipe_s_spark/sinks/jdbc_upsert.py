"""JDBC upsert sink: the reference's MySQL batch writer re-expressed.

Parity targets:
- single-row idempotent DML (`/root/reference/pkg/utils/mysql.go:197-218`):
  ``INSERT IGNORE`` / full-row ``UPDATE ... WHERE pk`` / ``DELETE WHERE pk``
- multi-row flush (`pkg/output/mysql/batch/tableprocessor.go:198-271`):
  multi-VALUES insert, multi-statement update transaction, ``DELETE ...
  WHERE (pk) IN (...)``
- per-key routing for ordered apply (`batch/batchoutput.go:164-190`):
  here ``repartition(n, keys)`` + per-partition executors

SQL generation is dialect-parameterized and unit-tested; the executor
needs a live DB + JDBC driver (absent in this environment), so
``jdbc_upsert_writer`` returns a ``foreachPartition`` closure whose DB
calls go through a pluggable ``execute`` callable (tests inject a
recorder; production injects a DB-API/JDBC connection).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass


def _q(ident: str, dialect: str = "mysql") -> str:
    if dialect == "mysql":
        return "`" + ident.replace("`", "``") + "`"
    return '"' + ident.replace('"', '""') + '"'


def _fmt(v: object, dialect: str = "mysql") -> str:
    """Literal formatting for interpolated batches (the reference uses
    interpolateParams=true client-side interpolation, utils/mysql.go:27).

    Escaping is dialect-aware: MySQL treats backslash as an escape in
    string literals, so it must be doubled; ANSI dialects (Postgres with
    standard_conforming_strings, etc.) treat backslash literally and
    doubling would corrupt the value. Production JDBC paths should
    prefer prepared-statement batching over interpolation."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    if dialect == "mysql":
        s = s.replace("\\", "\\\\")
    return f"'{s}'"


@dataclass
class UpsertStatements:
    inserts: list[str]
    updates: list[str]
    deletes: list[str]

    def all(self) -> list[str]:
        return self.inserts + self.updates + self.deletes


def build_upsert_statements(
    table: str,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    rows: Iterable[dict],
    net_op_col: str = "net_op",
    max_rows_per_stmt: int = 1000,
    dialect: str = "mysql",
) -> UpsertStatements:
    """Group compacted rows by net op and render batched SQL.

    mysql dialect: INSERT IGNORE + per-row UPDATE + DELETE..IN, matching
    the reference byte-for-byte in shape; 'ansi' renders MERGE-less
    standard statements (INSERT ON CONFLICT for postgres-alikes).
    """
    keys = list(key_cols)
    cols = keys + list(payload_cols)
    ins_rows: list[str] = []
    upd_stmts: list[str] = []
    del_keys: list[str] = []

    for r in rows:
        op = r[net_op_col]
        if op == "insert":
            ins_rows.append("(" + ", ".join(_fmt(r[c], dialect) for c in cols) + ")")
        elif op == "update":
            sets = ", ".join(f"{_q(c, dialect)} = {_fmt(r[c], dialect)}" for c in payload_cols)
            where = " AND ".join(f"{_q(k, dialect)} = {_fmt(r[k], dialect)}" for k in keys)
            upd_stmts.append(f"UPDATE {_q(table, dialect)} SET {sets} WHERE {where};")
        elif op == "delete":
            del_keys.append("(" + ", ".join(_fmt(r[k], dialect) for k in keys) + ")")

    inserts = []
    collist = ", ".join(_q(c, dialect) for c in cols)
    head = (
        f"INSERT IGNORE INTO {_q(table, dialect)} ({collist}) VALUES "
        if dialect == "mysql"
        else f"INSERT INTO {_q(table, dialect)} ({collist}) VALUES "
    )
    for i in range(0, len(ins_rows), max_rows_per_stmt):
        stmt = head + ", ".join(ins_rows[i : i + max_rows_per_stmt])
        if dialect != "mysql":
            stmt += f" ON CONFLICT ({', '.join(_q(k, dialect) for k in keys)}) DO NOTHING"
        inserts.append(stmt + ";")

    updates = []
    for i in range(0, len(upd_stmts), max_rows_per_stmt):
        updates.append("BEGIN;\n" + "\n".join(upd_stmts[i : i + max_rows_per_stmt]) + "\nCOMMIT;")

    deletes = []
    key_tuple = "(" + ", ".join(_q(k, dialect) for k in keys) + ")"
    for i in range(0, len(del_keys), max_rows_per_stmt):
        deletes.append(
            f"DELETE FROM {_q(table, dialect)} WHERE {key_tuple} IN "
            f"({', '.join(del_keys[i : i + max_rows_per_stmt])});"
        )
    return UpsertStatements(inserts, updates, deletes)


def build_upsert_param_batches(
    table: str,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    rows: Iterable[dict],
    net_op_col: str = "net_op",
    max_rows_per_batch: int = 1000,
    dialect: str = "mysql",
    placeholder: str = "%s",
) -> list[tuple[str, list[tuple]]]:
    """Prepared-statement rendering of :func:`build_upsert_statements`:
    ``[(sql_template, params_batch), ...]`` for ``executemany`` — the
    production-preferred path (server-side parameter binding; no
    literal escaping, the interpolated path exists for parity with the
    reference's interpolateParams=true client, utils/mysql.go:27).

    One template per op kind per chunk; params are row tuples in
    declared column order (insert: keys+payloads; update: payloads
    then keys, matching SET ... WHERE ...; delete: keys)."""
    keys = list(key_cols)
    pays = list(payload_cols)
    cols = keys + pays

    ins_params: list[tuple] = []
    upd_params: list[tuple] = []
    del_params: list[tuple] = []
    for r in rows:
        op = r[net_op_col]
        if op == "insert":
            ins_params.append(tuple(r[c] for c in cols))
        elif op == "update":
            upd_params.append(tuple([r[c] for c in pays] + [r[k] for k in keys]))
        elif op == "delete":
            del_params.append(tuple(r[k] for k in keys))

    collist = ", ".join(_q(c, dialect) for c in cols)
    slots = ", ".join([placeholder] * len(cols))
    if dialect == "mysql":
        ins_sql = f"INSERT IGNORE INTO {_q(table, dialect)} ({collist}) VALUES ({slots})"
    else:
        conflict = ", ".join(_q(k, dialect) for k in keys)
        ins_sql = (
            f"INSERT INTO {_q(table, dialect)} ({collist}) VALUES ({slots}) "
            f"ON CONFLICT ({conflict}) DO NOTHING"
        )
    sets = ", ".join(f"{_q(c, dialect)} = {placeholder}" for c in pays)
    where = " AND ".join(f"{_q(k, dialect)} = {placeholder}" for k in keys)
    upd_sql = f"UPDATE {_q(table, dialect)} SET {sets} WHERE {where}"
    del_sql = f"DELETE FROM {_q(table, dialect)} WHERE {where}"

    out: list[tuple[str, list[tuple]]] = []
    for sql, params in ((ins_sql, ins_params), (upd_sql, upd_params), (del_sql, del_params)):
        for i in range(0, len(params), max_rows_per_batch):
            out.append((sql, params[i : i + max_rows_per_batch]))
    return out


def jdbc_upsert_writer(
    table: str,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    execute: Callable[[str], None] | None = None,
    num_key_partitions: int = 8,
    executemany: Callable[[str, list[tuple]], None] | None = None,
):
    """Return (df) -> None applying a compacted changelog DataFrame via
    batched SQL, partition-parallel, hash-routed by key for per-key
    serial order (parity: batchoutput.go:164-190).

    Exactly one of the two executors must be given: ``execute`` runs
    one interpolated SQL string (DB-API cursor.execute in production,
    a recorder in tests); ``executemany`` runs a parameterized
    template with a params batch (cursor.executemany / JDBC
    addBatch+executeBatch — the production-preferred path)."""
    if (execute is None) == (executemany is None):
        raise ValueError("provide exactly one of execute / executemany")

    def write(df) -> None:
        routed = df.repartition(num_key_partitions, *key_cols)

        def per_partition(rows) -> None:
            batch = [r.asDict() for r in rows]
            if not batch:
                return
            if executemany is not None:
                for sql, params in build_upsert_param_batches(
                    table, key_cols, payload_cols, batch
                ):
                    executemany(sql, params)
                return
            stmts = build_upsert_statements(table, key_cols, payload_cols, batch)
            for s in stmts.all():
                execute(s)

        routed.foreachPartition(per_partition)

    return write
