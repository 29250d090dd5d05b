"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle on the same sf dir and compare (sorted columns, sorted
rows, exact values — floats bit-exact unless the query opted into
rounding)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v, na_action="ignore"
            )
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, float_tol: float = 0.0) -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), f"columns: {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"row count: {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        # Dtype-kind fence: the driver's value hash is dtype-sensitive, so an
        # int64 Spark column vs a float64 oracle column (e.g. DuckDB
        # SUM(BIGINT) -> HUGEINT -> fetchdf float64) hash-mismatches even
        # when every value is numerically equal.  The old coercing compare
        # masked exactly that for four rounds (text_lang_summary); refuse
        # int-vs-float pairs outright so the local gate can never hide it.
        g_float = pd.api.types.is_float_dtype(g)
        w_float = pd.api.types.is_float_dtype(w)
        g_num = pd.api.types.is_numeric_dtype(g) and not pd.api.types.is_bool_dtype(g)
        w_num = pd.api.types.is_numeric_dtype(w) and not pd.api.types.is_bool_dtype(w)
        if g_num and w_num:
            assert g_float == w_float, (
                f"column {c}: dtype-kind mismatch {g.dtype} (spark) vs {w.dtype} (oracle) — "
                "the driver's hash is dtype-sensitive; cast the oracle (or the query) so both "
                "engines agree on int-vs-float"
            )
        if g_float or w_float:
            ga = pd.to_numeric(g, errors="coerce")
            wa = pd.to_numeric(w, errors="coerce")
            both_nan = ga.isna() & wa.isna()
            if float_tol == 0.0:
                ok = (ga == wa) | both_nan
            else:
                ok = both_nan | ga.combine(
                    wa, lambda a, b: (math.isnan(a) and math.isnan(b)) or abs(a - b) <= float_tol * max(1.0, abs(b))
                )
            assert ok.all(), f"column {c}: first mismatch at {ok.idxmin()}: {ga[~ok].head(3).tolist()} vs {wa[~ok].head(3).tolist()}"
        else:
            gn, wn = g.isna(), w.isna()
            ok = (gn & wn) | ((~gn) & (~wn) & (g.astype(str) == w.astype(str)))
            assert ok.all(), f"column {c}: mismatch {g[~ok].head(3).tolist()} vs {w[~ok].head(3).tolist()}"
