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
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
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
