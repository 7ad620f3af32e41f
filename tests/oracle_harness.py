"""Differential-oracle harness: run a registry query on Spark and its
SQL twin on DuckDB over the same parquet, canonicalize, compare.
Mirrors the driver's CORRECTNESS gate (FIXTURES.md §C)."""

from __future__ import annotations

from pathlib import Path

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif s.dtype == object:
            out[c] = s.astype(str)
        else:
            # unify int widths (int32 vs int64) and nullable ints
            try:
                out[c] = s.astype("Int64")
            except (TypeError, ValueError):
                pass
    out = out.sort_values(by=list(out.columns), kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    con = duck_connection(sf_dir)
    try:
        oracle = con.execute(sql).fetchdf()
    finally:
        con.close()
    mine = spark_df.toPandas()
    if set(mine.columns) != set(oracle.columns):
        return False, f"column mismatch: spark={sorted(mine.columns)} oracle={sorted(oracle.columns)}"
    a, b = canonicalize(mine), canonicalize(oracle)
    if len(a) != len(b):
        return False, f"row count mismatch: spark={len(a)} oracle={len(b)}"
    if a.equals(b):
        return True, "ok"
    # pinpoint first differing cell for debugging
    for c in a.columns:
        neq = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
        if neq.any():
            i = int(neq.idxmax())
            return False, f"value mismatch col={c} row={i}: spark={a[c][i]!r} oracle={b[c][i]!r}"
    return False, "frames differ (index/dtype)"
