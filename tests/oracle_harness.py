"""Local mimic of the driver's duckdb-oracle comparison.

For a query name: run the Spark implementation and the DuckDB oracle
on the same sf dir, then compare row count, column names, and values
(columns sorted by name, rows sorted by all columns) — stricter than
the driver (exact equality incl. floats) so divergence surfaces here
first.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in [
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
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[col] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("int64")
        elif s.dtype == object:
            out[col] = s.astype(str)
    out = out[sorted(out.columns)]
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def compare(spark_df, oracle_pdf: pd.DataFrame, float_exact: bool = True):
    """Returns (ok, message)."""
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_pdf)
    if list(got.columns) != list(want.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"row count differs: {len(got)} vs {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            # The driver hashes raw values, so an integer column on one
            # side vs a float column on the other (e.g. DuckDB
            # sum(int) -> HUGEINT -> float64 vs Spark sum -> BIGINT)
            # hash-mismatches even when the values are numerically
            # equal. Mirror that strictness here: same kind required.
            if pd.api.types.is_float_dtype(g) != pd.api.types.is_float_dtype(w):
                return False, (
                    f"column {col} dtype kind differs: {g.dtype} vs {w.dtype}"
                    " (driver value-hash would mismatch; CAST the oracle)"
                )
            g = g.astype("float64")
            w = w.astype("float64")
            if float_exact:
                bad = ~((g == w) | (g.isna() & w.isna()))
            else:
                bad = ~(
                    (g.isna() & w.isna())
                    | ((g - w).abs() <= 1e-9 * w.abs().clip(lower=1.0))
                )
            if bad.any():
                i = bad.idxmax()
                return False, (
                    f"column {col} differs at row {i}: {g[i]!r} vs {w[i]!r} "
                    f"({int(bad.sum())} rows)"
                )
        else:
            if not g.equals(w):
                neq = g != w
                i = neq.idxmax()
                return False, (
                    f"column {col} differs at row {i}: {g[i]!r} vs {w[i]!r}"
                )
    return True, f"ok ({len(got)} rows)"
