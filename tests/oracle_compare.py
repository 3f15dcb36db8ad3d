"""Driver-style Spark-vs-DuckDB comparison used by the parity tests.

Mirrors what the correctness driver does: run the Spark query and the
oracle SQL on the same parquet tables, then compare row count, column-name
set, and order-insensitive values (columns sorted by name, rows sorted by
all columns; floats compared with tolerance).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLE_NAMES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = pd.to_datetime(col).dt.tz_localize(None).astype("datetime64[us]")
        elif col.dtype == object:
            # dates / lists arrive as objects from either side — stringify
            df[c] = col.map(lambda v: str(sorted(v)) if isinstance(v, (list, tuple))
                            else str(v))
        elif pd.api.types.is_integer_dtype(col):
            df[c] = col.astype("float64")  # unify int32/int64 for compare
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, rtol: float = 1e-6,
            atol: float = 1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    sp = spark_df.toPandas()
    problems = []
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} "
                        f"oracle={sorted(oracle_df.columns)}")
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"row count differs: spark={len(sp)} oracle={len(oracle_df)}")
        return problems
    a, b = _normalize(sp), _normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = [(x == y) or (isinstance(x, float) and isinstance(y, float)
                  and math.isnan(x) and math.isnan(y))
                  or (pd.notna(x) and pd.notna(y)
                      and math.isclose(x, y, rel_tol=rtol, abs_tol=atol))
                  or (pd.isna(x) and pd.isna(y))
                  for x, y in zip(av, bv)]
            bad = [i for i, v in enumerate(ok) if not v]
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            bad = list(eq[~eq].index)
        if bad:
            i = bad[0]
            problems.append(
                f"col {c}: {len(bad)} mismatches, first at row {i}: "
                f"spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}")
    return problems
