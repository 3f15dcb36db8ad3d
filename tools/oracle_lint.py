"""Fast oracle type-lint: catch driver-hash-killing DuckDB result types
WITHOUT spinning up Spark.

Two rounds each lost a correctness row to the same class of bug — an
oracle whose VALUES match Spark but whose Arrow TYPE does not:

- round 1: ``sum(<integer>)`` → HUGEINT → ``decimal128(38, 0)`` vs
  Spark's int64 (q12_shipmode_priority, events_zscore_outliers);
- round 2: ``to_timestamp(...)`` → TIMESTAMPTZ →
  ``timestamp[us, tz=UTC]`` vs Spark's plain ``timestamp[us]``
  (events_sliding_1h_30m).

Grep-linting oracle SQL for the offending constructs is fragile (alias
nesting, casts, macros); executing each oracle with a LIMIT-0 wrapper
and inspecting the Arrow schema catches EVERY syntactic route to these
types.  Spark never emits either shape through ``DataFrame.toArrow()``
— tz handling is normalized on the Spark side and integral aggregates
stay int64 — so any hit here is an oracle bug by construction.

Usage:  python tools/oracle_lint.py          # lints every oracle
Exit 1 on any hit; run it (plus tools/strict_audit.py) before every
round hand-off — it is part of the verify recipe.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLE_NAMES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]


def lint_schema(schema: pa.Schema) -> list[str]:
    problems = []
    for field in schema:
        t = field.type
        if pa.types.is_timestamp(t) and t.tz is not None:
            problems.append(
                f"col {field.name}: {t} — TIMESTAMPTZ (DuckDB to_timestamp/"
                f"timezone arithmetic); Spark emits plain timestamp[us], "
                f"driver schema hash will fail.  CAST(... AS TIMESTAMP).")
        if pa.types.is_decimal(t) and t.scale == 0 and t.precision > 18:
            problems.append(
                f"col {field.name}: {t} — HUGEINT-class integer widening "
                f"(DuckDB sum of integers); Spark emits int64, driver hash "
                f"will fail.  CAST(... AS BIGINT).")
        elif pa.types.is_decimal(t):
            # the benford share_exp regression: DECIMAL literals (CASE
            # ... THEN 0.30103) surface as decimal while Spark emits
            # double — same driver-hash failure class as HUGEINT
            problems.append(
                f"col {field.name}: {t} — DECIMAL output (DuckDB keeps "
                f"numeric literals as decimal); Spark emits double, "
                f"driver hash will fail.  CAST(... AS DOUBLE).")
    return problems


def main() -> int:
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    n_fail = 0
    for name, sql in oracles.items():
        try:
            # LIMIT 0 wrapper: type-check the full query shape without
            # paying for its execution
            schema = con.execute(
                f"SELECT * FROM ({sql}) __lint WHERE 1=0").arrow().schema
            problems = lint_schema(schema)
        except Exception as ex:  # noqa: BLE001 — lint must report, not die
            problems = [f"ERROR {type(ex).__name__}: {ex}"[:300]]
        if problems:
            n_fail += 1
            print(f"LINT {name}")
            for p in problems:
                print(f"      {p}")
    print(f"\n{n_fail} oracle lint failures / {len(oracles)} oracles")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
