"""Every queries() entry with an oracle must match DuckDB at sf0.001.

This is a local pre-flight of the driver's t2 correctness gate (which runs
the same comparison at sf0.01).

r7 (verdict item 8, suite-wall budget): the oracled, non-streaming
queries are SHARDED and each shard runs its comparisons through a
thread pool — Spark schedules concurrent jobs from multiple driver
threads natively, and each DuckDB comparison opens its own connection,
so the comparisons are independent.  Sequentially this module was
7:51 of the 18:22 full-suite wall; threading cuts it several-fold with
identical coverage (every query still compared, failures still named
per-query in the assertion message).  Streaming/stateful queries stay
on a SEQUENTIAL path: events_tws_running_totals scopes a global
state-store conf around its run and micro-batch checkpoints are
touchy under concurrent session use — correctness of the gate beats
wall time there.

Temp-view safety under threading (audited r7): every recursive-CTE
query registers a UNIQUE ``qr_*`` view name; the only shared names
(``orders``, ``customer`` in relational_more, the table names in
sources/registry) are always re-registered with IDENTICAL content for
a given sf_dir, so a concurrent createOrReplaceTempView is a no-op
replace.  A new query that registers a shared view name with
DIFFERENT content must go on the sequential path.
"""

from concurrent.futures import ThreadPoolExecutor

import pytest

from tests.oracle_compare import compare, duckdb_run

# The whole module is the end-to-end driver pre-flight (every oracled
# query vs DuckDB at sf0.001) — marked slow for the fast gate; the same
# surface is covered per-change by tools/strict_audit.py at sf0.01 and
# by the driver itself (pytest.ini documents the split).
pytestmark = pytest.mark.slow

N_SHARDS = 12
POOL_WIDTH = 8


def _registry():
    import __spark_entry__ as entry
    qs = entry.queries()
    oracles = entry.oracle_sql()
    return qs, oracles


def _is_streaming(name: str, fn) -> bool:
    mod = getattr(fn, "__module__", "") or ""
    return ("streaming" in mod or "stateful" in mod
            or "stream" in name or "tws" in name)


def _main_thread_only(name: str, fn) -> bool:
    """Queries that must run on the main thread: streaming/stateful
    (global conf scoping, checkpoints), plus the Python Data Source
    WRITER — classic Spark resolves Python data sources through the
    JVM's THREAD-LOCAL active session on the write path
    (``DataSource.lookupDataSource`` → ``getActiveSession`` with no
    default-session fallback), so ``.save()`` from a pool worker
    thread raises DATA_SOURCE_NOT_FOUND even when registration
    happened first (reproduced r7; the READ path resolves fine from
    worker threads — ``python_datasource_scan`` stays sharded).  The
    driver runs every query on its main thread, so the product
    surface is unaffected; this is purely a gate-threading concern."""
    return _is_streaming(name, fn) or name == "python_datasource_sink_roundtrip"


def _sharded_names():
    qs, oracles = _registry()
    names = sorted(n for n in qs if n in oracles
                   and not _main_thread_only(n, qs[n]))
    return [names[i::N_SHARDS] for i in range(N_SHARDS)]


def pytest_generate_tests(metafunc):
    if "shard" in metafunc.fixturenames:
        metafunc.parametrize("shard", range(N_SHARDS))


def _compare_one(qs, oracles, spark, sf_dir, name):
    try:
        sdf = qs[name](spark, sf_dir)
        odf = duckdb_run(oracles[name], sf_dir)
        problems = compare(sdf, odf)
    except Exception as exc:  # noqa: BLE001 — report, don't abort shard
        return f"{name}: raised {type(exc).__name__}: {exc}"
    if problems:
        return f"{name}: " + "; ".join(problems)
    return None


def test_oracle_parity_shard(spark, sf_dir, shard):
    qs, oracles = _registry()
    names = _sharded_names()[shard]
    assert names, "empty shard — N_SHARDS exceeds the oracled-query count"
    with ThreadPoolExecutor(max_workers=POOL_WIDTH) as pool:
        failures = [f for f in pool.map(
            lambda n: _compare_one(qs, oracles, spark, sf_dir, n), names)
            if f]
    assert not failures, "\n".join(failures)


def test_oracle_parity_streaming_sequential(spark, sf_dir):
    """Main-thread-only oracled queries, one at a time: streaming/
    stateful (global conf scoping + micro-batch checkpoints are not
    thread-safe to share) plus the Python Data Source writer (see
    ``_main_thread_only``)."""
    qs, oracles = _registry()
    names = sorted(n for n in qs if n in oracles
                   and _main_thread_only(n, qs[n]))
    assert names  # the streaming layer must stay covered here
    failures = []
    for name in names:
        if name == "events_tws_running_totals":
            from qrapids_forecast_r_script_spark.streaming.stateful import (
                tws_available)
            if not tws_available(spark):
                continue  # gated at execution; registered unconditionally
        f = _compare_one(qs, oracles, spark, sf_dir, name)
        if f:
            failures.append(f)
    assert not failures, "\n".join(failures)


def test_oracle_coverage_is_total():
    """The shards + streaming list must partition the FULL oracled
    registry — a classifier bug must not silently drop a query from
    the parity gate."""
    qs, oracles = _registry()
    sharded = {n for s in _sharded_names() for n in s}
    streaming = {n for n in qs if n in oracles
                 and _main_thread_only(n, qs[n])}
    assert sharded | streaming == set(oracles)
    assert not sharded & streaming


def test_all_queries_run(spark, sf_dir):
    """Queries without oracles must still execute and return a schema."""
    qs, oracles = _registry()
    names = [n for n in qs if n not in oracles]

    def run_one(name):
        try:
            df = qs[name](spark, sf_dir)
            assert df.columns, name
            assert df.count() >= 0, name
        except Exception as exc:  # noqa: BLE001
            return f"{name}: {type(exc).__name__}: {exc}"
        return None

    with ThreadPoolExecutor(max_workers=POOL_WIDTH) as pool:
        failures = [f for f in pool.map(run_one, names) if f]
    assert not failures, "\n".join(failures)
