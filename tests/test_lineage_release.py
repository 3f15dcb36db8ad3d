"""The r10 release discipline (lineage.release_stale + bench.py wiring).

VERDICT r9 items 3+4: ~135 localCheckpoint/persist sites with zero
unpersist leaked blocks across the driver's 405x3 single-JVM bench, and
persist() sites let bench reps 2-3 serve rep 1's SQL cache.  The fix is
a release call at the sequential harness boundary (bench.py rep loop),
NOT at the product surface — queries() must stay safe for concurrent
construction (guide §2.6; the parity pool).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _n_sql_cached(spark) -> int:
    try:
        return int(spark._jsparkSession.sharedState().cacheManager()
                   .numCachedEntries())
    except Exception:  # noqa: BLE001 — private API fallback
        return -1


def test_release_stale_empties_blocks_and_sql_cache(spark):
    """After a ranked-family query (localCheckpoint + exact_ntile
    persist) runs, release_stale drops every persistent RDD and every
    SQL-cache entry, and the SAME query re-runs to the same result —
    rep 2 computes from parquet, not rep 1's cache."""
    import __spark_entry__ as E
    from qrapids_forecast_r_script_spark.lineage import release_stale

    qs = E.queries()
    fn = qs["rfm_quartile_segments"]
    rows1 = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert _n_persistent(spark) > 0, "expected persist/checkpoint blocks"
    n_cached = _n_sql_cached(spark)
    assert n_cached != 0, "expected SQL-cache entries from exact_ntile"

    released = release_stale(spark)
    assert released > 0
    assert _n_persistent(spark) == 0
    assert _n_sql_cached(spark) in (0, -1)

    rows2 = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert rows1 == rows2
    release_stale(spark)


def test_release_is_wired_into_bench_not_queries():
    """bench.py's rep loop releases BEFORE the timer; the product
    surface (__spark_entry__.queries) must NOT call it — a cross-thread
    release can drop in-flight localCheckpoint blocks (unrecoverable)
    under concurrent construction."""
    import inspect

    import bench
    import __spark_entry__ as E

    src = inspect.getsource(bench.main)
    # the release must precede the `t0 = time.time()` timer start
    assert "release_stale(spark)" in src
    assert src.index("release_stale(spark)") < src.index("t0 = time.time()")
    entry_src = inspect.getsource(E)
    assert "release_stale" not in entry_src
