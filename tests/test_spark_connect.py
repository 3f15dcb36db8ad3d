"""Spark Connect service boundary (r5 verdict item 6).

STATUS.md documents the production service boundary as Spark Connect:
the reference is driven over an Rserve TCP bridge (``README.md:5,42``);
this engine's decoupled analog is a thin
``SparkSession.builder.remote("sc://...")`` client in front of the
same ``queries()`` functions.  This file delivers the verdict's "gated
test proving the facade is Connect-clean, or a documented blocker with
the exact probe error" — BOTH:

1. ``test_connect_roundtrip_when_available`` runs one real queries()
   entry through a Connect client session when the client stack exists
   (Spark 4's ``spark.api.mode=connect`` launches an in-process
   localhost gRPC server, so no second host is needed).
2. When it does not, the skip message carries the EXACT probe error.
   In this container the blocker chain is:
     - ``import pyspark.sql.connect.session`` →
       PySparkImportError [PACKAGE_NOT_INSTALLED] "grpcio >= 1.48.1
       must be installed; however, it was not found."
     - grpcio is a compiled wheel: not vendorable the way the
       pure-python protobuf runtime was (streaming/stateful.py), and
       pip installs are off-limits.
     - the pip-shipped pyspark also carries no
       ``sbin/start-connect-server.sh`` (server jars are in the full
       distribution), so ``spark.api.mode=connect`` is the only
       in-container route once grpcio exists.
3. ``test_query_paths_are_connect_clean`` pins the static guarantee
   that makes (1) pure deployment config: a Connect ``SparkSession``
   exposes NO ``sparkContext`` / ``_jvm`` / ``_jsc`` and no ``.rdd``,
   so the package's query paths must never touch them.  The one
   documented exception is the classic-session-only protobuf wiring in
   ``streaming/stateful.py`` (it configures worker env vars through
   ``sc.environment``, which Connect replaces with server-side config —
   the TWS queries gate on it loudly).
"""

import os
import re

import pytest


def _connect_client_available() -> tuple[bool, str]:
    try:
        import pyspark.sql.connect.session  # noqa: F401
        return True, ""
    except Exception as exc:  # PySparkImportError on missing grpcio
        return False, f"{type(exc).__name__}: {exc}"


_AVAILABLE, _PROBE_ERROR = _connect_client_available()


@pytest.mark.skipif(
    not _AVAILABLE,
    reason=f"Spark Connect client stack unavailable — exact probe error: "
           f"{_PROBE_ERROR}")
def test_connect_roundtrip_when_available(sf_dir):
    """One real queries() entry through a Connect client session.
    ``spark.api.mode=connect`` (Spark 4) starts a localhost gRPC server
    inside the JVM this builder launches — a true client/server
    round-trip with no second host."""
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (SparkSession.builder
             .config("spark.api.mode", "connect")
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]")
             .appName("qrapids-connect-roundtrip")
             .getOrCreate())
    # ADVICE r6: with grpcio present, getOrCreate() may hand back the
    # suite's already-running CLASSIC conftest session (an existing
    # session ignores spark.api.mode), and the finally-stop below would
    # tear down the shared fixture and break the rest of the suite.
    # Only proceed — and only ever stop — a session we can PROVE is a
    # Connect one; otherwise skip without touching it.
    if not spark.__class__.__module__.startswith("pyspark.sql.connect"):
        pytest.skip("getOrCreate returned the existing classic session; "
                    "cannot start an in-process Connect server here "
                    "without tearing it down")
    try:
        df = E.queries()["part_filter_projection"](spark, sf_dir)
        assert df.count() >= 0
    finally:
        spark.stop()


def test_connect_blocker_is_the_documented_one():
    """If the client stack is missing, the failure must be the
    documented grpcio gap — not a regression somewhere else in the
    import chain (e.g. a transitive import of this package breaking
    ``pyspark.sql.connect``)."""
    if _AVAILABLE:
        pytest.skip("client stack present — round-trip test covers this")
    assert "grpcio" in _PROBE_ERROR, _PROBE_ERROR


def test_query_paths_are_connect_clean():
    """Static audit: no query-path module touches sparkContext, _jvm,
    _jsc, or .rdd — the APIs a Connect session does not have.  Allowed:
    streaming/stateful.py (classic-only protobuf worker wiring,
    documented + loudly gated), engine.py's version banner, and
    lineage.py (r10): a HARNESS-side release utility — called only from
    bench.py/tools between timed reps, never from a query function —
    whose block-manager introspection is classic-only by design and
    degrades to a no-op under Connect (the broad try swallows the
    missing ``_jsc``)."""
    pkg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "qrapids_forecast_r_script_spark")
    allowed = {os.path.join("streaming", "stateful.py"), "lineage.py"}
    pattern = re.compile(r"\bsparkContext\b|\b_jvm\b|\b_jsc\b|\.rdd\b")
    offenders = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, pkg)
            if rel in allowed:
                continue
            with open(path) as fh:
                for ln, line in enumerate(fh, 1):
                    code = line.split("#", 1)[0]  # comments may explain
                    if pattern.search(code):
                        offenders.append(f"{rel}:{ln}: {line.strip()}")
    assert not offenders, "\n".join(offenders)
