"""Registry-wide scale-killer sweep (r8).

`tests/test_plan_shapes.py` asserts the designed plan shapes on
representative queries; this module closes the long tail: EVERY
`queries()` entry is planned (and, where construction itself runs
micro-batches or localCheckpoints, executed) at sf0.001 and its
physical plan checked for the two shapes that are never acceptable at
100 TB:

- ``CartesianProduct`` — an unkeyed shuffled cross product (the
  broadcast-nested-loop form used by the bounded-grid joins is fine
  and does NOT print this node);
- ``BatchEvalPython`` — a row-at-a-time pickled Python UDF in the hot
  path.  Arrow-batched boundaries (ArrowEvalPython,
  FlatMapGroupsInPandas, MapInPandas, ...) are the budgeted Python
  sites and stay allowed; the ONE allowed BatchEvalPython-family node
  is the documented UDTF API demo (`doc_chunks_udtf` — Spark plans
  Python UDTFs through the batch-eval node regardless of the arrow
  conf).

A regression that introduces either shape anywhere in the 400+ query
registry fails here by name.  Marked slow; planned through an 8-thread
pool (the sharded-oracle-gate pattern — Catalyst planning and the few
construction-time micro-batch jobs schedule concurrently), ~1 min.
"""

from concurrent.futures import ThreadPoolExecutor

import pytest

import __spark_entry__ as E
from qrapids_forecast_r_script_spark.plans import executed_plan

# the documented row-Python allowance: the UDTF API-surface demo
ALLOWED_BATCH_EVAL = {"doc_chunks_udtf"}


@pytest.mark.slow
def test_registry_wide_no_cartesian_no_row_python(spark):
    sf_dir = "/root/testdata/sf0.001"
    cart, batch, errs = [], [], []

    def _check(item):
        name, fn = item
        try:
            plan = executed_plan(fn(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — collected, asserted below
            errs.append((name, f"{type(ex).__name__}: {str(ex)[:120]}"))
            return
        if "CartesianProduct" in plan:
            cart.append(name)
        if "BatchEvalPython" in plan and name not in ALLOWED_BATCH_EVAL:
            batch.append(name)

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(_check, E.queries().items()))
    assert not errs, errs
    assert not cart, f"cartesian products: {cart}"
    assert not batch, f"row-at-a-time Python in hot path: {batch}"
