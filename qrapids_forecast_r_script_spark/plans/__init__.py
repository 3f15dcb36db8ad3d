"""Physical-plan introspection — the engine's "did Catalyst do what we
designed for?" layer.

The reference has no optimizer (SURVEY §4): its pushdowns are hand-coded
into the Elasticsearch request (R:27-28).  In this engine every
optimization is delegated to Catalyst, so the scale contract is checked
*on the plan*, not in the operator code: filters reach the scan, dims
broadcast, rewrites stay equi-join, Python stays out of the hot path.
These helpers make those assertions first-class (used by
tests/test_plan_shapes.py and the PLANS.md report generator).
"""

from .introspect import (
    benign_global_windows,
    broadcast_join_count,
    exchange_count,
    executed_plan,
    global_windows,
    has_cartesian,
    plan_report,
    pushed_filters,
    python_eval_count,
    read_schemas,
    scan_count,
    wholestage_codegen_count,
)

__all__ = [
    "executed_plan",
    "pushed_filters",
    "read_schemas",
    "exchange_count",
    "scan_count",
    "broadcast_join_count",
    "wholestage_codegen_count",
    "python_eval_count",
    "has_cartesian",
    "global_windows",
    "benign_global_windows",
    "plan_report",
]
