"""Executed-plan inspectors used by plan-shape tests and PLANS.md.

All functions take a DataFrame and parse
``df._jdf.queryExecution().executedPlan().toString()`` — the
post-optimization physical plan (pre-AQE final shape; AQE nodes appear
as ``AdaptiveSparkPlan`` wrappers whose initial plan still carries the
join/exchange choices we assert on).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Physical plan text.  After execution, AQE's toString prints BOTH
    '== Final Plan ==' and '== Initial Plan ==' sections — keep only the
    final one so counts aren't doubled."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def pushed_filters(df: DataFrame, plan: str | None = None) -> list[str]:
    """Every ``PushedFilters: [...]`` segment, one string per scan."""
    plan = plan or executed_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame, plan: str | None = None) -> list[str]:
    """Every ``ReadSchema: struct<...>`` segment — what each scan reads.

    A scan whose ReadSchema lists columns the query never returns means
    pruning failed; at 100 TB that is the difference between reading 2
    columns and reading 40.
    """
    plan = plan or executed_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def exchange_count(df: DataFrame, plan: str | None = None) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges).

    Each one is a full materialize-and-repartition of its input — the
    unit of cost that dominates at cluster scale.
    """
    plan = plan or executed_plan(df)
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|"
                          r"RoundRobinPartitioning|SinglePartition)", plan))


def scan_count(df: DataFrame, table: str, plan: str | None = None) -> int:
    """How many separate scans of ``<table>.parquet`` the plan contains."""
    plan = plan or executed_plan(df)
    return plan.count(f"{table}.parquet")


def broadcast_join_count(df: DataFrame, plan: str | None = None) -> int:
    plan = plan or executed_plan(df)
    return (plan.count("BroadcastHashJoin")
            + plan.count("BroadcastNestedLoopJoin"))


def wholestage_codegen_count(df: DataFrame, plan: str | None = None) -> int:
    """Distinct whole-stage-codegen spans. Fewer, wider spans = more of
    the plan fused into generated JVM code.  ``executedPlan().toString()``
    marks codegen stages as ``*(N) Operator``; formatted explain spells
    out ``WholeStageCodegen (N)`` — match both."""
    plan = plan or executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


def python_eval_count(df: DataFrame, plan: str | None = None) -> int:
    """Python-boundary operators in the plan (ArrowEvalPython,
    FlatMapGroupsInPandas, FlatMapCoGroupsInPandas, MapInPandas,
    BatchEvalPython incl. the UDTF node).  The engine's budget is:
    >0 only for forecast fitting, multimodal extraction, and the two
    documented API-surface demos (UDTF chunker, cogrouped as-of)."""
    plan = plan or executed_plan(df)
    return len(re.findall(r"(?:ArrowEvalPython|BatchEvalPython|"
                          r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|"
                          r"MapInPandas)", plan))


def has_cartesian(df: DataFrame, plan: str | None = None) -> bool:
    plan = plan or executed_plan(df)
    return "CartesianProduct" in plan


def global_windows(df: DataFrame) -> list[dict]:
    """Every UNPARTITIONED Window in the optimized logical plan.

    An empty-partition window plans as ``Exchange SinglePartition`` +
    one task over the whole input — the scale-killer shape when the
    input is row-grain (r8 verdict, What's wrong #1).  Walks the JVM
    plan tree (string-matching ``windowspecdefinition`` can't separate
    partition from order expressions) and reports, per hit:

    - ``order``: the window's order spec;
    - ``child``: the child node class (``Aggregate``, ``Project``, ...);
    - ``grouping``: the child's grouping expressions when it is an
      Aggregate — ``operators.ranked``'s bounded partition-count window
      shows its ``__rb_pid`` marker here, which the plan sweep's census
      treats as the documented benign form.

    Only the main query tree is walked (no subquery descent) — every
    registry window lives in the main tree.
    """
    out: list[dict] = []

    def _walk(node) -> None:
        if (node.getClass().getSimpleName() == "Window"
                and node.partitionSpec().isEmpty()):
            child = node.child()
            grouping = ""
            if child.getClass().getSimpleName() == "Aggregate":
                grouping = child.groupingExpressions().mkString(", ")
            out.append({
                "order": node.orderSpec().mkString(", "),
                "child": child.getClass().getSimpleName(),
                "grouping": grouping,
            })
        kids = node.children()
        for i in range(kids.length()):
            _walk(kids.apply(i))

    _walk(df._jdf.queryExecution().optimizedPlan())
    return out


def benign_global_windows(df: DataFrame,
                          hits: list[dict] | None = None) -> bool:
    """True when every unpartitioned window in the plan is the
    documented bounded form: the ranked-bucket helper's
    partition-count prefix (grouping carries the ``__rb_pid`` marker).
    Row-grain global windows and other aggregate-grain ones return
    False — callers decide via the census allowlist."""
    hits = global_windows(df) if hits is None else hits
    return all("__rb_pid" in h["grouping"] for h in hits)


def plan_report(df: DataFrame) -> dict:
    """One-line structural summary of a query's physical plan."""
    plan = executed_plan(df)
    return {
        "shuffles": exchange_count(df, plan),
        "broadcast_joins": broadcast_join_count(df, plan),
        "codegen_spans": wholestage_codegen_count(df, plan),
        "python_ops": python_eval_count(df, plan),
        "cartesian": has_cartesian(df, plan),
        "pushed_filters": sum(1 for p in pushed_filters(df, plan) if p.strip()),
        "scans": len(read_schemas(df, plan)),
    }
