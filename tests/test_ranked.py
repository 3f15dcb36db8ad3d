"""operators.ranked — the distributed exact ranking/ntile primitives
(r9, the r8-verdict "two-pass quantile-boundary swap").

Three contracts:

1. EXACT EQUIVALENCE: ``exact_ntile`` / ``global_rank`` /
   ``global_cumsum`` are bit-identical to the single-task global
   windows they replace (``ntile`` / ``row_number`` / running ``sum``
   over the same total order), across bucket-boundary edge cases
   (N < n, N = n, N % n != 0) and both sort directions — the property
   that let the ten routed registry queries keep their oracle hashes
   unchanged (strict-audited at the rewrite).
2. PLAN SHAPE: the helper plans NO unpartitioned window over its input
   — its only global window is the bounded per-partition-count prefix
   (grouping carries the ``__rb_pid`` marker ``plans.global_windows``
   reports).
3. ROUTED QUERIES: the global-ntile family named by the r8 verdict
   (rfm_quartile_segments, nb_calibration_curve, cumulative_gain_curve)
   plus the same-shape siblings routed with them no longer contain any
   fact-grain global window.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qrapids_forecast_r_script_spark.operators.ranked import (
    exact_ntile,
    global_cumsum,
    global_rank,
)
from qrapids_forecast_r_script_spark.plans import (
    benign_global_windows,
    global_windows,
)

SF_DIR = "/root/testdata/sf0.001"


def _fixture(spark, n_rows, seed=11, n_parts=8):
    """Deterministic rows with heavy value ties (the ntile stressor —
    only the tiebreak column makes the order total)."""
    return (spark.range(n_rows)
            .select(F.col("id"),
                    (F.xxhash64(F.col("id") + seed) % 7).alias("v"),
                    (F.xxhash64(F.col("id") * 31 + seed) % 1000)
                    .alias("x"))
            .repartition(n_parts))


@pytest.mark.parametrize("n_rows,n", [
    (1, 4), (3, 4), (4, 4), (5, 4),      # N <, =, just past n
    (97, 4), (100, 10), (1000, 7),       # N % n != 0
    (32, 32), (2, 10),                   # degenerate q = 0 paths
])
def test_exact_ntile_matches_builtin(spark, n_rows, n):
    df = _fixture(spark, n_rows)
    for order in ([F.col("v"), F.col("id")],
                  [F.col("v").desc(), F.col("id")]):
        expect = df.withColumn(
            "q", F.ntile(n).over(Window.orderBy(*order)))
        got = exact_ntile(df, n, order, "q")
        assert expect.select("id", "q").exceptAll(
            got.select("id", "q")).count() == 0
        assert got.select("id", "q").exceptAll(
            expect.select("id", "q")).count() == 0


def test_global_rank_matches_row_number(spark):
    df = _fixture(spark, 500)
    order = [F.col("v").desc(), F.col("id")]
    expect = df.withColumn(
        "r", F.row_number().over(Window.orderBy(*order)).cast("long"))
    got = global_rank(df, order, rank_col="r")
    assert expect.select("id", "r").exceptAll(
        got.select("id", "r")).count() == 0
    assert got.columns == expect.columns  # no helper-column leakage


def test_global_cumsum_matches_running_total(spark):
    df = _fixture(spark, 500)
    order = [F.col("v"), F.col("id")]
    w = (Window.orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    expect = df.withColumn("c", F.sum("x").over(w))
    got = global_cumsum(df, order, "x", "c")
    assert expect.select("id", "c").exceptAll(
        got.select("id", "c")).count() == 0
    # BIGINT in, BIGINT out — the exact-integer discipline survives
    assert dict(got.dtypes)["c"] == "bigint"


def test_helper_plans_only_the_bounded_pid_window(spark):
    df = _fixture(spark, 100)
    for out in (exact_ntile(df, 4, [F.col("v"), F.col("id")], "q"),
                global_rank(df, [F.col("v"), F.col("id")], "r"),
                global_cumsum(df, [F.col("v"), F.col("id")], "x", "c")):
        hits = global_windows(out)
        assert hits, "the pid-count prefix window must be present"
        assert benign_global_windows(out, hits), hits


# the family routed through operators.ranked in r9 — each must keep
# ZERO fact-grain global windows; cumulative_gain_curve's surviving
# hit is its 10-row decile-grain cumulative window (bounded by
# _CAL_BINS, not by data)
ROUTED = [
    "rfm_quartile_segments",        # 3× customer-grain ntile (named)
    "nb_calibration_curve",         # doc-grain decile ntile (named)
    "cumulative_gain_curve",        # doc-grain decile ntile (named)
    "brier_decomposition",          # doc-grain bin ntile (sibling)
    "isotonic_calibration_map",     # doc-grain bin ntile (sibling)
    "doc_graph_degree_powerlaw",    # node-grain decile ntile (sibling)
    "curriculum_order",             # doc-grain ntile + position rank
    "quantile_normalization_map",   # doc-grain pooled-ventile ntile
    "parts_abc_pareto",             # part-grain running total
    "customer_revenue_gini",        # customer-grain rank
    # r9 additions built on the helpers from day one
    "customer_lorenz_curve",        # customer-grain exact ventile cut
    "orders_exact_price_quantiles",  # order-grain exact type-7 rank
]
# bounded-by-a-constant aggregate grains (the surviving global windows
# run over _CAL_BINS/_LORENZ_BINS rows, not data grain)
BOUNDED_GRAIN_MARKERS = ("decile", "ventile")


@pytest.mark.parametrize("name", ROUTED)
def test_routed_queries_have_no_fact_grain_global_window(spark, name):
    import __spark_entry__ as E

    df = E.queries()[name](spark, SF_DIR)
    hits = [h for h in global_windows(df)
            if "__rb_pid" not in h["grouping"]]
    for h in hits:
        assert any(m in h["grouping"] for m in BOUNDED_GRAIN_MARKERS), (
            name, h)
