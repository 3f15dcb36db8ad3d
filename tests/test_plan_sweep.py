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

r9 extension (r8 verdict items 2): the same sweep now pins the
GLOBAL-WINDOW census — every query whose optimized plan contains an
unpartitioned Window that is NOT the ranked-bucket helper's bounded
``__rb_pid`` prefix.  Fact-grain global windows are the third
at-100×-you-wouldn't shape; the ten global-ntile/rank/cumsum family
members were routed through ``operators.ranked`` this round, and the
46 census entries (pinned below, each reviewed — the 44 r8-reviewed
sites plus the two r9 fixed-grid additions) are all over
bounded inputs: top-k ``GlobalLimit`` children, fixed-grid aggregates
(digits / deciles / day grids / vocab / distinct-value grids), or
constant-size replicate/look/round relations.  A NEW query landing a
global window — or an existing one regressing into the shape — changes
the census and fails by name until it is either routed through
``operators.ranked`` or reviewed into the pin.
"""

from concurrent.futures import ThreadPoolExecutor

import pytest

import __spark_entry__ as E
from qrapids_forecast_r_script_spark.plans import executed_plan, global_windows

# the documented row-Python allowance: the UDTF API-surface demo
ALLOWED_BATCH_EVAL = {"doc_chunks_udtf"}

# Reviewed global-window census (r9).  Children legend —
# GlobalLimit: window over a top-k constant (≤50 rows);
# Aggregate: window over a fixed-grid aggregate (digit / decile / day /
#   bucket / vocab / distinct-value grain — bounded or value-bounded);
# Join/Project/Union/Window: constant-size replicate grids, day grids,
#   look sequences, or recursive-CTE round states (all bounded).
ALLOWED_GLOBAL_WINDOW = {
    # --- top-k GlobalLimit children
    "basket_part_pairs_lift", "basket_part_triples_apriori",
    "bigram_pmi_top", "cms_heavy_hitters", "corpus_bigram_topk",
    "doc_graph_eigencentrality", "doc_graph_pagerank",
    "doc_graph_triangles", "mahalanobis_outliers", "rake_keywords_top",
    "repeated_ngram_spans", "series_analog_search",
    "term_burstiness_topk", "textrank_keywords", "weighted_sample_docs",
    "decision_stump_doclen",
    # --- fixed-grid / value-bounded aggregates
    "ab_cliffs_delta", "customer_lorenz_curve",
    "ab_mannwhitney_test", "benford_first_digit_audit",
    "cumulative_gain_curve", "granger_lag1_purchases",
    "kruskal_wallis_values", "parts_skyline_frontier",
    "revenue_bootstrap_ci", "sequence_packing_examples",
    "t_closeness_audit", "vocab_coverage_curve",
    # --- bounded grids / replicate relations / recursion states
    "ab_bh_fdr_nations", "ab_sequential_looks", "ab_sprt_trace",
    "bradley_terry_strengths",
    "chi_square_independence", "competing_risks_cif",
    "evt_gpd_tail_fit", "greedy_coverage_selection", "ips_policy_value",
    "join_key_skew_profile", "littles_law_audit", "logrank_cohort_test",
    "nb_average_precision", "negative_sampling_table",
    "nelson_aalen_hazard", "source_length_emd", "ucb1_replay_policy",
    "user_survival_curve",
}


@pytest.mark.slow
def test_registry_wide_no_cartesian_no_row_python(spark, monkeypatch):
    sf_dir = "/root/testdata/sf0.001"
    cart, batch, gw, errs = [], [], [], []

    # Neutralize every lineage/plan cut for the duration of the sweep:
    # a localCheckpoint replaces its upstream tree with a LogicalRDD at
    # construction (and a persist wraps it in an InMemoryRelation the
    # walker does not descend), so anything above either — including a
    # new fact-grain global window, a cartesian, or a row-Python UDF —
    # would be INVISIBLE to the census (review finding, r9).  With the
    # identity patches the sweep sees full lineage for all ~60 cut
    # sites (ranked helpers, dedup CC, the recursive-CTE family); the
    # iterative constructions this slows run over sf0.001 inputs, so
    # the extra recompute stays in the noise.
    from pyspark.sql import DataFrame
    monkeypatch.setattr(DataFrame, "localCheckpoint",
                        lambda self, eager=True: self)
    monkeypatch.setattr(DataFrame, "persist",
                        lambda self, *a, **k: self)
    monkeypatch.setattr(DataFrame, "cache", lambda self: self)

    def _check(item):
        name, fn = item
        try:
            df = fn(spark, sf_dir)
            plan = executed_plan(df)
            nonpid = [h for h in global_windows(df)
                      if "__rb_pid" not in h["grouping"]]
        except Exception as ex:  # noqa: BLE001 — collected, asserted below
            errs.append((name, f"{type(ex).__name__}: {str(ex)[:120]}"))
            return
        if "CartesianProduct" in plan:
            cart.append(name)
        if "BatchEvalPython" in plan and name not in ALLOWED_BATCH_EVAL:
            batch.append(name)
        if nonpid:
            gw.append(name)

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(_check, E.queries().items()))
    assert not errs, errs
    assert not cart, f"cartesian products: {cart}"
    assert not batch, f"row-at-a-time Python in hot path: {batch}"
    # SUBSET, not equality: with lineage cuts neutralized above the
    # census sees every window, but entries whose windows were ROUTED
    # away (or that AQE plans differently at this SF) may legitimately
    # produce no hit — the pin may over-approximate, never
    # under-approximate.  Pruning genuinely-cleared entries is a manual
    # step (re-run the census standalone).
    assert set(gw) <= ALLOWED_GLOBAL_WINDOW, (
        f"global-window census gained entries — route through "
        f"operators.ranked or review into the pin: "
        f"{sorted(set(gw) - ALLOWED_GLOBAL_WINDOW)}")
