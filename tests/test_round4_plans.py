"""Physical-plan contracts for the round-4 operators — the same
first-class plan pins as tests/test_plan_shapes.py: zero unbudgeted
Python boundaries, zero cartesian products, the broadcasts the 100 TB
design argument depends on, and single-scan guarantees."""

from qrapids_forecast_r_script_spark.plans.introspect import (
    broadcast_join_count,
    exchange_count,
    executed_plan,
    has_cartesian,
    python_eval_count,
    scan_count,
)


def _executed(df):
    df.collect()
    return df


def test_paragraph_dedup_rewrite_plan(spark, sf_dir):
    """One documents scan (segmentation is map-only off it), no Python,
    no cartesian, and the shuffle budget is the documented three
    (block-text rank, doc reassembly, final order)."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        paragraph_dedup_rewrite)
    df = _executed(paragraph_dedup_rewrite(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)
    assert scan_count(df, "documents", plan) == 1
    assert exchange_count(df, plan) <= 4


def test_doc_novelty_plan(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.dedup import (
        doc_novelty_scores)
    df = _executed(doc_novelty_scores(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)


def test_rm3_broadcasts_query_models(spark, sf_dir):
    """Both retrieval stages join the posting lists against BROADCAST
    query-model tables (qterms / expanded query) — the corpus-side
    relation never reshuffles for the query batch."""
    from qrapids_forecast_r_script_spark.operators.text import (
        rm3_query_expansion)
    df = _executed(rm3_query_expansion(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)
    assert broadcast_join_count(df, plan) >= 2


def test_lang_classifier_broadcasts_weight_grid(spark, sf_dir):
    """The langs×vocab weight grid and the priors are broadcast onto
    the doc trigram stream — scoring never shuffles the corpus on the
    trigram key."""
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        char_trigram_lang_classifier)
    df = _executed(char_trigram_lang_classifier(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)
    assert broadcast_join_count(df, plan) >= 2


def test_benford_single_scan_map_side(spark, sf_dir):
    """One orders scan, digit extraction map-side, and only the 9-row
    digit aggregate shuffles."""
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        benford_first_digit_audit)
    df = _executed(benford_first_digit_audit(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert scan_count(df, "orders", plan) == 1
    # projection pruned to the price column only
    assert "o_orderpriority" not in plan.split("ReadSchema:")[1][:300]


def test_zipf_fit_plan(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.text_quality import (
        corpus_zipf_fit)
    df = _executed(corpus_zipf_fit(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)
    assert scan_count(df, "documents", plan) == 1


def test_link_prediction_no_allpairs(spark, sf_dir):
    """The wedge join keys on the shared midpoint — no cartesian, no
    Python; the post-checkpoint plan shows only bounded joins."""
    from qrapids_forecast_r_script_spark.operators.graph import (
        doc_graph_link_prediction)
    df = _executed(doc_graph_link_prediction(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)


def test_waterfill_rounds_are_scalar_joins(spark, sf_dir):
    """The unrolled rounds cross-join 1-row broadcast scalars onto the
    #sources-row state — every BroadcastNestedLoopJoin in the plan is a
    1-row scalar attach, and the only real shuffle is the per-source
    aggregate."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        mixture_waterfill_budget)
    df = _executed(mixture_waterfill_budget(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert scan_count(df, "documents", plan) <= 1  # checkpoint cuts re-reads


def test_croston_plan_map_side(spark, sf_dir):
    """No Python, no cartesian (the day-zero attach is a broadcast
    scalar), one events scan."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        forecast_croston_events)
    df = _executed(forecast_croston_events(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)


def test_hierarchical_broadcasts_shares_and_bounds(spark, sf_dir):
    """Shares, date bound, and steps attach by broadcast; no
    cartesian; no Python."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        hierarchical_forecast_coherence)
    df = _executed(hierarchical_forecast_coherence(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)
    assert broadcast_join_count(df, plan) >= 3


def test_chi_square_grid_broadcast(spark, sf_dir):
    """The r×c grid build and totals are broadcast-attached; one
    conditional-aggregate pass over the cells, no cartesian."""
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        chi_square_independence)
    df = _executed(chi_square_independence(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)
    assert broadcast_join_count(df, plan) >= 2


def test_incremental_join_view_no_cartesian(spark, sf_dir):
    """Four delta joins, zero cartesian, zero Python — the IVM
    identity is pure join algebra."""
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        incremental_join_view)
    df = _executed(incremental_join_view(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)


def test_erasure_cascade_ships_keys_only(spark, sf_dir):
    """Semi-join cascade: no Python, no cartesian, and lineitem's scan
    reads only its join key + nothing wide (ReadSchema pruned)."""
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        user_erasure_audit)
    df = _executed(user_erasure_audit(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)


def test_mmr_bounded_after_stage1(spark, sf_dir):
    """MMR's only non-broadcast work is the stage-1 scoring; the greedy
    rounds add no Python and no cartesian (the pair table is a
    broadcast nested-loop over 20 rows)."""
    from qrapids_forecast_r_script_spark.operators.similarity import (
        mmr_diversified_topk)
    df = _executed(mmr_diversified_topk(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 0
    assert not has_cartesian(df, plan)


def test_energy_segments_single_python_boundary(spark, sf_dir):
    """Exactly ONE budgeted Python op (the mapInPandas extraction) —
    the multimodal budget row."""
    from qrapids_forecast_r_script_spark.operators.multimodal import (
        media_energy_segments)
    df = _executed(media_energy_segments(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 1
    assert not has_cartesian(df, plan)
