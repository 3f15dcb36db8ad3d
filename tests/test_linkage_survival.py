"""Invariant tests for entity resolution (`operators/linkage.py`) and
the Kaplan-Meier curve (`operators/product_analytics.py::
user_survival_curve` / `km_curve`)."""

import math

from pyspark.sql import functions as F

from qrapids_forecast_r_script_spark.operators.linkage import (
    _MATCH_T,
    _PERTURB_MOD,
    customer_entity_resolution,
)
from qrapids_forecast_r_script_spark.operators.product_analytics import (
    km_curve,
    user_survival_curve,
)
from qrapids_forecast_r_script_spark.sources import load_table


def test_entity_resolution_recovers_ground_truth(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    n = cust.count()
    rows = customer_entity_resolution(spark, sf_dir).collect()
    by = {(r.verdict, r.is_same_entity): r for r in rows}
    # every record pairs with its own counterpart inside its block
    # (the 3-char SUFFIX survives the head perturbation), so true-match pairs
    # = population; all must classify as 'match' on this perturbation
    true_match = sum(r.n_pairs for r in rows if r.is_same_entity)
    assert true_match == n
    assert ("match", True) in by and by[("match", True)].n_pairs == n
    assert by[("match", True)].min_score >= _MATCH_T
    # false-accept rate, not absence: a cross-entity blocked pair with
    # one differing middle digit and |Δbal| ≲ 1.16 CAN legitimately
    # score ≥ 0.95 (P ≈ 2e-4 per pair), so at larger SFs a handful of
    # ('match', False) rows is correct classifier behavior, not a bug
    false_accepts = by.get(("match", False))
    assert (false_accepts.n_pairs if false_accepts else 0) <= 0.01 * n
    # the perturbation actually fired (scores below 1.0 exist)
    assert by[("match", True)].min_score < 1.0
    assert n // _PERTURB_MOD > 0  # fixture large enough to perturb


def test_survival_curve_matches_hand_km(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # hand-build subjects: t = days to first purchase (all users
    # convert in this fixture, which the query's docstring notes)
    subs = {}
    for r in ev.collect():
        d = r.ts.date()
        u = subs.setdefault(r.user_id, {"d0": d, "d1": d, "p0": None})
        u["d0"] = min(u["d0"], d)
        u["d1"] = max(u["d1"], d)
        if r.event_type == "purchase":
            u["p0"] = d if u["p0"] is None else min(u["p0"], d)
    ts = sorted((u["p0"] - u["d0"]).days if u["p0"] else
                (u["d1"] - u["d0"]).days for u in subs.values())
    n_total = len(ts)
    rows = user_survival_curve(spark, sf_dir).collect()
    assert sum(r.d for r in rows) == sum(
        1 for u in subs.values() if u["p0"] is not None)
    # hand KM product per step
    surv, at_risk = 1.0, n_total
    for r in rows:
        assert r.n_at_risk == at_risk
        assert r.hazard == round(r.d / r.n_at_risk, 6)
        surv *= math.exp(round(math.log(1 - r.d / r.n_at_risk), 6)) \
            if r.d < r.n_at_risk else 0.0
        assert abs(r.survival - round(surv, 6)) < 2e-6, (r.t, surv)
        at_risk -= [x for x in ts].count(r.t)
    # survival is non-increasing and ends at/near full conversion
    vals = [r.survival for r in rows]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_km_censoring_branch_on_synthetic_subjects(spark):
    """Censored subjects leave the risk set WITHOUT generating an
    event: S must stay above the naive all-event estimate."""
    # 4 subjects: events at t=1 and t=2; censored at t=1 and t=3
    df = spark.createDataFrame(
        [(1, True), (1, False), (2, True), (3, False)],
        "t bigint, converted boolean")
    rows = {r.t: r for r in km_curve(df).collect()}
    # t=1: n=4, d=1 → S=0.75 ; t=2: n=2, d=1 → S=0.375 ; t=3: d=0
    assert rows[1].n_at_risk == 4 and rows[1].d == 1
    assert abs(rows[1].survival - 0.75) < 1e-6
    assert rows[2].n_at_risk == 2 and rows[2].d == 1
    assert abs(rows[2].survival - 0.375) < 1e-6
    assert rows[3].d == 0 and abs(rows[3].survival - 0.375) < 1e-6
    # the exact-zero guard: every subject an event at one t
    z = {r.t: r for r in km_curve(
        spark.createDataFrame([(5, True), (5, True)],
                              "t bigint, converted boolean")).collect()}
    assert z[5].survival == 0.0
