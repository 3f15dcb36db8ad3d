"""Invariant tests for the A/B report, decay attribution
(`operators/product_analytics.py`), and positional proximity search
(`operators/text.py`)."""

import math

from pyspark.sql import functions as F

from qrapids_forecast_r_script_spark.operators.product_analytics import (
    _ATTR_HALFLIFE_MIN,
    _ATTR_WINDOW_MIN,
    ab_test_report,
    purchase_attribution_decay,
)
from qrapids_forecast_r_script_spark.operators.text import (
    _PROX_A,
    _PROX_B,
    _PROX_WIN,
    proximity_search,
)
from qrapids_forecast_r_script_spark.sources import load_table


def test_ab_report_partitions_users_and_is_aa_calibrated(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    r = ab_test_report(spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r.n_a + r.n_b == n_users
    assert r.rate_a == round(r.conv_a / r.n_a, 6)
    assert r.rate_b == round(r.conv_b / r.n_b, 6)
    assert 0 < r.conv_a + r.conv_b < n_users  # metric non-degenerate
    # hash split = an A/A test: must NOT be significant on this data
    assert r.significant is False
    assert abs(r.z_stat) < 1.96


def test_attribution_conserves_credit(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    pur = [e for e in ev if e.event_type == "purchase"]
    touches_by_user = {}
    for e in ev:
        if e.event_type != "purchase":
            touches_by_user.setdefault(e.user_id, []).append(e)
    # purchases with >= 1 in-window touch each hand out exactly 1 unit
    n_attributed = 0
    for p in pur:
        n = sum(1 for t in touches_by_user.get(p.user_id, [])
                if t.ts < p.ts
                and (p.ts - t.ts).total_seconds()
                <= _ATTR_WINDOW_MIN * 60)
        if n:
            n_attributed += 1
    rows = purchase_attribution_decay(spark, sf_dir).collect()
    total = sum(r.total_credit for r in rows)
    assert abs(total - n_attributed) < 0.01 * max(n_attributed, 1), (
        total, n_attributed)
    assert all(r.total_credit > 0 for r in rows)
    # recency bias sanity: decay weight math on one pair
    assert math.exp(-1.0 / _ATTR_HALFLIFE_MIN) < 1.0


def test_proximity_search_matches_bruteforce(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    expect = {}
    for d in docs:
        toks = d.text.split(" ")
        pa = [i for i, t in enumerate(toks) if t == _PROX_A]
        pb = [i for i, t in enumerate(toks) if t == _PROX_B]
        pairs = [(abs(i - j)) for i in pa for j in pb
                 if abs(i - j) <= _PROX_WIN]
        if pairs:
            expect[d.doc_id] = (min(pairs), len(pairs))
    got = {r.doc_id: (r.min_distance, r.n_pairs_within)
           for r in proximity_search(spark, sf_dir).collect()}
    assert got == expect
    assert expect, "fixture must contain proximate term pairs"
