"""Invariant tests for `operators/assoc_privacy.py` (oracle parity is
covered by test_oracle_parity)."""

from pyspark.sql import functions as F

from qrapids_forecast_r_script_spark.operators.assoc_privacy import (
    _DP_EPS,
    _K_ANON,
    _MIN_SUPPORT,
    basket_part_pairs_lift,
    dp_noisy_counts,
    k_anonymity_audit,
)
from qrapids_forecast_r_script_spark.sources import load_table


def test_basket_lift_matches_bruteforce_on_top_pair(spark, sf_dir):
    rows = basket_part_pairs_lift(spark, sf_dir).collect()
    assert rows, "fixture must surface co-occurring pairs"
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    # non-increasing by the full sort key
    for x, y in zip(rows, rows[1:]):
        assert (x.lift, x.n_ab, -x.pa, -x.pb) >= (y.lift, y.n_ab,
                                                  -y.pa, -y.pb)
    # brute-force the top pair's statistics from the raw table
    li = load_table(spark, sf_dir, "lineitem")
    baskets = [(r.l_orderkey, r.l_partkey)
               for r in li.select("l_orderkey", "l_partkey")
               .distinct().collect()]
    orders_of = {}
    for ok, pk in baskets:
        orders_of.setdefault(pk, set()).add(ok)
    top = rows[0]
    co = len(orders_of[top.pa] & orders_of[top.pb])
    n = len({ok for ok, _ in baskets})
    assert co == top.n_ab >= _MIN_SUPPORT
    assert len(orders_of[top.pa]) == top.n_a
    assert len(orders_of[top.pb]) == top.n_b
    expect = round(co * n / (top.n_a * top.n_b), 6)
    assert abs(top.lift - expect) < 1e-9


def test_k_anonymity_partitions_population(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    rows = k_anonymity_audit(spark, sf_dir).collect()
    assert sum(r.cell_size for r in rows) == cust.count()
    for r in rows:
        assert r.violates_k == (r.cell_size < _K_ANON)
    # the fine-grained QI tuple must produce violating cells on this
    # population — otherwise the audit tests nothing
    assert any(r.violates_k for r in rows)


def test_dp_noise_is_nonzero_bounded_and_deterministic(spark, sf_dir):
    a = {r.event_type: r for r in dp_noisy_counts(spark, sf_dir).collect()}
    b = {r.event_type: r for r in dp_noisy_counts(spark, sf_dir).collect()}
    assert a.keys() == b.keys() and len(a) >= 2
    for t in a:
        assert a[t].noisy_count == b[t].noisy_count  # replayable release
        noise = a[t].noisy_count - a[t].n_events
        assert noise != 0.0
        # Laplace(b=1/eps) tail: |noise| beyond 20b has mass ~2e-9 —
        # a seeded draw landing there means the inverse CDF is wrong
        assert abs(noise) < 20.0 / _DP_EPS
        assert a[t].epsilon == _DP_EPS
