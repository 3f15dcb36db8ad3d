"""Invariant tests for the co-grouped as-of alignment
(`operators/cogroup_ops.py`), the numeric distribution profile
(`operators/data_quality.py::events_numeric_profile`), and the
stream-stream LEFT OUTER join's eviction semantics
(`streaming/queries.py::events_stream_stream_left_join`).  Oracle
parity is covered by test_oracle_parity; these pin properties parity
can't express."""

from pyspark.sql import functions as F

from qrapids_forecast_r_script_spark.operators.cogroup_ops import (
    events_orders_asof_cogroup,
)
from qrapids_forecast_r_script_spark.operators.data_quality import (
    events_numeric_profile,
)
from qrapids_forecast_r_script_spark.sources import load_table


def test_cogroup_asof_matches_latest_preceding_order(spark, sf_dir):
    out = events_orders_asof_cogroup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    assert out.count() == events.count()  # exactly one row per event

    rows = out.collect()
    orders_by_user: dict[int, list] = {}
    for o in orders.collect():
        orders_by_user.setdefault(o.o_custkey, []).append(
            (o.o_orderdate, o.o_orderkey))
    for r in rows[:200]:  # spot-check the as-of pick per event
        cand = [(d, k) for d, k in orders_by_user.get(r.user_id, [])
                if d <= r.ts]
        if not cand:
            assert r.last_orderkey is None
            assert r.days_since_order is None
        else:
            best = max(cand)  # latest date, then highest key — the tie rule
            assert r.last_orderkey == best[1], (r, best)
            assert r.days_since_order >= 0


def test_cogroup_handles_users_without_orders(spark, sf_dir):
    """events.user_id deliberately dangles vs orders customers (the FK
    audit measures it) — those co-groups must null-extend, not drop."""
    out = events_orders_asof_cogroup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    users_with_orders = {r.o_custkey for r in
                         orders.select("o_custkey").distinct().collect()}
    orderless_events = (events
                        .where(~F.col("user_id").isin(users_with_orders))
                        .count())
    assert (out.where(F.col("last_orderkey").isNull()).count()
            >= orderless_events)


def test_numeric_profile_shapes(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    rows = events_numeric_profile(spark, sf_dir).collect()
    assert sum(r.n_events for r in rows) == events.count()
    for r in rows:
        assert r.std_value > 0
        assert -1.0 <= r.corr_value_hour <= 1.0
        # value ∈ (0, ~500] ⇒ moments must be finite and sane
        assert 0 < r.mean_value < 1000
        assert r.excess_kurtosis > -3.0


def test_stream_left_join_withholds_unevictable_tail(spark, sf_dir):
    """The operational point of the outer stream join: unmatched left
    rows younger than the final watermark stay in state — the streaming
    result must be a strict subset of the batch left join whenever such
    rows exist (they do in this fixture)."""
    from qrapids_forecast_r_script_spark.streaming.queries import (
        events_stream_stream_left_join,
    )
    out = events_stream_stream_left_join(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    err = (events.where(F.col("event_type") == "error")
           .select(F.col("event_id").alias("err_id"),
                   F.col("user_id").alias("u"),
                   F.col("ts").alias("ets")))
    pur = (events.where(F.col("event_type") == "purchase")
           .select(F.col("event_id").alias("pur_id"),
                   F.col("user_id").alias("pu"),
                   F.col("ts").alias("pts")))
    batch = err.join(
        pur,
        (F.col("u") == F.col("pu"))
        & (F.col("pts") >= F.col("ets") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("pts") <= F.col("ets") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer")
    n_stream, n_batch = out.count(), batch.count()
    assert n_stream < n_batch, (n_stream, n_batch)
    # every matched pair IS emitted — only null-extensions are withheld
    n_pairs_stream = out.where(F.col("pur_id").isNotNull()).count()
    n_pairs_batch = batch.where(F.col("pur_id").isNotNull()).count()
    assert n_pairs_stream == n_pairs_batch
