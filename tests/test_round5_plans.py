"""Round-5 plan/behavior contracts: the header-decode round-trip and
the TWS conf-scoping rules."""

import pytest

from qrapids_forecast_r_script_spark.plans.introspect import (
    executed_plan,
    has_cartesian,
    python_eval_count,
)


def _executed(df):
    df.count()
    return df


def test_image_header_meta_plan(spark, sf_dir):
    """Exactly TWO budgeted Python ops (payload build + header parse,
    both Arrow mapInPandas), the doc_id filter pushed to the parquet
    scan, single-column read schema, no cartesian."""
    from qrapids_forecast_r_script_spark.operators.multimodal import (
        media_image_header_meta)
    df = _executed(media_image_header_meta(spark, sf_dir))
    plan = executed_plan(df)
    assert python_eval_count(df, plan) == 2
    assert not has_cartesian(df, plan)
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,200)]" in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_tws_restores_state_store_provider_conf(spark, sf_dir):
    """events_tws_running_totals needs the RocksDB state-store provider;
    the override must be scoped to the stream run — the session conf
    must come back exactly as it was (here: unset)."""
    from qrapids_forecast_r_script_spark.streaming.stateful import (
        events_tws_running_totals, tws_available)
    if not tws_available(spark):
        pytest.skip("no protobuf runtime on this host")
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    events_tws_running_totals(spark, sf_dir).count()
    assert spark.conf.get(key, None) == before
