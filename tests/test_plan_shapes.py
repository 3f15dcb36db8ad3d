"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the executed plan — pushdown reaching the scan,
dimension joins broadcast, no accidental cartesian products.
"""

import pytest

from qrapids_forecast_r_script_spark.plans import (
    broadcast_join_count,
    exchange_count,
    executed_plan as _plan,
    plan_report,
    read_schemas,
)


def test_filter_and_projection_pushdown(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.relational import (
        part_filter_projection)
    plan = _plan(part_filter_projection(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "p_size" in plan.split("PushedFilters:")[1][:200]
    # projection pruned to the 4 referenced columns (not the full table)
    read_schema = plan.split("ReadSchema:")[1][:300]
    assert "p_retailprice" not in read_schema


def test_q5_broadcasts_dimensions(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.relational import (
        q5_local_supplier)
    plan = _plan(q5_local_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q3_broadcasts_customer(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.relational import (
        q3_shipping_priority)
    plan = _plan(q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_search_element_pushes_name_filter(spark, sf_dir):
    """The engine analog of the reference's source-side query pushdown
    (q='metric:<name>', R:27): the event_type predicate must reach the
    parquet scan."""
    from qrapids_forecast_r_script_spark.operators.relational import (
        search_element_scan)
    plan = _plan(search_element_scan(spark, sf_dir))
    assert "PushedFilters" in plan


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.similarity import (
        cosine_topk_bruteforce)
    plan = _plan(cosine_topk_bruteforce(spark, sf_dir))
    # the deliberate small-side broadcast: a BroadcastNestedLoopJoin over
    # the 5-row query set, never a shuffled cartesian
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_forecast_batch_single_shuffle(spark, sf_dir):
    """The grouped-UDF plan should contain exactly one exchange for the
    series key (plus AQE reads) and a FlatMapGroupsInPandas."""
    from qrapids_forecast_r_script_spark.sources import (events_as_metrics,
                                                         load_table)
    from qrapids_forecast_r_script_spark.forecast.api import forecast_batch
    metrics = events_as_metrics(load_table(spark, sf_dir, "events"))
    plan = _plan(forecast_batch(spark, metrics, "SNAIVE", 7, 7))
    assert "FlatMapGroupsInPandas" in plan


def test_q19_or_blocks_push_to_scan(spark, sf_dir):
    """The OR-of-conjunctions must reach BOTH parquet scans as pushed
    disjunctive filters — not evaluated post-join."""
    from qrapids_forecast_r_script_spark.operators.tpch_full import (
        q19_discounted_revenue)
    plan = _plan(q19_discounted_revenue(spark, sf_dir))
    assert "CartesianProduct" not in plan
    pushed = [seg[:400] for seg in plan.split("PushedFilters:")[1:]]
    assert any("Or(" in seg for seg in pushed), pushed


def test_range_join_is_equi_join(spark, sf_dir):
    """The bin-and-refine rewrite must produce a hash-based equi-join on
    (user_id, bucket) — never a nested-loop/cartesian inequality join."""
    from qrapids_forecast_r_script_spark.operators.relational_more import (
        events_range_join_binned)
    plan = _plan(events_range_join_binned(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_q21_no_self_join_explosion(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair is rewritten to windows: the lineitem
    table must be scanned once (no O(n^2) self-joins on the fact)."""
    from qrapids_forecast_r_script_spark.operators.tpch_full import (
        q21_waiting_suppliers)
    plan = _plan(q21_waiting_suppliers(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan


def test_ivf_assignment_broadcasts_centroids(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.similarity import ivf_topk
    plan = _plan(ivf_topk(spark, sf_dir))
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_neardup_join_is_band_blocked(spark, sf_dir):
    """The near-dup self-join must key on the LSH band columns (bounded
    bucket fan-out), never a label-only or nested-loop pair join."""
    from qrapids_forecast_r_script_spark.operators.similarity import (
        embedding_neardup_pairs)
    plan = _plan(embedding_neardup_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_val" in plan  # join keys include the band signature


def test_salted_join_shuffles_on_salted_key(spark, sf_dir):
    """The skew rewrite must hold: no broadcast (the demo's premise is a
    non-broadcastable dim), a hash join whose key includes the salt, and
    no cartesian fallback."""
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        salted_skew_join)
    df = salted_skew_join(spark, sf_dir)
    plan = _plan(df)
    assert broadcast_join_count(df, plan) == 0, plan
    assert "ShuffledHashJoin" in plan
    assert "salt" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_no_shuffle_on_join_key(spark, sf_dir):
    """Bucketed co-located join: the sort-merge join must consume the
    bucketed layout directly — no Exchange on either join key.  (The
    later segment aggregate + orderBy may still shuffle; only the join
    inputs are asserted.)"""
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        bucketed_orders_join)
    df = bucketed_orders_join(spark, sf_dir)
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    assert "hashpartitioning(c_custkey" not in plan, plan
    assert "hashpartitioning(o_custkey" not in plan, plan


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A fact table partitioned by day, joined to a filtered dim on the
    partition column, must get a runtime ``dynamicpruning`` partition
    filter — at 100 TB this is what turns a full scan into reading only
    the joined days' directories."""
    from pyspark.sql import functions as F
    from qrapids_forecast_r_script_spark.sources import load_table
    fact_path = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts"))
    ev.write.mode("overwrite").partitionBy("day").parquet(fact_path)
    dim_path = str(tmp_path / "day_dim")
    ev.select("day").distinct().write.mode("overwrite").parquet(dim_path)
    fact = spark.read.parquet(fact_path)
    # NB the dim filter must be a comparison — Spark's DPP heuristic
    # (isLikelySelective) ignores bare boolean-column predicates
    dim = spark.read.parquet(dim_path).where(F.dayofmonth("day") <= 2)
    joined = (fact.join(dim, "day")
              .groupBy("day").agg(F.round(F.sum("value"), 4).alias("total")))
    plan = _plan(joined)
    assert "dynamicpruning" in plan, plan


def test_stratified_sample_is_map_only(spark, sf_dir):
    """The deterministic hash sample must be a pure scan+filter — zero
    exchanges — so at 100 TB it is one pass with no shuffle at all."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        stratified_sample_docs)
    df = stratified_sample_docs(spark, sf_dir)
    plan = _plan(df)
    assert exchange_count(df, plan) == 0, plan
    assert "CartesianProduct" not in plan


def test_shard_packing_broadcasts_bucket_offsets(spark, sf_dir):
    """The two-pass prefix sum must join the (tiny) bucket-offset frame
    by broadcast — no shuffle of the doc-level side beyond the window's
    own (lang, bucket) partitioning."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        token_shard_packing)
    plan = _plan(token_shard_packing(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_zorder_bins_skip_on_either_dimension(spark, sf_dir):
    """The z-bin min/max stats must actually prune: a predicate on the
    hour dimension alone may touch at most ~25% of bins for a quarter-
    month range (a hour-sorted layout gives the same, but then a USER
    predicate would touch 100%; z-order bounds both)."""
    from pyspark.sql import functions as F
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        zorder_bin_stats)
    bins = zorder_bin_stats(spark, sf_dir).collect()
    total = len(bins)
    hour_touched = sum(1 for b in bins
                       if b.max_hour >= 0 and b.min_hour < 180)
    assert hour_touched / total <= 0.34, (hour_touched, total)
    # every bin's bounding box is a proper sub-rectangle on the hour dim
    assert all(b.max_hour - b.min_hour < 719 for b in bins)


def test_pii_scrub_is_pure_map(spark, sf_dir):
    """PII redaction must be a zero-shuffle scan-transform (regexp ops
    in codegen, no Python): at 100 TB it is exactly one pass."""
    from qrapids_forecast_r_script_spark.operators.text import pii_scrub_docs
    from qrapids_forecast_r_script_spark.plans import python_eval_count
    df = pii_scrub_docs(spark, sf_dir)
    plan = _plan(df)
    assert exchange_count(df, plan) == 0, plan
    assert python_eval_count(df, plan) == 0, plan
    # column pruning: only (doc_id, text) may be read
    assert all("lang" not in s and "source" not in s
               for s in read_schemas(df, plan)), plan


def test_scd2_single_shuffle_on_merge_key(spark, sf_dir):
    """The history closure is ONE exchange (the merge-key shuffle the
    lead() window needs) — no self-join, no second shuffle."""
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        orders_upsert_scd2)
    df = orders_upsert_scd2(spark, sf_dir)
    plan = _plan(df)
    assert exchange_count(df, plan) == 1, plan
    assert "CartesianProduct" not in plan


def test_maxsim_broadcasts_query_tokens(spark, sf_dir):
    """Late-interaction scoring must broadcast the constant query-token
    side (never shuffle the corpus token table against it) and keep the
    per-token max + per-doc sum as partial aggregates."""
    from qrapids_forecast_r_script_spark.operators.similarity import (
        maxsim_multivector_topk)
    df = maxsim_multivector_topk(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df, plan) >= 1, plan


def test_partitioned_layout_prunes_directories(spark, sf_dir):
    """The one-day query over the date-partitioned layout must carry a
    PartitionFilters entry on event_date (directory-level pruning — no
    data files outside the day are opened) and read only the pruned
    partition's rows."""
    from qrapids_forecast_r_script_spark.sources.formats import (
        events_partitioned_pruning)
    df = events_partitioned_pruning(spark, sf_dir)
    plan = _plan(df)
    import re
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and any("event_date" in p for p in pf), plan


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's OptimizeSkewedJoin must actually fire on a skewed
    sort-merge join (the automatic complement to the manual
    `salted_skew_join` pattern): the executed SMJ node carries
    ``skew=true`` once a partition exceeds max(threshold,
    factor × median).  Found gotchas, pinned here: (a) partition
    COALESCING runs first and merges small partitions until the skew
    ratio disappears at test scale — disable it to observe the
    mechanism; (b) broadcast demotion must be off or the dim side
    broadcasts and there is no shuffle join to split.  At 100 TB both
    defaults stay ON and the same mechanism triggers at the real
    256 MB threshold."""
    from pyspark.sql import functions as F
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(400000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id"))
            .alias("k"),
            F.rand(1).alias("v"))
        dim = spark.range(1000).select(F.col("id").alias("k"),
                                       F.lit("x").alias("tag"))
        j = big.join(dim, "k").select(F.sum("v").alias("s"))
        j.collect()
        assert "skew=true" in _plan(j)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_relational_queries_have_no_python_ops(spark, sf_dir):
    """Budget: the Python boundary exists ONLY in forecast fitting and
    multimodal extraction; every relational headline stays JVM-side."""
    from qrapids_forecast_r_script_spark.operators.relational import (
        q1_pricing_summary, q5_local_supplier)
    for fn in (q1_pricing_summary, q5_local_supplier):
        df = fn(spark, sf_dir)
        # collect() (not count(), which compiles a separate plan) executes
        # THIS plan, finalizing AQE so codegen stages are marked
        df.collect()
        rep = plan_report(df)
        assert rep["python_ops"] == 0, (fn.__name__, rep)
        assert not rep["cartesian"], fn.__name__
        assert rep["codegen_spans"] >= 1, (fn.__name__, rep)
