"""Semantic properties of the text-quality layer beyond oracle equality:
hand-computed n-gram fractions on a constructed corpus, LM ordering, and
DSIR sign behavior."""

import math

from pyspark.sql import Row


def _docs(spark, rows):
    return spark.createDataFrame([
        Row(doc_id=i, text=t, lang=lang, source="s", n_chars=len(t))
        for i, (t, lang) in enumerate(rows)])


def test_repetition_fracs_hand_computed(spark, monkeypatch):
    """'a a a b' → top unigram 3/4; bigrams (a a, a a, a b) → 2/3;
    trigrams (a a a, a a b) → 1/2.  All three trip the Gopher
    thresholds → repetitive."""
    from qrapids_forecast_r_script_spark.operators import text_quality as tq
    # the clean doc needs ≥1/0.16 ≈ 7 trigrams (9 tokens) of all-unique
    # tokens to stay under every threshold — short docs trivially trip
    # the trigram rule (1/n_trigrams > 0.16 whenever n_tokens < 9)
    docs = _docs(spark, [("a a a b", "en"),
                         ("the quick brown fox jumps over two lazy sleeping "
                          "dogs near my barn", "en")])
    monkeypatch.setattr(
        "qrapids_forecast_r_script_spark.operators.text_quality.load_table",
        lambda spark, sf_dir, name: docs)
    out = {r.doc_id: r for r in tq.doc_repetition_stats(spark, "x").collect()}
    r0 = out[0]
    assert r0.n_tokens == 4
    assert r0.top_unigram_frac == 0.75
    assert abs(r0.top_bigram_frac - round(2 / 3, 6)) < 1e-12
    assert r0.top_trigram_frac == 0.5
    assert r0.repetitive
    r1 = out[1]
    assert not r1.repetitive  # all unique tokens: every frac == 1/n


def test_bigram_logprob_orders_common_vs_rare(spark, monkeypatch):
    """A document made of the corpus's dominant bigram must score a
    lower avg neg-logprob (more probable) than one of a unique bigram."""
    from qrapids_forecast_r_script_spark.operators import text_quality as tq
    docs = _docs(spark, [("x y x y x y x y", "en"),
                         ("x y x y x y x y", "en"),
                         ("q z", "en")])
    monkeypatch.setattr(
        "qrapids_forecast_r_script_spark.operators.text_quality.load_table",
        lambda spark, sf_dir, name: docs)
    out = {r.doc_id: r.avg_neg_logprob
           for r in tq.doc_bigram_logprob(spark, "x").collect()}
    assert out[0] == out[1]
    assert out[0] < out[2]


def test_dsir_sign_separates_target_like_docs(spark, monkeypatch):
    """Tokens exclusive to the lang='en' target make a positive score;
    tokens exclusive to the background make a negative one."""
    from qrapids_forecast_r_script_spark.operators import text_quality as tq
    docs = _docs(spark, [("good clean prose text", "en"),
                         ("good clean prose text", "en"),
                         ("junk noise junk noise", "xx"),
                         ("junk noise junk noise", "xx")])
    monkeypatch.setattr(
        "qrapids_forecast_r_script_spark.operators.text_quality.load_table",
        lambda spark, sf_dir, name: docs)
    out = {r.doc_id: r for r in tq.dsir_importance(spark, "x").collect()}
    assert out[0].keep and out[1].keep
    assert not out[2].keep and not out[3].keep
    assert out[0].dsir_score > 0 > out[2].dsir_score


def test_corpus_topk_rank_is_total_and_deterministic(spark, sf_dir):
    """Ranks 1..20, unique bigrams, counts non-increasing, lexicographic
    tiebreak."""
    from qrapids_forecast_r_script_spark.operators import text_quality as tq
    rows = tq.corpus_bigram_topk(spark, sf_dir).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 20
    assert len({r.bigram for r in rows}) == len(rows)
    for a, b in zip(rows, rows[1:]):
        assert (a.n_occurrences > b.n_occurrences) or \
            (a.n_occurrences == b.n_occurrences and a.bigram < b.bigram)


def test_bigram_logprob_matches_closed_form(spark, monkeypatch):
    """One two-token doc: its single bigram has c2=1, prefix c1=1, V=2 →
    neg-logprob = -ln(1.5 / (1 + 0.5*2)) = -ln(0.75)."""
    from qrapids_forecast_r_script_spark.operators import text_quality as tq
    docs = _docs(spark, [("p q", "en")])
    monkeypatch.setattr(
        "qrapids_forecast_r_script_spark.operators.text_quality.load_table",
        lambda spark, sf_dir, name: docs)
    [r] = tq.doc_bigram_logprob(spark, "x").collect()
    assert r.n_bigrams == 1
    assert abs(r.avg_neg_logprob - round(-math.log(1.5 / 2.0), 6)) < 1e-9


def test_doc_chunks_reconstruct_original(spark, sf_dir):
    """Overlap-aware reconstruction: chunk 0 plus each later chunk minus
    its 8-token overlap must rebuild every document exactly — no token
    lost or duplicated at any chunk boundary (the property that makes
    chunked training data safe)."""
    from qrapids_forecast_r_script_spark.operators.text import (
        _CHUNK_SIZE, _CHUNK_STEP, doc_chunks)
    from qrapids_forecast_r_script_spark.sources import load_table
    overlap = _CHUNK_SIZE - _CHUNK_STEP
    chunks = {}
    for r in doc_chunks(spark, sf_dir).collect():
        chunks.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
    originals = {r.doc_id: r.text.split(" ")
                 for r in load_table(spark, sf_dir, "documents").collect()}
    assert set(chunks) == set(originals)
    for doc_id, by_id in chunks.items():
        rebuilt = list(by_id[0])
        for cid in range(1, max(by_id) + 1):
            rebuilt.extend(by_id[cid][overlap:])
        assert rebuilt == originals[doc_id], doc_id


def test_ivf_kmeans_partitioning_invariant(spark, sf_dir):
    """The rounded-Lloyd refinement must give identical top-k under a
    different shuffle width — the 1e-6 coordinate rounding exists
    precisely to absorb partitioning-dependent float-mean association."""
    from qrapids_forecast_r_script_spark.operators.similarity import (
        ivf_kmeans_topk)
    a = sorted(map(tuple, ivf_kmeans_topk(spark, sf_dir).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(map(tuple, ivf_kmeans_topk(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_observe_quality_gate_metrics(spark, sf_dir):
    """DataFrame.observe data-quality gate: the metrics that ride along
    with the cleaning action must equal the directly-aggregated truth —
    no second corpus scan needed for the circuit breaker."""
    from pyspark.sql import functions as F
    from qrapids_forecast_r_script_spark.operators.pipeline import (
        observed_clean_pass)
    from qrapids_forecast_r_script_spark.operators.text import quality_flags
    from qrapids_forecast_r_script_spark.sources import load_table
    df, obs = observed_clean_pass(spark, sf_dir)
    kept_rows = df.count()          # the action that populates the gate
    got = obs.get
    truth = quality_flags(load_table(spark, sf_dir, "documents")).agg(
        F.count(F.lit(1)).alias("seen"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(F.lit(0)))
         .alias("tokens")).first()
    assert got["docs_seen"] == truth.seen
    assert got["docs_kept"] == truth.kept == kept_rows
    assert got["tokens_kept"] == truth.tokens


def test_ccnet_terciles_balanced_and_ordered(spark, sf_dir):
    """Per language: tercile sizes differ by at most 1 (ntile contract)
    and every head-bucket score <= every tail-bucket score (the split
    is by LM score, ascending — head = most fluent)."""
    from collections import defaultdict
    from qrapids_forecast_r_script_spark.operators import text_quality as tq
    rows = tq.ccnet_perplexity_buckets(spark, sf_dir).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        sizes = defaultdict(int)
        for r in rs:
            sizes[r.tercile] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        head = [r.avg_neg_logprob for r in rs if r.ppl_bucket == "head"]
        tail = [r.avg_neg_logprob for r in rs if r.ppl_bucket == "tail"]
        if head and tail:
            assert max(head) <= min(tail), lang


def test_psi_nonnegative_and_level_consistent(spark, sf_dir):
    """PSI terms are (p-q)ln(p/q) with sign(p-q) = sign(ln(p/q)), so
    PSI >= 0 always; the drift verdict must match the rounded value
    against the published 0.1 / 0.25 bands."""
    from qrapids_forecast_r_script_spark.operators import text_quality as tq
    rows = tq.source_drift_psi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.psi >= 0, r
        expect = ("major" if r.psi > 0.25
                  else "moderate" if r.psi > 0.1 else "stable")
        assert r.drift_level == expect, r
