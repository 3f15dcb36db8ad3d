"""Training-data curation operators over ``documents`` / ``embeddings``
(north-star extension; no reference counterpart — the reference is a
single-series forecasting service, `TimeSeriesFunctions_GPL_0.5.1.R:1-406`).
These are the steps a 100 TB pretraining pipeline runs between raw scrape
and tokenizer, expressed Spark-first:

- :func:`stratified_sample_docs` — deterministic hash-Bernoulli sampling
  with per-language rates (downsample over-represented languages).
  Map-only: no shuffle, no RNG state, rerun-stable at any parallelism.
- :func:`source_quota_cap` — cap documents per source (domain quota),
  keeping the longest docs first.  One shuffle on ``source``.
- :func:`token_shard_packing` — assign docs to fixed token-budget shards
  via a DISTRIBUTED two-pass prefix sum (per-bucket partials + broadcast
  bucket offsets), never a single giant ordered window.
- :func:`semantic_dedup_keep` — SemDeDup-style: connected components
  over the embedding near-dup graph, keep the min-id representative of
  each cluster.

All four are integer/deterministic end-to-end, so each has an exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .dedup import cluster_edges
from .similarity import _neardup_oracle_sql, embedding_neardup_pairs

# Knuth multiplicative hash: spreads sequential doc_ids uniformly over
# [0, 2^32).  doc_id * KNUTH stays far under BIGINT range (doc_id < 2^40
# would still fit), so the expression is ANSI-overflow-safe.
_KNUTH = 2654435761
_HASH_MOD = 4294967296          # 2^32

# Per-language keep rates (percent).  The synthetic corpus is ~44% 'en';
# a balanced pretraining mix downsamples the head languages.
_LANG_KEEP_PCT = {"en": 30, "zh": 60}
_DEFAULT_KEEP_PCT = 100

_SOURCE_CAP = 15                 # max docs kept per source
_SHARD_BUDGET = 20_000           # word-tokens per output shard
_PACK_BUCKET = 64                # doc_ids per prefix-sum bucket


def _hash_pct(col):
    return F.pmod(col * F.lit(_KNUTH), F.lit(_HASH_MOD)) % 100


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language Bernoulli sample of ``documents``.

    keep iff hash(doc_id) % 100 < rate(lang).  The hash is a fixed
    multiplicative constant, not ``rand()``: the sample is a pure
    function of the row, so it is identical across retries, partitions,
    and cluster sizes — the property that makes a 100 TB sample job
    restartable.  Plan shape: map-only filter, zero shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(_DEFAULT_KEEP_PCT)
    for lang, pct in sorted(_LANG_KEEP_PCT.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return (docs
            .withColumn("keep_pct", rate)
            .where(_hash_pct(F.col("doc_id")) < F.col("keep_pct"))
            .select("doc_id", "lang", "source", "n_chars",
                    F.col("keep_pct").cast("int").alias("keep_pct")))


def source_quota_cap(spark: SparkSession, sf_dir: str,
                     cap: int = _SOURCE_CAP) -> DataFrame:
    """Per-source document quota: keep the ``cap`` longest docs of each
    source (n_chars desc, doc_id tiebreak).

    The domain-quota step of corpus curation — prevents any single
    crawl source from dominating the mix.  One shuffle on ``source``;
    rank-then-filter pushes nothing across sources, so a skewed source
    costs only its own partition (for a pathological mega-source,
    pre-aggregate a salted partial top-``cap`` per salt, then re-rank
    the ``salt_count * cap`` survivors — same two-level shape as
    ``scale_patterns.salted_skew_join``).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    return (docs
            .withColumn("src_rank", F.row_number().over(w))
            .where(F.col("src_rank") <= cap)
            .select("doc_id", "source", "n_chars", "src_rank"))


def token_shard_packing(spark: SparkSession, sf_dir: str,
                        budget: int = _SHARD_BUDGET,
                        bucket_width: int = _PACK_BUCKET) -> DataFrame:
    """Assign every doc a token-budget shard id: shard = (exclusive
    running token count within lang, ordered by doc_id) div ``budget``.

    The naive form is one window over (PARTITION BY lang ORDER BY
    doc_id) — a single task per language, which at 100 TB serializes
    the biggest language through one core.  This implementation is the
    scalable two-pass prefix sum instead:

      1. per-(lang, bucket) token totals, bucket = doc_id div 64 —
         ordinary partial aggregation;
      2. exclusive prefix over BUCKET totals within lang — a window over
         ~n_docs/64 rows, broadcast back;
      3. exclusive cumsum WITHIN each (lang, bucket) — windows over 64-row
         partitions, embarrassingly parallel — plus the bucket offset.

    Integer arithmetic end-to-end, so the decomposition is exactly equal
    to the single-window form — which is what the oracle runs.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs
            .select("doc_id", "lang",
                    F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9]+"))
                     .cast("bigint").alias("n_tokens"))
            .withColumn("bucket", F.expr(f"doc_id div {bucket_width}")))
    bucket_tot = (toks.groupBy("lang", "bucket")
                  .agg(F.sum("n_tokens").alias("bucket_tokens")))
    wb = (Window.partitionBy("lang").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = bucket_tot.select(
        "lang", "bucket",
        F.coalesce(F.sum("bucket_tokens").over(wb), F.lit(0))
         .alias("bucket_offset"))
    wd = (Window.partitionBy("lang", "bucket").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    return (toks
            .withColumn("within_excl",
                        F.coalesce(F.sum("n_tokens").over(wd), F.lit(0)))
            .join(F.broadcast(offsets), ["lang", "bucket"])
            .select("doc_id", "lang", "n_tokens",
                    F.expr(f"(bucket_offset + within_excl) div {budget}")
                     .alias("shard_id")))


def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over embeddings: connected
    components of the near-duplicate graph (cosine >= 0.25 within label,
    LSH-banded — :func:`similarity.embedding_neardup_pairs`), keep the
    min-vec_id representative of every cluster.

    Reuses :func:`dedup.cluster_edges` (min-label propagation with the
    large-star/small-star mega-component fallback).  Oracle: recursive
    transitive closure over the identical deterministic pair SQL.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    pairs = (embedding_neardup_pairs(spark, sf_dir)
             .select(F.col("vec_a").alias("doc_a"),
                     F.col("vec_b").alias("doc_b")))
    labels = cluster_edges(emb.select(F.col("vec_id").alias("doc_id")), pairs)
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("kept"))


_EVAL_SET_SIZE = 10              # docs in the held-out eval set
_CONTAM_N = 3                    # n-gram length for overlap detection


def _eval_ids(docs: DataFrame) -> DataFrame:
    """The deterministic held-out eval set: the 10 lowest-doc_id English
    documents — single source of truth for the contamination audit AND
    the span-removal transform (they must never diverge)."""
    return (docs.where(F.col("lang") == "en")
            .orderBy("doc_id").limit(_EVAL_SET_SIZE)
            .select("doc_id"))


def _doc_shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, pos, shingle) for every n-gram start position — the
    posexplode + window-lead construction (HOF-free, one tokenization),
    shared by the audit (which distincts away pos) and the transform
    (which needs pos for span coverage)."""
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    return (toks
            .select("doc_id", "pos",
                    F.concat_ws(" ", *grams).alias("shingle"),
                    grams[-1].alias("last_tok"))
            .where(F.col("last_tok").isNotNull())
            .select("doc_id", "pos", "shingle"))


def eval_contamination(spark: SparkSession, sf_dir: str,
                       n: int = _CONTAM_N) -> DataFrame:
    """Train/eval decontamination: which training documents share
    ``n``-gram shingles with the held-out eval set, and how much.

    Eval set = the 10 lowest-doc_id English documents (deterministic).
    Every other doc is "training"; a doc is contaminated if any of its
    distinct n-grams appears in the eval set's n-gram set.  Output is
    one row per contaminated doc: distinct overlapping n-grams, the
    doc's distinct n-gram count, and the overlap ratio.

    Scale shape: the eval n-gram set is tiny (eval suites are KBs, the
    corpus is TBs) — it broadcasts, so the check is ONE map-side
    semi-join over the training shingles, no shuffle of the corpus side
    beyond the per-doc aggregation.  n=3 suits the synthetic corpus's
    short random sentences; production decontamination uses n of 8-13
    over the same plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    eval_ids = _eval_ids(docs)
    sh = _doc_shingles(docs, n).select("doc_id", "shingle").distinct()
    ev = F.broadcast(sh.join(F.broadcast(eval_ids), "doc_id")
                     .select("shingle").distinct())
    train = sh.join(eval_ids, "doc_id", "left_anti")
    per_doc = (train.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_shingles")))
    overlap = (train.join(ev, "shingle")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_overlap")))
    return (overlap.join(per_doc, "doc_id")
            .select("doc_id", "n_overlap", "n_shingles",
                    F.round(F.col("n_overlap") / F.col("n_shingles"), 6)
                     .alias("contamination")))


def decontaminate_spans(spark: SparkSession, sf_dir: str,
                        n: int = _CONTAM_N) -> DataFrame:
    """The decontamination TRANSFORM (the step after
    :func:`eval_contamination`'s audit): actually REMOVE every token
    span that overlaps the eval set — each training doc loses the
    tokens covered by any contaminated ``n``-gram window and is
    re-assembled in original order (Lee/Brown-style span excision, the
    form labs ship because dropping whole documents wastes the clean
    majority of a barely-contaminated doc).

    Output per training doc: total tokens, tokens removed, and the md5
    of the cleaned text (hash-checked — the reassembly itself is what
    the oracle proves; emitting full bodies would bloat the compare).

    Scale shape: eval shingles broadcast (KBs vs TBs); coverage
    expansion is a constant ×n explode of only the CONTAMINATED starts;
    the anti-join and the re-assembly group are both keyed by doc_id —
    one corpus shuffle, same contract as the audit query.
    """
    docs = load_table(spark, sf_dir, "documents")
    eval_ids = _eval_ids(docs)
    train = docs.join(eval_ids, "doc_id", "left_anti")
    toks = train.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    starts = _doc_shingles(train, n)
    ev_sh = F.broadcast(_doc_shingles(
        docs.join(F.broadcast(eval_ids), "doc_id"), n)
        .select("shingle").distinct())
    # r9 (guide §2.4): cut the contaminated-position set — the token
    # anti-join and the removed-count aggregate each reference it, so
    # the uncut plan re-ran the shingle+eval-set chain per consumer
    covered = (starts.join(ev_sh, "shingle")
               .select("doc_id",
                       F.explode(F.sequence(
                           F.col("pos"),
                           F.col("pos") + F.lit(n - 1))).alias("pos"))
               .distinct().localCheckpoint())
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    cleaned = (kept.groupBy("doc_id")
               .agg(F.concat_ws(" ", F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda x: x["tok"])).alias("cleaned")))
    removed = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_removed"))
    base = train.select("doc_id",
                        F.size(F.split("text", " ")).cast("long")
                        .alias("n_tokens"))
    return (base
            .join(cleaned, "doc_id", "left")
            .join(removed, "doc_id", "left")
            .select("doc_id", "n_tokens",
                    F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
                    F.md5(F.coalesce("cleaned", F.lit(""))
                          .cast("binary")).alias("cleaned_md5")))


_WS_K = 50                       # weighted sample size


def weighted_sample_docs(spark: SparkSession, sf_dir: str,
                         k: int = _WS_K) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"): each
    doc gets key = ln(u)/w for a hash-derived uniform u and weight w,
    and the k LARGEST keys are the sample — inclusion probability
    proportional to weight, one pass, no replacement bookkeeping.  The
    curation use: sample documents proportional to length/quality so a
    fixed-budget subset covers the corpus mass, not the doc count.

    Determinism: u comes from the same Knuth-hash-mod construction as
    the stratified sampler (reproducible across retries/partitioning);
    keys are ROUNDED at 1e-6 before ranking with a doc_id tiebreak —
    Spark's log() and DuckDB's ln() are different libm builds whose
    last-ulp drift the rounding absorbs (the PMI-collocation
    precedent).  Plan: map-side key computation + one TakeOrdered —
    no shuffle beyond the top-k."""
    docs = load_table(spark, sf_dir, "documents")
    # u in (0, 1): (hash + 1) / (mod + 1) keeps u strictly inside the
    # open interval on both engines (ln(0) would be -inf)
    u = ((F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(_HASH_MOD))
          + F.lit(1.0)) / F.lit(float(_HASH_MOD + 1)))
    key = F.round(F.log(u) / F.col("n_chars"), 6)
    scored = docs.select("doc_id", "source", "n_chars",
                         key.alias("ws_key"))
    top = (scored.orderBy(F.col("ws_key").desc(), F.col("doc_id").asc())
           .limit(k))
    w = Window.orderBy(F.col("ws_key").desc(), F.col("doc_id").asc())
    return (top.withColumn("sample_rank", F.row_number().over(w))
            .select("sample_rank", "doc_id", "source", "n_chars",
                    "ws_key"))


_SHUFFLE_EPOCHS = 2


def epoch_shuffle_order(spark: SparkSession, sf_dir: str,
                        epochs: int = _SHUFFLE_EPOCHS) -> DataFrame:
    """Deterministic per-epoch training order: each epoch assigns every
    doc a position by ranking ``md5(epoch || ':' || doc_id)`` — a fresh
    pseudo-random permutation per epoch that is nevertheless exactly
    reproducible (resumable training, auditable batch composition) and
    independent of partition layout.  This is the data-ordering
    primitive training loops need: epoch boundaries reshuffle, but a
    re-run of epoch e replays the identical order.

    Scale shape: position assignment is one window rank per epoch over
    a map-side hash — at 100 TB the window becomes a sort on the hash
    key that the shard-packing pass already pays; the constant-epoch
    explode adds no corpus-proportional work.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ep = docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(e) for e in range(epochs)]))
        .alias("epoch"))
    key = F.md5(F.concat(F.col("epoch").cast("string"), F.lit(":"),
                         F.col("doc_id").cast("string")).cast("binary"))
    w = Window.partitionBy("epoch").orderBy(key.asc(), F.col("doc_id").asc())
    return (ep.select("epoch", "doc_id", key.alias("shuffle_key"))
            .withColumn("position", F.row_number().over(w).cast("long"))
            .select("epoch", "position", "doc_id"))


_SPLIT_BOUNDS = (80, 90)         # hash-bucket cut points: train/val/test
_FIXED_K = 10                    # eval-set size per language


def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = hash(doc_id)
    % 100, <80 train / <90 val / else test.  Same multiplicative-hash
    discipline as :func:`stratified_sample_docs` — a pure row function,
    so the split is identical across retries, partitions, and cluster
    sizes, and docs can never migrate between splits when the corpus
    grows (doc_id is stable).  Map-only, zero shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = _hash_pct(F.col("doc_id"))
    split = (F.when(bucket < _SPLIT_BOUNDS[0], F.lit("train"))
             .when(bucket < _SPLIT_BOUNDS[1], F.lit("val"))
             .otherwise(F.lit("test")))
    return docs.select("doc_id", "lang", "source", split.alias("split"))


def leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUP-AWARE train/val/test split: the split hash keys on the
    doc's dedup CLUSTER id, not its own id, so near-duplicate documents
    can never straddle train and test — the leakage channel Lee et al.
    2022 showed inflates eval scores (the test set silently contains
    paraphrases of training docs).  Plain `dataset_split_assignment`
    has exactly this hole; this is the split a careful lab actually
    ships.

    Composition: the MinHash-LSH + CC cluster assignment (proven by
    ``dedup_clusters``) + the same multiplicative-hash bucketing as the
    doc-level split, applied to cluster_id.  One extra join keyed by
    doc_id over the clustering itself; singleton clusters degrade to
    the doc-level behavior.
    """
    from .dedup import dedup_clusters
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang",
                                                         "source")
    clusters = dedup_clusters(spark, sf_dir)
    bucket = _hash_pct(F.col("cluster_id"))
    split = (F.when(bucket < _SPLIT_BOUNDS[0], F.lit("train"))
             .when(bucket < _SPLIT_BOUNDS[1], F.lit("val"))
             .otherwise(F.lit("test")))
    return (docs.join(clusters, "doc_id")
            .select("doc_id", "cluster_id", "lang", "source",
                    split.alias("split")))


def fixed_k_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k deterministic sample per language: rank docs by a
    multiplicative hash within each lang, keep the k smallest (doc_id
    tiebreak makes the order total).  The fixed-size complement of the
    Bernoulli sampler: Bernoulli gives rate guarantees with binomial
    size jitter; this gives |sample| = min(k, n_lang) exactly — the
    eval-set construction primitive.  One shuffle (the per-lang rank);
    at 100 TB, per-group top-k pushes partial TakeOrdered into the map
    side, so nothing near the full corpus reaches the reducers.
    """
    from pyspark.sql.window import Window
    docs = load_table(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(_HASH_MOD))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (docs
            .withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= _FIXED_K)
            .select("doc_id", "lang", "source", "sample_rank"))


_MIX_ALPHA = 0.7                 # temperature: 1 = natural, 0 = uniform
_MIX_KEEP_FRAC = 0.5             # target corpus fraction after sampling
_MIX_RES = 1_000_000             # hash resolution for the keep threshold


def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language-mixture sampling (the T5/mT5
    alpha-sampling scheme): languages are re-weighted w_l ∝ p_l^α
    (α = 0.7), flattening the head and up-weighting the tail, and each
    language is then hash-Bernoulli sampled at the rate that realizes
    its re-balanced share of a half-size corpus.

    Shape at scale: one tiny per-lang count aggregate → rates derived in
    closed form and broadcast-joined back → map-only deterministic keep
    (same multiplicative-hash discipline as the other samplers, so the
    mixture is restartable and partition-invariant).  The rate is
    rounded to 1e-6 BEFORE thresholding on both engines: pow() is not
    correctly rounded across libms, and the rounding absorbs the ulp
    drift that could otherwise flip a keep decision at the boundary.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    tot = counts.agg(F.sum("n_l").cast("double").alias("n"),
                     F.lit(1).alias("one"))
    w = (counts.withColumn("one", F.lit(1))
         .join(F.broadcast(tot), "one")
         .withColumn("wl", F.pow(F.col("n_l") / F.col("n"),
                                 F.lit(_MIX_ALPHA))))
    wsum = w.agg(F.sum("wl").alias("wsum"), F.lit(1).alias("one"))
    rates = (w.join(F.broadcast(wsum), "one")
             .withColumn(
                 "keep_rate",
                 F.round(F.least(
                     F.lit(1.0),
                     (F.col("wl") / F.col("wsum")) * F.col("n")
                     * F.lit(_MIX_KEEP_FRAC) / F.col("n_l")), 6))
             .select("lang", "keep_rate"))
    thresh = F.floor(F.col("keep_rate") * _MIX_RES).cast("long")
    return (docs.join(F.broadcast(rates), "lang")
            .where(F.pmod(F.col("doc_id") * F.lit(_KNUTH),
                          F.lit(_HASH_MOD)) % _MIX_RES < thresh)
            .select("doc_id", "lang", "source", "keep_rate"))


def winsorized_doclen_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language length statistics via winsorization: exact
    p05/p95 cutpoints of ``n_chars`` per language, values clipped to
    the cutpoints, and both raw and winsorized means reported with clip
    counts — the outlier-robust aggregation a curation report uses so a
    handful of megadocs (or truncated fragments) can't swing the
    per-language profile that downstream mixture weights read.

    Cutpoints use Spark ``percentile`` == SQL ``quantile_cont`` (the
    ``value_percentiles_by_type`` parity precedent) and are ROUNDED to
    4 dp before clipping so the clip decision can't flip on float
    noise.  Scale: one per-lang percentile aggregate (tiny result,
    broadcast back) + one map-side clipped re-aggregate — two passes
    over the column, no window, no sort beyond the per-group
    percentile; the 100 TB path swaps in ``approx_percentile`` without
    changing shape."""
    docs = load_table(spark, sf_dir, "documents")
    cuts = (docs.groupBy("lang")
            .agg(F.round(F.percentile("n_chars", F.lit(0.05)), 4)
                 .alias("p05"),
                 F.round(F.percentile("n_chars", F.lit(0.95)), 4)
                 .alias("p95")))
    clipped = (docs.join(F.broadcast(cuts), "lang")
               .select("lang", "n_chars", "p05", "p95",
                       F.least(F.greatest(F.col("n_chars")
                                          .cast("double"),
                                          F.col("p05")),
                               F.col("p95")).alias("wlen")))
    return (clipped.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("n_chars") < F.col("p05")).cast("long"))
                 .alias("n_clipped_low"),
                 F.sum((F.col("n_chars") > F.col("p95")).cast("long"))
                 .alias("n_clipped_high"),
                 F.round(F.avg("n_chars"), 6).alias("mean_raw"),
                 F.round(F.avg("wlen"), 6).alias("mean_winsorized")))


def shard_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-quality report over :func:`token_shard_packing`: per
    (lang, shard) the doc count, token fill, and fill fraction against
    the budget — the metric a training job actually pays for (underfull
    shards waste step time as padding; the trailing shard per language
    is expected to be partial).  ``overflow`` marks shards whose fill
    exceeds the budget — inherent to start-offset assignment, where a
    doc straddling the boundary lands in the shard its first token
    falls in.

    Scale: one aggregate keyed by (lang, shard) over the packing
    output — the packing's own shuffle key prefix, so AQE plans it
    shuffle-local."""
    packed = token_shard_packing(spark, sf_dir)
    return (packed.groupBy("lang", "shard_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("shard_tokens"))
            .withColumn("fill_frac",
                        F.round(F.col("shard_tokens")
                                / float(_SHARD_BUDGET), 6))
            .withColumn("overflow",
                        F.col("shard_tokens") > _SHARD_BUDGET))


QUERIES = {
    "winsorized_doclen_stats": winsorized_doclen_stats,
    "shard_packing_efficiency": shard_packing_efficiency,
    "stratified_sample_docs": stratified_sample_docs,
    "eval_contamination": eval_contamination,
    "decontaminate_spans": decontaminate_spans,
    "weighted_sample_docs": weighted_sample_docs,
    "epoch_shuffle_order": epoch_shuffle_order,
    "source_quota_cap": source_quota_cap,
    "token_shard_packing": token_shard_packing,
    "semantic_dedup_keep": semantic_dedup_keep,
    "dataset_split_assignment": dataset_split_assignment,
    "leakage_free_split": leakage_free_split,
    "fixed_k_sample_per_lang": fixed_k_sample_per_lang,
    "temperature_mixture_sample": temperature_mixture_sample,
}

_RATE_CASE = ("CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {pct}"
    for lang, pct in sorted(_LANG_KEEP_PCT.items()))
    + f" ELSE {_DEFAULT_KEEP_PCT} END")

ORACLES = {
    "eval_contamination": f"""
        WITH ev AS (
            SELECT doc_id FROM documents WHERE lang = 'en'
            ORDER BY doc_id LIMIT {_EVAL_SET_SIZE}
        ), sh AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(
                       range(1, len(string_split(text, ' ')) - {_CONTAM_N - 2}),
                       i -> array_to_string(list_slice(
                            string_split(text, ' '), i, i + {_CONTAM_N - 1}), ' ')))
                       AS shingle
            FROM documents
        ), evsh AS (
            SELECT DISTINCT shingle FROM sh
            WHERE doc_id IN (SELECT doc_id FROM ev)
        ), train AS (
            SELECT * FROM sh
            WHERE doc_id NOT IN (SELECT doc_id FROM ev)
        ), per_doc AS (
            SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id
        ), overlap AS (
            SELECT t.doc_id, count(*) AS n_overlap
            FROM train t JOIN evsh e USING (shingle)
            GROUP BY t.doc_id
        )
        SELECT o.doc_id,
               CAST(o.n_overlap AS BIGINT) AS n_overlap,
               CAST(p.n_shingles AS BIGINT) AS n_shingles,
               round(o.n_overlap / CAST(p.n_shingles AS DOUBLE), 6)
                   AS contamination
        FROM overlap o JOIN per_doc p USING (doc_id)
    """,
    "decontaminate_spans": f"""
        WITH ev AS (
            SELECT doc_id FROM documents WHERE lang = 'en'
            ORDER BY doc_id LIMIT {_EVAL_SET_SIZE}
        ), toks AS (
            -- parallel unnests zip: (pos, tok) pairs without a lateral
            -- range (DuckDB range() cannot take column bounds in FROM)
            SELECT doc_id,
                   unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM ev)
        ), evsh AS (
            SELECT DISTINCT
                   unnest(list_transform(
                       range(1, len(string_split(text, ' ')) - {_CONTAM_N - 2}),
                       i -> array_to_string(list_slice(
                            string_split(text, ' '), i, i + {_CONTAM_N - 1}), ' ')))
                       AS shingle
            FROM documents WHERE doc_id IN (SELECT doc_id FROM ev)
        ), starts AS (
            SELECT doc_id,
                   unnest(range(1, len(string_split(text, ' '))
                                   - {_CONTAM_N - 2})) AS pos,
                   unnest(list_transform(
                       range(1, len(string_split(text, ' '))
                                - {_CONTAM_N - 2}),
                       i -> array_to_string(list_slice(
                            string_split(text, ' '), i,
                            i + {_CONTAM_N - 1}), ' '))) AS shingle
            FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM ev)
        ), covered AS (
            SELECT DISTINCT s.doc_id, s.pos + j.j AS pos
            FROM starts s
            JOIN evsh e USING (shingle), range(0, {_CONTAM_N}) j(j)
        ), kept AS (
            SELECT t.* FROM toks t
            LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
            WHERE c.doc_id IS NULL
        ), cleaned AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned
            FROM kept GROUP BY doc_id
        ), removed AS (
            SELECT doc_id, count(*) AS n_removed FROM covered GROUP BY doc_id
        )
        SELECT d.doc_id,
               len(string_split(d.text, ' ')) AS n_tokens,
               coalesce(r.n_removed, 0) AS n_removed,
               md5(coalesce(c.cleaned, '')) AS cleaned_md5
        FROM documents d
        LEFT JOIN cleaned c USING (doc_id)
        LEFT JOIN removed r USING (doc_id)
        WHERE d.doc_id NOT IN (SELECT doc_id FROM ev)
    """,
    "stratified_sample_docs": f"""
        SELECT doc_id, lang, source, n_chars,
               CAST({_RATE_CASE} AS INTEGER) AS keep_pct
        FROM documents
        WHERE (doc_id * {_KNUTH}) % {_HASH_MOD} % 100 < {_RATE_CASE}
    """,
    "epoch_shuffle_order": f"""
        WITH ep AS (
            SELECT d.doc_id, e.epoch,
                   md5(CAST(e.epoch AS VARCHAR) || ':'
                       || CAST(d.doc_id AS VARCHAR)) AS shuffle_key
            FROM documents d, range(0, {_SHUFFLE_EPOCHS}) e(epoch)
        )
        SELECT CAST(epoch AS INTEGER) AS epoch,
               CAST(row_number() OVER (PARTITION BY epoch
                     ORDER BY shuffle_key ASC, doc_id ASC) AS BIGINT)
                   AS position,
               doc_id
        FROM ep
    """,
    "weighted_sample_docs": f"""
        WITH scored AS (
            SELECT doc_id, source, n_chars,
                   round(ln(((doc_id * {_KNUTH}) % {_HASH_MOD}
                             + CAST(1 AS DOUBLE))
                            / CAST({_HASH_MOD + 1} AS DOUBLE))
                         / n_chars, 6) AS ws_key
            FROM documents
        )
        SELECT sample_rank, doc_id, source, n_chars, ws_key FROM (
            SELECT *, row_number() OVER (ORDER BY ws_key DESC,
                                         doc_id ASC) AS sample_rank
            FROM scored)
        WHERE sample_rank <= {_WS_K}
    """,
    "source_quota_cap": f"""
        SELECT doc_id, source, n_chars, src_rank FROM (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS src_rank
            FROM documents)
        WHERE src_rank <= {_SOURCE_CAP}
    """,
    # the oracle is the NAIVE single-window form the docstring names —
    # proving the distributed two-pass decomposition exactly equals it
    "token_shard_packing": f"""
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                        AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT doc_id, lang, n_tokens,
               -- CAST: DuckDB sum(BIGINT) is HUGEINT; the driver's value
               -- hash is type-sensitive (see VERDICT r1 q12 artifact)
               CAST((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) // {_SHARD_BUDGET} AS BIGINT) AS shard_id
        FROM t
    """,
    "semantic_dedup_keep": f"""
        WITH RECURSIVE pairs AS (
            SELECT vec_a, vec_b FROM ({_neardup_oracle_sql()})
        ), sym AS (
            SELECT vec_a AS a, vec_b AS b FROM pairs
            UNION SELECT vec_b, vec_a FROM pairs
        ), reach(a, b) AS (
            SELECT a, b FROM sym
            UNION
            SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        ), labeled AS (
            SELECT e.vec_id,
                   CAST(least(e.vec_id,
                              coalesce((SELECT min(b) FROM reach
                                        WHERE a = e.vec_id), e.vec_id))
                        AS BIGINT) AS cluster_id
            FROM embeddings e
        )
        SELECT vec_id, cluster_id, (vec_id = cluster_id) AS kept
        FROM labeled
    """,
}

ORACLES["dataset_split_assignment"] = f"""
    SELECT doc_id, lang, source,
           CASE WHEN (doc_id * {_KNUTH}) % {_HASH_MOD} % 100
                     < {_SPLIT_BOUNDS[0]} THEN 'train'
                WHEN (doc_id * {_KNUTH}) % {_HASH_MOD} % 100
                     < {_SPLIT_BOUNDS[1]} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
"""

# the leakage-free split composes on the dedup_clusters closure
# (nested-CTE subquery, same pattern as dedup_keep_best's oracle)
def _leakage_free_split_oracle() -> str:
    from .dedup import ORACLES as _DEDUP_ORACLES
    return f"""
        WITH clusters AS ({_DEDUP_ORACLES["dedup_clusters"]})
        SELECT d.doc_id, c.cluster_id, d.lang, d.source,
               CASE WHEN (c.cluster_id * {_KNUTH}) % {_HASH_MOD} % 100
                         < {_SPLIT_BOUNDS[0]} THEN 'train'
                    WHEN (c.cluster_id * {_KNUTH}) % {_HASH_MOD} % 100
                         < {_SPLIT_BOUNDS[1]} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents d JOIN clusters c USING (doc_id)
    """


ORACLES["leakage_free_split"] = _leakage_free_split_oracle()

ORACLES["fixed_k_sample_per_lang"] = f"""
    WITH ranked AS (
        SELECT doc_id, lang, source,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id * {_KNUTH}) % {_HASH_MOD}, doc_id)
                   AS sample_rank
        FROM documents
    )
    SELECT doc_id, lang, source, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM ranked WHERE sample_rank <= {_FIXED_K}
"""

ORACLES["temperature_mixture_sample"] = f'''
    WITH counts AS (
        SELECT lang, count(*) AS n_l FROM documents GROUP BY 1
    ), tot AS (SELECT CAST(sum(n_l) AS DOUBLE) AS n FROM counts),
    w AS (
        SELECT lang, n_l, pow(n_l / t.n, {_MIX_ALPHA}) AS wl, t.n
        FROM counts, tot t
    ), wsum AS (SELECT sum(wl) AS wsum FROM w),
    rates AS (
        SELECT lang,
               round(least(1.0,
                     (wl / ws.wsum) * n * {_MIX_KEEP_FRAC} / n_l), 6)
                   AS keep_rate
        FROM w, wsum ws
    )
    SELECT d.doc_id, d.lang, d.source, r.keep_rate
    FROM documents d JOIN rates r USING (lang)
    WHERE (d.doc_id * {_KNUTH}) % {_HASH_MOD} % {_MIX_RES}
          < CAST(floor(r.keep_rate * {_MIX_RES}) AS BIGINT)
'''


ORACLES["winsorized_doclen_stats"] = """
    WITH cuts AS (
        SELECT lang,
               round(CAST(quantile_cont(n_chars, 0.05) AS DOUBLE), 4)
                   AS p05,
               round(CAST(quantile_cont(n_chars, 0.95) AS DOUBLE), 4)
                   AS p95
        FROM documents GROUP BY lang
    ), clipped AS (
        SELECT d.lang, d.n_chars, c.p05, c.p95,
               least(greatest(CAST(d.n_chars AS DOUBLE), c.p05), c.p95)
                   AS wlen
        FROM documents d JOIN cuts c USING (lang)
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN n_chars < p05 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_low,
           CAST(sum(CASE WHEN n_chars > p95 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_high,
           round(avg(n_chars), 6) AS mean_raw,
           round(avg(wlen), 6) AS mean_winsorized
    FROM clipped GROUP BY lang
"""

ORACLES["shard_packing_efficiency"] = f"""
    WITH packed AS ({ORACLES["token_shard_packing"]})
    SELECT lang, shard_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
           round(sum(n_tokens) / CAST({_SHARD_BUDGET} AS DOUBLE), 6)
               AS fill_frac,
           CAST(sum(n_tokens) AS BIGINT) > {_SHARD_BUDGET} AS overflow
    FROM packed GROUP BY lang, shard_id
"""


# ---------------------------------------------------------------------------
# Round-4 addition: budget water-filling across sources — the mixture
# PLANNER that sits upstream of `temperature_mixture_sample` (which
# rebalances by rate, not absolute budget).

_WF_BUDGET_NUM, _WF_BUDGET_DEN = 1, 2   # budget = 1/2 of corpus tokens
_WF_ROUNDS = 3


def mixture_waterfill_budget(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Token-budget allocation across sources by WATER-FILLING: a total
    budget of half the corpus's tokens is split equally per round among
    sources that still have capacity, capped at each source's available
    tokens, with freed budget redistributed — ``_WF_ROUNDS`` unrolled
    rounds of exact integer arithmetic (the equal-share-with-caps
    allocator every mixture designer runs before sampling: small
    sources contribute everything they have, big sources split the
    rest evenly).  Emits per source: available, allocated, capped flag,
    fill fraction.

    All-integer (shares via integer div), so the unrolled DuckDB oracle
    is exact with no rounding discipline — the `doc_graph_communities`
    all-integer unroll precedent.  At 100 TB the input is the
    per-source token aggregate (one corpus pass, map-side combined);
    the allocation itself runs on #sources rows — constant-size, the
    same footprint as `source_drift_psi`'s per-source stats."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.size(F.split("text", " ")).alias("nt"))
    avail = (toks.groupBy("source")
             .agg(F.sum("nt").alias("n_avail"))
             .localCheckpoint())
    budget = avail.agg(
        (F.sum("n_avail") * _WF_BUDGET_NUM)
        .cast("bigint").alias("tot"))
    state = (avail.crossJoin(F.broadcast(budget))
             .select("source", "n_avail",
                     F.lit(0).cast("bigint").alias("alloc"),
                     F.expr(f"tot div {_WF_BUDGET_DEN}").alias("rem")))
    for _ in range(_WF_ROUNDS):
        scal = state.agg(
            F.max("rem").alias("rem"),
            F.sum(F.when(F.col("alloc") < F.col("n_avail"), 1)
                  .otherwise(0)).alias("n_active"))
        give = F.when(
            (F.col("alloc") < F.col("n_avail")) & (F.col("n_active") > 0),
            F.least(F.col("n_avail") - F.col("alloc"),
                    F.expr("rem div n_active"))).otherwise(0)
        stepped = (state.drop("rem")
                   .crossJoin(F.broadcast(scal))
                   .withColumn("give", give))
        spent = stepped.agg(F.sum("give").alias("spent"),
                            F.max("rem").alias("rem0"))
        state = (stepped
                 .crossJoin(F.broadcast(spent))
                 .select("source", "n_avail",
                         (F.col("alloc") + F.col("give")).alias("alloc"),
                         (F.col("rem0") - F.col("spent")).alias("rem")))
    return (state
            .select("source", F.col("n_avail").alias("n_tokens_available"),
                    F.col("alloc").alias("n_tokens_allocated"),
                    (F.col("alloc") == F.col("n_avail")).alias("capped"),
                    F.round(F.col("alloc")
                            / F.col("n_avail").cast("double"), 6)
                    .alias("fill_frac"))
            .orderBy("source"))


def _waterfill_oracle_sql() -> str:
    body = """
        s0 AS (
            SELECT source, n_avail, CAST(0 AS BIGINT) AS alloc,
                   (SELECT (sum(n_avail) * {num}) // {den} FROM avail)
                       AS rem
            FROM avail
        )"""
    rnd = """
        , a{i} AS (
            SELECT max(rem) AS rem,
                   sum(CASE WHEN alloc < n_avail THEN 1 ELSE 0 END)
                       AS n_active
            FROM s{p}
        ), g{i} AS (
            SELECT s.source, s.n_avail, s.alloc, a.rem, a.n_active,
                   CASE WHEN s.alloc < s.n_avail AND a.n_active > 0
                        THEN least(s.n_avail - s.alloc,
                                   a.rem // a.n_active)
                        ELSE 0 END AS give
            FROM s{p} s CROSS JOIN a{i} a
        ), s{i} AS (
            SELECT source, n_avail, alloc + give AS alloc,
                   rem - (SELECT sum(give) FROM g{i}) AS rem
            FROM g{i}
        )"""
    chain = body.format(num=_WF_BUDGET_NUM, den=_WF_BUDGET_DEN)
    for i in range(1, _WF_ROUNDS + 1):
        chain += rnd.format(i=i, p=i - 1)
    return f"""
    WITH avail AS (
        SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS n_avail
        FROM documents GROUP BY source
    ), {chain}
    SELECT source, n_avail AS n_tokens_available,
           CAST(alloc AS BIGINT) AS n_tokens_allocated,
           alloc = n_avail AS capped,
           round(alloc / CAST(n_avail AS DOUBLE), 6) AS fill_frac
    FROM s{_WF_ROUNDS} ORDER BY source
    """


QUERIES["mixture_waterfill_budget"] = mixture_waterfill_budget
ORACLES["mixture_waterfill_budget"] = _waterfill_oracle_sql()


# ---------------------------------------------------------------------------
# Round-4 addition: curriculum ordering (sequence-length warmup).

_CURR_STAGES = 3


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum ordering: documents staged easy→hard by
    token count (the sequence-length warmup schedule — short-sequence
    early training is the standard stabilizer), with a deterministic
    md5 shuffle WITHIN each stage (ordered-by-difficulty inside a stage
    would correlate adjacent batches).  Emits doc_id, n_tokens, stage
    (1..3 via exact integer tercile cutpoints), and the global
    curriculum position — the data-loader read order.

    Ties at the cutpoints resolve by the ntile contract (both engines
    compute ntile over the same total order (n_tokens, doc_id), so the
    stage assignment is exact).  At 100 TB: one map-side token count,
    then BOTH global orderings run distributed (r9,
    ``operators.ranked``): the stage terciles via ``exact_ntile`` and
    the curriculum position via ``global_rank`` — two parallel range
    exchanges, no single-task window over doc grain."""
    from qrapids_forecast_r_script_spark.operators.ranked import (
        exact_ntile, global_rank)
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.concat(F.lit("curr"), F.col("doc_id").cast("string")))
        .alias("shuf"))
    staged = exact_ntile(sized, _CURR_STAGES,
                         [F.col("n_tokens"), F.col("doc_id")], "stage")
    positioned = global_rank(
        staged, [F.col("stage"), F.col("shuf"), F.col("doc_id")],
        rank_col="position")
    return (positioned
            .select("doc_id", "n_tokens", "stage",
                    F.col("position").cast("int").alias("position"))
            .orderBy("position"))


ORACLES["curriculum_order"] = f"""
    WITH sized AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
               md5('curr' || CAST(doc_id AS VARCHAR)) AS shuf
        FROM documents
    ), staged AS (
        SELECT *, ntile({_CURR_STAGES})
                   OVER (ORDER BY n_tokens, doc_id) AS stage
        FROM sized
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(stage AS INT) AS stage,
           CAST(row_number() OVER (ORDER BY stage, shuf, doc_id)
                AS BIGINT) AS position
    FROM staged ORDER BY position
"""

QUERIES["curriculum_order"] = curriculum_order


# ---------------------------------------------------------------------------
# Round-4 continuation: DoReMi-style domain reweighting — one
# multiplicative-weights update of the mixture from per-domain excess
# loss, the step that turns a loss profile into new sampling weights.

_DRM_ETA = 0.1       # multiplicative-weights step size
_DRM_U = 1_000_000   # 1e-6 fixed-point grid


def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-lite domain reweighting (Xie et al. 2023, reduced to its
    closed-form core): per source, the EXCESS LOSS — mean per-token
    neg-logprob under the corpus unigram LM minus the corpus mean (the
    proxy/reference gap DoReMi's group-DRO inner loop estimates) —
    drives one exponentiated-gradient update of the mixture:

        w_s  ∝  base_share_s · exp(eta · excess_s),   renormalized,

    so harder-than-average domains gain sampling mass and easy ones
    shrink — the data-mixture optimization step upstream of
    ``temperature_mixture_sample`` (which rebalances by SIZE; this
    rebalances by LOSS).

    Exactness discipline: per-doc LM scores (6dp-rounded upstream,
    the ``doc_unigram_logprob`` contract) snap to the 1e-6 BIGINT
    micro-grid, so per-source sums are exact integers and every mean /
    share / excess is a fixed-shape division of exact values; the
    exp() output is itself snapped to the micro-grid before the
    integer-sum renormalization (the ``temperature_mixture_sample``
    pow-drift discipline).

    Scale shape: rides the unigram-LM scoring chain (one explode + one
    vocab join, the Zipf-skew note there), then everything is
    per-source aggregates over #sources rows — broadcast-tiny."""
    from .text import doc_unigram_logprob
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source")
    scored = (doc_unigram_logprob(spark, sf_dir)
              .join(docs, "doc_id")
              .select("source", "n_tokens",
                      F.round(F.round("avg_neg_logprob", 6) * _DRM_U, 0)
                      .cast("long").alias("su")))
    # r9 (guide §2.4): cut at the #sources-row aggregate — the totals
    # agg and the crossJoin below each replanned the whole unigram-LM
    # chain (explode + vocab join), and the weighted/norm pair doubled
    # it again: 32 planned scans for a #sources-row output
    per_src = (scored.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_tokens").alias("n_tokens"),
                    F.sum("su").alias("sum_su"))
               .localCheckpoint())
    tot = per_src.agg(F.sum("n_tokens").alias("tok_total"),
                      F.sum("sum_su").alias("su_total"),
                      F.sum("n_docs").alias("docs_total"))
    j = per_src.crossJoin(F.broadcast(tot))
    base_share = (F.col("n_tokens").cast("double")
                  / F.col("tok_total").cast("double"))
    mean_loss = (F.col("sum_su").cast("double")
                 / F.col("n_docs").cast("double") / _DRM_U)
    corpus_loss = (F.col("su_total").cast("double")
                   / F.col("docs_total").cast("double") / _DRM_U)
    excess = mean_loss - corpus_loss
    wu = F.round(base_share * F.exp(F.lit(_DRM_ETA) * excess) * _DRM_U,
                 0).cast("long")
    weighted = j.select("source", "n_docs", "n_tokens",
                        F.round(base_share, 6).alias("base_share"),
                        F.round(mean_loss, 6).alias("mean_loss"),
                        F.round(excess, 6).alias("excess_loss"),
                        wu.alias("wu"))
    norm = weighted.agg(F.sum("wu").alias("wu_total"))
    return (weighted.crossJoin(F.broadcast(norm))
            .select("source", "n_docs", "n_tokens", "base_share",
                    "mean_loss", "excess_loss",
                    F.round(F.col("wu").cast("double")
                            / F.col("wu_total").cast("double"), 6)
                    .alias("new_weight"))
            .orderBy("source"))


ORACLES["doremi_domain_weights"] = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), vocab AS (
        SELECT token, count(*) AS tf FROM toks GROUP BY 1
    ), tot AS (
        SELECT count(*) AS n FROM toks
    ), lm AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(-ln(tf / CAST(n AS DOUBLE))), 6)
                   AS avg_neg_logprob
        FROM toks JOIN vocab USING (token) CROSS JOIN tot
        GROUP BY doc_id
    ), scored AS (
        SELECT d.source, lm.n_tokens,
               CAST(round(round(lm.avg_neg_logprob, 6) * {_DRM_U}, 0)
                    AS BIGINT) AS su
        FROM lm JOIN documents d USING (doc_id)
    ), per_src AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               sum(su) AS sum_su
        FROM scored GROUP BY 1
    ), totals AS (
        SELECT sum(n_tokens) AS tok_total, sum(sum_su) AS su_total,
               sum(n_docs) AS docs_total
        FROM per_src
    ), weighted AS (
        SELECT source, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / CAST(tok_total AS DOUBLE)
                   AS base_share,
               CAST(sum_su AS DOUBLE) / CAST(n_docs AS DOUBLE)
                   / {_DRM_U} AS mean_loss,
               CAST(sum_su AS DOUBLE) / CAST(n_docs AS DOUBLE)
                   / {_DRM_U}
                 - CAST(su_total AS DOUBLE) / CAST(docs_total AS DOUBLE)
                   / {_DRM_U} AS excess_loss,
               CAST(round(CAST(n_tokens AS DOUBLE)
                          / CAST(tok_total AS DOUBLE)
                          * exp(CAST({_DRM_ETA} AS DOUBLE)
                                * (CAST(sum_su AS DOUBLE)
                                   / CAST(n_docs AS DOUBLE) / {_DRM_U}
                                   - CAST(su_total AS DOUBLE)
                                     / CAST(docs_total AS DOUBLE)
                                     / {_DRM_U}))
                          * {_DRM_U}, 0) AS BIGINT) AS wu
        FROM per_src CROSS JOIN totals
    ), norm AS (SELECT sum(wu) AS wu_total FROM weighted)
    SELECT source, n_docs, n_tokens,
           round(base_share, 6) AS base_share,
           round(mean_loss, 6) AS mean_loss,
           round(excess_loss, 6) AS excess_loss,
           round(CAST(wu AS DOUBLE) / CAST(wu_total AS DOUBLE), 6)
               AS new_weight
    FROM weighted CROSS JOIN norm ORDER BY source
"""
QUERIES["doremi_domain_weights"] = doremi_domain_weights


_QN_BINS = 20     # quantile-normalization resolution (ventiles)


def quantile_normalization_map(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Quantile normalization of per-source document-length
    distributions onto the pooled corpus reference (Bolstad et al.
    2003 — the microarray normalizer, reused in data prep whenever
    per-source length/score distributions must be made comparable
    before mixing): each source's k-th length ventile is mapped to
    the POOLED k-th ventile's mean length; the emitted (source,
    bucket) → target table is the monotone transform a loader
    applies to, e.g., equalize truncation behavior across crawls.

    Output per (source, ventile): doc count, observed mean length,
    the pooled target mean, and the additive shift the transform
    applies.  Exactness: both binnings are ntile over (n_chars,
    doc_id) — total orders, so bucket membership is integer-exact —
    and every mean is one division of BIGINT sums.

    Scale: the per-source ventiles stay a partitioned (parallel)
    window; the pooled ventiles run through the distributed exact
    ntile (``operators.ranked.exact_ntile``, r9 — replacing the
    doc-grain single-task global window) and one (source × 20)-row
    join; the map itself is broadcast-sized."""
    from pyspark.sql.window import Window

    from qrapids_forecast_r_script_spark.operators.ranked import exact_ntile
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "source", "n_chars")
    wsrc = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    binned = exact_ntile(
        docs.withColumn("bucket", F.ntile(_QN_BINS).over(wsrc)),
        _QN_BINS, [F.col("n_chars"), F.col("doc_id")], "gbucket")
    ref = (binned.groupBy("gbucket")
           .agg(F.sum("n_chars").alias("gs"),
                F.count(F.lit(1)).alias("gn"))
           .select(F.col("gbucket").alias("bucket"),
                   (F.col("gs").cast("double") / F.col("gn"))
                   .alias("target_mean")))
    per = (binned.groupBy("source", "bucket")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("s")))
    obs = F.col("s").cast("double") / F.col("n_docs")
    return (per.join(F.broadcast(ref), "bucket")
            .select("source", "bucket", "n_docs",
                    F.round(obs, 4).alias("observed_mean"),
                    F.round("target_mean", 4).alias("target_mean"),
                    F.round(F.col("target_mean") - obs, 4).alias("shift"))
            .orderBy("source", "bucket"))


QUERIES["quantile_normalization_map"] = quantile_normalization_map
ORACLES["quantile_normalization_map"] = f"""
    WITH binned AS (
        SELECT source, n_chars,
               ntile({_QN_BINS}) OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS bucket,
               ntile({_QN_BINS}) OVER (ORDER BY n_chars, doc_id)
                   AS gbucket
        FROM documents
    ), ref AS (
        SELECT gbucket AS bucket,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS target_mean
        FROM binned GROUP BY gbucket
    ), per AS (
        SELECT source, bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS s
        FROM binned GROUP BY source, bucket
    )
    SELECT p.source, p.bucket, p.n_docs,
           round(CAST(p.s AS DOUBLE) / p.n_docs, 4) AS observed_mean,
           round(r.target_mean, 4) AS target_mean,
           round(r.target_mean - CAST(p.s AS DOUBLE) / p.n_docs, 4)
               AS shift
    FROM per p JOIN ref r ON p.bucket = r.bucket
    ORDER BY p.source, p.bucket
"""


_NA_BUDGET = 1000     # labeling budget to allocate across sources


def neyman_allocation_sample(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a fixed labeling budget across
    document SOURCES (Neyman 1934: for stratified estimation of a
    mean, sampling n_h ∝ N_h·σ_h minimizes variance at fixed total
    n) — the answer to "we can afford 1000 human quality labels;
    how many from each crawl?"  Strata with more docs AND more
    internal spread get more labels; a uniform source wastes
    budget.  Output per source: stratum size, the length sd, the
    Neyman share, the allocated n, and the proportional-allocation
    n the naive splitter would use.

    Exactness: σ_h comes from exact BIGINT (Σx, Σx²) over n_chars —
    sd = √(N·Σx² − (Σx)²)/N, one sqrt per stratum; the N_h·σ_h
    weights snap to the 1e-6 grid and BIGINT-sum into the
    normalizer, so shares and allocations are single divisions of
    integers.  Scale: one (source) aggregate — dimension-sized
    output, the allocation table broadcasts into the sampling job
    (`stratified_sample_docs` consumes exactly this shape of rate
    table)."""
    docs = load_table(spark, sf_dir, "documents")
    per = (docs.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sx"),
                F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx")))
    sd = (F.sqrt((F.col("n_docs") * F.col("sxx")
                  - F.col("sx") * F.col("sx")).cast("double"))
          / F.col("n_docs"))
    per = per.withColumn(
        "w6", F.round(F.col("n_docs") * sd * 1e6, 0).cast("bigint"))
    tot = per.agg(F.sum("w6").alias("wtot"), F.sum("n_docs").alias("n"))
    share = F.col("w6").cast("double") / F.col("wtot")
    return (per.crossJoin(F.broadcast(tot))
            .select("source", "n_docs",
                    F.round(F.col("w6") / F.col("n_docs") / 1e6, 4)
                    .alias("length_sd"),
                    F.round(share, 6).alias("neyman_share"),
                    F.round(share * _NA_BUDGET, 0).cast("bigint")
                    .alias("neyman_n"),
                    F.round(F.col("n_docs").cast("double") / F.col("n")
                            * _NA_BUDGET, 0).cast("bigint")
                    .alias("proportional_n"))
            .orderBy("source"))


QUERIES["neyman_allocation_sample"] = neyman_allocation_sample
ORACLES["neyman_allocation_sample"] = f"""
    WITH per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sx,
               CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY source
    ), w AS (
        SELECT *,
               CAST(round(n_docs
                    * (sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE))
                       / n_docs) * 1e6, 0) AS BIGINT) AS w6
        FROM per
    ), tot AS (
        SELECT CAST(sum(w6) AS BIGINT) AS wtot,
               CAST(sum(n_docs) AS BIGINT) AS n
        FROM w
    )
    SELECT w.source, w.n_docs,
           round(CAST(w.w6 AS DOUBLE) / w.n_docs / 1e6, 4) AS length_sd,
           round(CAST(w.w6 AS DOUBLE) / t.wtot, 6) AS neyman_share,
           CAST(round(CAST(w.w6 AS DOUBLE) / t.wtot * {_NA_BUDGET}, 0)
                AS BIGINT) AS neyman_n,
           CAST(round(CAST(w.n_docs AS DOUBLE) / t.n * {_NA_BUDGET}, 0)
                AS BIGINT) AS proportional_n
    FROM w CROSS JOIN tot t
    ORDER BY w.source
"""


_IPF_SAMPLE_PCT = 30    # deterministic Knuth-hash sample kept for raking
_IPF_SWEEPS = 2         # full (row, col) sweep pairs, unrolled


def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative-proportional-fitting (raking) calibration weights
    (Deming & Stephan 1940; the survey-statistics standard) for the
    deterministic 30% document sample against the FULL corpus's
    (lang, source) margins — the weighting step that makes
    sample-based corpus statistics unbiased when the sampling is
    uneven across cells: each (lang, source) cell gets a weight so
    the weighted sample reproduces both the language margin and the
    source margin of the population.  Two full row/col sweep pairs,
    UNROLLED (IPF converges geometrically; the residual row-margin
    error after the final column sweep is part of the output — the
    honest stopping report).

    Determinism: the sample is the Knuth-hash rule (pure function of
    doc_id); cell/margin counts are exact integers; every margin
    reduction BIGINT-sums 1e-6-snapped weight*count terms, so each
    scaling factor is a ratio of order-proof scalars and the weight
    chain (4 factors) is bit-stable.

    Scale: two scans (population margins, sample cells) reduce to a
    (langs x sources)-sized grid; every sweep is a grid-sized
    broadcast join — the calibration is dimension-sized."""
    docs = load_table(spark, sf_dir, "documents")
    samp = docs.where(_hash_pct(F.col("doc_id")) < _IPF_SAMPLE_PCT)
    cells = (samp.groupBy("lang", "source")
             .agg(F.count(F.lit(1)).alias("n")))
    mlang = (docs.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("t_lang")))
    msrc = (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("t_src")))
    # r9 (guide §2.4): cut the (langs × sources) grid at each sweep
    # boundary — every sweep step references cur twice (margin agg +
    # join back), so the uncut plan grew ~3^(2·sweeps): 192 planned
    # parquet scans / 5.7k plan lines for a grid-sized frame (the
    # bradley_terry / pagerank iteration-boundary idiom)
    cur = (cells.join(F.broadcast(mlang), "lang")
           .join(F.broadcast(msrc), "source")
           .withColumn("w", F.lit(1.0))
           .localCheckpoint())
    for _ in range(_IPF_SWEEPS):
        rm = (cur.withColumn("wn", F.round(F.col("w") * F.col("n")
                                           * 1e6, 0).cast("bigint"))
              .groupBy("lang").agg(F.sum("wn").alias("rsum")))
        cur = (cur.join(F.broadcast(rm), "lang")
               .withColumn("w", F.col("w") * F.col("t_lang")
                           / (F.col("rsum") / 1e6))
               .drop("rsum"))
        cm = (cur.withColumn("wn", F.round(F.col("w") * F.col("n")
                                           * 1e6, 0).cast("bigint"))
              .groupBy("source").agg(F.sum("wn").alias("csum")))
        cur = (cur.join(F.broadcast(cm), "source")
               .withColumn("w", F.col("w") * F.col("t_src")
                           / (F.col("csum") / 1e6))
               .drop("csum")
               .localCheckpoint())
    fin = (cur.withColumn("wn", F.round(F.col("w") * F.col("n") * 1e6,
                                        0).cast("bigint")))
    rm2 = fin.groupBy("lang").agg(F.sum("wn").alias("rsum2"))
    return (fin.join(F.broadcast(rm2), "lang")
            .select("lang", "source", "n",
                    F.round("w", 6).alias("weight"),
                    F.round(F.col("rsum2") / 1e6 - F.col("t_lang"), 6)
                    .alias("lang_margin_err"))
            .orderBy("lang", "source"))


QUERIES["ipf_raking_weights"] = ipf_raking_weights
ORACLES["ipf_raking_weights"] = f"""
    WITH samp AS (
        SELECT * FROM documents
        WHERE ((doc_id * {_KNUTH}) % {_HASH_MOD}) % 100
              < {_IPF_SAMPLE_PCT}
    ), cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM samp GROUP BY 1, 2
    ), ml AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS t_lang
        FROM documents GROUP BY 1
    ), ms AS (
        SELECT source, CAST(count(*) AS BIGINT) AS t_src
        FROM documents GROUP BY 1
    ), w0 AS (
        SELECT c.lang, c.source, c.n, l.t_lang, s.t_src,
               CAST(1.0 AS DOUBLE) AS w
        FROM cells c JOIN ml l USING (lang) JOIN ms s USING (source)
    ), r1 AS (
        SELECT lang, CAST(sum(CAST(round(w * n * 1e6, 0) AS BIGINT))
                          AS BIGINT) AS rsum
        FROM w0 GROUP BY lang
    ), w1 AS (
        SELECT w0.*EXCLUDE w, w0.w * w0.t_lang / (r1.rsum / 1e6) AS w
        FROM w0 JOIN r1 USING (lang)
    ), c1 AS (
        SELECT source, CAST(sum(CAST(round(w * n * 1e6, 0) AS BIGINT))
                            AS BIGINT) AS csum
        FROM w1 GROUP BY source
    ), w2 AS (
        SELECT w1.*EXCLUDE w, w1.w * w1.t_src / (c1.csum / 1e6) AS w
        FROM w1 JOIN c1 USING (source)
    ), r2 AS (
        SELECT lang, CAST(sum(CAST(round(w * n * 1e6, 0) AS BIGINT))
                          AS BIGINT) AS rsum
        FROM w2 GROUP BY lang
    ), w3 AS (
        SELECT w2.*EXCLUDE w, w2.w * w2.t_lang / (r2.rsum / 1e6) AS w
        FROM w2 JOIN r2 USING (lang)
    ), c2 AS (
        SELECT source, CAST(sum(CAST(round(w * n * 1e6, 0) AS BIGINT))
                            AS BIGINT) AS csum
        FROM w3 GROUP BY source
    ), w4 AS (
        SELECT w3.*EXCLUDE w, w3.w * w3.t_src / (c2.csum / 1e6) AS w
        FROM w3 JOIN c2 USING (source)
    ), rfin AS (
        SELECT lang, CAST(sum(CAST(round(w * n * 1e6, 0) AS BIGINT))
                          AS BIGINT) AS rsum2
        FROM w4 GROUP BY lang
    )
    SELECT w4.lang, w4.source, w4.n, round(w4.w, 6) AS weight,
           round(rfin.rsum2 / 1e6 - w4.t_lang, 6) AS lang_margin_err
    FROM w4 JOIN rfin USING (lang)
    ORDER BY w4.lang, w4.source
"""


_COV_K = 3      # greedy rounds, unrolled


def greedy_coverage_selection(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage document selection over distinct
    bigram shingles (Nemhauser-Wolsey-Fisher 1978: the greedy rule
    is (1-1/e)-optimal for submodular coverage) — the facility-
    location data-selection primitive: pick the K documents that
    together cover the most distinct corpus shingles, each round
    choosing the doc with the largest MARGINAL gain over what is
    already covered (ties: lowest doc_id).  The exact miniature of
    coreset selection for training data (coverage over features
    instead of gradients) — and the diversity-first complement to
    `mmr_diversified_topk`, which trades off against a query.

    Three rounds UNROLLED: round r is one anti-join of the shingle
    stream against the covered set, one per-doc count, one global
    argmax — all exact integer counts, so the trace is fully
    deterministic and the oracle replays the identical recursion-free
    SQL.

    Scale: each round is one map-side anti-join (covered set is the
    union of <= r docs' shingles — broadcast-sized) + one count
    aggregate; K is the knob, the scan count is K, and nothing is
    ever pairwise."""
    from .dedup import shingle_table
    docs = load_table(spark, sf_dir, "documents")
    # r9 (guide §2.4): sh is referenced twice per greedy round (the
    # marginal-gain pool + the new-coverage extraction) — uncut, the
    # corpus tokenize chain re-ran ~2K times; likewise ``covered``
    # feeds both the next pool's anti-join and the next union.  One
    # cut for sh + one per-round cut for the (broadcast-sized)
    # covered set keep the round chain linear.
    sh = shingle_table(docs, distinct=True).localCheckpoint()
    picks = []
    covered = None
    for r in range(1, _COV_K + 1):
        pool = sh if covered is None else sh.join(
            # no hint (r10): the covered set is ≤ r docs' shingles but a
            # doc's shingle count is unbounded at corpus scale; AQE
            # re-plans the anti-join to broadcast at runtime when the
            # side fits (VERDICT r9 item 2)
            covered, "shingle", "left_anti")
        if picks:
            excl = picks[0][1]
            for _, d in picks[1:]:
                excl = excl.union(d)
            pool = pool.join(excl, "doc_id", "left_anti")
        gain = (pool.groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("gain")))
        pick = (gain.orderBy(F.col("gain").desc(),
                             F.col("doc_id").asc())
                .limit(1)
                .select("doc_id", "gain",
                        F.lit(r).cast("int").alias("rank")))
        pick = pick.localCheckpoint(eager=True)
        picks.append((pick, pick.select("doc_id")))
        newcov = sh.join(F.broadcast(pick.select("doc_id")), "doc_id") \
            .select("shingle").distinct()
        covered = (newcov if covered is None else
                   covered.union(newcov).distinct()).localCheckpoint()
    out = picks[0][0]
    for p, _ in picks[1:]:
        out = out.union(p)
    w = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, 0)
    return (out.withColumn("cum_coverage",
                           F.sum("gain").over(w).cast("bigint"))
            .select("rank", "doc_id", "gain", "cum_coverage")
            .orderBy("rank"))


QUERIES["greedy_coverage_selection"] = greedy_coverage_selection
ORACLES["greedy_coverage_selection"] = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] AS shingle
        FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
    ), p1 AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS gain, 1 AS rank
        FROM sh GROUP BY doc_id
        ORDER BY gain DESC, doc_id ASC LIMIT 1
    ), cov1 AS (
        SELECT DISTINCT shingle FROM sh
        WHERE doc_id = (SELECT doc_id FROM p1)
    ), p2 AS (
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS gain, 2 AS rank
        FROM sh s ANTI JOIN cov1 c ON s.shingle = c.shingle
        WHERE s.doc_id != (SELECT doc_id FROM p1)
        GROUP BY s.doc_id
        ORDER BY gain DESC, s.doc_id ASC LIMIT 1
    ), cov2 AS (
        SELECT shingle FROM cov1
        UNION
        SELECT DISTINCT shingle FROM sh
        WHERE doc_id = (SELECT doc_id FROM p2)
    ), p3 AS (
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS gain, 3 AS rank
        FROM sh s ANTI JOIN cov2 c ON s.shingle = c.shingle
        WHERE s.doc_id NOT IN (SELECT doc_id FROM p1
                               UNION SELECT doc_id FROM p2)
        GROUP BY s.doc_id
        ORDER BY gain DESC, s.doc_id ASC LIMIT 1
    ), allp AS (
        SELECT * FROM p1 UNION ALL SELECT * FROM p2
        UNION ALL SELECT * FROM p3
    )
    SELECT CAST(rank AS INT) AS rank, doc_id, gain,
           CAST(sum(gain) OVER (ORDER BY rank
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_coverage
    FROM allp ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Round-9: Heaps'-law vocabulary growth (the Chao1 estimate's dynamic
# sibling — same question, "is more data still buying vocabulary?").


def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(N) ≈ K·N^β of vocabulary growth: walk the
    corpus in doc_id order, track the running token count N and the
    running distinct-type count V (a type counts at its FIRST
    occurrence), and fit ln V = ln K + β·ln N by OLS over the per-doc
    checkpoints.  β ≈ 0.4-0.6 is natural text; β collapsing toward 0
    says vocabulary has saturated (more crawl buys repetition — the
    dynamic confirmation of a small `vocab_chao1_richness` gap), and β
    near 1 says near-disjoint shards (OCR noise / ID-like tokens).

    r9 construction: the running totals are TWO
    `operators.ranked.global_cumsum` passes over doc grain (first-
    occurrence counts come from one token aggregate — min doc_id per
    type — so no per-token window exists anywhere); the OLS rides the
    zipf-fit discipline — both lns snapped to 1e-6 BIGINT micro-units,
    every OLS sum accumulated in DECIMAL(38,0)/HUGEINT exact integer
    arithmetic, one double division at the end.

    Scale: one token aggregate (vocabulary-bounded), one doc-grain
    aggregate, two distributed prefix sums, a 5-sum reduce."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    first = (docs.select("doc_id",
                         F.explode(F.split("text", " ")).alias("tok"))
             .groupBy("tok").agg(F.min("doc_id").alias("fdoc"))
             .groupBy("fdoc").agg(F.count(F.lit(1)).alias("n_new")))
    per_doc = (sized.join(first,
                          sized.doc_id == first.fdoc, "left")
               .select("doc_id", "n_tokens",
                       F.coalesce("n_new", F.lit(0).cast("long"))
                       .alias("n_new")))
    from qrapids_forecast_r_script_spark.operators.ranked import (
        global_cumsum)
    cum = global_cumsum(per_doc, [F.col("doc_id")],
                        "n_tokens", "cum_tokens")
    cum = global_cumsum(cum, [F.col("doc_id")], "n_new", "cum_types")
    pts = (cum.where((F.col("cum_tokens") > 0)
                     & (F.col("cum_types") > 0))
           .select(F.round(F.log(F.col("cum_tokens").cast("double"))
                           * 1e6, 0).cast("long").alias("xu"),
                   F.round(F.log(F.col("cum_types").cast("double"))
                           * 1e6, 0).cast("long").alias("yu")))
    dec = "decimal(38,0)"
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("xu").cast(dec)).alias("sx"),
        F.sum(F.col("yu").cast(dec)).alias("sy"),
        F.sum((F.col("xu") * F.col("xu")).cast(dec)).alias("sxx"),
        F.sum((F.col("xu") * F.col("yu")).cast(dec)).alias("sxy"),
        F.sum((F.col("yu") * F.col("yu")).cast(dec)).alias("syy"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    beta = num.cast("double") / denx.cast("double")
    icept_u = ((F.col("sy").cast("double")
                - beta * F.col("sx").cast("double"))
               / F.col("n").cast("double"))
    r2 = (num.cast("double") * num.cast("double")
          / (denx.cast("double") * deny.cast("double")))
    return s.select(
        F.col("n").alias("n_docs"),
        F.round(beta, 6).alias("heaps_beta"),
        F.round(F.exp(icept_u / 1e6), 4).alias("heaps_k"),
        F.round(r2, 6).alias("r_squared"))


QUERIES["corpus_heaps_law"] = corpus_heaps_law
ORACLES["corpus_heaps_law"] = """
    WITH sized AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), first AS (
        SELECT fdoc, CAST(count(*) AS BIGINT) AS n_new
        FROM (SELECT min(doc_id) AS fdoc
              FROM (SELECT doc_id,
                           unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY tok)
        GROUP BY fdoc
    ), per_doc AS (
        SELECT s.doc_id, s.n_tokens, coalesce(f.n_new, 0) AS n_new
        FROM sized s LEFT JOIN first f ON s.doc_id = f.fdoc
    ), cum AS (
        SELECT doc_id,
               sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tokens,
               sum(n_new) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_types
        FROM per_doc
    ), pts AS (
        SELECT CAST(round(ln(CAST(cum_tokens AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS xu,
               CAST(round(ln(CAST(cum_types AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS yu
        FROM cum WHERE cum_tokens > 0 AND cum_types > 0
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(CAST(xu AS HUGEINT)) AS sx,
               sum(CAST(yu AS HUGEINT)) AS sy,
               sum(CAST(xu AS HUGEINT) * xu) AS sxx,
               sum(CAST(xu AS HUGEINT) * yu) AS sxy,
               sum(CAST(yu AS HUGEINT) * yu) AS syy
        FROM pts
    )
    SELECT n AS n_docs,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS heaps_beta,
           round(exp((CAST(sy AS DOUBLE)
                      - CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(sx AS DOUBLE)) / n / 1e6), 4)
               AS heaps_k,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6)
               AS r_squared
    FROM s
"""
