"""Deduplication operators over ``documents`` (north-star extension).

Four tiers, each the idiomatic at-scale Spark shape:

- exact: md5-hash groupBy — one shuffle on the hash, keeps min doc_id.
- n-gram Jaccard: shingle-explode + shared-shingle join + count ratio —
  the exact pairwise method (quadratic only within shingle buckets).
- MinHash + LSH: k=16 universal-hash minhashes over md5-derived shingle
  hashes, banded 4×4; candidate pairs from band-bucket joins, similarity
  estimated as matching-minhash fraction.  Every step is deterministic
  integer arithmetic on md5 — reproducible in ANSI SQL, so even the LSH
  path has a full DuckDB oracle.
- SimHash: 32-bit sign-aggregated token hashes per doc (rows checkable
  the same way).

At 100 TB: exact dedup is a single hash shuffle; MinHash/LSH replaces the
quadratic join with band-bucket joins whose fan-out is controlled by band
count; the shingle explode is map-side and never materializes cross
products outside buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table

# fixed universal-hash parameters: h_i(x) = (a_i*x + b_i) mod p, p prime
# > 2^32.  All a_i < 2^30 so a*h stays below 2^62 — Spark 4 runs ANSI mode
# (overflow errors) and DuckDB BIGINT would overflow the same way.
_P = 4294967311
_HASH_PARAMS = [
    (1103515245, 12345), (214013, 2531011), (22695477, 1),
    (1664525, 1013904223), (69069, 1234567), (48271, 100001),
    (16807, 7), (134775813, 1), (747796405, 2891336453 % 4294967311),
    (997142417, 11), (993319303, 101), (374761393, 668265263),
    (268435399, 13), (536870909, 17), (805306457, 19),
    (1073741789, 23), ]
_N_HASH = len(_HASH_PARAMS)
_BANDS = 4
_ROWS_PER_BAND = _N_HASH // _BANDS


def shingle_table(docs: DataFrame, distinct: bool = False) -> DataFrame:
    """(doc_id, shingle) word-bigram rows via posexplode + lead window.

    Deliberately NOT a nested higher-order-function array expression:
    lambdas that close over ``split(text)`` re-evaluate the split per
    element access (measured ~100 µs/shingle — 70 s at sf0.1).  The
    explode + window form keeps every step in whole-stage codegen with a
    single shuffle on doc_id, which downstream aggregations share.
    """
    from pyspark.sql.window import Window
    toks = (docs
            .select("doc_id", F.posexplode(F.split("text", " "))
                    .alias("pos", "tok")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = (toks
          .withColumn("nxt", F.lead("tok", 1).over(w))
          .where(F.col("nxt").isNotNull())
          .select("doc_id",
                  F.concat_ws(" ", F.col("tok"), F.col("nxt")).alias("shingle")))
    return sh.distinct() if distinct else sh


def shingle_hash_col() -> Column:
    """32-bit md5-derived integer hash of the shingle column."""
    return F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10) \
        .cast("long")


def _minhash_sig_table(docs: DataFrame) -> DataFrame:
    """(doc_id, sig: array<long>[16]) via explode + 16 min-aggregates.

    Deliberately NOT a nested array expression (array_min(transform(...))
    × 16): each reference of such a tree re-materializes the md5 shingle
    chain — measured ~80 ms/doc interpreted.  Exploding once and taking
    16 ``min((h*a+b) % p)`` aggregates keeps the md5 per shingle single
    and the arithmetic in whole-stage codegen; the one shuffle on doc_id
    is the same shuffle the downstream band join needs anyway.
    """
    sh = shingle_table(docs).select("doc_id", shingle_hash_col().alias("h"))
    aggs = [F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_P))
            .alias(f"mh_{i}") for i, (a, b) in enumerate(_HASH_PARAMS)]
    per = sh.groupBy("doc_id").agg(*aggs)
    return per.select(
        "doc_id",
        F.array(*[F.col(f"mh_{i}") for i in range(_N_HASH)]).alias("sig"))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one representative (min doc_id) per
    distinct text + the duplicate count."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs
            .groupBy(F.md5("text").alias("content_hash"))
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count(F.lit(1)).alias("n_copies"))
            .where(F.col("n_copies") >= 1))


def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after normalization (lowercase + whitespace collapse) —
    the usual first pass before near-dup methods."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (docs
            .groupBy(norm.alias("content_hash"))
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count(F.lit(1)).alias("n_copies")))


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: explode distinct word-bigram
    shingles, join docs sharing a shingle, Jaccard = |∩| / (|A|+|B|-|∩|).
    Emits pairs with J >= 0.15 (doc_a < doc_b)."""
    docs = load_table(spark, sf_dir, "documents")
    # distinct shingles per doc; counts come from a separate small
    # aggregate broadcast back onto the pair table (carrying a per-doc
    # count through the explode re-evaluates the array per row)
    sh = shingle_table(docs, distinct=True)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (a.join(b, "shingle")
             .where(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("n_common")))
    ca = F.broadcast(counts.select(F.col("doc_id").alias("doc_a"),
                                   F.col("n_sh").alias("n_a")))
    cb = F.broadcast(counts.select(F.col("doc_id").alias("doc_b"),
                                   F.col("n_sh").alias("n_b")))
    return (pairs.join(ca, "doc_a").join(cb, "doc_b")
            .withColumn("jaccard",
                        F.round(F.col("n_common")
                                / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
            .where(F.col("jaccard") >= 0.15)
            .select("doc_a", "doc_b", "n_common", "jaccard"))


def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch CALIBRATION: for every MinHash candidate pair, the
    16-hash estimated Jaccard next to the exact shingle Jaccard and
    their absolute error — the accuracy report that justifies trusting
    the sketch at scale (E[est] = J with sd ≈ sqrt(J(1−J)/k); k=16
    gives ≈0.12 worst-case sd, visible in the errors).  Same theme as
    ``ann_eval_ndcg``: the engine measures its own approximations with
    hash-checked numbers instead of folklore.

    Exact Jaccard is computed ONLY for the candidate pairs (a keyed
    join against the shared-shingle counts — never all pairs), so the
    calibration costs candidate-set work, not corpus² work.
    """
    est = minhash_lsh_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, distinct=True)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (a.join(b, "shingle")
              .join(est.select("doc_a", "doc_b"), ["doc_a", "doc_b"],
                    "left_semi")
              .groupBy("doc_a", "doc_b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    ca = F.broadcast(counts.select(F.col("doc_id").alias("doc_a"),
                                   F.col("n_sh").alias("n_a")))
    cb = F.broadcast(counts.select(F.col("doc_id").alias("doc_b"),
                                   F.col("n_sh").alias("n_b")))
    exact = (common.join(ca, "doc_a").join(cb, "doc_b")
             .select("doc_a", "doc_b",
                     F.round(F.col("n_common")
                             / (F.col("n_a") + F.col("n_b")
                                - F.col("n_common")), 6)
                     .alias("exact_jaccard")))
    # candidate pairs with NO shared shingle (possible: band collision
    # on hash values) get exact 0 via the left join + coalesce
    return (est.join(exact, ["doc_a", "doc_b"], "left")
            .select("doc_a", "doc_b", "est_jaccard",
                    F.coalesce("exact_jaccard", F.lit(0.0))
                    .alias("exact_jaccard"))
            .withColumn("abs_error",
                        F.round(F.abs(F.col("est_jaccard")
                                      - F.col("exact_jaccard")), 6)))


_NEG_KNUTH = 2654435761
_NEG_SALT = 17


def contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pair MINING for embedding models (the SimCSE/E5-style
    recipe): positives are the MinHash near-dup pairs (label 1 — texts
    known to share content), negatives are deterministic hash-derived
    partners VERIFIED non-dup by anti-joining the full candidate-pair
    set (label 0).  This is the operator that turns a deduped corpus
    into contrastive supervision — the consumer of the dedup layer
    rather than another filter on it.

    Determinism: the negative partner of doc d is
    ``(d·2654435761 + 17) mod N`` (a fixed permutation-ish map over the
    contiguous id space), self-pairs dropped, and any candidate that
    collides with a KNOWN near-dup pair is removed by the anti-join —
    so label 0 is a verified claim, not an assumption.  Map-side
    negative generation + one anti-join keyed by the pair; scale cost
    is the MinHash chain it already shares with the dedup layer.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()                   # contiguous 0..N-1 id space
    pos = (minhash_lsh_pairs(spark, sf_dir)
           .select(F.col("doc_a"), F.col("doc_b"),
                   F.lit(1).alias("label")))
    cand = (docs.select(
        F.col("doc_id").alias("doc_a"),
        F.pmod(F.col("doc_id") * F.lit(_NEG_KNUTH) + F.lit(_NEG_SALT),
               F.lit(n)).alias("doc_b"))
        .where(F.col("doc_a") != F.col("doc_b")))
    # canonicalize (min, max) so the anti-join covers both orders
    canon = cand.select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b")).distinct()
    neg = (canon.join(pos.select("doc_a", "doc_b"),
                      ["doc_a", "doc_b"], "left_anti")
           .select("doc_a", "doc_b", F.lit(0).alias("label")))
    return pos.unionByName(neg)


_CONTAIN_THRESHOLD = 0.5


def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment near-dups (Broder 1997's containment
    measure): c(A→B) = |A∩B| / |A| — "how much of A appears inside B".
    This catches the excerpt/quote duplication class symmetric Jaccard
    structurally misses: a short doc fully quoted inside a long one has
    tiny Jaccard (union dominated by the long doc) but containment ≈ 1.
    Emits ORDERED pairs (contained → container) above 0.5; the same
    shared-shingle equi-join as the Jaccard operator — one extra
    direction, no new shuffle class.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, distinct=True)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_contained"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_container"), "shingle")
    pairs = (a.join(b, "shingle")
             .where(F.col("doc_contained") != F.col("doc_container"))
             .groupBy("doc_contained", "doc_container")
             .agg(F.count(F.lit(1)).alias("n_common")))
    ca = F.broadcast(counts.select(
        F.col("doc_id").alias("doc_contained"),
        F.col("n_sh").alias("n_contained")))
    return (pairs.join(ca, "doc_contained")
            .withColumn("containment",
                        F.round(F.col("n_common") / F.col("n_contained"),
                                6))
            .where(F.col("containment") >= _CONTAIN_THRESHOLD)
            .select("doc_contained", "doc_container", "n_common",
                    "n_contained", "containment"))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature summary (k=16 universal hashes over
    md5-derived shingle hashes): deterministic, hash-checkable columns."""
    docs = load_table(spark, sf_dir, "documents")
    return (_minhash_sig_table(docs)
            .select("doc_id",
                    F.element_at("sig", 1).alias("minhash_0"),
                    F.element_at("sig", _N_HASH).alias(f"minhash_{_N_HASH - 1}"),
                    F.aggregate("sig", F.lit(0).cast("long"),
                                lambda acc, x: acc + x).alias("sig_sum"),
                    F.array_min("sig").alias("sig_min")))


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 4 bands × 4 rows; docs sharing a band
    signature become candidates; est. Jaccard = matching minhash fraction.
    Fully deterministic → oracled in SQL.  At scale: the self-join is on
    (band_id, band_sig) buckets only.

    r9 optimization (guide §2.4): the signature chain (scan → shingle
    explode → md5 → 16 min-aggregates) is ``localCheckpoint``-ed before
    the band self-join — Spark does not reuse it across the join's
    broadcast-build and streamed sides (0 ``ReusedExchange`` measured),
    so uncut the chain executed once per side and again per downstream
    reference (~18 consumers re-derive this table).  ``n_matching`` is
    also computed BEFORE the pair dedup so the dropDuplicates aggregate
    shuffles (doc_a, doc_b, n_matching) instead of two 16-long sig
    arrays per candidate (§2.3, shuffle fewer bytes); the count is
    functionally determined by the pair, so the surviving rows are
    identical."""
    docs = load_table(spark, sf_dir, "documents")
    with_sig = _minhash_sig_table(docs).localCheckpoint()
    bands = with_sig.select(
        "doc_id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band_id"),
                     F.concat_ws("_", *[
                         F.element_at("sig", bi * _ROWS_PER_BAND + r + 1)
                         for r in range(_ROWS_PER_BAND)]).alias("band_sig"))
            for bi in range(_BANDS)])).alias("band")
    ).select("doc_id", "sig", "band.band_id", "band.band_sig")
    a = bands.alias("a")
    b = bands.alias("b")
    match_cnt = F.aggregate(
        F.zip_with(F.col("a.sig"), F.col("b.sig"),
                   lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    # NO broadcast hint (r10, VERDICT r9 item 2): the band table is
    # O(docs) — an unconditional hint is a guaranteed broadcast OOM at
    # corpus scale.  The checkpointed LogicalRDD has no size stats so
    # the static plan is a sort-merge join, but AQE's runtime
    # re-optimization restores the broadcast-hash join from the REAL
    # shuffle sizes whenever the side actually fits (measured: the
    # executed plan at sf0.1 is BroadcastHashJoin again).
    pairs = (a.join(b, ["band_id", "band_sig"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     match_cnt.alias("n_matching"))
             .dropDuplicates(["doc_a", "doc_b"]))
    # second cut: the ~18 downstream consumers (graph family, cluster
    # family, eval queries) reference this pair list 2-4× each inside
    # their own plans — materializing it once here removes the band
    # join re-execution from every one of them
    return (pairs
            .withColumn("est_jaccard", F.round(F.col("n_matching") / _N_HASH, 6))
            .select("doc_a", "doc_b", "n_matching", "est_jaccard")
            .localCheckpoint())


# Cross-snapshot incremental dedup: docs with doc_id % 5 == 4 stand in
# for the "new crawl" batch; the rest are the already-ingested corpus.
_INC_BATCH_MOD = 5
_INC_NEAR_THRESHOLD = 0.5


def incremental_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup a NEW BATCH against the EXISTING corpus — the shape every
    production ingestion runs (dedup the day's crawl against the index,
    never all-pairs over history; the exact-membership fast path of
    ``bloom_ngram_containment``, upgraded to verdicts + matched docs):

    - tier 1 ``exact``: the batch doc's content hash exists in the
      corpus (match = lowest such corpus doc).
    - tier 2 ``near``: no exact hit, but a MinHash-LSH band collision
      with a corpus doc whose estimated Jaccard ≥ 0.5 (match = highest
      estimate, doc_id tiebreak).
    - else ``keep`` — the doc enters the corpus.

    Scale shape: the exact tier is one equi-join on the hash key; the
    near tier joins batch band rows against corpus band rows — with a
    daily batch ~1% of the corpus the batch side broadcasts and the
    corpus band table streams map-side; nothing is ever batch×corpus.
    Signatures reuse `_minhash_sig_table` computed ONCE over the union
    (in production the corpus side's sigs and band table are persisted
    and only the batch side is computed fresh)."""
    docs = load_table(spark, sf_dir, "documents")
    is_batch = (F.col("doc_id") % _INC_BATCH_MOD) == (_INC_BATCH_MOD - 1)
    # tier 1: exact content hash against the corpus
    corpus_hash = (docs.where(~is_batch)
                   .groupBy(F.md5("text").alias("content_hash"))
                   .agg(F.min("doc_id").alias("exact_match")))
    bexact = (docs.where(is_batch)
              .select("doc_id", F.md5("text").alias("content_hash"))
              .join(corpus_hash, "content_hash", "left")
              .select("doc_id", "exact_match"))
    # tier 2: LSH band collision batch → corpus
    sig = _minhash_sig_table(docs)
    bands = sig.select(
        "doc_id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band_id"),
                     F.concat_ws("_", *[
                         F.element_at("sig", bi * _ROWS_PER_BAND + r + 1)
                         for r in range(_ROWS_PER_BAND)]).alias("band_sig"))
            for bi in range(_BANDS)])).alias("band")
    ).select("doc_id", "sig", "band.band_id", "band.band_sig")
    bb = bands.where(is_batch).alias("a")
    cb = bands.where(~is_batch).alias("b")
    match_cnt = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    cand = (bb.join(cb, ["band_id", "band_sig"])
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.col("b.doc_id").alias("near_match"),
                    F.col("a.sig").alias("sig_a"),
                    F.col("b.sig").alias("sig_b"))
            .dropDuplicates(["doc_id", "near_match"])
            .withColumn("ej", F.round(match_cnt / _N_HASH, 6))
            .where(F.col("ej") >= _INC_NEAR_THRESHOLD))
    wbest = Window.partitionBy("doc_id").orderBy(
        F.col("ej").desc(), F.col("near_match").asc())
    best = (cand.withColumn("rn", F.row_number().over(wbest))
            .where(F.col("rn") == 1)
            .select("doc_id", "near_match", "ej"))
    return (bexact.join(best, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("exact_match").isNotNull(), F.lit("exact"))
                .when(F.col("near_match").isNotNull(), F.lit("near"))
                .otherwise(F.lit("keep")).alias("verdict"),
                F.coalesce("exact_match", "near_match").alias("matched_doc"),
                F.when(F.col("exact_match").isNull(), F.col("ej"))
                .alias("est_jaccard")))


_LP_HOPS = 3        # propagation hops fused per materialization round


def _label_prop(edges: DataFrame, max_iter: int) -> tuple[DataFrame, bool]:
    """Min-label propagation over a symmetric (src, dst) edge list.

    Returns ``(labels, converged)`` — labels only for edge-touched nodes.
    Hops = graph diameter, so this is the fast path for shallow dup
    graphs but cannot finish a component whose diameter exceeds
    ``max_iter`` hops; the caller decides the fallback.

    r10 (guide §1/§2.4): each materialization ROUND fuses ``_LP_HOPS``
    propagation hops.  The measured round cost is ~0.9 s of DRIVER-side
    physical planning (``toRdd`` on any join+agg plan; the actual count
    job is ~0.1 s at bench SF), so fusing hops divides the dominant
    per-round cost by ~3 while the semantic dup graph's diameter-9
    chains previously paid 9+1 rounds.  Correctness is unchanged:
    min-label propagation is a monotone fixpoint — the final labels are
    the per-component minimum under ANY propagation schedule — and
    "the last hop changed nothing" remains an exact convergence test
    (a no-op hop means the fixpoint is reached, whatever earlier hops
    in the same round did)."""
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("cluster_id", F.col("doc_id"))
              .localCheckpoint(eager=False))
    changed = 0
    for _ in range(0, max_iter, _LP_HOPS):
        cur = labels
        # hops 1..k-1: fully merged label frames, no materialization
        for _hop in range(_LP_HOPS - 1):
            nb = (edges.join(cur, edges.dst == cur.doc_id)
                  .groupBy("src").agg(F.min("cluster_id").alias("nb_min")))
            cur = (cur.join(nb, cur.doc_id == nb.src, "left")
                   .select(cur.doc_id,
                           F.least(F.col("cluster_id"),
                                   F.coalesce(F.col("nb_min"),
                                              F.col("cluster_id")))
                           .alias("cluster_id")))
        # final hop keeps nb_min visible: the convergence count and the
        # next label frame both derive from ONE lazily-checkpointed
        # frame, materialized by the count() — one action per round
        nb = (edges.join(cur, edges.dst == cur.doc_id)
              .groupBy("src").agg(F.min("cluster_id").alias("nb_min")))
        joined = (cur.join(nb, cur.doc_id == nb.src, "left")
                  .select(cur.doc_id, "cluster_id", "nb_min")
                  .localCheckpoint(eager=False))
        changed = joined.where(F.col("nb_min") < F.col("cluster_id")).count()
        labels = joined.select(
            "doc_id",
            F.least(F.col("cluster_id"),
                    F.coalesce(F.col("nb_min"), F.col("cluster_id")))
             .alias("cluster_id"))
        if changed == 0:
            return labels, True
    return labels, changed == 0


def _cc_star(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the mega-component path: converges in O(log² n) rounds regardless of
    component diameter or skew, where plain label propagation needs
    diameter rounds.

    Both operations are grouped min-aggregates + an equi-join (no
    all-pairs work): large-star points every larger neighbor of u at
    min(Γ(u) ∪ {u}); small-star does the same for the smaller neighbors.
    The fixed point is a star forest — every node points at its
    component's minimum id.  Returns (doc_id, cluster_id) for
    edge-touched nodes.
    """
    # canonical directed edges u -> v with v < u; self-loops dropped
    e = (edges.select(F.greatest("src", "dst").alias("u"),
                      F.least("src", "dst").alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct().localCheckpoint())
    for _ in range(max_iter):
        # --- large-star: group by u over BOTH directions ---
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (sym.groupBy("u").agg(F.min("v").alias("mv"))
             .select("u", F.least("u", "mv").alias("m")))
        large = (sym.join(m, "u")
                 .where(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .where(F.col("u") != F.col("v"))
                 .distinct())
        # --- small-star: group by u over smaller neighbors only ---
        m2 = (large.groupBy("u").agg(F.min("v").alias("mv"))
              .select("u", F.least("u", "mv").alias("m")))
        small = (large.join(m2, "u")
                 .select(F.col("v").alias("n"), F.col("m"), F.col("u"))
                 .select(F.explode(F.array(
                     F.struct(F.col("n").alias("a"), F.col("m").alias("b")),
                     F.struct(F.col("u").alias("a"), F.col("m").alias("b"))))
                     .alias("e"))
                 .select(F.greatest("e.a", "e.b").alias("u"),
                         F.least("e.a", "e.b").alias("v"))
                 .where(F.col("u") != F.col("v"))
                 .distinct().localCheckpoint())
        n_changed = small.exceptAll(e).count() + e.exceptAll(small).count()
        e = small
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"_cc_star did not converge within {max_iter} rounds — "
            "O(log^2 n) bound exceeded; graph input is likely malformed")
    # fixed point is a star forest: every non-root points at its root
    return (e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
            .union(e.select(F.col("v").alias("doc_id"),
                            F.col("v").alias("cluster_id")))
            .groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id")))


def cluster_edges(docs: DataFrame, pairs: DataFrame,
                  max_iter: int = 20) -> DataFrame:
    """Assign every doc the min doc_id of its connected component in the
    ``pairs`` graph (singletons keep their own id).

    Strategy: min-label propagation first (rounds = diameter — shallow
    dup graphs finish in 2-3); if it has not converged after ``max_iter``
    rounds (deep-chain or skewed mega-components), LOUDLY fall back to
    the large-star/small-star algorithm, which is round-bounded by
    O(log² n) independent of diameter.
    """
    # r9 (guide §2.4): cut the pair list BEFORE the symmetric union —
    # uncut, the union's two branches each re-ran the full candidate
    # chain (MinHash band join here; the 36-projection embedding chain
    # for semantic_dedup_keep) into the eager edges checkpoint below
    pairs = pairs.localCheckpoint()
    edges = (pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
             .union(pairs.select(F.col("doc_b").alias("src"),
                                 F.col("doc_a").alias("dst"))))
    edges = edges.localCheckpoint()
    # iterate ONLY over edge-touched nodes: singletons can never change
    # label, and at corpus scale dup-pair endpoints are a small fraction
    # of all docs — the per-round joins shrink accordingly.  Singletons
    # rejoin (label = own id) after convergence.
    labels, converged = _label_prop(edges, max_iter)
    if not converged:
        import logging
        logging.getLogger(__name__).warning(
            "dedup_clusters: label propagation did not converge within "
            "%d rounds (component diameter exceeds the round budget); "
            "falling back to large-star/small-star", max_iter)
        labels = _cc_star(edges)
    return (docs.join(labels, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("cluster_id", "doc_id").alias("cluster_id")))


def dedup_clusters(spark: SparkSession, sf_dir: str,
                   max_iter: int = 20) -> DataFrame:
    """Near-dup CLUSTERS from the MinHash-LSH candidate pairs: connected
    components via iterative min-label propagation — every doc gets the
    smallest doc_id reachable through the pair graph (singletons keep
    their own id).  This is the step that turns pairwise dedup into
    actionable keep/drop groups.

    Iterative Spark algorithm (the reference has nothing like it): see
    :func:`cluster_edges` — min-label propagation (rounds = diameter,
    shallow dup graphs converge in 2-3) with a loud automatic fallback to
    large-star/small-star (:func:`_cc_star`, O(log² n) rounds) when a
    deep or skewed mega-component outlives the round budget.
    ``localCheckpoint`` cuts the exploding join lineage each round.
    Oracle: recursive-CTE transitive closure over the identical pair SQL
    — fully hash-checked.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return cluster_edges(docs, pairs, max_iter=max_iter)


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END STEP a training-corpus pipeline actually ships:
    after clustering near-duplicates, keep exactly ONE representative
    per cluster — the highest-quality member, not an arbitrary one
    (Lee et al. 2022 keep-one semantics + a quality argmax, the
    composition corpus builders use so dedup never discards the clean
    copy and keeps the boilerplate one).

    Quality here is the distinct-token ratio (vocabulary richness — the
    repetition signal Gopher filters on), tiebroken by doc_id so the
    winner is total.  Plan shape: the cluster assignment (MinHash-LSH +
    CC, proven by ``dedup_clusters``) joins per-doc token stats on
    doc_id, then ONE window keyed by cluster_id picks the argmax — one
    extra shuffle over the clustering itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(spark, sf_dir)
    stats = (docs.select(
        "doc_id",
        F.split("text", " ").alias("toks"))
        .select("doc_id",
                F.round(F.size(F.array_distinct("toks"))
                        / F.size("toks"), 6).alias("q")))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("q").desc(), F.col("doc_id").asc())
    wall = Window.partitionBy("cluster_id")
    return (clusters.join(stats, "doc_id")
            .withColumn("rn", F.row_number().over(w))
            .withColumn("n_members", F.count(F.lit(1)).over(wall))
            .where(F.col("rn") == 1)
            .select("cluster_id", "n_members",
                    F.col("doc_id").alias("kept_doc_id"),
                    F.col("q").alias("kept_distinct_ratio")))


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document: sign-sum of per-token md5 bits —
    bit b is set when a majority of the doc's tokens have bit b set in
    their 32-bit md5-prefix hash.

    Executed as explode → ONE grouped aggregate with 33 expressions
    (count + 32 per-bit sums).  The HOF alternative (32 ``F.aggregate``
    lambdas over the token array) re-walks the array once per bit AND
    re-evaluates the md5 tree per reference (measured pathology #3,
    module notes) — the exploded form md5-hashes each token exactly
    once inside whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id",
                       F.explode(F.split("text", " ")).alias("token"))
    th = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
         .alias("h"))
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum((F.col("h").bitwiseAND(F.lit(1 << bit)) != 0).cast("int"))
         .alias(f"b{bit}")
        for bit in range(32)]
    g = th.groupBy("doc_id").agg(*aggs)
    simhash = F.lit(0)
    for bit in range(32):
        simhash = simhash + F.when(
            F.col(f"b{bit}") * 2 >= F.col("n"), F.lit(1 << bit)).otherwise(0)
    return g.select("doc_id", simhash.cast("long").alias("simhash"))


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

_SHINGLE_HASH_CTE = """
WITH sh AS (
    SELECT doc_id,
           list_transform(
               generate_series(1, len(string_split(text, ' ')) - 1),
               i -> ('0x' || substr(md5(string_split(text, ' ')[i]
                         || ' ' || string_split(text, ' ')[i + 1]), 1, 8))::BIGINT)
               AS hashes
    FROM documents
), sig AS (
    SELECT doc_id,
           [{minhash_exprs}] AS sig
    FROM sh
)
"""

_MINHASH_EXPRS = ", ".join(
    f"list_min(list_transform(hashes, h -> (h * {a} + {b}) % {_P}))"
    for a, b in _HASH_PARAMS)

_SIG_CTE = _SHINGLE_HASH_CTE.format(minhash_exprs=_MINHASH_EXPRS)

def _band_select(bi: int) -> str:
    sig_concat = " || '_' || ".join(
        f"CAST(sig[{bi * _ROWS_PER_BAND + r + 1}] AS VARCHAR)"
        for r in range(_ROWS_PER_BAND))
    return (f"SELECT doc_id, sig, {bi} AS band_id, {sig_concat} AS band_sig "
            "FROM sig")


_BANDS_UNION = " UNION ALL ".join(_band_select(bi) for bi in range(_BANDS))

ORACLES = {
    "dedup_exact": """
        SELECT md5(text) AS content_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
        HAVING count(*) >= 1
    """,
    "dedup_exact_normalized": """
        SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS content_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "ngram_jaccard_pairs": """
        WITH doc_sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' '
                            || string_split(text, ' ')[i + 1])) AS shingles
            FROM documents
        ), sh AS (
            SELECT doc_id, unnest(shingles) AS shingle, len(shingles) AS n_sh
            FROM doc_sh
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_common,
               round(count(*) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6)
                   AS jaccard
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        HAVING round(count(*) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.15
    """,
    "minhash_calibration": _SIG_CTE + f"""
        , bands AS ({_BANDS_UNION}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                        AND a.doc_id < b.doc_id
        ),
        est AS (
            SELECT c.doc_a, c.doc_b,
                   round(len(list_filter(generate_series(1, {_N_HASH}),
                                 i -> sa.sig[i] = sb.sig[i]))
                         / {_N_HASH}.0, 6) AS est_jaccard
            FROM cand c
            JOIN sig sa ON c.doc_a = sa.doc_id
            JOIN sig sb ON c.doc_b = sb.doc_id
        ),
        doc_sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' '
                            || string_split(text, ' ')[i + 1])) AS shingles
            FROM documents
        ), shx AS (
            SELECT doc_id, unnest(shingles) AS shingle,
                   len(shingles) AS n_sh
            FROM doc_sh
        ), exact AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(count(*) / CAST(a.n_sh + b.n_sh - count(*)
                                         AS DOUBLE), 6) AS exact_jaccard
            FROM shx a JOIN shx b ON a.shingle = b.shingle
                                 AND a.doc_id < b.doc_id
            JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        )
        SELECT e.doc_a, e.doc_b, e.est_jaccard,
               coalesce(x.exact_jaccard, 0.0) AS exact_jaccard,
               round(abs(e.est_jaccard
                         - coalesce(x.exact_jaccard, 0.0)), 6) AS abs_error
        FROM est e
        LEFT JOIN exact x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
    """,
    "contrastive_pairs": _SIG_CTE.replace("WITH sh", "WITH sh", 1) + f"""
        , bands AS ({_BANDS_UNION}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                        AND a.doc_id < b.doc_id
        ),
        nn AS (SELECT count(*) AS n FROM documents),
        cand AS (
            SELECT d.doc_id AS doc_a,
                   (d.doc_id * {_NEG_KNUTH} + {_NEG_SALT}) % nn.n AS doc_b
            FROM documents d CROSS JOIN nn
        ),
        canon AS (
            SELECT DISTINCT least(doc_a, doc_b) AS doc_a,
                   greatest(doc_a, doc_b) AS doc_b
            FROM cand WHERE doc_a != doc_b
        )
        SELECT doc_a, doc_b, 1 AS label FROM pairs
        UNION ALL
        SELECT c.doc_a, c.doc_b, 0 AS label
        FROM canon c
        LEFT JOIN pairs p ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
        WHERE p.doc_a IS NULL
    """,
    "ngram_containment_pairs": f"""
        WITH doc_sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' '
                            || string_split(text, ' ')[i + 1])) AS shingles
            FROM documents
        ), sh AS (
            SELECT doc_id, unnest(shingles) AS shingle,
                   len(shingles) AS n_sh
            FROM doc_sh
        )
        SELECT a.doc_id AS doc_contained, b.doc_id AS doc_container,
               count(*) AS n_common,
               a.n_sh AS n_contained,
               round(count(*) / CAST(a.n_sh AS DOUBLE), 6) AS containment
        FROM sh a JOIN sh b ON a.shingle = b.shingle
                           AND a.doc_id != b.doc_id
        GROUP BY a.doc_id, b.doc_id, a.n_sh
        HAVING round(count(*) / CAST(a.n_sh AS DOUBLE), 6)
               >= {_CONTAIN_THRESHOLD}
    """,
    "minhash_signatures": _SIG_CTE + f"""
        SELECT doc_id,
               sig[1] AS minhash_0,
               sig[{_N_HASH}] AS minhash_{_N_HASH - 1},
               CAST(list_sum(sig) AS BIGINT) AS sig_sum,
               list_min(sig) AS sig_min
        FROM sig
    """,
    "minhash_lsh_pairs": _SIG_CTE + f"""
        , bands AS ({_BANDS_UNION}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                        AND a.doc_id < b.doc_id
        )
        SELECT p.doc_a, p.doc_b,
               len(list_filter(generate_series(1, {_N_HASH}),
                               i -> sa.sig[i] = sb.sig[i])) AS n_matching,
               round(len(list_filter(generate_series(1, {_N_HASH}),
                               i -> sa.sig[i] = sb.sig[i])) / {_N_HASH}.0, 6)
                   AS est_jaccard
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb ON sb.doc_id = p.doc_b
    """,
    "dedup_clusters": _SIG_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1) + f"""
        , bands AS ({_BANDS_UNION}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                        AND a.doc_id < b.doc_id
        ),
        sym AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(a, b) AS (
            SELECT a, b FROM sym
            UNION
            SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        )
        SELECT d.doc_id,
               CAST(least(d.doc_id,
                          coalesce((SELECT min(b) FROM reach
                                    WHERE a = d.doc_id), d.doc_id))
                    AS BIGINT) AS cluster_id
        FROM documents d
    """,
    "simhash_docs": """
        WITH th AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '),
                       t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hashes,
                   len(string_split(text, ' ')) AS n
            FROM documents
        )
        SELECT doc_id,
               CAST({simhash_sum} AS BIGINT) AS simhash
        FROM th
    """.format(simhash_sum=" + ".join(
        f"(CASE WHEN 2 * len(list_filter(hashes, h -> (h & {1 << bit}) != 0)) >= n "
        f"THEN {1 << bit} ELSE 0 END)" for bit in range(32))),
}

# keep-best composes on the dedup_clusters closure (nested-CTE subquery:
# a CTE body may carry its own WITH RECURSIVE) + a quality argmax window
ORACLES["dedup_keep_best"] = f"""
    WITH clusters AS ({ORACLES["dedup_clusters"]}),
    stats AS (
        SELECT doc_id,
               round(len(list_distinct(string_split(text, ' ')))
                     / len(string_split(text, ' ')), 6) AS q
        FROM documents
    ), ranked AS (
        SELECT c.cluster_id, c.doc_id, s.q,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY s.q DESC, c.doc_id ASC) AS rn,
               count(*) OVER (PARTITION BY c.cluster_id) AS n_members
        FROM clusters c JOIN stats s USING (doc_id)
    )
    SELECT cluster_id, n_members, doc_id AS kept_doc_id,
           q AS kept_distinct_ratio
    FROM ranked WHERE rn = 1
"""

_SIMHASH_BANDS = 4          # 4 bands × 8 bits
_HAMMING_MAX = 3            # pigeonhole: d ≤ 3 ⇒ ≥1 of 4 bands identical


def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: hamming distance ≤ 3 over the 32-bit
    signatures, found by band blocking.

    Pigeonhole principle: if two signatures differ in ≤ 3 bits, at least
    one of the 4 disjoint 8-bit bands is identical — so candidates come
    from an EQUI-join on (band_id, band_value), never an all-pairs scan,
    then the exact ``bit_count(xor) ≤ 3`` refine.  At 100 TB the band
    join shuffles (docs × 4) rows on evenly-hashed 8-bit band values;
    the oracle runs the O(n²) definition directly, verifying the
    blocking loses nothing.
    """
    # materialize signatures first: the simhash column is 32 F.aggregate
    # HOFs over per-token md5 — referenced 5x below (projection + 4 band
    # structs) on both join sides, Catalyst would re-evaluate the whole
    # tree per reference (measured pathology; see module docstring notes)
    sh = simhash_docs(spark, sf_dir).localCheckpoint()
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.shiftright("simhash", 8 * b).bitwiseAND(F.lit(0xFF))
                      .alias("band_val"))
            for b in range(_SIMHASH_BANDS)])).alias("band"))
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("simhash").alias("sim_a"), "band.*")
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("simhash").alias("sim_b"), "band.*")
    return (a.join(b, ["band_id", "band_val"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b",
                    F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
                     .alias("hamming"))
            .where(F.col("hamming") <= _HAMMING_MAX)
            .distinct()
            .orderBy("doc_a", "doc_b"))


def part_name_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-matching join: part-name pairs within Levenshtein distance 8,
    blocked by brand.

    Edit distance is O(len²) per pair and can't be indexed directly, so
    the scalable shape is block-then-refine: the equi-join on ``p_brand``
    bounds candidates to same-brand pairs (the classic blocking-key
    pattern from record linkage), then the exact ``levenshtein`` refine
    runs only inside blocks.  At 100 TB blocking keys need cardinality
    tuning (brand+prefix, or LSH over q-grams) — same plan shape.
    """
    parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_name",
                                                     "p_brand")
    a = parts.select(F.col("p_partkey").alias("key_a"),
                     F.col("p_name").alias("name_a"), "p_brand")
    b = parts.select(F.col("p_partkey").alias("key_b"),
                     F.col("p_name").alias("name_b"), "p_brand")
    # r9 note (guide §1): the "obvious" refinements were MEASURED and
    # rejected — the threshold form ``levenshtein(a, b, 8)`` ran ~2×
    # SLOWER than the unbounded DP on this name distribution (warm A/B
    # 18.1 s vs 9.1 s at sf0.1: most same-brand pairs pass the ≤ 8 cut,
    # so the banded DP's early-exit never fires and its bookkeeping is
    # pure overhead), and the |len(a)−len(b)| > 8 pre-filter prunes ~0%
    # (names draw from a fixed word vocabulary, lengths cluster).  The
    # unbounded form stays.
    #
    # r10 (guide §2.6 + §1.1): the planner broadcast-joins b (part is
    # under the threshold at bench SF), which leaves the STREAMED side
    # = the one-file parquet scan — a single task computed every
    # levenshtein DP (measured: the whole 7.6 s standalone cost was one
    # task; 8-vs-32-core ratio 1.09).  An explicit keyed repartition of
    # the streamed side spreads the O(pairs · len²) refine across the
    # session's shuffle width (user-specified counts are exempt from
    # AQE coalescing); it shuffles only the parts table — bounded —
    # and changes nothing about the candidate set or join strategy.
    from ..session import shuffle_width
    a = a.repartition(shuffle_width(spark), F.col("key_a"))
    return (a.join(b, "p_brand")
            .where(F.col("key_a") < F.col("key_b"))
            .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
            .where(F.col("edit_dist") <= 8)
            .select("key_a", "key_b", "edit_dist")
            .orderBy("key_a", "key_b"))


_SPAN_LEN = 8      # tokens per span (Lee et al. use 50; docs here are short)
_SPAN_TOPK = 50


def repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup primitive (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): the top repeated
    8-token spans corpus-wide — every span occurring ≥ 2 times, ranked
    by occurrence count, with its document frequency.  The production
    action is to strip or collapse these spans; the detection table is
    the operator.

    Span construction is the same posexplode + lead-window shape as
    :func:`shingle_table` widened to 8 tokens (one shuffle on doc_id,
    no HOF lambdas); the top-k is TakeOrdered, so the global step moves
    k·P rows regardless of corpus size.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = (docs
            .select("doc_id", F.posexplode(F.split("text", " "))
                    .alias("pos", "tok")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    lead_cols = [F.col("tok")] + [F.lead("tok", i).over(w)
                                  for i in range(1, _SPAN_LEN)]
    spans = (toks
             .withColumn("last_tok", F.lead("tok", _SPAN_LEN - 1).over(w))
             .withColumn("span", F.concat_ws(" ", *lead_cols))
             .where(F.col("last_tok").isNotNull())
             .select("doc_id", "span"))
    counts = (spans.groupBy("span")
              .agg(F.count(F.lit(1)).alias("n_occurrences"),
                   F.count_distinct("doc_id").alias("n_docs"))
              .where(F.col("n_occurrences") >= 2))
    top = (counts
           .orderBy(F.col("n_occurrences").desc(), F.col("span").asc())
           .limit(_SPAN_TOPK))
    wr = Window.orderBy(F.col("n_occurrences").desc(), F.col("span").asc())
    return (top.withColumn("rank", F.row_number().over(wr))
            .select("rank", "span", "n_occurrences", "n_docs"))


_BLOOM_M = 1 << 20   # bit-array size — FIXED, so the set stays broadcastable
_BLOOM_K = 4         # hash functions (first 4 universal-hash params)
_BLOOM_NGRAM = 4     # word 4-grams: bigrams saturate (shared vocab → 100 %
#                      containment everywhere); 4-grams split the batch
#                      cleanly (measured sf0.01: containment 0→1, mean 0.11,
#                      only true near-dup partners cross the 0.8 threshold)
_BLOOM_DUP_THRESHOLD = 0.8


def _span_table(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle) word n-gram rows via posexplode + lead window —
    the same codegen-friendly shape as ``shingle_table`` (see its
    docstring for why NOT a nested higher-order-function expression),
    generalized to n tokens."""
    from pyspark.sql.window import Window
    toks = (docs
            .select("doc_id", F.posexplode(F.split("text", " "))
                    .alias("pos", "tok")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    lead_cols = [F.col("tok")] + [F.lead("tok", i).over(w)
                                  for i in range(1, n)]
    # the span MUST be materialized before the where: a window expression
    # evaluated after the filter re-runs over the filtered frame, turning
    # end-of-doc leads NULL (and concat_ws silently drops them)
    return (toks
            .withColumn("last_tok", F.lead("tok", n - 1).over(w))
            .withColumn("shingle", F.concat_ws(" ", *lead_cols))
            .where(F.col("last_tok").isNotNull())
            .select("doc_id", "shingle"))


def bloom_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-batch near-dup pre-filter via a deterministic Bloom
    n-gram containment test (the Dolma/BFF "Bloom filter filtering"
    shape): for each document of the incoming batch (``source='src0'``),
    the fraction of its distinct word 4-grams already present in the
    standing corpus (every other source), flagging docs above 80 %
    containment as dup candidates.

    The at-scale shape: the corpus never re-shuffles against the batch.
    Its Bloom bit-set — ``k=4`` universal hashes of each distinct
    shingle's md5-prefix hash, mod a FIXED ``m = 2^20`` — is a
    distinct-``pos`` relation bounded by ``m`` rows (≤ 8 MB) regardless
    of corpus size, built map-side + one dedup and then **broadcast**;
    the batch side is a map-only shingle explode + broadcast-hash join +
    two grouped aggregates.  A 100 TB corpus and a 1 GB daily batch meet
    in a constant-size structure — the standard "mostly already crawled?"
    pre-filter in front of MinHash.  False positives (shingle counted
    seen that is new) follow the classic rate ≈ fill^k; size m to the
    corpus shingle cardinality in production.  False negatives are
    impossible, so containment is never under-estimated.

    Every step is integer arithmetic on the md5 prefix — the same idiom
    as MinHash above — so the whole path has an exact DuckDB oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus_sh = (_span_table(docs.where(F.col("source") != "src0"),
                             _BLOOM_NGRAM)
                 .select("shingle").distinct()
                 .select(shingle_hash_col().alias("h")))
    batch_sh = (_span_table(docs.where(F.col("source") == "src0"),
                            _BLOOM_NGRAM)
                .select("doc_id", "shingle").distinct()
                .select("doc_id", shingle_hash_col().alias("h")))
    pos = [((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_P) % F.lit(_BLOOM_M))
           for (a, b) in _HASH_PARAMS[:_BLOOM_K]]
    corpus_bits = (corpus_sh.select(F.explode(F.array(*pos)).alias("pos"))
                   .distinct().withColumn("hit", F.lit(1)))
    batch_pos = batch_sh.select(
        "doc_id", F.col("h"), F.explode(F.array(*pos)).alias("pos"))
    per_shingle = (batch_pos
                   .join(F.broadcast(corpus_bits), "pos", "left")
                   .groupBy("doc_id", "h")
                   .agg((F.min(F.coalesce(F.col("hit"), F.lit(0))) == 1)
                        .alias("seen")))
    return (per_shingle.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_ngrams"),
                 F.sum(F.col("seen").cast("long")).alias("n_seen"))
            .select("doc_id", "n_ngrams", "n_seen",
                    F.round(F.col("n_seen") / F.col("n_ngrams"), 4)
                     .alias("containment"),
                    (F.col("n_seen") >= F.col("n_ngrams")
                     * F.lit(_BLOOM_DUP_THRESHOLD)).alias("dup_candidate")))


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_exact_normalized": dedup_exact_normalized,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "dedup_clusters": dedup_clusters,
    "dedup_keep_best": dedup_keep_best,
    "ngram_containment_pairs": ngram_containment_pairs,
    "contrastive_pairs": contrastive_pairs,
    "minhash_calibration": minhash_calibration,
    "simhash_docs": simhash_docs,
    "simhash_neardup_pairs": simhash_neardup_pairs,
    "part_name_editdist_pairs": part_name_editdist_pairs,
    "bloom_ngram_containment": bloom_ngram_containment,
    "incremental_dedup_batch": incremental_dedup_batch,
}

# Round-2 addition, registered in __spark_entry__'s tail block so the
# driver's ~50-query window allocation stays byte-stable this round.
EXTRA_QUERIES = {"repeated_ngram_spans": repeated_ngram_spans}
EXTRA_ORACLES: dict[str, str] = {}

_BLOOM_PARAMS_SQL = ", ".join(f"({a}, {b})"
                              for a, b in _HASH_PARAMS[:_BLOOM_K])
ORACLES["bloom_ngram_containment"] = f"""
    WITH base AS (
        SELECT doc_id, source, string_split(text, ' ') AS s FROM documents
    ), doc_sh AS (
        SELECT doc_id, source,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(s) - {_BLOOM_NGRAM - 1}),
                   i -> {" || ' ' || ".join(f"s[i+{j}]" for j in range(_BLOOM_NGRAM))}
               ))) AS shingle
        FROM base
    ), hashed AS (
        SELECT doc_id, source,
               ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h
        FROM doc_sh
    ), params(a, b) AS (VALUES {_BLOOM_PARAMS_SQL}),
    corpus_bits AS (
        SELECT DISTINCT (c.h * p.a + p.b) % {_P} % {_BLOOM_M} AS pos
        FROM (SELECT DISTINCT h FROM hashed WHERE source <> 'src0') c,
             params p
    ), batch_pos AS (
        SELECT b.doc_id, b.h, (b.h * p.a + p.b) % {_P} % {_BLOOM_M} AS pos
        FROM (SELECT DISTINCT doc_id, h FROM hashed
              WHERE source = 'src0') b, params p
    ), per_sh AS (
        SELECT bp.doc_id, bp.h, bool_and(cb.pos IS NOT NULL) AS seen
        FROM batch_pos bp LEFT JOIN corpus_bits cb USING (pos)
        GROUP BY 1, 2
    )
    SELECT doc_id, count(*) AS n_ngrams,
           CAST(sum(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
           round(CAST(sum(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT)
                 / count(*), 4) AS containment,
           CAST(sum(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT)
               >= count(*) * {_BLOOM_DUP_THRESHOLD} AS dup_candidate
    FROM per_sh GROUP BY 1
"""

EXTRA_ORACLES["repeated_ngram_spans"] = f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(s) - {_SPAN_LEN - 1}),
                   i -> {" || ' ' || ".join(f"s[i+{j}]" for j in range(_SPAN_LEN))}))
                   AS span
        FROM base
    ), counts AS (
        SELECT span, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM g GROUP BY 1 HAVING count(*) >= 2
    ), ranked AS (
        SELECT *, row_number() OVER (ORDER BY n_occurrences DESC,
                                     span ASC) AS rank
        FROM counts
    )
    SELECT rank, span, n_occurrences, n_docs
    FROM ranked WHERE rank <= {_SPAN_TOPK}
"""

ORACLES["part_name_editdist_pairs"] = """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 8
    ORDER BY 1, 2
"""

# the oracle runs the O(n²) hamming definition — no banding — so the
# equi-join blocking is verified lossless against first principles
ORACLES["simhash_neardup_pairs"] = f"""
    WITH sh AS ({ORACLES["simhash_docs"]})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
    ORDER BY 1, 2
"""

ORACLES["incremental_dedup_batch"] = _SIG_CTE + f"""
    , bands AS ({_BANDS_UNION}),
    exactc AS (
        SELECT md5(text) AS content_hash, min(doc_id) AS exact_match
        FROM documents WHERE doc_id % {_INC_BATCH_MOD} != {_INC_BATCH_MOD - 1}
        GROUP BY 1
    ), bx AS (
        SELECT d.doc_id, e.exact_match
        FROM documents d LEFT JOIN exactc e
          ON md5(d.text) = e.content_hash
        WHERE d.doc_id % {_INC_BATCH_MOD} = {_INC_BATCH_MOD - 1}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS near_match
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_sig = b.band_sig
        WHERE a.doc_id % {_INC_BATCH_MOD} = {_INC_BATCH_MOD - 1}
          AND b.doc_id % {_INC_BATCH_MOD} != {_INC_BATCH_MOD - 1}
    ), scored AS (
        SELECT c.doc_id, c.near_match,
               round(len(list_filter(generate_series(1, {_N_HASH}),
                               i -> sa.sig[i] = sb.sig[i]))
                     / {_N_HASH}.0, 6) AS ej
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.doc_id
        JOIN sig sb ON sb.doc_id = c.near_match
    ), best AS (
        SELECT doc_id, near_match, ej FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY ej DESC, near_match ASC) AS rn
            FROM scored WHERE ej >= {_INC_NEAR_THRESHOLD})
        WHERE rn = 1
    )
    SELECT bx.doc_id,
           CASE WHEN bx.exact_match IS NOT NULL THEN 'exact'
                WHEN b.near_match IS NOT NULL THEN 'near'
                ELSE 'keep' END AS verdict,
           coalesce(bx.exact_match, b.near_match) AS matched_doc,
           CASE WHEN bx.exact_match IS NULL THEN b.ej END AS est_jaccard
    FROM bx LEFT JOIN best b USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Round-4 additions: paragraph-level dedup rewrite + n-gram novelty.

_PARA_WORDS = 16     # deterministic "paragraph" = 16-word block (the
                     # fixture text has no newlines, so segmentation is
                     # positional — same convention as text.doc_chunks)
_NOVELTY_N = 4       # novelty n-gram width (matches the Bloom/span ops)


def paragraph_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level dedup with document REWRITE — the Dolma/CCNet
    "dedupe paragraphs, keep the document" step that exact doc-dedup
    misses (boilerplate headers, quoted blocks, syndicated footers):
    segment every document into fixed 16-word blocks, rank identical
    blocks corpus-wide by first occurrence (doc_id, block_id), keep only
    each block's first occurrence, and reassemble the surviving blocks
    in order.  Emits per doc: block counts, removed-block count, kept
    word count, and the md5 of the cleaned text (the rewrite itself,
    hash-checked — the `decontaminate_spans` convention).

    At 100 TB: block construction is MAP-ONLY (`slice` over the token
    array, the `doc_chunks` shape — no shuffle, no Python); the dedup
    decision is ONE shuffle keyed by block text (the exact-tier analog
    of Dolma's Bloom filter, with first-occurrence-wins rank instead of
    probabilistic membership); reassembly is one shuffle back on doc_id.
    Linear in corpus size, no pairwise anything.  Block text as the
    shuffle key is safe: blocks are ≤16 words, and a pathological hot
    block (the same boilerplate everywhere) lands on one reducer only
    for its rank — mitigable with the salted two-stage pattern if a
    profile (`join_key_skew_profile`) flags it."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("s"))
    n_blocks = F.ceil(F.size("s") / F.lit(float(_PARA_WORDS))).cast("int")
    blocks = (toks
              .select("doc_id", "s",
                      F.posexplode(F.sequence(F.lit(0), n_blocks - 1))
                      .alias("block_id", "bi"))
              .select("doc_id", "block_id",
                      F.slice("s", F.col("bi") * _PARA_WORDS + 1,
                              _PARA_WORDS).alias("blk"))
              .select("doc_id", "block_id",
                      F.size("blk").alias("bw"),
                      F.concat_ws(" ", "blk").alias("block_text")))
    w = Window.partitionBy("block_text").orderBy("doc_id", "block_id")
    ranked = blocks.withColumn("rk", F.row_number().over(w))
    keep = F.col("rk") == 1
    kept_struct = F.when(keep, F.struct("block_id", "block_text"))
    return (ranked.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_blocks"),
                 F.sum(F.when(~keep, 1).otherwise(0)).alias("n_removed"),
                 F.sum(F.when(keep, F.col("bw")).otherwise(0))
                 .alias("n_words_kept"),
                 F.md5(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(kept_struct)),
                         lambda x: x.block_text), " ")).alias("cleaned_md5"))
            .orderBy("doc_id"))


ORACLES["paragraph_dedup_rewrite"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    ), blocks AS (
        SELECT doc_id, bi AS block_id,
               len(list_slice(s, bi * {_PARA_WORDS} + 1,
                              bi * {_PARA_WORDS} + {_PARA_WORDS})) AS bw,
               array_to_string(list_slice(s, bi * {_PARA_WORDS} + 1,
                               bi * {_PARA_WORDS} + {_PARA_WORDS}), ' ')
                   AS block_text
        FROM toks, LATERAL (SELECT unnest(generate_series(0,
             CAST(ceil(len(s) / {_PARA_WORDS}.0) AS INT) - 1)) AS bi) t
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY block_text
                   ORDER BY doc_id, block_id) AS rk
        FROM blocks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           CAST(coalesce(sum(CASE WHEN rk = 1 THEN bw END), 0) AS BIGINT)
               AS n_words_kept,
           md5(coalesce(string_agg(CASE WHEN rk = 1 THEN block_text END,
                                   ' ' ORDER BY block_id), ''))
               AS cleaned_md5
    FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    word 4-grams that occur in no other document — the inverse of the
    containment family (high novelty = fresh content worth keeping;
    low novelty = assembled from corpus-common fragments even when no
    single pair-level dup fires).  The canonical use is a cheap
    keep-priority signal between exact dedup and MinHash.

    At 100 TB: one map-side distinct-shingle explode, one grouped count
    on the shingle key (doc-frequency), one join back on that same key,
    one grouped count by doc — every stage linear, the shingle join's
    build side is the doc-frequency table (vocabulary-of-4-grams
    bounded, and only `nd` rides along)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = _span_table(docs, _NOVELTY_N).distinct()
    df_tbl = grams.groupBy("shingle").agg(F.count(F.lit(1)).alias("nd"))
    return (grams.join(df_tbl, "shingle")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.when(F.col("nd") == 1, 1).otherwise(0))
                 .alias("n_unique"))
            .withColumn("novelty",
                        F.round(F.col("n_unique")
                                / F.col("n_grams").cast("double"), 6))
            .orderBy("doc_id"))


ORACLES["doc_novelty_scores"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(s, i, i + {_NOVELTY_N - 1}), ' ')
                   AS shingle
        FROM toks, LATERAL (SELECT unnest(generate_series(1,
             len(s) - {_NOVELTY_N - 1})) AS i) t
    ), df AS (
        SELECT shingle, count(*) AS nd FROM grams GROUP BY shingle
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique,
           round(sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS novelty
    FROM grams JOIN df USING (shingle)
    GROUP BY doc_id ORDER BY doc_id
"""


QUERIES["paragraph_dedup_rewrite"] = paragraph_dedup_rewrite
QUERIES["doc_novelty_scores"] = doc_novelty_scores


def source_dedup_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication profile: exact-duplicate rate and
    cross-source duplicate share for every source — the crawl-health
    report that tells a curation pipeline WHICH feed is flooding the
    corpus with boilerplate (corpus-wide dedup says how much
    duplication exists; this says who ships it).  A doc is an exact
    dup if its normalized text hash appears more than once
    corpus-wide; it is a CROSS-source dup if the hash also appears
    under a different source — the distinction between a feed
    re-crawling itself and two feeds mirroring each other.

    One hash aggregate (the `dedup_exact` shuffle), one broadcast
    re-join of the per-hash profile, one per-source aggregate —
    map-side heavy, nothing pairwise."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", "source",
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"))
    prof = (hashed.groupBy("h")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.count_distinct("source").alias("n_sources")))
    j = hashed.join(prof, "h")
    return (j.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("n_total") > 1).cast("long"))
                 .alias("n_dup_docs"),
                 F.sum((F.col("n_sources") > 1).cast("long"))
                 .alias("n_cross_source_dups"))
            .select("source", "n_docs", "n_dup_docs",
                    "n_cross_source_dups",
                    F.round(F.col("n_dup_docs").cast("double")
                            / F.col("n_docs").cast("double"), 6)
                    .alias("dup_rate"))
            .orderBy("source"))


EXTRA_QUERIES["source_dedup_rates"] = source_dedup_rates
EXTRA_ORACLES["source_dedup_rates"] = """
    WITH hashed AS (
        SELECT doc_id, source, md5(lower(trim(text))) AS h
        FROM documents
    ), prof AS (
        SELECT h, count(*) AS n_total,
               count(DISTINCT source) AS n_sources
        FROM hashed GROUP BY 1
    )
    SELECT hd.source, count(*) AS n_docs,
           CAST(sum(CASE WHEN p.n_total > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           CAST(sum(CASE WHEN p.n_sources > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cross_source_dups,
           round(CAST(sum(CASE WHEN p.n_total > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS dup_rate
    FROM hashed hd JOIN prof p USING (h)
    GROUP BY 1 ORDER BY 1
"""


def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-SIZE distribution of the near-dup component structure —
    the macro view over `dedup_clusters`: per component size, how many
    clusters exist, what fraction of the corpus they hold, and the
    giant-component flag (the largest size band).  The shape of this
    histogram is the dedup health read: a heavy giant component means
    band collisions are chaining unrelated docs (tighten bands); a
    pure size-1/size-2 profile means near-dup families are clean
    pairs.

    One re-aggregate of the CC output (cluster → size → size
    histogram) — two tiny grouped counts on top of the clustering
    cost."""
    clusters = dedup_clusters(spark, sf_dir)
    total = clusters.count()             # bounded driver scalar
    sizes = (clusters.groupBy("cluster_id")
             .agg(F.count(F.lit(1)).alias("size")))
    maxsize = sizes.agg(F.max("size").alias("max_size"))
    return (sizes.groupBy("size")
            .agg(F.count(F.lit(1)).alias("n_clusters"))
            .crossJoin(F.broadcast(maxsize))
            .select("size", "n_clusters",
                    F.round((F.col("size") * F.col("n_clusters"))
                            .cast("double") / F.lit(float(total)), 6)
                    .alias("share_of_docs"),
                    (F.col("size") == F.col("max_size"))
                    .alias("is_giant"))
            .orderBy("size"))


EXTRA_QUERIES["dedup_cluster_sizes"] = dedup_cluster_sizes
EXTRA_ORACLES["dedup_cluster_sizes"] = f"""
    WITH clusters AS ({ORACLES["dedup_clusters"]}),
    sizes AS (
        SELECT cluster_id, count(*) AS size
        FROM clusters GROUP BY 1
    ), mx AS (SELECT max(size) AS max_size FROM sizes),
    tot AS (SELECT count(*) AS total FROM clusters)
    SELECT s.size, count(*) AS n_clusters,
           round(CAST(s.size * count(*) AS DOUBLE)
                 / CAST((SELECT total FROM tot) AS DOUBLE), 6)
               AS share_of_docs,
           s.size = (SELECT max_size FROM mx) AS is_giant
    FROM sizes s GROUP BY s.size ORDER BY s.size
"""


_PR_TAU = 0.5      # exact-Jaccard ground-truth threshold for the eval


def lsh_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PRECISION/RECALL of the MinHash-LSH candidate set
    against the exact-Jaccard ≥ 0.5 ground truth — the one-row eval
    that turns the banding configuration (4 bands × 4 rows here) into
    a measured operating point, the same way `ivf_nprobe_sweep` turns
    nprobe into one.  `minhash_calibration` reports PER-PAIR estimate
    error; this reports the SET-level consequence (how many true
    near-dup pairs the bands miss, how much junk they admit).

    Ground truth: the shared-shingle equi-join is the textbook shape
    but this corpus's bigram space is DENSE (931 distinct shingles,
    max df 338 at sf0.1 → Σdf² ≈ 70M exploded join rows, measured
    15 s), so the truth side instead DICTIONARY-ENCODES the
    vocabulary-bounded shingle space and represents each doc as a
    ⌈V/64⌉-long BITMAP: all docs' bitmaps broadcast (5000 × ~120 B),
    the pair enumeration is a map-side broadcast product with NO
    shuffle, and n_common per pair is popcount(AND) in whole-stage
    codegen (~3 s).  The in-pred flag joins the (tiny) banded
    candidate list into the same pass, so truth, pred, and their
    intersection come out of ONE aggregate.  All counts are exact
    integers; precision/recall are single divisions and F1 uses the
    pure integer identity 2·tp / (2·tp + fp + fn).  At 100 TB the
    pair product is the expensive side — there you run this on a
    deterministic document SAMPLE (the fixed-k idiom), which
    estimates both rates unbiasedly; the bitmap stays valid as long
    as the shingle vocabulary is bounded (here: yes by measurement;
    for open vocabularies fall back to the equi-join on a sample)."""
    pred = (minhash_lsh_pairs(spark, sf_dir)
            .select("doc_a", "doc_b")
            .withColumn("in_p", F.lit(1))
            .localCheckpoint(eager=True))
    docs = load_table(spark, sf_dir, "documents")
    # r9 (guide §2.4): sh feeds the dictionary AND the id join, dic is
    # executed by its own count() and again by the join — two cuts so
    # the tokenize/distinct chains run once each
    sh = shingle_table(docs, distinct=True).localCheckpoint()
    # vocabulary-bounded dictionary (the bm25 idf-broadcast premise);
    # V is a bounded driver scalar (the graph.py node-count precedent)
    from pyspark.sql.window import Window
    dic = (sh.select("shingle").distinct()
           .withColumn("sid", F.row_number().over(
               Window.orderBy("shingle")) - 1)
           .localCheckpoint())
    v = dic.count()
    nwords = (v + 63) // 64
    ids = sh.join(F.broadcast(dic), "shingle").select("doc_id", "sid")
    bm = (ids.groupBy("doc_id")
          .agg(F.collect_set("sid").alias("sids"))
          .select("doc_id",
                  F.size("sids").alias("n_sh"),
                  F.transform(
                      F.sequence(F.lit(0), F.lit(nwords - 1)),
                      lambda w: F.aggregate(
                          F.filter("sids",
                                   lambda i: F.shiftright(i, 6) == w),
                          F.lit(0).cast("long"),
                          lambda acc, i: acc.bitwiseOR(
                              F.call_function(
                                  "shiftleft", F.lit(1).cast("long"),
                                  (i % 64).cast("int")))))
                  .alias("bits"))
          .localCheckpoint(eager=True))
    # r10 (guide §2.6): the checkpointed bitmap frame inherits the
    # AQE-coalesced (single-partition at bench SF) layout of the
    # groupBy above it, so the ~12.5M-pair popcount stream below ran
    # in ONE task; one bounded keyed repartition of the streamed side
    # spreads it across the shuffle width (the pq_topk precedent)
    from ..session import shuffle_width
    ba = (bm.repartition(shuffle_width(spark), F.col("doc_id"))
          .select(F.col("doc_id").alias("doc_a"),
                  F.col("n_sh").alias("n_a"),
                  F.col("bits").alias("bits_a")))
    bb = bm.select(F.col("doc_id").alias("doc_b"),
                   F.col("n_sh").alias("n_b"),
                   F.col("bits").alias("bits_b"))
    # r9 (guide §4.1): the popcount over the ~n²/2 broadcast pair
    # product was an interpreted aggregate(zip_with(...)) — the query's
    # hot loop (~12.5M pairs × nwords lambda evaluations at sf0.1).
    # Unrolled as ONE F.expr over the construction-time-known word
    # count it whole-stage-codegens; integer addition is associative,
    # so the sum is exactly equal term-for-term.
    n_common = F.expr(
        "CAST(0 AS BIGINT) + " + " + ".join(
            f"CAST(bit_count(bits_a[{i}] & bits_b[{i}]) AS BIGINT)"
            for i in range(nwords)))
    # length filter (Arasu 2006): J >= tau forces
    # tau*max(n_a,n_b) <= min(n_a,n_b) — at tau=1/2, sizes within 2x;
    # pairs failing it can be neither truth nor true positives, so
    # pruning them BEFORE the popcount is exact (pred false positives
    # they might contain are counted from the materialized pred list)
    allp = (ba.crossJoin(F.broadcast(bb))
            .where((F.col("doc_a") < F.col("doc_b"))
                   & (F.col("n_b") <= 2 * F.col("n_a"))
                   & (F.col("n_a") <= 2 * F.col("n_b")))
            .withColumn("n_common", n_common)
            .withColumn("in_t",
                        F.when(F.round(F.col("n_common")
                                       / (F.col("n_a") + F.col("n_b")
                                          - F.col("n_common")), 6)
                               >= F.lit(float(_PR_TAU)), 1))
            .join(F.broadcast(pred), ["doc_a", "doc_b"], "left"))
    npred = pred.agg(F.count(F.lit(1)).alias("n_pred"))
    out = (allp.agg(
        F.count("in_t").alias("n_truth"),
        F.count(F.when(F.col("in_t").isNotNull()
                       & F.col("in_p").isNotNull(), 1)).alias("tp"))
        .crossJoin(F.broadcast(npred)))
    p = F.col("tp").cast("double") / F.nullif(
        F.col("n_pred").cast("double"), F.lit(0.0))
    r = F.col("tp").cast("double") / F.nullif(
        F.col("n_truth").cast("double"), F.lit(0.0))
    fp = F.col("n_pred") - F.col("tp")
    fn = F.col("n_truth") - F.col("tp")
    f1 = (F.lit(2.0) * F.col("tp").cast("double")
          / F.nullif((2 * F.col("tp") + fp + fn).cast("double"),
                     F.lit(0.0)))
    return out.select(
        "n_truth", "n_pred", "tp", fp.alias("fp"), fn.alias("fn"),
        F.round(F.coalesce(p, F.lit(0.0)), 6).alias("precision"),
        F.round(F.coalesce(r, F.lit(0.0)), 6).alias("recall"),
        F.round(F.coalesce(f1, F.lit(0.0)), 6).alias("f1"))


EXTRA_QUERIES["lsh_precision_recall"] = lsh_precision_recall
EXTRA_ORACLES["lsh_precision_recall"] = _SIG_CTE + f"""
    , bands AS ({_BANDS_UNION}),
    pred AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id
                    AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
    ),
    doc_sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' '
                        || string_split(text, ' ')[i + 1])) AS shingles
        FROM documents
    ), shx AS (
        SELECT doc_id, unnest(shingles) AS shingle,
               len(shingles) AS n_sh
        FROM doc_sh
    ), truth AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM shx a
        JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        HAVING round(count(*) / CAST(a.n_sh + b.n_sh - count(*)
                                     AS DOUBLE), 6)
               >= CAST({_PR_TAU} AS DOUBLE)
    ), agg AS (
        SELECT (SELECT count(*) FROM truth) AS n_truth,
               (SELECT count(*) FROM pred) AS n_pred,
               (SELECT count(*) FROM truth t
                JOIN pred p ON t.doc_a = p.doc_a
                           AND t.doc_b = p.doc_b) AS tp
    )
    SELECT n_truth, n_pred, tp,
           n_pred - tp AS fp, n_truth - tp AS fn,
           round(coalesce(CAST(tp AS DOUBLE)
                          / nullif(CAST(n_pred AS DOUBLE),
                                   CAST(0 AS DOUBLE)),
                          CAST(0 AS DOUBLE)), 6) AS precision,
           round(coalesce(CAST(tp AS DOUBLE)
                          / nullif(CAST(n_truth AS DOUBLE),
                                   CAST(0 AS DOUBLE)),
                          CAST(0 AS DOUBLE)), 6) AS recall,
           round(coalesce(CAST(2 AS DOUBLE) * CAST(tp AS DOUBLE)
                          / nullif(CAST(2 * tp + (n_pred - tp)
                                        + (n_truth - tp) AS DOUBLE),
                                   CAST(0 AS DOUBLE)),
                          CAST(0 AS DOUBLE)), 6) AS f1
    FROM agg
"""


_PPJ_TAU = 0.5     # Jaccard threshold (prefix arithmetic is exact at 1/2)


def prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join by prefix filtering (Chaudhuri
    et al. 2006 / Bayardo et al. 2007 / Xiao et al. 2008 PPJoin
    family): the deterministic scale path to "all pairs with Jaccard
    ≥ τ" that needs NO probabilistic sketch — where MinHash-LSH trades
    recall for speed, prefix filtering keeps exactness and prunes by
    ordering each doc's shingles by GLOBAL document frequency
    (rarest first) and joining only on each doc's first
    |d| − ⌈τ·|d|⌉ + 1 shingles: any pair meeting the overlap bound
    o ≥ ⌈τ·max(|a|,|b|)⌉ MUST collide inside those prefixes, so the
    candidate set is a superset of the answer and the exact verify
    join finishes the job.  At τ = 1/2 the prefix length is the pure
    integer ⌊|d|/2⌋ + 1 — no float in the pruning logic at all.

    Shingle WIDTH is the selectivity knob prefix filtering lives or
    dies by (Broder 1997 uses multi-word shingles for exactly this
    reason): on this corpus the shared bigram space is DENSE (931
    distinct bigrams, max df 338 at sf0.1 — every doc collides with
    every doc, 7.9M candidates, measured 73 s), while 4-word
    shingles are sparse (210k distinct, max df 6) and the prefix
    join emits exactly the true near-dup candidates (256 at sf0.1,
    sub-second verify).  So this operator shingles at w = 4 — the
    similarity it reports is 4-gram Jaccard, the near-dup notion
    Broder's original system used.

    The result set provably EQUALS the brute shared-shingle join at
    the same threshold and width — two different algorithms, one
    answer.  Scale: document frequency is a Zipf-bounded aggregate
    (broadcast), the candidate join touches only prefix rows (rare
    shingles → tiny buckets, the skew-safe direction), and
    verification is candidate-bounded (sorted-array intersection per
    candidate row, never an exploded re-join) — the standard exact
    complement to the banded sketch chain."""
    from pyspark.sql.window import Window
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.posexplode(F.split("text", " "))
                       .alias("pos", "tok"))
    ww = Window.partitionBy("doc_id").orderBy("pos")
    sh = (toks
          .withColumn("t1", F.lead("tok", 1).over(ww))
          .withColumn("t2", F.lead("tok", 2).over(ww))
          .withColumn("t3", F.lead("tok", 3).over(ww))
          .where(F.col("t3").isNotNull())
          .select("doc_id",
                  F.concat_ws(" ", "tok", "t1", "t2", "t3")
                  .alias("shingle"))
          .distinct()
          # r9 (guide §2.4): sh feeds counts, df, the ranked prefix AND
          # the verify arrays (4 uncut re-runs of the tokenize + lead
          # window + distinct chain; 16 parquet scans planned) — one cut
          .localCheckpoint())
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = (Window.partitionBy("doc_id")
         .orderBy(F.col("df").asc(), F.col("shingle").asc()))
    ranked = (sh.join(df, "shingle")
              .withColumn("rn", F.row_number().over(w))
              .join(F.broadcast(counts), "doc_id"))
    prefix = (ranked.where(F.col("rn") <= F.expr("n_sh div 2") + 1)
              # second cut: both sides of the candidate self-join
              .localCheckpoint())
    pa = prefix.select(F.col("doc_id").alias("doc_a"), "shingle")
    pb = prefix.select(F.col("doc_id").alias("doc_b"), "shingle")
    cand = (pa.join(pb, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    # verify via per-doc sorted shingle ARRAYS + array_intersect:
    # an exploded re-join would shuffle candidate×|shingles| rows;
    # intersecting two arrays per candidate row keeps the verify
    # join candidate-sized, JVM-side
    sharr = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("arr"),
        F.count(F.lit(1)).alias("n_sh"))
    verified = (cand
                .join(sharr.select(F.col("doc_id").alias("doc_a"),
                                   F.col("arr").alias("arr_a"),
                                   F.col("n_sh").alias("n_a")), "doc_a")
                .join(sharr.select(F.col("doc_id").alias("doc_b"),
                                   F.col("arr").alias("arr_b"),
                                   F.col("n_sh").alias("n_b")), "doc_b")
                .withColumn("n_common",
                            F.size(F.array_intersect("arr_a", "arr_b"))
                            .cast("bigint"))
                .where(F.col("n_common") > 0)
                .withColumn("jaccard", F.round(
                    F.col("n_common")
                    / (F.col("n_a") + F.col("n_b")
                       - F.col("n_common")), 6))
                .where(F.col("jaccard") >= F.lit(float(_PPJ_TAU))))
    return (verified.select("doc_a", "doc_b", "n_common", "jaccard")
            .orderBy("doc_a", "doc_b"))


EXTRA_QUERIES["prefix_filter_join"] = prefix_filter_join
EXTRA_ORACLES["prefix_filter_join"] = f"""
    WITH doc_sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 3),
                   i -> string_split(text, ' ')[i] || ' '
                        || string_split(text, ' ')[i + 1] || ' '
                        || string_split(text, ' ')[i + 2] || ' '
                        || string_split(text, ' ')[i + 3])) AS shingles
        FROM documents
    ), shx AS (
        SELECT doc_id, unnest(shingles) AS shingle,
               len(shingles) AS n_sh
        FROM doc_sh
    ), dfreq AS (
        SELECT shingle, count(*) AS df FROM shx GROUP BY 1
    ), ranked AS (
        SELECT s.doc_id, s.shingle, s.n_sh,
               row_number() OVER (PARTITION BY s.doc_id
                                  ORDER BY d.df ASC, s.shingle ASC)
                   AS rn
        FROM shx s JOIN dfreq d USING (shingle)
    ), pfx AS (
        SELECT doc_id, shingle FROM ranked
        WHERE rn <= n_sh // 2 + 1
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pfx a JOIN pfx b ON a.shingle = b.shingle
                             AND a.doc_id < b.doc_id
    ), verified AS (
        SELECT c.doc_a, c.doc_b, count(*) AS n_common,
               max(sa.n_sh) AS n_a, max(sb.n_sh) AS n_b
        FROM cand c
        JOIN shx sa ON sa.doc_id = c.doc_a
        JOIN shx sb ON sb.doc_id = c.doc_b
                   AND sb.shingle = sa.shingle
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           round(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 6)
               AS jaccard
    FROM verified
    WHERE round(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 6)
          >= CAST({_PPJ_TAU} AS DOUBLE)
    ORDER BY doc_a, doc_b
"""


def weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (multiset) Jaccard for every MinHash-LSH candidate
    pair: Σ_t min(c_A(t), c_B(t)) / Σ_t max(c_A(t), c_B(t)) over token
    COUNTS (Ioffe 2010's similarity, here computed exactly on the
    banded candidates) next to the plain set Jaccard — the pair that
    separates "same vocabulary" from "same vocabulary at the same
    RATE": boilerplate with one paragraph repeated 10× scores high
    weighted / lower set-wise, padded near-copies the reverse.  The
    verification-stage refinement CCNet-style dedup applies after
    banding.

    Identity used: Σmax = tot_A + tot_B − Σmin, so only the COMMON
    tokens join (never a full-outer union per pair) plus two per-doc
    totals.  All counts exact integers; two IEEE divisions per pair.

    Scale: candidates come from the banded index (never all-pairs);
    the common-token join is (pair × overlap)-bounded and token-keyed;
    per-doc totals ride the shared tokenize scan."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # r9 (guide §2.4): cnt feeds the totals and both join sides — one
    # cut so the tokenize + count chain runs once, not 3×
    cnt = (docs.select("doc_id",
                       F.explode(F.split("text", " ")).alias("token"))
           .groupBy("doc_id", "token")
           .agg(F.count(F.lit(1)).alias("c"))
           .localCheckpoint())
    tots = (cnt.groupBy("doc_id")
            .agg(F.sum("c").alias("tot"),
                 F.count(F.lit(1)).alias("nd")))
    ca = cnt.select(F.col("doc_id").alias("doc_a"), "token",
                    F.col("c").alias("ca"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"),
                    F.col("token").alias("token_b"),
                    F.col("c").alias("cb"))
    common = (pairs.join(ca, "doc_a")
              .join(cb.withColumnRenamed("token_b", "token"), ["doc_b",
                                                               "token"])
              .groupBy("doc_a", "doc_b")
              .agg(F.sum(F.least("ca", "cb")).alias("smin"),
                   F.count(F.lit(1)).alias("ninter")))
    ta = tots.select(F.col("doc_id").alias("doc_a"),
                     F.col("tot").alias("tot_a"),
                     F.col("nd").alias("nd_a"))
    tb = tots.select(F.col("doc_id").alias("doc_b"),
                     F.col("tot").alias("tot_b"),
                     F.col("nd").alias("nd_b"))
    j = (pairs.join(common, ["doc_a", "doc_b"], "left")
         .join(ta, "doc_a").join(tb, "doc_b")
         .withColumn("smin", F.coalesce("smin", F.lit(0)))
         .withColumn("ninter", F.coalesce("ninter", F.lit(0))))
    wj = (F.col("smin").cast("double")
          / (F.col("tot_a") + F.col("tot_b") - F.col("smin")))
    pj = (F.col("ninter").cast("double")
          / (F.col("nd_a") + F.col("nd_b") - F.col("ninter")))
    return (j.select("doc_a", "doc_b", "ninter",
                     F.round(pj, 6).alias("jaccard"),
                     F.round(wj, 6).alias("wjaccard"))
            .orderBy("doc_a", "doc_b"))


QUERIES["weighted_jaccard_pairs"] = weighted_jaccard_pairs
ORACLES["weighted_jaccard_pairs"] = _SIG_CTE + f"""
    , bands AS ({_BANDS_UNION}),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
    ),
    cnt AS (
        SELECT doc_id, token, count(*) AS c FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
        GROUP BY 1, 2
    ),
    tots AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot,
               count(*) AS nd
        FROM cnt GROUP BY 1
    ),
    common AS (
        SELECT p.doc_a, p.doc_b,
               CAST(sum(least(x.c, y.c)) AS BIGINT) AS smin,
               count(*) AS ninter
        FROM pairs p
        JOIN cnt x ON x.doc_id = p.doc_a
        JOIN cnt y ON y.doc_id = p.doc_b AND y.token = x.token
        GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           coalesce(c.ninter, 0) AS ninter,
           round(coalesce(c.ninter, 0)
                 / CAST(ta.nd + tb.nd - coalesce(c.ninter, 0)
                        AS DOUBLE), 6) AS jaccard,
           round(coalesce(c.smin, 0)
                 / CAST(ta.tot + tb.tot - coalesce(c.smin, 0)
                        AS DOUBLE), 6) AS wjaccard
    FROM pairs p
    LEFT JOIN common c ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b
    JOIN tots ta ON ta.doc_id = p.doc_a
    JOIN tots tb ON tb.doc_id = p.doc_b
    ORDER BY p.doc_a, p.doc_b
"""


def dedup_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture estimate of the TRUE near-duplicate pair count
    from two independent detectors (Lincoln-Petersen; Chapman 1951
    small-sample correction — the ecology estimator, reused for "how
    many dups did we MISS" data-quality reads, cf. capture-recapture
    coverage estimation in record linkage): capture 1 = the
    MinHash-LSH candidate pairs, capture 2 = the SimHash hamming≤3
    pairs; the overlap m between them plays the "marked recapture"
    role, N̂ = n₁·n₂/m (Chapman: (n₁+1)(n₂+1)/(m+1) − 1).  The gap
    between N̂ and max(n₁, n₂) is the estimated blind spot neither
    banding scheme sees — the number a recall argument needs and no
    single detector can produce.

    Both capture sets and the overlap are exact integer counts (one
    inner join on the ordered pair key); the estimates are single
    divisions, 2dp.  Independence is approximate (both detectors key
    on token content) — the standard caveat, stated here rather than
    hidden.

    Scale: rides both banded-LSH chains (each bucket-bounded, never
    all-pairs); the overlap join is pair-list-sized."""
    mh = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # r9 (guide §2.4): the SimHash capture feeds its own count AND the
    # overlap join — one cut; the MinHash side is already materialized
    # inside minhash_lsh_pairs
    sh = (simhash_neardup_pairs(spark, sf_dir).select("doc_a", "doc_b")
          .localCheckpoint())
    n1 = mh.agg(F.count(F.lit(1)).alias("n_minhash"))
    n2 = sh.agg(F.count(F.lit(1)).alias("n_simhash"))
    m = (mh.join(sh, ["doc_a", "doc_b"])
         .agg(F.count(F.lit(1)).alias("overlap")))
    lp = F.round(F.col("n_minhash").cast("double") * F.col("n_simhash")
                 / F.nullif(F.col("overlap").cast("double"),
                            F.lit(0.0)), 2)
    chap = F.round((F.col("n_minhash") + 1).cast("double")
                   * (F.col("n_simhash") + 1)
                   / (F.col("overlap") + 1) - 1, 2)
    return (n1.crossJoin(n2).crossJoin(m)
            .select("n_minhash", "n_simhash", "overlap",
                    lp.alias("lp_estimate"),
                    chap.alias("chapman_estimate")))


QUERIES["dedup_capture_recapture"] = dedup_capture_recapture
ORACLES["dedup_capture_recapture"] = f"""
    WITH mh AS (
        SELECT doc_a, doc_b FROM ({ORACLES["minhash_lsh_pairs"]})
    ), sh AS (
        SELECT doc_a, doc_b FROM ({ORACLES["simhash_neardup_pairs"]})
    ), n1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM mh),
    n2 AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM sh),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m
          FROM mh JOIN sh USING (doc_a, doc_b))
    SELECT n1 AS n_minhash, n2 AS n_simhash, m AS overlap,
           round(CAST(n1 AS DOUBLE) * n2 / nullif(m, 0), 2)
               AS lp_estimate,
           round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 2)
               AS chapman_estimate
    FROM n1 CROSS JOIN n2 CROSS JOIN m
"""
