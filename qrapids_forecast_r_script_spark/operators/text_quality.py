"""Corpus-quality operators over ``documents`` — the Gopher-style
repetition filters, n-gram language-model scoring, and DSIR-style
importance weighting a large-scale training-data pipeline runs between
raw crawl and tokenizer (north-star extension; the reference — a
forecasting service, TimeSeriesFunctions_GPL_0.5.1.R:1-406 — has no text
layer, so these extend SURVEY §2B's dedup/similarity/text row).

All four operators are pure Catalyst expressions — no Python UDFs — and
every one has an exact DuckDB oracle.  N-gram construction reuses
``dedup.shingle_table``'s explode + lead-window form (NOT nested
higher-order-function lambdas, which re-evaluate ``split(text)`` per
element access — measured at ~70 s/sf0.1 in round 1, `dedup.py:44-64`).

100 TB shape, per operator:

- repetition stats: three aggregations all keyed by ``doc_id`` — one
  logical shuffle key reused across stages, linear in corpus size.
- corpus bigram top-k: map-side partial aggregation into a global
  ``orderBy().limit(k)`` = TakeOrdered, never a full sort.
- bigram LM: two count tables (bigram, prefix) joined back on their own
  keys; the vocabulary scalar is a broadcast 1-row aggregate.
- DSIR: per-token log-ratio table joined to the token stream on the
  token key; a hot token is a skewed-join concern only if one token
  dominates the corpus — the join's build side (vocabulary) is
  bounded by vocabulary size, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources import load_table
from .dedup import shingle_table

# Gopher repetition thresholds (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", §A1.1.2):
# a document is repetitive when the most common n-gram covers too much
# of it.  Flags are computed from the ROUNDED fractions so the DuckDB
# oracle matches bit-for-bit.
_TOP_UNIGRAM_MAX = 0.20
_TOP_BIGRAM_MAX = 0.18
_TOP_TRIGRAM_MAX = 0.16

# add-k smoothing for the bigram LM (k=0.5: Jeffreys/Krichevsky–
# Trofimov; keeps unseen bigrams finite without flattening the model)
_LM_K = 0.5


def _trigram_table(docs: DataFrame) -> DataFrame:
    """(doc_id, trigram) rows — the 3-gram extension of
    ``dedup.shingle_table``: one posexplode, two lead()s, all in
    whole-stage codegen with a single shuffle on doc_id."""
    toks = (docs
            .select("doc_id", F.posexplode(F.split("text", " "))
                    .alias("pos", "tok")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (toks
            .withColumn("nxt", F.lead("tok", 1).over(w))
            .withColumn("nxt2", F.lead("tok", 2).over(w))
            .where(F.col("nxt2").isNotNull())
            .select("doc_id",
                    F.concat_ws(" ", "tok", "nxt", "nxt2").alias("trigram")))


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher repetition profile: the fraction of the
    document covered by its most common unigram / bigram / trigram, and
    the combined ``repetitive`` verdict.

    Three n-gram aggregations, each (doc_id, gram) → count → per-doc
    max/sum, joined on doc_id.  The joins are same-key and AQE turns
    them into cheap shuffle-local joins; nothing here reads the corpus
    more than three times or holds more than (doc × distinct-gram)
    state."""
    docs = load_table(spark, sf_dir, "documents")

    def _top_frac(grams: DataFrame, col: str, out: str) -> DataFrame:
        per = grams.groupBy("doc_id", col).agg(F.count(F.lit(1)).alias("c"))
        return (per.groupBy("doc_id")
                .agg(F.round(F.max("c") / F.sum("c"), 6).alias(out)))

    uni = docs.select("doc_id", F.explode(F.split("text", " ")).alias("g"))
    n_tok = uni.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    u = _top_frac(uni, "g", "top_unigram_frac")
    b = _top_frac(shingle_table(docs), "shingle", "top_bigram_frac")
    t = _top_frac(_trigram_table(docs), "trigram", "top_trigram_frac")
    return (n_tok.join(u, "doc_id").join(b, "doc_id").join(t, "doc_id")
            .withColumn("repetitive",
                        (F.col("top_unigram_frac") > _TOP_UNIGRAM_MAX)
                        | (F.col("top_bigram_frac") > _TOP_BIGRAM_MAX)
                        | (F.col("top_trigram_frac") > _TOP_TRIGRAM_MAX)))


def corpus_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams by occurrence count (ties broken
    lexicographically), with document frequency.

    ``orderBy().limit(20)`` compiles to TakeOrdered — each partition
    surrenders only its local top 20, so the global step moves 20 × P
    rows regardless of corpus size.  The rank window runs on the
    20-row result, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (shingle_table(docs)
              .groupBy(F.col("shingle").alias("bigram"))
              .agg(F.count(F.lit(1)).alias("n_occurrences"),
                   F.count_distinct("doc_id").alias("n_docs")))
    top = (counts
           .orderBy(F.col("n_occurrences").desc(), F.col("bigram").asc())
           .limit(20))
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("bigram").asc())
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "bigram", "n_occurrences", "n_docs"))


def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-probability under an add-k
    smoothed corpus bigram model — the bigram upgrade of
    ``text.doc_unigram_logprob`` (CCNet-style perplexity filtering,
    Wenzek et al. 2020, with the LM trained on the corpus itself).

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V), k = 0.5,
    V = corpus unigram vocabulary size.

    Plan: the bigram stream joins its own count table (keyed by bigram)
    and the prefix-count table (keyed by w1); V and the doc count are a
    broadcast 1-row aggregate — no driver collect, no second scan."""
    docs = load_table(spark, sf_dir, "documents")
    big = (shingle_table(docs)
           .select("doc_id", F.col("shingle").alias("bigram"),
                   F.split_part(F.col("shingle"), F.lit(" "), F.lit(1))
                   .alias("w1")))
    bc = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    pc = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (docs.select(F.explode(F.split("text", " ")).alias("tok"))
             .agg(F.count_distinct("tok").cast("double").alias("v")))
    scored = (big
              .join(bc, "bigram")
              .join(pc, "w1")
              .crossJoin(F.broadcast(vocab))
              .withColumn("neg_logprob",
                          -F.log((F.col("c2") + F.lit(_LM_K))
                                 / (F.col("c1") + F.lit(_LM_K) * F.col("v")))))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg("neg_logprob"), 6).alias("avg_neg_logprob")))


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weight per document (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    reduced to unigram features): the average over the document's tokens
    of log( p_target(tok) / p_corpus(tok) ), where the target
    distribution is estimated from the ``lang = 'en'`` subset and both
    sides use add-1 smoothing over the shared corpus vocabulary.

    ``keep`` = score > 0 (the document looks more like the target than
    like the background).  Per-token log-ratios live in a
    vocabulary-sized table joined to the token stream on the token key —
    the 100 TB cost is one keyed shuffle of the token stream; the
    vocabulary table is corpus-bounded, not stream-bounded."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang",
                       F.explode(F.split("text", " ")).alias("tok"))
    ct = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_corpus"),
        F.sum((F.col("lang") == "en").cast("long")).alias("c_target"))
    totals = ct.agg(
        F.sum("c_corpus").cast("double").alias("t_corpus"),
        F.sum("c_target").cast("double").alias("t_target"),
        F.count(F.lit(1)).cast("double").alias("v"))
    ratio = (ct.crossJoin(F.broadcast(totals))
             .select("tok",
                     (F.log((F.col("c_target") + 1)
                            / (F.col("t_target") + F.col("v")))
                      - F.log((F.col("c_corpus") + 1)
                              / (F.col("t_corpus") + F.col("v"))))
                     .alias("log_ratio")))
    return (toks.join(ratio, "tok")
            .groupBy("doc_id", "lang")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg("log_ratio"), 6).alias("dsir_score"))
            .withColumn("keep", F.col("dsir_score") > 0))


_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


def bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by pointwise mutual information:
    PMI(w1,w2) = ln(p(w1 w2) / (p(w1)·p(w2))), bigrams with count ≥ 5 —
    the classic association-mining table (phrase detection, tokenizer
    merge candidates, stop-phrase lists).

    Shape: unigram + bigram count tables (map-side partial agg), two
    equi-joins of the bigram table against the (vocabulary-bounded)
    unigram table, corpus totals as broadcast 1-row aggregates.  PMI is
    rounded to 1e-6 BEFORE ranking: ln() is a libm call whose last ulp
    differs across engines, and ranking on the rounded value (bigram
    tiebreak) keeps the top-k hash-identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cu"))
    n_tok = uni.agg(F.sum("cu").cast("double").alias("n_tok"),
                    F.lit(1).alias("one"))
    big = (shingle_table(docs)
           .groupBy(F.col("shingle").alias("bigram"))
           .agg(F.count(F.lit(1)).alias("n_ab"))
           .where(F.col("n_ab") >= _PMI_MIN_COUNT)
           .withColumn("w1", F.split_part("bigram", F.lit(" "), F.lit(1)))
           .withColumn("w2", F.split_part("bigram", F.lit(" "), F.lit(2))))
    n_big = big.agg(F.sum("n_ab").cast("double").alias("n_big"),
                    F.lit(1).alias("one"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("cu").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("cu").alias("c2"))
    pmi = F.round(
        F.log((F.col("n_ab") / F.col("n_big"))
              / ((F.col("c1") / F.col("n_tok"))
                 * (F.col("c2") / F.col("n_tok")))), 6)
    scored = (big.join(u1, "w1").join(u2, "w2")
              .withColumn("one", F.lit(1))
              .join(F.broadcast(n_tok), "one")
              .join(F.broadcast(n_big), "one")
              .select("bigram", "n_ab", pmi.alias("pmi")))
    top = (scored.orderBy(F.col("pmi").desc(), F.col("bigram").asc())
           .limit(_PMI_TOPK))
    w = Window.orderBy(F.col("pmi").desc(), F.col("bigram").asc())
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "bigram", "n_ab", "pmi"))


# CCNet head/middle/tail terciles (Wenzek et al. 2020 partition the
# crawl per language by LM perplexity into three equal buckets; training
# recipes then keep head+middle or re-weight).
_CCNET_BUCKETS = 3

# PSI drift monitoring: the industry-standard population-stability-index
# bands over fixed-width histograms (<0.1 stable, 0.1–0.25 moderate
# shift, >0.25 major shift), shares floored at 1e-4 so empty bins stay
# finite.
_PSI_BINS = 8
_PSI_EPS = 0.0001
_PSI_MODERATE = 0.1
_PSI_MAJOR = 0.25


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language perplexity terciles (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score every document with the corpus unigram LM
    (``text.doc_unigram_logprob``), then split EACH LANGUAGE into
    head / middle / tail thirds by score — the canonical quality
    partition a pretraining mixture samples from.

    ntile() runs over (rounded score, doc_id) — a total order, so the
    bucket assignment is deterministic and exactly SQL-oracled.  Scale:
    the LM scoring is the unigram operator's one keyed shuffle; the
    tercile window shuffles once on lang.  A per-lang window is the
    honest cost of exact terciles — the approximate scale path swaps in
    ``approx_percentile`` cutpoints (the percentile row documents that
    trade) without changing this operator's shape."""
    from .text import doc_unigram_logprob
    docs = load_table(spark, sf_dir, "documents")
    scored = (doc_unigram_logprob(spark, sf_dir)
              .join(docs.select("doc_id", "lang"), "doc_id"))
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_neg_logprob").asc(), F.col("doc_id").asc())
    bucket = F.ntile(_CCNET_BUCKETS).over(w)
    return (scored
            .withColumn("tercile", bucket)
            .withColumn("ppl_bucket",
                        F.when(F.col("tercile") == 1, F.lit("head"))
                        .when(F.col("tercile") == 2, F.lit("middle"))
                        .otherwise(F.lit("tail")))
            .select("doc_id", "lang", "avg_neg_logprob", "tercile",
                    "ppl_bucket"))


def source_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-drift monitor: the Population Stability
    Index of each source's document-length (``n_chars``) histogram
    against the whole-corpus histogram —
    PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i), shares floored at 1e-4.
    This is the data-quality gate a production pipeline runs per
    ingestion source per day: a crawler change or a spam flood shows up
    as a drifting length/quality profile long before eval metrics move.

    Everything is exact integer binning (global min/max + ``div`` —
    no float boundaries) followed by two tiny aggregations: the per-bin
    counts partial-agg map-side into |sources|×8 rows, the corpus
    histogram is 8 rows broadcast back, and the bin scaffold
    (sources × 8) keeps empty bins present on both engines.  ln() drift
    across libm builds is absorbed by rounding the final PSI at 1e-6
    (the PMI precedent); the drift verdict CASEs on the ROUNDED value
    so the band assignment can't flip."""
    docs = load_table(spark, sf_dir, "documents")
    rng = docs.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    # r9 (guide §2.4): cut the binned (source, bin) doc frame — the
    # per-source and corpus histograms each reference it (and their
    # totals double each branch), so the uncut plan scanned documents
    # (and re-ran the min/max agg) 4 times over
    binned = (docs.crossJoin(F.broadcast(rng))
              .select("source",
                      F.expr(f"least({_PSI_BINS - 1}, "
                             f"((n_chars - mn) * {_PSI_BINS}) "
                             f"div (mx - mn + 1))").alias("bin"))
              .localCheckpoint())
    per_src = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("c"))
    src_tot = per_src.groupBy("source").agg(F.sum("c").alias("tot"))
    corpus = (binned.groupBy("bin")
              .agg(F.count(F.lit(1)).alias("c_all")))
    corpus_tot = corpus.agg(F.sum("c_all").alias("tot_all"))
    scaffold = (src_tot
                .crossJoin(F.broadcast(corpus_tot))
                .select("source", "tot", "tot_all",
                        F.explode(F.sequence(
                            F.lit(0), F.lit(_PSI_BINS - 1))).alias("bin")))
    p = F.greatest(F.coalesce(F.col("c"), F.lit(0)) / F.col("tot"),
                   F.lit(_PSI_EPS))
    q = F.greatest(F.coalesce(F.col("c_all"), F.lit(0)) / F.col("tot_all"),
                   F.lit(_PSI_EPS))
    terms = (scaffold
             .join(per_src, ["source", "bin"], "left")
             .join(F.broadcast(corpus), "bin", "left")
             .select("source", "tot",
                     ((p - q) * F.log(p / q)).alias("term")))
    psi = F.round(F.sum("term"), 6)
    return (terms.groupBy("source")
            .agg(F.max("tot").alias("n_docs"), psi.alias("psi"))
            .withColumn("drift_level",
                        F.when(F.col("psi") > _PSI_MAJOR, F.lit("major"))
                        .when(F.col("psi") > _PSI_MODERATE,
                              F.lit("moderate"))
                        .otherwise(F.lit("stable"))))


QUERIES = {
    "doc_repetition_stats": doc_repetition_stats,
    "corpus_bigram_topk": corpus_bigram_topk,
    "doc_bigram_logprob": doc_bigram_logprob,
    "dsir_importance": dsir_importance,
    "bigram_pmi_top": bigram_pmi_top,
    "ccnet_perplexity_buckets": ccnet_perplexity_buckets,
    "source_drift_psi": source_drift_psi,
}

# DuckDB n-gram construction mirrors doc_fingerprint's oracle: index the
# split list with generate_series (positional, exactly the lead-window
# semantics — no distinct, duplicates preserved).
_GRAMS_SQL = """
    base AS (SELECT doc_id, lang, string_split(text, ' ') AS s
             FROM documents),
    uni AS (SELECT doc_id, lang, unnest(s) AS g FROM base),
    big AS (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(s) - 1),
                          i -> s[i] || ' ' || s[i + 1])) AS g
            FROM base),
    tri AS (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(s) - 2),
                          i -> s[i] || ' ' || s[i + 1] || ' ' || s[i + 2]))
                       AS g
            FROM base)
"""

ORACLES = {
    "doc_repetition_stats": f"""
        WITH {_GRAMS_SQL},
        uc AS (SELECT doc_id, g, count(*) AS c FROM uni GROUP BY 1, 2),
        bc AS (SELECT doc_id, g, count(*) AS c FROM big GROUP BY 1, 2),
        tc AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
        u AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                     round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS fu
              FROM uc GROUP BY 1),
        b AS (SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS fb
              FROM bc GROUP BY 1),
        t AS (SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS ft
              FROM tc GROUP BY 1)
        SELECT doc_id, n_tokens,
               fu AS top_unigram_frac,
               fb AS top_bigram_frac,
               ft AS top_trigram_frac,
               (fu > {_TOP_UNIGRAM_MAX} OR fb > {_TOP_BIGRAM_MAX}
                OR ft > {_TOP_TRIGRAM_MAX}) AS repetitive
        FROM u JOIN b USING (doc_id) JOIN t USING (doc_id)
    """,
    "corpus_bigram_topk": f"""
        WITH {_GRAMS_SQL},
        counts AS (
            SELECT g AS bigram, count(*) AS n_occurrences,
                   count(DISTINCT doc_id) AS n_docs
            FROM big GROUP BY 1
        ), ranked AS (
            SELECT *, row_number() OVER (ORDER BY n_occurrences DESC,
                                         bigram ASC) AS rank
            FROM counts
        )
        SELECT rank, bigram, n_occurrences, n_docs
        FROM ranked WHERE rank <= 20
    """,
    "doc_bigram_logprob": f"""
        WITH {_GRAMS_SQL},
        bigw AS (SELECT doc_id, g, string_split(g, ' ')[1] AS w1 FROM big),
        bc AS (SELECT g, count(*) AS c2 FROM bigw GROUP BY 1),
        pc AS (SELECT w1, count(*) AS c1 FROM bigw GROUP BY 1),
        vocab AS (SELECT CAST(count(DISTINCT g) AS DOUBLE) AS v FROM uni)
        SELECT doc_id, count(*) AS n_bigrams,
               round(avg(-ln((c2 + {_LM_K})
                             / (c1 + {_LM_K} * v))), 6) AS avg_neg_logprob
        FROM bigw JOIN bc USING (g) JOIN pc USING (w1) CROSS JOIN vocab
        GROUP BY doc_id
    """,
    "dsir_importance": f"""
        WITH {_GRAMS_SQL},
        ct AS (
            SELECT g AS tok, count(*) AS c_corpus,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS c_target
            FROM uni GROUP BY 1
        ), totals AS (
            SELECT CAST(sum(c_corpus) AS DOUBLE) AS t_corpus,
                   CAST(sum(c_target) AS DOUBLE) AS t_target,
                   CAST(count(*) AS DOUBLE) AS v
            FROM ct
        ), ratio AS (
            SELECT tok,
                   ln((c_target + 1) / (t_target + v))
                   - ln((c_corpus + 1) / (t_corpus + v)) AS log_ratio
            FROM ct CROSS JOIN totals
        )
        SELECT doc_id, lang, count(*) AS n_tokens,
               round(avg(log_ratio), 6) AS dsir_score,
               round(avg(log_ratio), 6) > 0 AS keep
        FROM uni JOIN ratio ON uni.g = ratio.tok
        GROUP BY doc_id, lang
    """,
}

ORACLES["bigram_pmi_top"] = f'''
    WITH {_GRAMS_SQL},
    u AS (SELECT g AS tok, count(*) AS cu FROM uni GROUP BY 1),
    ntok AS (SELECT CAST(sum(cu) AS DOUBLE) AS n_tok FROM u),
    b AS (
        SELECT g AS bigram, count(*) AS n_ab,
               string_split(g, ' ')[1] AS w1,
               string_split(g, ' ')[2] AS w2
        FROM big GROUP BY 1
        HAVING count(*) >= {_PMI_MIN_COUNT}
    ), nbig AS (SELECT CAST(sum(n_ab) AS DOUBLE) AS n_big FROM b),
    scored AS (
        SELECT b.bigram, b.n_ab,
               round(ln((b.n_ab / nb.n_big)
                     / ((u1.cu / nt.n_tok) * (u2.cu / nt.n_tok))), 6) AS pmi
        FROM b
        JOIN u u1 ON u1.tok = b.w1
        JOIN u u2 ON u2.tok = b.w2, ntok nt, nbig nb
    )
    SELECT rank, bigram, n_ab, pmi FROM (
        SELECT *, row_number() OVER (ORDER BY pmi DESC, bigram ASC) AS rank
        FROM scored)
    WHERE rank <= {_PMI_TOPK}
'''


ORACLES["ccnet_perplexity_buckets"] = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), vocab AS (
        SELECT token, count(*) AS tf FROM toks GROUP BY 1
    ), tot AS (
        SELECT count(*) AS n FROM toks
    ), scored AS (
        SELECT doc_id,
               round(avg(-ln(tf / CAST(n AS DOUBLE))), 6) AS avg_neg_logprob
        FROM toks JOIN vocab USING (token) CROSS JOIN tot
        GROUP BY doc_id
    ), lab AS (
        SELECT s.doc_id, d.lang, s.avg_neg_logprob,
               ntile({_CCNET_BUCKETS}) OVER (PARTITION BY d.lang
                   ORDER BY s.avg_neg_logprob ASC, s.doc_id ASC) AS tercile
        FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, avg_neg_logprob, tercile,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM lab
"""

ORACLES["source_drift_psi"] = f"""
    WITH rng AS (
        SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents
    ), binned AS (
        SELECT source,
               least({_PSI_BINS - 1},
                     ((n_chars - mn) * {_PSI_BINS}) // (mx - mn + 1)) AS bin
        FROM documents CROSS JOIN rng
    ), per_src AS (
        SELECT source, bin, count(*) AS c FROM binned GROUP BY 1, 2
    ), src_tot AS (
        SELECT source, sum(c) AS tot FROM per_src GROUP BY 1
    ), corpus AS (
        SELECT bin, count(*) AS c_all FROM binned GROUP BY 1
    ), corpus_tot AS (
        SELECT sum(c_all) AS tot_all FROM corpus
    ), scaffold AS (
        SELECT s.source, s.tot, ct.tot_all, r.bin
        FROM src_tot s CROSS JOIN corpus_tot ct
        CROSS JOIN range(0, {_PSI_BINS}) r(bin)
    ), terms AS (
        SELECT sc.source, sc.tot,
               (greatest(coalesce(p.c, 0) / CAST(sc.tot AS DOUBLE),
                         {_PSI_EPS})
                - greatest(coalesce(co.c_all, 0)
                           / CAST(sc.tot_all AS DOUBLE), {_PSI_EPS}))
               * ln(greatest(coalesce(p.c, 0) / CAST(sc.tot AS DOUBLE),
                             {_PSI_EPS})
                    / greatest(coalesce(co.c_all, 0)
                               / CAST(sc.tot_all AS DOUBLE), {_PSI_EPS}))
               AS term
        FROM scaffold sc
        LEFT JOIN per_src p ON p.source = sc.source AND p.bin = sc.bin
        LEFT JOIN corpus co ON co.bin = sc.bin
    ), agg AS (
        SELECT source, CAST(max(tot) AS BIGINT) AS n_docs,
               round(sum(term), 6) AS psi
        FROM terms GROUP BY source
    )
    SELECT source, n_docs, psi,
           CASE WHEN psi > {_PSI_MAJOR} THEN 'major'
                WHEN psi > {_PSI_MODERATE} THEN 'moderate'
                ELSE 'stable' END AS drift_level
    FROM agg
"""


# ---------------------------------------------------------------------------
# Round-4 addition: per-language Zipf-law fit over the term-frequency
# ranking — the corpus-health diagnostic (natural language tracks slope
# ≈ −1; a slope collapse flags boilerplate/template floods, a heavy
# tail flags OCR noise / tokenizer damage).

_ZIPF_TOP = 100      # fit over the top-100 terms per language
_ZIPF_SCALE = 1_000_000   # 1e-6 fixed-point grid for ln() values


def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of ln(freq) ~ ln(rank) over each language's top-100
    terms: slope, intercept, and R² per language (Zipf's law: slope
    near −1 on natural text).

    Determinism discipline: ln() values are snapped to the 1e-6 grid
    and converted to BIGINT micro-units BEFORE summation (the
    `nb_quality_classifier` fixed-point trick), so every OLS sum is
    exact integer arithmetic — bit-identical under any partitioning
    and on both engines; libm drift is absorbed by the grid.  Final
    slope/intercept/R² are computed from the exact sums and rounded
    6dp.

    At 100 TB: term counting is one map-side-combined shuffle on
    (lang, token); the ranking window runs over the per-lang count
    table (vocabulary-bounded); the fit consumes exactly 100 rows per
    language — a constant-size aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (docs
              .select("lang", F.explode(F.split("text", " ")).alias("tok"))
              .where(F.length("tok") > 0)
              .groupBy("lang", "tok")
              .agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
    top = (counts.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= _ZIPF_TOP))
    x = F.round(F.log(F.col("rank").cast("double")) * _ZIPF_SCALE) \
        .cast("bigint")
    y = F.round(F.log(F.col("c").cast("double")) * _ZIPF_SCALE) \
        .cast("bigint")
    pts = top.select("lang", x.alias("x"), y.alias("y"))
    s = (pts.groupBy("lang")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("y") * F.col("y")).alias("syy")))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov = (n * sxy - sx * sy).cast("double")
    varx = (n * sxx - sx * sx).cast("double")
    vary = (n * syy - sy * sy).cast("double")
    slope = cov / varx
    intercept = (sy.cast("double") - slope * sx.cast("double")) \
        / n.cast("double") / _ZIPF_SCALE
    return (s.select("lang", F.col("n").alias("n_terms"),
                     F.round(slope, 6).alias("slope"),
                     F.round(intercept, 6).alias("intercept"),
                     F.round(cov * cov / (varx * vary), 6).alias("r2"))
            .orderBy("lang"))


ORACLES["corpus_zipf_fit"] = f"""
    WITH counts AS (
        SELECT lang, word AS tok, count(*) AS c FROM (
            SELECT lang, unnest(string_split(text, ' ')) AS word
            FROM documents)
        WHERE length(word) > 0 GROUP BY 1, 2
    ), top AS (
        SELECT lang, c,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY c DESC, tok ASC) AS rank
        FROM counts QUALIFY rank <= {_ZIPF_TOP}
    ), pts AS (
        SELECT lang,
               CAST(round(ln(CAST(rank AS DOUBLE)) * {_ZIPF_SCALE})
                    AS BIGINT) AS x,
               CAST(round(ln(CAST(c AS DOUBLE)) * {_ZIPF_SCALE})
                    AS BIGINT) AS y
        FROM top
    ), s AS (
        SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM pts GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_terms,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / {_ZIPF_SCALE}, 6) AS intercept,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM s ORDER BY lang
"""


QUERIES["corpus_zipf_fit"] = corpus_zipf_fit


def source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence from the corpus language model,
    KL(P_source ‖ P_corpus) = Σ_tok p·ln(p/q) — the token-distribution
    drift monitor that complements `source_drift_psi` (which watches a
    NUMERIC column in 8 bins; this watches WHAT the source says over
    the whole vocabulary) and the per-doc `dsir_importance` (this is
    its source-level aggregate view).  A souring crawl or a template
    flood moves this number before the doc-level quality gates fire.

    No epsilon smoothing is needed: only tokens PRESENT in the source
    contribute (p > 0), and every source token exists in the corpus
    by construction (q > 0).  Each p·ln(p/q) term is snapped to the
    1e-6 BIGINT micro-grid BEFORE the per-source sum — ln() is a libm
    call whose last ulp differs across engines (the PMI/PSI
    discipline), and the exact integer sum makes aggregation order
    irrelevant.

    Scale: one tokenize pass, a (source, token) map-side-combinable
    count, and a broadcast join against the vocabulary-bounded corpus
    count table — the dsir/PMI cost envelope."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source",
                       F.explode(F.split("text", " ")).alias("tok"))
    st = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c_st"))
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("n_s"),
                                     F.count(F.lit(1)).alias("vocab_s"))
    corp = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_t"))
    n_tot = corp.agg(F.sum("c_t").alias("n_all"))
    p = F.col("c_st").cast("double") / F.col("n_s").cast("double")
    q = F.col("c_t").cast("double") / F.col("n_all").cast("double")
    terms = (st.join(s_tot, "source")
             .join(F.broadcast(corp), "tok")
             .crossJoin(F.broadcast(n_tot))
             .select("source", "n_s", "vocab_s",
                     F.round(p * F.log(p / q) * 1_000_000, 0)
                     .cast("long").alias("term_u")))
    return (terms.groupBy("source")
            .agg(F.max("n_s").alias("n_tokens"),
                 F.max("vocab_s").alias("vocab_size"),
                 F.round(F.sum("term_u").cast("double") / 1_000_000, 6)
                 .alias("kl_nats"))
            .orderBy("source"))


QUERIES["source_unigram_kl"] = source_unigram_kl
ORACLES["source_unigram_kl"] = """
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), st AS (
        SELECT source, tok, count(*) AS c_st
        FROM toks GROUP BY 1, 2
    ), s_tot AS (
        SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
               count(*) AS vocab_s
        FROM st GROUP BY 1
    ), corp AS (
        SELECT tok, count(*) AS c_t FROM toks GROUP BY 1
    ), n_tot AS (
        SELECT CAST(sum(c_t) AS BIGINT) AS n_all FROM corp
    ), terms AS (
        SELECT st.source, s_tot.n_s, s_tot.vocab_s,
               CAST(round(
                   (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                   * ln((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                        / (CAST(c_t AS DOUBLE)
                           / CAST(n_all AS DOUBLE)))
                   * 1000000, 0) AS BIGINT) AS term_u
        FROM st
        JOIN s_tot USING (source)
        JOIN corp USING (tok)
        CROSS JOIN n_tot
    )
    SELECT source, max(n_s) AS n_tokens,
           max(vocab_s) AS vocab_size,
           round(CAST(sum(term_u) AS DOUBLE) / 1000000, 6) AS kl_nats
    FROM terms GROUP BY 1 ORDER BY 1
"""


def doc_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the unigram distribution plus
    its normalized form — the vocabulary-diversity quality signal
    between raw length stats and the bigram LM: keyword-stuffed or
    template text has low entropy at any length, and normalized
    entropy H/ln(V_doc) (Pielou evenness) separates "few tokens" from
    "skewed tokens".  Filtering pipelines (Gopher-family heuristics)
    threshold on exactly this pair.

    H = ln(n) − (Σ c·ln c)/n on exact integer counts; each c·ln c
    term is snapped to the 1e-6 grid BEFORE the sum (the survival-
    curve libm-drift discipline) so both engines add identical terms.

    Scale shape: one map-side tokenize + (doc, token) count, one
    doc-keyed fold — the text-stats envelope, two narrow shuffles,
    output one row per doc."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token"))
    counts = (toks.groupBy("doc_id", "token")
              .agg(F.count(F.lit(1)).alias("c")))
    term = F.round(F.col("c") * F.log(F.col("c").cast("double")), 6)
    per_doc = (counts.groupBy("doc_id")
               .agg(F.sum("c").alias("n_tokens"),
                    F.count(F.lit(1)).alias("n_distinct"),
                    F.sum(term).alias("clogc")))
    h = (F.log(F.col("n_tokens").cast("double"))
         - F.col("clogc") / F.col("n_tokens").cast("double"))
    norm = h / F.nullif(F.log(F.col("n_distinct").cast("double")),
                        F.lit(0.0))
    return per_doc.select(
        "doc_id", "n_tokens", "n_distinct",
        F.round(h, 6).alias("entropy"),
        F.round(F.coalesce(norm, F.lit(0.0)), 6).alias("evenness"))


QUERIES["doc_entropy_scores"] = doc_entropy_scores
ORACLES["doc_entropy_scores"] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), counts AS (
        SELECT doc_id, token, count(*) AS c
        FROM toks GROUP BY 1, 2
    ), per_doc AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct,
               sum(round(c * ln(CAST(c AS DOUBLE)), 6)) AS clogc
        FROM counts GROUP BY 1
    )
    SELECT doc_id, n_tokens, n_distinct,
           round(ln(CAST(n_tokens AS DOUBLE))
                 - clogc / CAST(n_tokens AS DOUBLE), 6) AS entropy,
           round(coalesce(
               (ln(CAST(n_tokens AS DOUBLE))
                - clogc / CAST(n_tokens AS DOUBLE))
               / nullif(ln(CAST(n_distinct AS DOUBLE)), 0), 0), 6)
               AS evenness
    FROM per_doc
"""


def chao1_vocab_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness estimate + Good-Turing unseen mass over the
    corpus vocabulary, per language (Chao 1984; Good 1953) — the
    species-estimation read behind "how much NEW vocabulary would
    more crawl buy?": V_chao1 = V + f1²/(2·f2) extrapolates total
    vocabulary from the singleton/doubleton counts, and the
    Good-Turing mass f1/N is the probability the NEXT token is
    unseen — the coverage duals of `vocab_coverage_curve` (which
    reads the seen side).  A source where f1/N stays high is not
    converging — more data genuinely helps; near zero means the
    vocabulary is saturated and more crawl buys only duplicates.

    All inputs are exact integer frequencies-of-frequencies; the two
    estimates are single IEEE divisions.  Scale: one (lang, token)
    count, one frequency-of-frequency fold, a 3-integer row per
    language — the vocabulary stage is the only shuffle and it is
    the same one every lexical operator here shares."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("token"))
    vocab = (toks.groupBy("lang", "token")
             .agg(F.count(F.lit(1)).alias("c")))
    per_lang = (vocab.groupBy("lang")
                .agg(F.count(F.lit(1)).alias("v_seen"),
                     F.sum("c").alias("n_tokens"),
                     F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                     .alias("f1"),
                     F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
                     .alias("f2")))
    chao = (F.col("v_seen")
            + F.col("f1").cast("double") * F.col("f1")
            / (2.0 * F.nullif(F.col("f2").cast("double"), F.lit(0.0))))
    gt = F.col("f1").cast("double") / F.col("n_tokens").cast("double")
    return (per_lang.select(
        "lang", "n_tokens", "v_seen", "f1", "f2",
        F.round(F.coalesce(chao, F.col("v_seen").cast("double")), 4)
        .alias("chao1_vocab"),
        F.round(gt, 6).alias("unseen_mass"))
        .orderBy("lang"))


QUERIES["chao1_vocab_estimate"] = chao1_vocab_estimate
ORACLES["chao1_vocab_estimate"] = """
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), vocab AS (
        SELECT lang, token, count(*) AS c FROM toks GROUP BY 1, 2
    ), per_lang AS (
        SELECT lang, count(*) AS v_seen,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f1,
               CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f2
        FROM vocab GROUP BY 1
    )
    SELECT lang, n_tokens, v_seen, f1, f2,
           round(coalesce(
               v_seen + CAST(f1 AS DOUBLE) * f1
                        / (2.0 * nullif(CAST(f2 AS DOUBLE), 0)),
               CAST(v_seen AS DOUBLE)), 4) AS chao1_vocab,
           round(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
               AS unseen_mass
    FROM per_lang ORDER BY lang
"""


_KN_D = 0.75     # absolute discount (Kneser-Ney's standard value)


def kneser_ney_bigram_logprob(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-document average negative log-probability under an
    INTERPOLATED KNESER-NEY bigram model (Kneser & Ney 1995; Chen &
    Goodman 1999 found it the best-performing classical smoother) —
    the principled upgrade of the add-k `doc_bigram_logprob`: instead
    of flat pseudo-counts, absolute discounting D = 0.75 frees mass
    proportional to the DISTINCT continuations of each prefix, and
    the backoff distribution is the CONTINUATION probability
    P_cont(w2) = N1+(.w2)/B (how many distinct contexts w2 follows,
    over B distinct bigram types) — the "San Francisco" correction:
    a word frequent only inside one collocation gets a small backoff
    weight no matter how high its raw unigram count.

        P(w2|w1) = (max(c12 - D, 0) + D * N1+(w1.) * N1+(.w2) / B)
                   / c(w1.)

    Exactness: all five count families (c12, c(w1.), N1+(w1.),
    N1+(.w2), B) are exact integer aggregates off ONE shared bigram
    stream; each bigram's -ln P snaps to the 1e-6 grid and the
    per-doc mean is an integer-sum of those micro-units divided once
    — engine-order-proof (the `bm25_topk` discipline).

    Scale: the bigram stream joins its own count table (bigram key)
    and two prefix/continuation tables (w1 / w2 keys) — three keyed
    joins over the token stream, each vocabulary-bounded on the
    build side; B is a broadcast 1-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    big = (shingle_table(docs)
           .select("doc_id", F.col("shingle").alias("bigram"),
                   F.split_part(F.col("shingle"), F.lit(" "), F.lit(1))
                   .alias("w1"),
                   F.split_part(F.col("shingle"), F.lit(" "), F.lit(2))
                   .alias("w2")))
    bc = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    pc = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"),
                               F.count_distinct("w2").alias("n1p_w1"))
    cc = big.groupBy("w2").agg(F.count_distinct("w1").alias("n1p_w2"))
    btypes = bc.agg(F.count(F.lit(1)).cast("double").alias("b"))
    p = ((F.greatest(F.col("c12") - F.lit(_KN_D), F.lit(0.0))
          + F.lit(_KN_D) * F.col("n1p_w1") * F.col("n1p_w2")
          / F.col("b"))
         / F.col("c1"))
    scored = (big
              .join(bc, "bigram")
              .join(pc, "w1")
              .join(cc, "w2")
              .crossJoin(F.broadcast(btypes))
              .withColumn("nlu", F.round(-F.log(p) * 1e6, 0)
                          .cast("bigint")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.sum("nlu").cast("double")
                         / F.count(F.lit(1)) / 1e6, 6)
                 .alias("kn_avg_neg_logprob"))
            .orderBy("doc_id"))


QUERIES["kneser_ney_bigram_logprob"] = kneser_ney_bigram_logprob
ORACLES["kneser_ney_bigram_logprob"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), big AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
    ), bc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM big GROUP BY 1, 2
    ), pc AS (
        SELECT w1, CAST(count(*) AS BIGINT) AS c1,
               CAST(count(DISTINCT w2) AS BIGINT) AS n1p_w1
        FROM big GROUP BY 1
    ), cc AS (
        SELECT w2, CAST(count(DISTINCT w1) AS BIGINT) AS n1p_w2
        FROM big GROUP BY 1
    ), bt AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM bc),
    scored AS (
        SELECT g.doc_id,
               CAST(round(-ln((greatest(c.c12 - {_KN_D}, 0.0)
                               + {_KN_D} * p.n1p_w1 * cx.n1p_w2 / t.b)
                              / p.c1) * 1e6, 0) AS BIGINT) AS nlu
        FROM big g
        JOIN bc c ON c.w1 = g.w1 AND c.w2 = g.w2
        JOIN pc p ON p.w1 = g.w1
        JOIN cc cx ON cx.w2 = g.w2
        CROSS JOIN bt t
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(nlu) AS DOUBLE) / count(*) / 1e6, 6)
               AS kn_avg_neg_logprob
    FROM scored GROUP BY doc_id
    ORDER BY doc_id
"""


_GMM_ITERS = 2   # unrolled EM iterations


def doc_length_gmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component Gaussian mixture over ln(doc length) fit by TWO
    UNROLLED EM iterations (Dempster-Laird-Rubin 1977) — the
    model-based upgrade of the winsorize/tercile length heuristics:
    documents come from latent short/long regimes, and the fitted
    (pi, mu, sigma²) pair plus each regime's share is the read a
    curation mix policy consumes.  Deterministic quantile init
    (below/above the exact median defines the two starting
    populations — no RNG), then each EM step is the textbook E
    (per-row posterior responsibilities) + M (responsibility-weighted
    moments).

    Determinism: x = ln(n_chars) snaps to 1e-6 per row;
    responsibilities snap to 1e-9; every M-step moment BIGINT-sums
    1e-9-snapped r, r·x, r·x² terms, so each iteration's parameters
    are ratios of order-proof integer sums; the unrolled trace is
    replayed identically by both engines (and by the python test).

    Scale: the E-step is map-side against 6 broadcast scalars; each
    M-step is ONE aggregate — the standard distributed-EM shape
    (sufficient statistics reduce, parameters broadcast back); the
    unroll count is the knob."""
    docs = load_table(spark, sf_dir, "documents")
    x = (docs.select(F.round(F.log("n_chars"), 6).alias("x"))
         .localCheckpoint(eager=True))
    med = x.agg(F.expr("percentile(x, 0.5)").alias("med"))
    side = x.crossJoin(F.broadcast(med)).withColumn(
        "lo", (F.col("x") <= F.col("med")).cast("int"))

    def su(col):
        return F.sum(F.round(col * 1e9, 0).cast("bigint"))

    init = (side.groupBy("lo")
            .agg(F.count(F.lit(1)).alias("n"), su(F.col("x")).alias("sx"),
                 su(F.col("x") * F.col("x")).alias("sxx")))
    tot = init.agg(F.sum("n").alias("n_all"))
    params = (init.crossJoin(F.broadcast(tot))
              .select(F.col("lo").alias("k"),
                      (F.col("n") / F.col("n_all")).alias("pi"),
                      (F.col("sx") / 1e9 / F.col("n")).alias("mu"),
                      (F.col("sxx") / 1e9 / F.col("n")
                       - (F.col("sx") / 1e9 / F.col("n"))
                       * (F.col("sx") / 1e9 / F.col("n")))
                      .alias("s2")))
    for _ in range(_GMM_ITERS):
        p0 = params.where(F.col("k") == 0).select(
            F.col("pi").alias("pi0"), F.col("mu").alias("mu0"),
            F.col("s2").alias("s20"))
        p1 = params.where(F.col("k") == 1).select(
            F.col("pi").alias("pi1"), F.col("mu").alias("mu1"),
            F.col("s2").alias("s21"))
        e = x.crossJoin(F.broadcast(p0)).crossJoin(F.broadcast(p1))
        d0 = (F.col("pi0") / F.sqrt(F.col("s20"))
              * F.exp(-(F.col("x") - F.col("mu0"))
                      * (F.col("x") - F.col("mu0"))
                      / (2 * F.col("s20"))))
        d1 = (F.col("pi1") / F.sqrt(F.col("s21"))
              * F.exp(-(F.col("x") - F.col("mu1"))
                      * (F.col("x") - F.col("mu1"))
                      / (2 * F.col("s21"))))
        e = e.withColumn("r0", F.round(d0 / (d0 + d1), 9))
        m = e.agg(F.count(F.lit(1)).alias("n_all"),
                  su(F.col("r0")).alias("sr0"),
                  su(F.col("r0") * F.col("x")).alias("srx0"),
                  su(F.col("r0") * F.col("x") * F.col("x"))
                  .alias("srxx0"),
                  su(1 - F.col("r0")).alias("sr1"),
                  su((1 - F.col("r0")) * F.col("x")).alias("srx1"),
                  su((1 - F.col("r0")) * F.col("x") * F.col("x"))
                  .alias("srxx1"))
        rows = []
        for k in (0, 1):
            rows.append(m.select(
                F.lit(k).cast("int").alias("k"),
                (F.col(f"sr{k}") / 1e9 / F.col("n_all")).alias("pi"),
                (F.col(f"srx{k}") / F.col(f"sr{k}").cast("double"))
                .alias("mu"),
                (F.col(f"srxx{k}") / F.col(f"sr{k}").cast("double")
                 - (F.col(f"srx{k}") / F.col(f"sr{k}").cast("double"))
                 * (F.col(f"srx{k}") / F.col(f"sr{k}").cast("double")))
                .alias("s2")))
        params = rows[0].union(rows[1])
    return (params.select("k", F.round("pi", 6).alias("pi"),
                          F.round("mu", 6).alias("mu"),
                          F.round("s2", 6).alias("sigma2"))
            .orderBy("k"))


QUERIES["doc_length_gmm"] = doc_length_gmm


def _gmm_em_sql(prev: str, it: int) -> str:
    """One EM iteration as SQL CTEs (e{it}, m{it}, params{it})."""
    d0 = (f"(p.pi0 / sqrt(p.s20)) * exp(-(x.x - p.mu0) * (x.x - p.mu0)"
          f" / (2 * p.s20))")
    d1 = (f"(p.pi1 / sqrt(p.s21)) * exp(-(x.x - p.mu1) * (x.x - p.mu1)"
          f" / (2 * p.s21))")
    return f"""
    wide{it} AS (
        SELECT max(CASE WHEN k = 0 THEN pi END) AS pi0,
               max(CASE WHEN k = 0 THEN mu END) AS mu0,
               max(CASE WHEN k = 0 THEN s2 END) AS s20,
               max(CASE WHEN k = 1 THEN pi END) AS pi1,
               max(CASE WHEN k = 1 THEN mu END) AS mu1,
               max(CASE WHEN k = 1 THEN s2 END) AS s21
        FROM {prev}
    ), e{it} AS (
        SELECT x.x, round({d0} / ({d0} + {d1}), 9) AS r0
        FROM xs x CROSS JOIN wide{it} p
    ), m{it} AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all,
               CAST(sum(CAST(round(r0 * 1e9, 0) AS BIGINT))
                    AS BIGINT) AS sr0,
               CAST(sum(CAST(round(r0 * x * 1e9, 0) AS BIGINT))
                    AS BIGINT) AS srx0,
               CAST(sum(CAST(round(r0 * x * x * 1e9, 0) AS BIGINT))
                    AS BIGINT) AS srxx0,
               CAST(sum(CAST(round((1 - r0) * 1e9, 0) AS BIGINT))
                    AS BIGINT) AS sr1,
               CAST(sum(CAST(round((1 - r0) * x * 1e9, 0) AS BIGINT))
                    AS BIGINT) AS srx1,
               CAST(sum(CAST(round((1 - r0) * x * x * 1e9, 0)
                             AS BIGINT)) AS BIGINT) AS srxx1
        FROM e{it}
    ), params{it} AS (
        SELECT 0 AS k, sr0 / 1e9 / n_all AS pi,
               srx0 / CAST(sr0 AS DOUBLE) AS mu,
               srxx0 / CAST(sr0 AS DOUBLE)
               - (srx0 / CAST(sr0 AS DOUBLE))
                 * (srx0 / CAST(sr0 AS DOUBLE)) AS s2
        FROM m{it}
        UNION ALL
        SELECT 1, sr1 / 1e9 / n_all,
               srx1 / CAST(sr1 AS DOUBLE),
               srxx1 / CAST(sr1 AS DOUBLE)
               - (srx1 / CAST(sr1 AS DOUBLE))
                 * (srx1 / CAST(sr1 AS DOUBLE))
        FROM m{it}
    )"""


ORACLES["doc_length_gmm"] = f"""
    WITH xs AS (
        SELECT round(ln(n_chars), 6) AS x FROM documents
    ), med AS (SELECT median(x) AS med FROM xs),
    init AS (
        SELECT CAST(x <= m.med AS INT) AS lo,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(x * 1e9, 0) AS BIGINT)) AS BIGINT)
                   AS sx,
               CAST(sum(CAST(round(x * x * 1e9, 0) AS BIGINT))
                    AS BIGINT) AS sxx
        FROM xs CROSS JOIN med m GROUP BY 1
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM init),
    params0 AS (
        -- orientation matches the Spark side: k = lo, so k=1 is the
        -- below-median component, k=0 the above-median one; both
        -- engines keep the labels STABLE across iterations
        SELECT CAST(lo AS INT) AS k,
               n / CAST(t.n_all AS DOUBLE) AS pi,
               sx / 1e9 / n AS mu,
               sxx / 1e9 / n - (sx / 1e9 / n) * (sx / 1e9 / n) AS s2
        FROM init CROSS JOIN tot t
    ), {_gmm_em_sql("params0", 1).lstrip()},
    {_gmm_em_sql("params1", 2).lstrip()}
    SELECT CAST(k AS INT) AS k, round(pi, 6) AS pi,
           round(mu, 6) AS mu, round(s2, 6) AS sigma2
    FROM params2 ORDER BY k
"""


_BURST_TOP = 20
_BURST_MIN_DOCS = 5    # term must appear in >= this many docs


def term_burstiness_topk(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Top-20 BURSTIEST terms (Church & Gale 1995; Katz 1996): the
    variance-to-mean ratio (Fano factor) of a term's per-document
    count, over docs that CONTAIN it — a term with VMR >> 1 clumps
    (appears many times in few documents: a topical/boilerplate
    marker), VMR ~ 1 is Poisson background (function words scatter
    evenly).  The burstiness axis is orthogonal to frequency — two
    terms with identical corpus counts can sit at opposite ends —
    and it is the signal behind adaptive LMs, keyword weighting, and
    the repeated-span dedup heuristics: bursty terms are where
    near-dup spans live.

    Per qualifying term (>= 5 containing docs): document frequency,
    total count, mean, VMR (sample variance / mean) — ranked by VMR
    with term ties ascending.  Exactness: counts are exact integers;
    the variance comes from BIGINT (n, sum, sum-of-squares); two
    divisions per term.

    Scale: one (doc, term) count aggregate off the shared token
    scan, one vocabulary-keyed moment aggregate, one TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (docs.select("doc_id",
                      F.explode(F.split("text", " ")).alias("term"))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("c")))
    a = (tf.groupBy("term")
         .agg(F.count(F.lit(1)).alias("df"),
              F.sum("c").alias("s"),
              F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
              .alias("ss"))
         .where(F.col("df") >= _BURST_MIN_DOCS))
    n = F.col("df").cast("double")
    mean = F.col("s").cast("double") / n
    var = ((F.col("ss").cast("double")
            - n * mean * mean) / (n - 1))
    vmr = F.round(var / mean, 6)
    from pyspark.sql.window import Window
    w = Window.orderBy(F.col("vmr").desc(), F.col("term").asc())
    return (a.withColumn("vmr", vmr)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _BURST_TOP)
            .select("rank", "term", "df",
                    F.col("s").alias("total_count"),
                    F.round(mean, 6).alias("mean_per_doc"), "vmr")
            .orderBy("rank"))


QUERIES["term_burstiness_topk"] = term_burstiness_topk
ORACLES["term_burstiness_topk"] = f"""
    WITH tf AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), cnt AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
        FROM tf GROUP BY 1, 2
    ), a AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
        FROM cnt GROUP BY 1
        HAVING count(*) >= {_BURST_MIN_DOCS}
    ), scored AS (
        SELECT term, df, s,
               CAST(s AS DOUBLE) / df AS mean,
               round(((CAST(ss AS DOUBLE)
                       - df * (CAST(s AS DOUBLE) / df)
                         * (CAST(s AS DOUBLE) / df)) / (df - 1))
                     / (CAST(s AS DOUBLE) / df), 6) AS vmr
        FROM a
    )
    SELECT CAST(row_number() OVER (ORDER BY vmr DESC, term ASC)
                AS INT) AS rank,
           term, df, s AS total_count,
           round(mean, 6) AS mean_per_doc, vmr
    FROM scored
    QUALIFY rank <= {_BURST_TOP}
    ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Round-9: vocabulary richness estimation (Chao1 + Good-Turing).


def vocab_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much vocabulary has the crawl NOT seen yet?  Chao1 species-
    richness estimate (Chao 1984, the bias-corrected form
    V + n1(n1−1)/(2(n2+1))) plus the Good-Turing unseen-probability
    mass P0 = n1/N — both computed from the frequency SPECTRUM
    (singleton and doubleton type counts).  The curation read behind
    "is more crawling still buying vocabulary?": a large Chao1 gap and
    a fat P0 say the corpus undersamples its domain (more data will
    keep finding new types — the Heaps-law growth
    `corpus_heaps_law` fits directly); near-zero says vocabulary has
    saturated and further crawl budget buys only repetition.

    Exactness: every input (V, n1, n2, N) is an exact integer from two
    grouped aggregates; the estimates are single divisions rounded
    6dp.  Scale: one token aggregate (map-side combined, vocabulary-
    bounded output) + one spectrum aggregate over type counts —
    nothing heavier than the Zipf fit next door."""
    docs = load_table(spark, sf_dir, "documents")
    types = (docs.select(F.explode(F.split("text", " ")).alias("tok"))
             .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")))
    spec = types.agg(
        F.count(F.lit(1)).alias("v_types"),
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("cnt") == 2, 1).otherwise(0)).alias("n2"))
    # the unseen-term is computed ONCE and added — (v + x) − v in IEEE
    # is not x, so deriving the term by subtraction would drift from
    # the oracle's direct form.  The numerator multiplies in EXACT
    # integer arithmetic before the cast: double 0.0 * -1 is -0.0,
    # whose bit pattern fails the driver's value hash even though
    # -0.0 == 0.0 (the r9 red row).
    unseen = ((F.col("n1") * (F.col("n1") - 1)).cast("double")
              / (2.0 * (F.col("n2") + 1)))
    p0 = F.col("n1").cast("double") / F.col("n_tokens").cast("double")
    return spec.select(
        "v_types", "n_tokens", "n1", "n2",
        F.round(F.col("v_types") + unseen, 6).alias("chao1_richness"),
        F.round(unseen, 6).alias("unseen_types_est"),
        F.round(p0, 6).alias("gt_unseen_mass"),
        F.round(1.0 - p0, 6).alias("gt_coverage"))


QUERIES["vocab_chao1_richness"] = vocab_chao1_richness
ORACLES["vocab_chao1_richness"] = """
    WITH types AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY tok
    ), spec AS (
        SELECT CAST(count(*) AS BIGINT) AS v_types,
               CAST(sum(cnt) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2
        FROM types
    )
    SELECT v_types, n_tokens, n1, n2,
           round(v_types + CAST(n1 * (n1 - 1) AS DOUBLE)
                 / (2.0 * (n2 + 1)), 6) AS chao1_richness,
           round(CAST(n1 * (n1 - 1) AS DOUBLE) / (2.0 * (n2 + 1)), 6)
               AS unseen_types_est,
           round(CAST(n1 AS DOUBLE) / n_tokens, 6) AS gt_unseen_mass,
           round(1.0 - CAST(n1 AS DOUBLE) / n_tokens, 6)
               AS gt_coverage
    FROM spec
"""
