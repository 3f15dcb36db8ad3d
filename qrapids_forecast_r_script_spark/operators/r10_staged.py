"""Round-10 STAGED operators — implemented, tested, and oracle-validated
in round 9, but deliberately NOT registered: the r9 net-new registration
budget (<= +10 per round while the driver backlog drains, VERDICT r8
item 1) was already spent on the ten r9 statistics.  Registering these
is r10's one-line move: add ``(r10_staged.QUERIES, r10_staged.ORACLES)``
to ``__spark_entry__._registries()``'s block list, re-derive the driver
window with ``tools/rotation_window.py``, and strict-audit on
registration per the standing policy.  ``tests/test_r10_staged.py``
already pins Spark<->DuckDB parity, a brute-force python replay of each
statistic, and the fact that these names are NOT in the live registry.

Operator classes the 419-query registry still lacks:

- ``events_cvm_drift`` — the two-sample Cramér-von Mises drift test
  (Anderson 1962), the INTEGRATED-distance sibling of the max-distance
  KS monitor `events_ks_drift`: KS sees the single worst ECDF gap, CvM
  sums the squared gap over the whole distribution, so a broad small
  shift that never produces one large gap (the gradual-drift signature)
  crosses CvM's threshold first.
- ``balance_conversion_catrend`` — the Cochran-Armitage trend test
  (Cochran 1954, Armitage 1955), the ORDERED-alternative test for
  proportions the chi-square independence audit cannot express: is the
  high-value-conversion rate monotonically trending across ordered
  account-balance buckets?  Chi-square asks "any difference"; CA asks
  "a trend in dose order" with one degree of freedom.
- ``bleu_neardup_pairs`` — corpus-analytics BLEU-2 (Papineni et al.
  2002) over the MinHash-LSH candidate pairs: clipped n-gram precision
  + brevity penalty says HOW literal each near-duplicate is, the
  MT-eval metric applied as a dedup-audit lens (est_jaccard estimates
  set overlap; BLEU weighs repeated-token multiplicity and length
  asymmetry the set view discards).
- ``embedding_mmd2_drift`` — quadratic-kernel Maximum Mean Discrepancy
  (Gretton et al. 2012) between the deterministic embedding snapshot
  halves, collapsed to the Frobenius distance of mean second-moment
  matrices so no pairwise kernel sum ever materializes: the
  SHAPE-sensitive drift monitor next to the mean-only
  `embedding_drift_centroids`.
- ``events_kuiper_tod_drift`` — the Kuiper two-sample test (Kuiper
  1960) on the time-of-day distribution: the rotation-invariant KS
  variant whose sensitivity does not die at the midnight wrap-around,
  i.e. the CORRECT drift test for circular hour-of-day data (the
  `circular_stats` lesson applied to monitoring).
- ``ab_ratio_metric_delta`` — the delta-method readout for RATIO
  metrics under cluster (user-level) randomization (Deng, Knoblich &
  Lu 2018): the one standard A/B analysis the family still lacked —
  per-event metrics whose unit of analysis differs from the unit of
  randomization, where the naive per-event variance is simply wrong.
- ``retrieval_rbo_eval`` — Rank-Biased Overlap (Webber, Moffat &
  Zobel 2010) of the PQ index's top-k against the exact top-k: the
  top-weighted list-similarity designed for indefinite rankings,
  answering "does the ANN index show the same first page" next to
  NDCG/AP/MRR.
- ``balance_stump_split`` — the LightGBM/XGBoost histogram split
  finder (Ke et al. 2017; Chen & Guestrin 2016): 256 all-integer
  fixed-width bins, per-bin label counts, Gini-gain scan on the
  bounded grid — the supervised WHERE-to-cut-a-continuous-feature
  primitive the categorical WoE/IV screen doesn't cover, and the
  at-scale answer to split finding (never a fact-grain sort).
- ``user_type_cochran_q`` — Cochran's Q (Cochran 1950): the
  matched-blocks equal-rates test across the k event types' HIGH-VALUE
  adoption, conditioning on each user's breadth — the k-treatment
  generalization of the registered McNemar, and the matched-design
  question `chi_square_independence` (independent draws) cannot ask.
- ``spend_trend_jonckheere`` — the Jonckheere-Terpstra ordered-
  alternative trend test (Terpstra 1952; Jonckheere 1954) of customer
  spend across ordered balance doses: the continuous-outcome sibling
  of the Cochran-Armitage proportions trend and the ordered upgrade of
  Kruskal-Wallis, with exact-integer 2J off dose/value-partitioned
  prefix grids and the tie-corrected Hollander-Wolfe null moments.

(An Anderson-Darling two-sample variant was considered and dropped:
its Scholz-Stephens normalization needs the O(N) harmonic-sum spine
per group for sigma_N — implementable, but the KS/CvM/Kuiper trio
already spans max-gap / integrated / circular sensitivity, and a
Moore-Lewis cross-entropy selector was dropped as a near-duplicate of
the registered `dsir_importance`.)

Scale shapes: CvM is the `events_ks_drift` plan verbatim (one grouped
count by (type, value), per-type running sums over the DISTINCT value
grid, one aggregate — never a raw-row sort) with the squared-gap sum
kept as an exact 128-bit integer (decimal(38,0) / HUGEINT) until one
final division; CA trend is two grouped aggregates over
orders |x| customer with a dimension-sized dose table (the WoE target
precedent); BLEU joins per-pair n-gram counts only over the LSH-bounded
candidate set — fan-out is pair-count x doc-length, never corpus².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources import load_table
from .data_quality import _KS_SPLIT_DAYS
from .dedup import _BANDS_UNION, _SIG_CTE, minhash_lsh_pairs

# Upper 5% point of the limiting distribution of the two-sample CvM
# statistic T (the omega² law; Anderson & Darling 1952, Table 1) —
# inlined literal, no in-engine distribution math.
_CVM_CRIT_05 = 0.461361

# Cochran-Armitage dose width: thousand-dollar account-balance buckets
# over exact integer cents (floor of an exact-integer/1e5 ratio — the
# boundary can only move if cents is an exact multiple, where the
# double ratio is exact on both engines).
_CA_DOSE_CENTS = 100000


def events_cvm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises drift test per event type: first
    ``_KS_SPLIT_DAYS`` days of the feed vs the rest (Anderson 1962's
    two-sample form, in the ECDF-integral definition that stays exact
    under ties):

        T = N·M/(N+M)² · Σ_pooled (F_N(x) − G_M(x))²

    summed over every pooled OBSERVATION (distinct values weighted by
    pooled multiplicity).  With cume/cuml the running early/late counts
    over the ordered distinct-value grid, the numerator
    S = Σ m_x·(M·cume − N·cuml)² is exact 128-bit integer arithmetic
    (decimal(38,0) here, HUGEINT in the oracle) and T = S/(N·M·(N+M)²)
    is ONE division of exact integers.  Drift flags at the asymptotic
    5% point 0.461 of the omega² limiting law (inlined literal).

    Why next to KS: KS is the max ECDF gap, CvM the integrated squared
    gap — a broad 2% shift across the whole range moves CvM long before
    any single point-gap crosses the KS line.  Same plan as
    `events_ks_drift` (one grouped count, per-type running sums on the
    distinct grid, one aggregate); at 100x only the (type, value) count
    grows, and it stays key-partitioned."""
    ev = load_table(spark, sf_dir, "events")
    mind = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    sided = (ev.crossJoin(F.broadcast(mind))
             .select("event_type", "value",
                     (F.to_date("ts")
                      < F.date_add(F.col("d0"), _KS_SPLIT_DAYS))
                     .alias("early")))
    counts = (sided.groupBy("event_type", "value")
              .agg(F.sum(F.when(F.col("early"), 1).otherwise(0))
                   .alias("ce"),
                   F.sum(F.when(~F.col("early"), 1).otherwise(0))
                   .alias("cl")))
    wv = (Window.partitionBy("event_type").orderBy("value")
          .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("event_type")
    cum = (counts
           .withColumn("cume", F.sum("ce").over(wv))
           .withColumn("cuml", F.sum("cl").over(wv))
           .withColumn("ne", F.sum("ce").over(wt))
           .withColumn("nl", F.sum("cl").over(wt)))
    gap = (F.col("nl").cast("decimal(38,0)") * F.col("cume")
           - F.col("ne").cast("decimal(38,0)") * F.col("cuml"))
    term = (F.col("ce") + F.col("cl")).cast("decimal(38,0)") * gap * gap
    agg = (cum.groupBy("event_type")
           .agg(F.max("ne").alias("n_early"),
                F.max("nl").alias("n_late"),
                F.sum(term).alias("s")))
    denom = (F.col("n_early").cast("double") * F.col("n_late")
             * (F.col("n_early") + F.col("n_late"))
             * (F.col("n_early") + F.col("n_late")))
    return (agg
            .withColumn("cvm_t",
                        F.round(F.col("s").cast("double") / denom, 6))
            .withColumn("cvm_crit", F.lit(_CVM_CRIT_05))
            .withColumn("drift_detected",
                        F.col("cvm_t") > F.col("cvm_crit"))
            .select("event_type", "n_early", "n_late", "cvm_t",
                    "cvm_crit", "drift_detected")
            .orderBy("event_type"))


def balance_conversion_catrend(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test of the high-value-conversion rate
    across ordered account-balance buckets (Cochran 1954, Armitage
    1955 — the 1-df ordered-alternative test `chi_square_independence`
    cannot express).  Subjects = customers; outcome = placed at least
    one order above the global mean order value (the exact-integer-
    cents target of `woe_information_value`); dose score s_k = the
    thousand-dollar balance bucket floor(cents/1e5), an equally-spaced
    integer score (CA admits any monotone scores).

    With N subjects, R converters, and per-dose (n_k, r_k):

        z = (N·Σs_k r_k − R·Σs_k n_k)
            / sqrt( R(N−R)·(N·Σs_k²n_k − (Σs_k n_k)²) / N )

    — algebraically √N·corr(score, outcome), which the brute-force
    replay test pins.  Every sum is an exact integer (128-bit products
    per the discipline); z is one division of exact integers, snapped
    6dp, verdict at |z| > 1.96.  Output: the per-dose conversion table
    with the global test columns attached.

    Scale: one orders pass for the mean (1-row broadcast), one
    orders->distinct-converter aggregate keyed on custkey, one
    customer-side bucket projection, a dose-sized aggregate — the test
    itself runs on the #doses-row table."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice")
    yc = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    priced = orders.select("o_custkey", yc.alias("yc"))
    mean = priced.agg((F.sum("yc") / F.count(F.lit(1))).alias("mu"))
    conv = (priced.crossJoin(F.broadcast(mean))
            .where(F.col("yc") > F.col("mu"))
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
            .withColumn("converted", F.lit(1)))
    balcents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    dosed = (cust
             .join(conv, "c_custkey", "left")
             .select(F.floor(balcents / F.lit(float(_CA_DOSE_CENTS)))
                     .cast("int").alias("dose"),
                     F.coalesce(F.col("converted"), F.lit(0))
                     .alias("y")))
    per = (dosed.groupBy("dose")
           .agg(F.count(F.lit(1)).alias("n_customers"),
                F.sum("y").alias("n_converted")))
    d = F.col("dose").cast("decimal(38,0)")
    tot = per.agg(
        F.sum("n_customers").alias("n_total"),
        F.sum("n_converted").alias("r_total"),
        F.sum(d * F.col("n_customers")).alias("sx"),
        F.sum(d * F.col("dose") * F.col("n_customers")).alias("sxx"),
        F.sum(d * F.col("n_converted")).alias("sr"))
    num = (F.col("n_total").cast("decimal(38,0)") * F.col("sr")
           - F.col("r_total").cast("decimal(38,0)") * F.col("sx"))
    var_num = (F.col("r_total").cast("decimal(38,0)")
               * (F.col("n_total") - F.col("r_total"))
               * (F.col("n_total").cast("decimal(38,0)") * F.col("sxx")
                  - F.col("sx") * F.col("sx")))
    z = F.when(
        var_num > 0,
        F.round(num.cast("double")
                / F.sqrt(var_num.cast("double")
                         / F.col("n_total")), 6))
    stats = (tot
             .withColumn("ca_z", z)
             .withColumn("trend_detected", F.abs(F.col("ca_z")) > 1.96)
             .select(F.col("n_total").cast("bigint").alias("n_total"),
                     F.col("r_total").cast("bigint")
                     .alias("n_converted_total"),
                     "ca_z", "trend_detected"))
    return (per
            .withColumn("conv_rate",
                        F.round(F.col("n_converted")
                                / F.col("n_customers"), 6))
            .crossJoin(F.broadcast(stats))
            .select("dose",
                    F.col("n_customers").cast("bigint")
                    .alias("n_customers"),
                    F.col("n_converted").cast("bigint")
                    .alias("n_converted"),
                    "conv_rate", "n_total", "n_converted_total",
                    "ca_z", "trend_detected")
            .orderBy("dose"))


def bleu_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 over the MinHash-LSH candidate pairs (Papineni et al.
    2002): for each candidate pair (doc_a = hypothesis, doc_b =
    reference, the deterministic doc_a < doc_b orientation), the
    clipped n-gram precisions

        p_n = Σ_g min(count_a(g), count_b(g)) / (#n-grams in a)

    for n = 1, 2, the brevity penalty BP = 1 if len_a > len_b else
    exp(1 − len_b/len_a), and BLEU2 = BP·sqrt(p1·p2) (0 when either
    clipped match count is 0).  The dedup-audit read: est_jaccard is a
    SET-overlap estimate; BLEU weighs token MULTIPLICITY and length
    asymmetry, separating verbatim-copy pairs (BLEU ≈ 1) from
    shared-boilerplate pairs (high Jaccard, mid BLEU).

    Exactness: match counts and lengths are exact integers; p_n are
    single divisions of exact integers; sqrt is IEEE-correctly-rounded;
    the one libm call (exp in BP) follows the pow-drift discipline —
    final 6dp snap.  Scale: candidates come from the banded LSH join
    (never corpus²); the n-gram count joins fan out pair-count x
    doc-length rows, keyed on (doc, gram)."""
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    uni = (toks.groupBy("doc_id", "tok")
           .agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (toks.withColumn("nxt", F.lead("tok", 1).over(w))
           .where(F.col("nxt").isNotNull())
           .select("doc_id",
                   F.concat_ws(" ", "tok", "nxt").alias("tok")))
    bigc = (big.groupBy("doc_id", "tok")
            .agg(F.count(F.lit(1)).alias("c")))
    lens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))

    def clipped(counts: DataFrame, out: str) -> DataFrame:
        ca = counts.select(F.col("doc_id").alias("doc_a"), "tok",
                           F.col("c").alias("c_a"))
        cb = counts.select(F.col("doc_id").alias("doc_b"), "tok",
                           F.col("c").alias("c_b"))
        return (pairs.join(ca, "doc_a")
                .join(cb, ["doc_b", "tok"])
                .groupBy("doc_a", "doc_b")
                .agg(F.sum(F.least("c_a", "c_b")).alias(out)))

    la = lens.select(F.col("doc_id").alias("doc_a"),
                     F.col("n_tok").alias("len_a"))
    lb = lens.select(F.col("doc_id").alias("doc_b"),
                     F.col("n_tok").alias("len_b"))
    m1 = clipped(uni, "match_1")
    m2 = clipped(bigc, "match_2")
    out = (pairs
           .join(la, "doc_a").join(lb, "doc_b")
           .join(m1, ["doc_a", "doc_b"], "left")
           .join(m2, ["doc_a", "doc_b"], "left")
           .withColumn("match_1", F.coalesce("match_1", F.lit(0)))
           .withColumn("match_2", F.coalesce("match_2", F.lit(0))))
    p1 = F.col("match_1") / F.col("len_a")
    p2 = F.col("match_2") / (F.col("len_a") - 1)
    bp = F.when(F.col("len_a") > F.col("len_b"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.col("len_b") / F.col("len_a")
              .cast("double")))
    bleu = F.when(
        (F.col("match_1") > 0) & (F.col("match_2") > 0)
        & (F.col("len_a") > 1),
        F.round(bp * F.sqrt(p1 * p2), 6)).otherwise(F.lit(0.0))
    return (out
            .withColumn("p1", F.round(p1, 6))
            .withColumn("p2", F.when(F.col("len_a") > 1,
                                     F.round(p2, 6)).otherwise(F.lit(0.0)))
            .withColumn("bleu2", bleu)
            .select("doc_a", "doc_b", "len_a", "len_b",
                    F.col("match_1").cast("bigint").alias("match_1"),
                    F.col("match_2").cast("bigint").alias("match_2"),
                    "p1", "p2", "bleu2")
            .orderBy("doc_a", "doc_b"))


# MMD drift: 1e-5 coordinate snap — chosen so the worst-case 128-bit
# sums stay inside decimal(38,0)/HUGEINT (entry <= n·1e10, cross term
# <= n·m·1e20·d² ≈ 4e35 at sf0.1); the statistic is DEFINED on the
# snapped coordinates, identically on both engines.
_MMD_GRID = 100000
# drift_share flag threshold — like `embedding_drift_centroids`, a
# per-corpus knob to be calibrated on an A/A split of one snapshot.
_MMD_SHARE_MAX = 0.05


def embedding_mmd2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label quadratic-kernel MMD² between the two deterministic
    embedding snapshot halves (Gretton et al. 2012, Maximum Mean
    Discrepancy; vec_id-parity halves per the
    `embedding_drift_centroids` convention).  With kernel
    k(x,y) = (x·y)², the biased MMD² collapses to the Frobenius
    distance of the mean SECOND-MOMENT matrices:

        MMD² = || Σxxᵀ/n − Σyyᵀ/m ||²_F

    — so the pairwise-kernel double sum never materializes: one
    d²-entry moment matrix per (label, half) (exact BIGINT sums of
    1e-5-snapped coordinate products), then a d²-row comparison.  This
    is the SHAPE-sensitive drift monitor: a re-encode that rotates or
    re-scales the space moves second moments while centroids (the mean
    monitor) can stay put.  `drift_share` = MMD² normalized by
    ||M_A||² + ||M_B||² is an exact ratio of 128-bit integers.

    Scale: the self-join fan-out is d² rows per vector (d=64) but
    map-side partial aggregation collapses the shuffle to d² rows per
    partition; everything downstream is (labels × d²), broadcast-tiny.
    Labels with an empty half are omitted (no second snapshot to
    compare)."""
    emb = load_table(spark, sf_dir, "embeddings")
    expl = (emb.select(
        "vec_id", "label", (F.col("vec_id") % 2).alias("snap"),
        F.posexplode("embedding").alias("d", "v_raw"))
        .select("vec_id", "label", "snap", "d",
                F.round(F.col("v_raw").cast("double") * _MMD_GRID, 0)
                .cast("long").alias("xv")))
    right = expl.select("vec_id", F.col("d").alias("d2"),
                        F.col("xv").alias("xv2"))
    smat = (expl.join(right, "vec_id")
            .groupBy("label", "snap", "d", "d2")
            .agg(F.sum(F.col("xv") * F.col("xv2")).alias("s")))
    a = (smat.where(F.col("snap") == 0)
         .select("label", "d", "d2", F.col("s").alias("sa")))
    b = (smat.where(F.col("snap") == 1)
         .select("label", "d", "d2", F.col("s").alias("sb")))
    counts = (emb.groupBy("label")
              .agg(F.count(F.when(F.col("vec_id") % 2 == 0, 1))
                   .alias("n_a"),
                   F.count(F.when(F.col("vec_id") % 2 == 1, 1))
                   .alias("n_b")))
    j = (a.join(b, ["label", "d", "d2"])
         .join(F.broadcast(counts), "label"))
    diff = (F.col("n_b").cast("decimal(38,0)") * F.col("sa")
            - F.col("n_a").cast("decimal(38,0)") * F.col("sb"))
    per = (j.groupBy("label")
           .agg(F.max("n_a").alias("n_a"),
                F.max("n_b").alias("n_b"),
                F.sum(diff * diff).alias("num"),
                F.sum(F.col("sa").cast("decimal(38,0)") * F.col("sa"))
                .alias("sa2"),
                F.sum(F.col("sb").cast("decimal(38,0)") * F.col("sb"))
                .alias("sb2")))
    na2 = F.col("n_a").cast("double") * F.col("n_a")
    nb2 = F.col("n_b").cast("double") * F.col("n_b")
    mmd2 = (F.col("num").cast("double")
            / (na2 * nb2 * float(_MMD_GRID) ** 4))
    den = (F.col("n_b").cast("decimal(38,0)") * F.col("n_b")
           * F.col("sa2")
           + F.col("n_a").cast("decimal(38,0)") * F.col("n_a")
           * F.col("sb2"))
    share = F.col("num").cast("double") / den.cast("double")
    return (per
            .withColumn("mmd2", F.round(mmd2, 9))
            .withColumn("drift_share", F.round(share, 9))
            .withColumn("drifted",
                        F.col("drift_share") > F.lit(_MMD_SHARE_MAX))
            .select("label", "n_a", "n_b", "mmd2", "drift_share",
                    "drifted")
            .orderBy("label"))


# Kuiper asymptotic 5% point of V*sqrt(Ne) (Stephens 1970, Table 1) —
# the KS _KS_COEF sibling for the rotation-invariant statistic.
_KUIPER_COEF = 1.747


def events_kuiper_tod_drift(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Kuiper two-sample drift test of the TIME-OF-DAY distribution per
    event type, first ``_KS_SPLIT_DAYS`` days vs the rest (Kuiper 1960):
    V = D⁺ + D⁻, the sum of the largest positive and largest negative
    ECDF gaps.  Unlike KS, V is invariant under rotation of the circle
    — a shift ACROSS midnight that splits its KS gap into two half-size
    gaps at the wrap-around keeps its full Kuiper gap, which is exactly
    the failure mode of hour-of-day monitoring (the
    `circular_stats` midnight-not-noon lesson applied to drift).
    Verdict at the Stephens large-sample 5% point
    V > 1.747·sqrt((n+m)/(n·m)).

    Exactness: the observable is the integer second-of-day; D⁺ and D⁻
    are maxima of the SIGNED integer numerator M·cume − N·cuml over the
    distinct-value grid, so V = (max⁺ + max⁻)/(N·M) is one division of
    exact integers.  Same plan as `events_ks_drift` (grouped count on
    the distinct grid, per-type running sums, one aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    mind = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    tod = (F.hour("ts") * 3600 + F.minute("ts") * 60
           + F.second("ts"))
    sided = (ev.crossJoin(F.broadcast(mind))
             .select("event_type", tod.alias("tod"),
                     (F.to_date("ts")
                      < F.date_add(F.col("d0"), _KS_SPLIT_DAYS))
                     .alias("early")))
    counts = (sided.groupBy("event_type", "tod")
              .agg(F.sum(F.when(F.col("early"), 1).otherwise(0))
                   .alias("ce"),
                   F.sum(F.when(~F.col("early"), 1).otherwise(0))
                   .alias("cl")))
    wv = (Window.partitionBy("event_type").orderBy("tod")
          .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("event_type")
    cum = (counts
           .withColumn("cume", F.sum("ce").over(wv))
           .withColumn("cuml", F.sum("cl").over(wv))
           .withColumn("ne", F.sum("ce").over(wt))
           .withColumn("nl", F.sum("cl").over(wt)))
    signed = (F.col("nl").cast("decimal(38,0)") * F.col("cume")
              - F.col("ne").cast("decimal(38,0)") * F.col("cuml"))
    agg = (cum.groupBy("event_type")
           .agg(F.max("ne").alias("n_early"),
                F.max("nl").alias("n_late"),
                F.greatest(F.max(signed), F.lit(0).cast("decimal(38,0)"))
                .alias("dpos"),
                F.greatest(F.max(-signed), F.lit(0).cast("decimal(38,0)"))
                .alias("dneg")))
    v = ((F.col("dpos") + F.col("dneg")).cast("double")
         / (F.col("n_early").cast("double") * F.col("n_late")))
    crit = F.round(F.lit(_KUIPER_COEF)
                   * F.sqrt((F.col("n_early") + F.col("n_late"))
                            / (F.col("n_early").cast("double")
                               * F.col("n_late"))), 6)
    return (agg
            .withColumn("kuiper_v", F.round(v, 6))
            .withColumn("kuiper_crit", crit)
            .withColumn("drift_detected",
                        F.col("kuiper_v") > F.col("kuiper_crit"))
            .select("event_type", "n_early", "n_late", "kuiper_v",
                    "kuiper_crit", "drift_detected")
            .orderBy("event_type"))


def ab_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method A/B readout for a RATIO metric — average value per
    EVENT under USER-level randomization (Deng, Knoblich & Lu 2018,
    "Applying the Delta Method in Metric Analytics"): the metric
    R = ΣY_u/ΣN_u is a ratio of per-user sums, so the naive
    per-event variance is wrong (events within a user correlate); the
    delta method gives Var(R) ≈ (s_Y² − 2R·s_YN + R²·s_N²)/(K·n̄²)
    from per-user moments.  The md5 50/50 user split and the A/A
    calibration property follow `ab_test_report`; this completes the
    A/B family's one missing standard readout (proportion z, CUPED,
    SRM, log-rank, permutation, MW, DiD, power — and now ratio
    metrics).

    Exactness: value in exact milli-units; per-arm K, ΣY, ΣN, ΣY²,
    ΣN², ΣYN are exact 128-bit integer sums, and the delta bracket
    collapses (multiply through by ΣN²) to the all-integer

        B = SN²(K·SYY − SY²) − 2·SY·SN(K·SYN − SY·SN)
            + SY²(K·SNN − SN²),   Var(R) = B/((K−1)·SN⁴)

    so R and Var(R) are single divisions of exact integers and z is
    order-proof.  (B fits decimal(38,0) through sf0.1 with milli
    units; a larger deployment drops to centi units, same plan.)
    Scale: one per-user aggregate (the only wide stage), then a 2-row
    arm table."""
    ev = load_table(spark, sf_dir, "events")
    arm = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                              1, 8), 16, 10).cast("bigint") % 2)
    mv = F.round(F.col("value") * 1000, 0).cast("long")
    users = (ev.select("user_id", mv.alias("mv"))
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_u"),
                  F.sum("mv").alias("y_u"))
             .withColumn("arm", arm))
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    arms = (users.groupBy("arm")
            .agg(F.count(F.lit(1)).alias("k"),
                 F.sum("y_u").alias("sy"),
                 F.sum("n_u").alias("sn"),
                 F.sum(d("y_u") * F.col("y_u")).alias("syy"),
                 F.sum(d("n_u") * F.col("n_u")).alias("snn"),
                 F.sum(d("y_u") * F.col("n_u")).alias("syn")))
    b = (d("sn") * F.col("sn") * (d("k") * F.col("syy")
                                  - d("sy") * F.col("sy"))
         - F.lit(2).cast("decimal(38,0)") * F.col("sy") * F.col("sn")
         * (d("k") * F.col("syn") - d("sy") * F.col("sn"))
         + d("sy") * F.col("sy") * (d("k") * F.col("snn")
                                    - d("sn") * F.col("sn")))
    snd = F.col("sn").cast("double")
    var_r = (b.cast("double")
             / ((F.col("k") - 1).cast("double")
                * snd * snd * snd * snd))
    stats = (arms
             .withColumn("ratio_milli", F.col("sy") / F.col("sn"))
             .withColumn("var_milli", var_r))
    wide = stats.agg(
        F.max(F.when(F.col("arm") == 0, F.col("ratio_milli")))
        .alias("rc"),
        F.max(F.when(F.col("arm") == 1, F.col("ratio_milli")))
        .alias("rt"),
        F.max(F.when(F.col("arm") == 0, F.col("var_milli")))
        .alias("vc"),
        F.max(F.when(F.col("arm") == 1, F.col("var_milli")))
        .alias("vt"))
    z = F.when((F.col("vc") + F.col("vt")) > 0,
               F.round((F.col("rt") - F.col("rc"))
                       / F.sqrt(F.col("vc") + F.col("vt")), 6))
    wz = (wide.withColumn("delta_z", z)
          .withColumn("significant", F.abs(F.col("delta_z")) > 1.96)
          .select("delta_z", "significant"))
    return (stats
            .select("arm",
                    F.col("k").cast("bigint").alias("n_users"),
                    F.col("sn").cast("bigint").alias("n_events"),
                    F.col("sy").cast("bigint").alias("sum_value_milli"),
                    F.round(F.col("ratio_milli") / 1000.0, 6)
                    .alias("ratio_per_event"),
                    F.round(F.sqrt(F.col("var_milli")) / 1000.0, 9)
                    .alias("se_ratio"))
            .crossJoin(F.broadcast(wz))
            .orderBy("arm"))


# RBO parameters (Webber, Moffat & Zobel 2010): persistence p = 0.9,
# depth = the shared _TOP_K of the ranking chains.  The geometric
# weights (1-p)p^(d-1) and the extrapolation weight p^K are PRECOMPUTED
# python literals inlined on both engines; each depth's contribution is
# snapped to integer 1e-9 units pre-sum (the BM25 per-term discipline)
# so the per-query sum is order-proof.
_RBO_P = 0.9
_RBO_K = 10  # = similarity._TOP_K, asserted in tests
_RBO_W = {depth: 1e9 * (1.0 - _RBO_P) * _RBO_P ** (depth - 1)
          for depth in range(1, _RBO_K + 1)}
_RBO_EXT_W = 1e9 * _RBO_P ** _RBO_K


def retrieval_rbo_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Overlap of the PQ index's top-k list against the
    exact cosine top-k, per query (Webber, Moffat & Zobel 2010 — the
    IR-standard similarity for INDEFINITE rankings): with A_d the
    fraction of the top-d prefixes two lists share,

        RBO_ext = (1−p)·Σ_{d=1..k} p^(d-1)·A_d + p^k·A_k

    (eq. 30's truncated-prefix extrapolation).  Kendall/Spearman treat
    every position equally and need conjoint lists; RBO is top-weighted
    (p = 0.9 ≈ the searcher who scans ~10 results) and handles
    non-overlapping tails — so it answers "does the ANN index SHOW the
    same first page", completing the eval family next to NDCG (graded
    gain), AP and MRR (single-relevant).

    Exactness: prefix overlaps c_d are exact integer counts off one
    (query, id) join of the two bounded k·Q frames; each depth's
    weighted term round(L_d·c_d/d) is snapped to integer 1e-9 units
    before the per-query sum.  Scale: eval cost is corpus-independent
    beyond running the two input chains (the `retrieval_mrr_eval`
    envelope); the depth spine is a 10-row broadcast."""
    from .similarity import cosine_topk_bruteforce, pq_topk

    bf = (cosine_topk_bruteforce(spark, sf_dir)
          .select("query_id", F.col("neighbor_id").alias("id"),
                  F.col("rank").alias("ra")))
    ann = (pq_topk(spark, sf_dir)
           .select("query_id", F.col("neighbor_id").alias("id"),
                   F.col("rank").alias("rb")))
    common = (bf.join(ann, ["query_id", "id"])
              .select("query_id",
                      F.greatest("ra", "rb").alias("dmin")))
    depths = (spark.range(1, _RBO_K + 1)
              .select(F.col("id").cast("int").alias("d")))
    grid = (bf.select("query_id").distinct()
            .crossJoin(F.broadcast(depths)))
    cd = (grid.join(common, "query_id", "left")
          .withColumn("hit",
                      F.when(F.col("dmin") <= F.col("d"), 1)
                      .otherwise(0))
          .groupBy("query_id", "d")
          .agg(F.sum("hit").alias("c")))
    wmap = F.create_map(*[F.lit(v) for kv in _RBO_W.items()
                          for v in kv])
    base = F.round(F.element_at(wmap, F.col("d")) * F.col("c")
                   / F.col("d"), 0).cast("bigint")
    ext = F.when(F.col("d") == _RBO_K,
                 F.round(F.lit(_RBO_EXT_W) * F.col("c")
                         / F.col("d"), 0).cast("bigint")) \
        .otherwise(F.lit(0).cast("bigint"))
    per = (cd.withColumn("m", base + ext)
           .groupBy("query_id")
           .agg(F.sum("m").alias("micro"),
                F.max(F.when(F.col("d") == _RBO_K, F.col("c")))
                .alias("overlap_at_k")))
    g = per.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.sum("micro") / 1e9 / F.count(F.lit(1)), 6)
        .alias("mean_rbo"))
    return (per
            .withColumn("rbo_ext", F.round(F.col("micro") / 1e9, 9))
            .select("query_id",
                    F.col("overlap_at_k").cast("bigint")
                    .alias("overlap_at_k"),
                    "rbo_ext")
            .crossJoin(F.broadcast(g))
            .orderBy("query_id"))


# Histogram split finder: 256 fixed-width bins (the LightGBM default
# max_bin), all-integer bin assignment and boundaries.
_STUMP_BINS = 256


def balance_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based decision-stump split finder on account balance
    vs the high-value-conversion target — the LightGBM/XGBoost-approx
    split-finding primitive (Ke et al. 2017 §2.1; Chen & Guestrin 2016
    §3.2) that makes tree training feasible at scale: instead of
    sorting the raw feature (a fact-grain global sort), bin it into
    {bins} fixed-width integer bins, aggregate per-bin label counts
    (one keyed shuffle, map-side combinable), and scan the BOUNDED
    bin grid for the Gini-gain-maximizing threshold.  This is the
    supervised-discretization read `woe_information_value` (fixed
    categorical) and `nb_calibration_curve` (score deciles) don't
    cover: WHERE to cut a continuous feature.

    Exactness: bin ids and cent boundaries are pure integer arithmetic
    (``div``, no floats anywhere near a boundary); per-candidate Gini
    gain is three single divisions of exact integers, snapped 1e-9;
    the best split is picked by (snapped gain, lowest bin) — a total
    order on exact values.  Prefix counts use a bin×bin self-join on
    the ≤{bins}-row grid rather than an unpartitioned window, so the
    plan stays window-free.  Scale: the only corpus-sized stages are
    the converter aggregate and the per-bin count; everything after is
    grid-sized."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice")
    yc = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    priced = orders.select("o_custkey", yc.alias("yc"))
    mean = priced.agg((F.sum("yc") / F.count(F.lit(1))).alias("mu"))
    conv = (priced.crossJoin(F.broadcast(mean))
            .where(F.col("yc") > F.col("mu"))
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
            .withColumn("y", F.lit(1)))
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    labeled = (cust.join(conv, "c_custkey", "left")
               .select(cents.alias("cents"),
                       F.coalesce(F.col("y"), F.lit(0)).alias("y")))
    rng = labeled.agg(F.min("cents").alias("mn"),
                      F.max("cents").alias("mx"))
    binned = (labeled.crossJoin(F.broadcast(rng))
              .withColumn("bin", F.expr(
                  f"((cents - mn) * {_STUMP_BINS}) div (mx - mn + 1)"))
              .withColumn("w", F.col("mx") - F.col("mn") + 1))
    grid = (binned.groupBy("bin", "w", "mn")
            .agg(F.count(F.lit(1)).alias("n_b"),
                 F.sum("y").alias("p_b")))
    lhs = grid.select(F.col("bin").alias("b2"),
                      F.col("n_b").alias("n2"),
                      F.col("p_b").alias("p2"))
    pref = (grid.join(F.broadcast(lhs), F.col("b2") <= F.col("bin"))
            .groupBy("bin", "w", "mn")
            .agg(F.sum("n2").alias("n_left"),
                 F.sum("p2").alias("pos_left")))
    parent = grid.agg(F.sum("n_b").alias("n_tot"),
                      F.sum("p_b").alias("p_tot"))
    cand = (pref.crossJoin(F.broadcast(parent))
            .withColumn("n_right", F.col("n_tot") - F.col("n_left"))
            .withColumn("pos_right", F.col("p_tot") - F.col("pos_left"))
            .where((F.col("n_left") > 0) & (F.col("n_right") > 0)))

    def wgini(n, p):
        # divisor null-guarded so ANSI mode stays safe even if Catalyst
        # evaluates the projection speculatively around the n>0 filter
        q = n - p
        return n.cast("double") - (p.cast("double") * p
                                   + q.cast("double") * q) \
            / F.when(n > 0, n)

    gain = F.round(
        wgini(F.col("n_tot"), F.col("p_tot"))
        - wgini(F.col("n_left"), F.col("pos_left"))
        - wgini(F.col("n_right"), F.col("pos_right")), 9)
    cand = (cand.withColumn("gini_gain", gain)
            .withColumn("split_at_cents", F.expr(
                f"mn + (w * (bin + 1) + {_STUMP_BINS - 1}) "
                f"div {_STUMP_BINS} - 1")))
    best = cand.agg(F.max("gini_gain").alias("bg"))
    bestbin = (cand.join(F.broadcast(best),
                         F.col("gini_gain") == F.col("bg"))
               .agg(F.min("bin").alias("bb"),
                    F.max("bg").alias("bg")))
    return (cand.crossJoin(F.broadcast(bestbin))
            .withColumn("is_best",
                        (F.col("gini_gain") == F.col("bg"))
                        & (F.col("bin") == F.col("bb")))
            .select(F.col("bin").cast("int").alias("bin"),
                    "split_at_cents",
                    F.col("n_left").cast("bigint").alias("n_left"),
                    F.col("pos_left").cast("bigint").alias("pos_left"),
                    F.col("n_right").cast("bigint").alias("n_right"),
                    F.col("pos_right").cast("bigint").alias("pos_right"),
                    "gini_gain", "is_best")
            .orderBy("bin"))


balance_stump_split.__doc__ = balance_stump_split.__doc__.format(
    bins=_STUMP_BINS)


# Upper 5% chi-square points for df 1..9, inlined literals (the
# Benjamini-Hochberg inverse-normal precedent: no in-engine
# distribution math); Cochran's Q has df = #treatments - 1.
_CHI2_05 = {1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729,
            5: 11.070498, 6: 12.591587, 7: 14.067140, 8: 15.507313,
            9: 16.918978}

# High-value event threshold — the `ab_test_report` conversion literal;
# plain presence saturates (every user fires every type at any SF), so
# the matched-blocks question is asked of HIGH-VALUE adoption, where
# per-user breadth actually varies.
_HV_EVENT_VALUE = 200


def user_type_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test (Cochran 1950) of whether the k event TYPES
    have equal per-user HIGH-VALUE adoption rates, treating each user
    as a matched block: X_ij = 1 iff user i ever fired type j with
    value > 200 (the `ab_test_report` conversion literal — plain
    presence saturates at every SF; users with NO high-value events
    drop out, which leaves Q exactly unchanged: an all-zero block adds
    0 to every G_j, ΣL and ΣL²),

        Q = (k−1)·(k·ΣG_j² − (ΣG_j)²) / (k·ΣL_i − ΣL_i²)

    with G_j the per-type user counts and L_i the per-user type
    counts.  The existing `chi_square_independence` treats EVENTS as
    independent draws; Q asks the matched-design question — the same
    users are behind every type, and Q conditions on each user's
    overall breadth, which is exactly what a funnel/feature-adoption
    comparison needs (McNemar is its k=2 special case, already
    registered).  Verdict vs the χ²(k−1) 5% literal table.

    Exactness: numerator and denominator are single exact-integer
    expressions off two bounded aggregates (per-type totals, per-user
    totals); Q is ONE division.  Scale: one (user,type) distinct
    aggregate (map-side combinable) then dimension-sized tables."""
    ev = load_table(spark, sf_dir, "events")
    present = (ev.where(F.col("value") > _HV_EVENT_VALUE)
               .select("user_id", "event_type").distinct())
    g = (present.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("g_j")))
    l_u = (present.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("l_i")))
    gt = g.agg(F.count(F.lit(1)).alias("k"),
               F.sum("g_j").alias("sg"),
               F.sum(F.col("g_j").cast("decimal(38,0)") * F.col("g_j"))
               .alias("sg2"))
    lt = l_u.agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum("l_i").alias("sl"),
                 F.sum(F.col("l_i").cast("decimal(38,0)") * F.col("l_i"))
                 .alias("sl2"))
    crit_map = F.create_map(*[F.lit(v) for kv in _CHI2_05.items()
                              for v in kv])
    num = ((F.col("k") - 1).cast("decimal(38,0)")
           * (F.col("k").cast("decimal(38,0)") * F.col("sg2")
              - F.col("sg").cast("decimal(38,0)") * F.col("sg")))
    den = (F.col("k").cast("decimal(38,0)") * F.col("sl")
           - F.col("sl2"))
    stats = (gt.crossJoin(F.broadcast(lt))
             .withColumn("q_stat",
                         F.when(den > 0,
                                F.round(num.cast("double")
                                        / den.cast("double"), 6)))
             .withColumn("df", (F.col("k") - 1).cast("int"))
             .withColumn("chi2_crit",
                         F.element_at(crit_map, F.col("df")))
             .withColumn("significant",
                         F.col("q_stat") > F.col("chi2_crit"))
             .select(F.col("k").cast("int").alias("k_types"),
                     F.col("n_users").cast("bigint").alias("n_users"),
                     "q_stat", "df", "chi2_crit", "significant"))
    share = F.round(F.col("g_j") / F.col("n_users"), 6)
    return (g.crossJoin(F.broadcast(stats))
            .select("event_type",
                    F.col("g_j").cast("bigint").alias("n_users_with"),
                    share.alias("adoption_share"),
                    "k_types", "n_users", "q_stat", "df", "chi2_crit",
                    "significant")
            .orderBy("event_type"))


def spend_trend_jonckheere(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend test (Terpstra
    1952; Jonckheere 1954) of customer TOTAL SPEND across the ordered
    account-balance buckets: J = Σ_{k<l} U_kl, the sum of pairwise
    Mann-Whitney counts between every lower/higher dose pair (ties
    counted half).  This is the CONTINUOUS-outcome sibling of
    `balance_conversion_catrend` (which needs a binary outcome) and
    the ordered-alternative upgrade of `kruskal_wallis` (which tests
    "any difference", not "a monotone trend in dose order") — the
    dose-response read for skewed, outlier-heavy outcomes like spend,
    where rank methods keep their power and OLS-style trends break.

    Exactness: 2J is an exact integer — per (dose, value) tier the
    contribution c·(2·A + B) uses A = count in lower doses strictly
    below the value and B = tied count in lower doses, both exact
    prefix sums over the dose×distinct-value grid (windows PARTITIONED
    by dose and by value — never global).  The tie-corrected null
    moments (Hollander & Wolfe §6.2: E[J] = (N² − Σn_k²)/4 and the
    three-term variance with pooled tie groups t) are single
    divisions of exact 128-bit integer products.  Scale: the grid is
    (#doses × distinct values) — a bounded small multiple of the
    customer grain with key-partitioned windows; everything after is
    dose-sized."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice")
    yc = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    spend = (orders.groupBy("o_custkey")
             .agg(F.sum(yc).alias("spend"))
             .withColumnRenamed("o_custkey", "c_custkey"))
    balcents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    dosed = (cust.join(spend, "c_custkey", "left")
             .select(F.floor(balcents / F.lit(float(_CA_DOSE_CENTS)))
                     .cast("int").alias("dose"),
                     F.coalesce(F.col("spend"), F.lit(0))
                     .alias("spend")))
    tiers = (dosed.groupBy("dose", "spend")
             .agg(F.count(F.lit(1)).alias("c")))
    vspine = tiers.select("spend").distinct()
    doses = tiers.select("dose").distinct()
    gt = (vspine.crossJoin(F.broadcast(doses))
          .join(tiers, ["dose", "spend"], "left")
          .withColumn("c", F.coalesce(F.col("c"), F.lit(0))))
    wv = (Window.partitionBy("dose").orderBy("spend")
          .rowsBetween(Window.unboundedPreceding, -1))
    wg = (Window.partitionBy("spend").orderBy("dose")
          .rowsBetween(Window.unboundedPreceding, -1))
    gt = (gt.withColumn("cumlt", F.coalesce(F.sum("c").over(wv),
                                            F.lit(0)))
          .withColumn("a_low", F.coalesce(F.sum("cumlt").over(wg),
                                          F.lit(0)))
          .withColumn("b_tie", F.coalesce(F.sum("c").over(wg),
                                          F.lit(0))))
    jsum = gt.agg(F.sum(F.col("c").cast("decimal(38,0)")
                        * (2 * F.col("a_low") + F.col("b_tie")))
                  .alias("two_j"))
    n = F.col("n_k")
    gstats = (dosed.groupBy("dose")
              .agg(F.count(F.lit(1)).alias("n_k"))
              .agg(F.sum("n_k").alias("nn"),
                   F.sum(n.cast("decimal(38,0)") * n).alias("sn2"),
                   F.sum(n.cast("decimal(38,0)") * (n - 1))
                   .alias("sn21"),
                   F.sum(n.cast("decimal(38,0)") * (n - 1) * (n - 2))
                   .alias("sn321"),
                   F.sum(n.cast("decimal(38,0)") * (n - 1)
                         * (2 * n + 5)).alias("sn25")))
    t = F.col("t_v")
    tstats = (dosed.groupBy("spend")
              .agg(F.count(F.lit(1)).alias("t_v"))
              .agg(F.sum(t.cast("decimal(38,0)") * (t - 1))
                   .alias("st21"),
                   F.sum(t.cast("decimal(38,0)") * (t - 1) * (t - 2))
                   .alias("st321"),
                   F.sum(t.cast("decimal(38,0)") * (t - 1)
                         * (2 * t + 5)).alias("st25")))
    nd = F.col("nn").cast("double")
    term1 = ((F.col("nn").cast("decimal(38,0)") * (F.col("nn") - 1)
              * (2 * F.col("nn") + 5)
              - F.col("sn25") - F.col("st25")).cast("double") / 72.0)
    term2 = ((F.col("sn321") * F.col("st321")).cast("double")
             / (36.0 * nd * (nd - 1) * (nd - 2)))
    term3 = ((F.col("sn21") * F.col("st21")).cast("double")
             / (8.0 * nd * (nd - 1)))
    var_j = term1 + term2 + term3
    e4 = (F.col("nn").cast("decimal(38,0)") * F.col("nn")
          - F.col("sn2"))
    z = F.when(var_j > 0,
               F.round((F.col("two_j").cast("double") / 2.0
                        - e4.cast("double") / 4.0)
                       / F.sqrt(var_j), 6))
    stats = (jsum.crossJoin(F.broadcast(gstats))
             .crossJoin(F.broadcast(tstats))
             .withColumn("jt_z", z)
             .withColumn("trend_detected", F.abs(F.col("jt_z")) > 1.96)
             .select(F.col("two_j").cast("bigint").alias("two_j"),
                     F.col("nn").cast("bigint").alias("n_total"),
                     "jt_z", "trend_detected"))
    per = (dosed.groupBy("dose")
           .agg(F.count(F.lit(1)).alias("n_customers"),
                F.sum("spend").alias("total_spend_cents")))
    return (per.crossJoin(F.broadcast(stats))
            .select("dose",
                    F.col("n_customers").cast("bigint")
                    .alias("n_customers"),
                    F.col("total_spend_cents").cast("bigint")
                    .alias("total_spend_cents"),
                    "two_j", "n_total", "jt_z", "trend_detected")
            .orderBy("dose"))


QUERIES = {
    "events_cvm_drift": events_cvm_drift,
    "balance_conversion_catrend": balance_conversion_catrend,
    "bleu_neardup_pairs": bleu_neardup_pairs,
    "embedding_mmd2_drift": embedding_mmd2_drift,
    "events_kuiper_tod_drift": events_kuiper_tod_drift,
    "ab_ratio_metric_delta": ab_ratio_metric_delta,
    "retrieval_rbo_eval": retrieval_rbo_eval,
    "balance_stump_split": balance_stump_split,
    "user_type_cochran_q": user_type_cochran_q,
    "spend_trend_jonckheere": spend_trend_jonckheere,
}

ORACLES = {
    "events_cvm_drift": f"""
        WITH d0 AS (
            SELECT min(CAST(ts AS DATE)) AS d0 FROM events
        ), sided AS (
            SELECT event_type, value,
                   CAST(ts AS DATE) < d0 + {_KS_SPLIT_DAYS} AS early
            FROM events CROSS JOIN d0
        ), counts AS (
            SELECT event_type, value,
                   sum(CASE WHEN early THEN 1 ELSE 0 END) AS ce,
                   sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS cl
            FROM sided GROUP BY 1, 2
        ), cum AS (
            SELECT event_type, ce, cl,
                   sum(ce) OVER w AS cume,
                   sum(cl) OVER w AS cuml,
                   sum(ce) OVER t AS ne,
                   sum(cl) OVER t AS nl
            FROM counts
            WINDOW w AS (PARTITION BY event_type ORDER BY value
                         ROWS UNBOUNDED PRECEDING),
                   t AS (PARTITION BY event_type)
        ), agg AS (
            SELECT event_type,
                   CAST(max(ne) AS BIGINT) AS n_early,
                   CAST(max(nl) AS BIGINT) AS n_late,
                   sum(CAST(ce + cl AS HUGEINT)
                       * (CAST(nl AS HUGEINT) * cume
                          - CAST(ne AS HUGEINT) * cuml)
                       * (CAST(nl AS HUGEINT) * cume
                          - CAST(ne AS HUGEINT) * cuml)) AS s
            FROM cum GROUP BY 1
        )
        SELECT event_type, n_early, n_late,
               round(CAST(s AS DOUBLE)
                     / (CAST(n_early AS DOUBLE) * n_late
                        * (n_early + n_late) * (n_early + n_late)), 6)
                   AS cvm_t,
               CAST({_CVM_CRIT_05} AS DOUBLE) AS cvm_crit,
               round(CAST(s AS DOUBLE)
                     / (CAST(n_early AS DOUBLE) * n_late
                        * (n_early + n_late) * (n_early + n_late)), 6)
                   > {_CVM_CRIT_05} AS drift_detected
        FROM agg ORDER BY event_type
    """,
    "balance_conversion_catrend": f"""
        WITH priced AS (
            SELECT o_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS yc
            FROM orders
        ), mu AS (
            SELECT sum(yc) / CAST(count(*) AS DOUBLE) AS mu FROM priced
        ), conv AS (
            SELECT DISTINCT o_custkey AS c_custkey
            FROM priced CROSS JOIN mu WHERE yc > mu
        ), dosed AS (
            SELECT CAST(floor(CAST(round(c.c_acctbal * 100) AS BIGINT)
                              / {float(_CA_DOSE_CENTS)}) AS INT) AS dose,
                   CASE WHEN v.c_custkey IS NULL THEN 0 ELSE 1 END AS y
            FROM customer c LEFT JOIN conv v ON c.c_custkey = v.c_custkey
        ), per AS (
            SELECT dose, count(*) AS n_customers,
                   sum(y) AS n_converted
            FROM dosed GROUP BY 1
        ), tot AS (
            SELECT sum(n_customers) AS n_total,
                   sum(n_converted) AS r_total,
                   sum(CAST(dose AS HUGEINT) * n_customers) AS sx,
                   sum(CAST(dose AS HUGEINT) * dose * n_customers) AS sxx,
                   sum(CAST(dose AS HUGEINT) * n_converted) AS sr
            FROM per
        ), stats AS (
            SELECT CAST(n_total AS BIGINT) AS n_total,
                   CAST(r_total AS BIGINT) AS n_converted_total,
                   CASE WHEN CAST(r_total AS HUGEINT)
                             * (n_total - r_total)
                             * (CAST(n_total AS HUGEINT) * sxx - sx * sx)
                             > 0
                        THEN round(
                            CAST(CAST(n_total AS HUGEINT) * sr
                                 - CAST(r_total AS HUGEINT) * sx
                                 AS DOUBLE)
                            / sqrt(CAST(CAST(r_total AS HUGEINT)
                                        * (n_total - r_total)
                                        * (CAST(n_total AS HUGEINT) * sxx
                                           - sx * sx) AS DOUBLE)
                                   / n_total), 6)
                   END AS ca_z
            FROM tot
        )
        SELECT p.dose,
               CAST(p.n_customers AS BIGINT) AS n_customers,
               CAST(p.n_converted AS BIGINT) AS n_converted,
               round(p.n_converted / CAST(p.n_customers AS DOUBLE), 6)
                   AS conv_rate,
               s.n_total, s.n_converted_total, s.ca_z,
               abs(s.ca_z) > 1.96 AS trend_detected
        FROM per p CROSS JOIN stats s
        ORDER BY p.dose
    """,
    "embedding_mmd2_drift": f"""
        WITH expl AS (
            SELECT vec_id, label, vec_id % 2 AS snap,
                   generate_subscripts(embedding, 1) AS d,
                   CAST(round(CAST(unnest(embedding) AS DOUBLE)
                              * {_MMD_GRID}) AS BIGINT) AS xv
            FROM embeddings
        ), smat AS (
            SELECT a.label, a.snap, a.d, b.d AS d2,
                   sum(a.xv * b.xv) AS s
            FROM expl a JOIN expl b ON a.vec_id = b.vec_id
            GROUP BY 1, 2, 3, 4
        ), counts AS (
            SELECT label,
                   count(*) FILTER (vec_id % 2 = 0) AS n_a,
                   count(*) FILTER (vec_id % 2 = 1) AS n_b
            FROM embeddings GROUP BY 1
        ), j AS (
            SELECT a.label, c.n_a, c.n_b,
                   CAST(c.n_b AS HUGEINT) * a.s
                       - CAST(c.n_a AS HUGEINT) * b.s AS diff,
                   CAST(a.s AS HUGEINT) AS sa,
                   CAST(b.s AS HUGEINT) AS sb
            FROM smat a
            JOIN smat b ON a.label = b.label AND a.d = b.d
                       AND a.d2 = b.d2 AND a.snap = 0 AND b.snap = 1
            JOIN counts c ON c.label = a.label
        ), per AS (
            SELECT label, max(n_a) AS n_a, max(n_b) AS n_b,
                   sum(diff * diff) AS num,
                   sum(sa * sa) AS sa2, sum(sb * sb) AS sb2
            FROM j GROUP BY 1
        )
        SELECT label,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               round(CAST(num AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * n_a * n_b * n_b
                        * {float(_MMD_GRID) ** 4!r}), 9) AS mmd2,
               round(CAST(num AS DOUBLE)
                     / CAST(CAST(n_b AS HUGEINT) * n_b * sa2
                            + CAST(n_a AS HUGEINT) * n_a * sb2
                            AS DOUBLE), 9) AS drift_share,
               round(CAST(num AS DOUBLE)
                     / CAST(CAST(n_b AS HUGEINT) * n_b * sa2
                            + CAST(n_a AS HUGEINT) * n_a * sb2
                            AS DOUBLE), 9) > {_MMD_SHARE_MAX} AS drifted
        FROM per ORDER BY label
    """,
    "events_kuiper_tod_drift": f"""
        WITH d0 AS (
            SELECT min(CAST(ts AS DATE)) AS d0 FROM events
        ), sided AS (
            SELECT event_type,
                   extract('hour' FROM ts) * 3600
                   + extract('minute' FROM ts) * 60
                   + extract('second' FROM ts) AS tod,
                   CAST(ts AS DATE) < d0 + {_KS_SPLIT_DAYS} AS early
            FROM events CROSS JOIN d0
        ), counts AS (
            SELECT event_type, tod,
                   sum(CASE WHEN early THEN 1 ELSE 0 END) AS ce,
                   sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS cl
            FROM sided GROUP BY 1, 2
        ), cum AS (
            SELECT event_type,
                   sum(ce) OVER w AS cume,
                   sum(cl) OVER w AS cuml,
                   sum(ce) OVER t AS ne,
                   sum(cl) OVER t AS nl
            FROM counts
            WINDOW w AS (PARTITION BY event_type ORDER BY tod
                         ROWS UNBOUNDED PRECEDING),
                   t AS (PARTITION BY event_type)
        ), agg AS (
            SELECT event_type,
                   CAST(max(ne) AS BIGINT) AS n_early,
                   CAST(max(nl) AS BIGINT) AS n_late,
                   greatest(max(CAST(nl AS HUGEINT) * cume
                                - CAST(ne AS HUGEINT) * cuml),
                            CAST(0 AS HUGEINT)) AS dpos,
                   greatest(max(CAST(ne AS HUGEINT) * cuml
                                - CAST(nl AS HUGEINT) * cume),
                            CAST(0 AS HUGEINT)) AS dneg
            FROM cum GROUP BY 1
        )
        SELECT event_type, n_early, n_late,
               round(CAST(dpos + dneg AS DOUBLE)
                     / (CAST(n_early AS DOUBLE) * n_late), 6)
                   AS kuiper_v,
               round({_KUIPER_COEF} * sqrt((n_early + n_late)
                     / (CAST(n_early AS DOUBLE) * n_late)), 6)
                   AS kuiper_crit,
               round(CAST(dpos + dneg AS DOUBLE)
                     / (CAST(n_early AS DOUBLE) * n_late), 6)
                   > round({_KUIPER_COEF} * sqrt((n_early + n_late)
                     / (CAST(n_early AS DOUBLE) * n_late)), 6)
                   AS drift_detected
        FROM agg ORDER BY event_type
    """,
    "spend_trend_jonckheere": f"""
        WITH spend AS (
            SELECT o_custkey AS c_custkey,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS spend
            FROM orders GROUP BY 1
        ), dosed AS (
            SELECT CAST(floor(CAST(round(c.c_acctbal * 100) AS BIGINT)
                              / {float(_CA_DOSE_CENTS)}) AS INT) AS dose,
                   coalesce(s.spend, 0) AS spend
            FROM customer c LEFT JOIN spend s ON c.c_custkey = s.c_custkey
        ), tiers AS (
            SELECT dose, spend, count(*) AS c
            FROM dosed GROUP BY 1, 2
        ), grid AS (
            SELECT d.dose, v.spend, coalesce(t.c, 0) AS c
            FROM (SELECT DISTINCT dose FROM tiers) d
            CROSS JOIN (SELECT DISTINCT spend FROM tiers) v
            LEFT JOIN tiers t ON t.dose = d.dose AND t.spend = v.spend
        ), pref AS (
            SELECT dose, spend, c,
                   coalesce(sum(c) OVER (
                       PARTITION BY dose ORDER BY spend
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cumlt
            FROM grid
        ), ab AS (
            SELECT dose, spend, c,
                   coalesce(sum(cumlt) OVER (
                       PARTITION BY spend ORDER BY dose
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS a_low,
                   coalesce(sum(c) OVER (
                       PARTITION BY spend ORDER BY dose
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS b_tie
            FROM pref
        ), jsum AS (
            SELECT sum(CAST(c AS HUGEINT) * (2 * a_low + b_tie))
                       AS two_j
            FROM ab
        ), gstats AS (
            SELECT sum(n_k) AS nn,
                   sum(CAST(n_k AS HUGEINT) * n_k) AS sn2,
                   sum(CAST(n_k AS HUGEINT) * (n_k - 1)) AS sn21,
                   sum(CAST(n_k AS HUGEINT) * (n_k - 1) * (n_k - 2))
                       AS sn321,
                   sum(CAST(n_k AS HUGEINT) * (n_k - 1)
                       * (2 * n_k + 5)) AS sn25
            FROM (SELECT dose, count(*) AS n_k FROM dosed GROUP BY 1)
        ), tstats AS (
            SELECT sum(CAST(t_v AS HUGEINT) * (t_v - 1)) AS st21,
                   sum(CAST(t_v AS HUGEINT) * (t_v - 1) * (t_v - 2))
                       AS st321,
                   sum(CAST(t_v AS HUGEINT) * (t_v - 1)
                       * (2 * t_v + 5)) AS st25
            FROM (SELECT spend, count(*) AS t_v FROM dosed GROUP BY 1)
        ), stats AS (
            SELECT CAST(j.two_j AS BIGINT) AS two_j,
                   CAST(g.nn AS BIGINT) AS n_total,
                   CASE WHEN
                        CAST(CAST(g.nn AS HUGEINT) * (g.nn - 1)
                             * (2 * g.nn + 5)
                             - g.sn25 - t.st25 AS DOUBLE) / 72.0
                        + CAST(g.sn321 * t.st321 AS DOUBLE)
                          / (36.0 * CAST(g.nn AS DOUBLE) * (g.nn - 1)
                             * (g.nn - 2))
                        + CAST(g.sn21 * t.st21 AS DOUBLE)
                          / (8.0 * CAST(g.nn AS DOUBLE) * (g.nn - 1))
                        > 0
                   THEN round(
                        (CAST(j.two_j AS DOUBLE) / 2.0
                         - CAST(CAST(g.nn AS HUGEINT) * g.nn - g.sn2
                                AS DOUBLE) / 4.0)
                        / sqrt(
                          CAST(CAST(g.nn AS HUGEINT) * (g.nn - 1)
                               * (2 * g.nn + 5)
                               - g.sn25 - t.st25 AS DOUBLE) / 72.0
                          + CAST(g.sn321 * t.st321 AS DOUBLE)
                            / (36.0 * CAST(g.nn AS DOUBLE)
                               * (g.nn - 1) * (g.nn - 2))
                          + CAST(g.sn21 * t.st21 AS DOUBLE)
                            / (8.0 * CAST(g.nn AS DOUBLE)
                               * (g.nn - 1))), 6)
                   END AS jt_z
            FROM jsum j CROSS JOIN gstats g CROSS JOIN tstats t
        )
        SELECT p.dose,
               CAST(p.n_customers AS BIGINT) AS n_customers,
               CAST(p.total_spend_cents AS BIGINT)
                   AS total_spend_cents,
               s.two_j, s.n_total, s.jt_z,
               abs(s.jt_z) > 1.96 AS trend_detected
        FROM (SELECT dose, count(*) AS n_customers,
                     sum(spend) AS total_spend_cents
              FROM dosed GROUP BY 1) p
        CROSS JOIN stats s
        ORDER BY p.dose
    """,
    "user_type_cochran_q": """
        WITH present AS (
            SELECT DISTINCT user_id, event_type FROM events
            WHERE value > {hv}
        ), g AS (
            SELECT event_type, count(*) AS g_j FROM present GROUP BY 1
        ), l_u AS (
            SELECT user_id, count(*) AS l_i FROM present GROUP BY 1
        ), gt AS (
            SELECT count(*) AS k, sum(g_j) AS sg,
                   sum(CAST(g_j AS HUGEINT) * g_j) AS sg2
            FROM g
        ), lt AS (
            SELECT count(*) AS n_users, sum(l_i) AS sl,
                   sum(CAST(l_i AS HUGEINT) * l_i) AS sl2
            FROM l_u
        ), stats AS (
            SELECT CAST(k AS INTEGER) AS k_types,
                   CAST(n_users AS BIGINT) AS n_users,
                   CASE WHEN CAST(k AS HUGEINT) * sl - sl2 > 0
                        THEN round(
                            CAST(CAST(k - 1 AS HUGEINT)
                                 * (CAST(k AS HUGEINT) * sg2
                                    - CAST(sg AS HUGEINT) * sg)
                                 AS DOUBLE)
                            / CAST(CAST(k AS HUGEINT) * sl - sl2
                                   AS DOUBLE), 6)
                   END AS q_stat,
                   CAST(k - 1 AS INTEGER) AS df,
                   CAST(CASE k - 1 {chi2_case} END AS DOUBLE)
                       AS chi2_crit
            FROM gt CROSS JOIN lt
        )
        SELECT p.event_type,
               CAST(p.g_j AS BIGINT) AS n_users_with,
               round(p.g_j / CAST(s.n_users AS DOUBLE), 6)
                   AS adoption_share,
               s.k_types, s.n_users, s.q_stat, s.df, s.chi2_crit,
               s.q_stat > s.chi2_crit AS significant
        FROM g p CROSS JOIN stats s
        ORDER BY p.event_type
    """.format(chi2_case=" ".join(
        f"WHEN {df} THEN {v}" for df, v in _CHI2_05.items()),
               hv=_HV_EVENT_VALUE),
    "balance_stump_split": f"""
        WITH priced AS (
            SELECT o_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS yc
            FROM orders
        ), mu AS (
            SELECT sum(yc) / CAST(count(*) AS DOUBLE) AS mu FROM priced
        ), conv AS (
            SELECT DISTINCT o_custkey AS c_custkey
            FROM priced CROSS JOIN mu WHERE yc > mu
        ), labeled AS (
            SELECT CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents,
                   CASE WHEN v.c_custkey IS NULL THEN 0 ELSE 1 END AS y
            FROM customer c LEFT JOIN conv v ON c.c_custkey = v.c_custkey
        ), rng AS (
            SELECT min(cents) AS mn, max(cents) AS mx,
                   max(cents) - min(cents) + 1 AS w
            FROM labeled
        ), grid AS (
            SELECT ((cents - mn) * {_STUMP_BINS}) // w AS bin,
                   max(w) AS w, max(mn) AS mn,
                   count(*) AS n_b, sum(y) AS p_b
            FROM labeled CROSS JOIN rng GROUP BY 1
        ), pref AS (
            SELECT g.bin, max(g.w) AS w, max(g.mn) AS mn,
                   sum(l.n_b) AS n_left, sum(l.p_b) AS pos_left
            FROM grid g JOIN grid l ON l.bin <= g.bin
            GROUP BY 1
        ), parent AS (
            SELECT sum(n_b) AS n_tot, sum(p_b) AS p_tot FROM grid
        ), cand AS (
            SELECT p.bin, p.w, p.mn, p.n_left, p.pos_left,
                   t.n_tot - p.n_left AS n_right,
                   t.p_tot - p.pos_left AS pos_right,
                   t.n_tot, t.p_tot
            FROM pref p CROSS JOIN parent t
            WHERE p.n_left > 0 AND t.n_tot - p.n_left > 0
        ), scored AS (
            SELECT bin,
                   mn + (w * (bin + 1) + {_STUMP_BINS - 1})
                       // {_STUMP_BINS} - 1 AS split_at_cents,
                   n_left, pos_left, n_right, pos_right,
                   round(
                     (CAST(n_tot AS DOUBLE)
                      - (CAST(p_tot AS DOUBLE) * p_tot
                         + CAST(n_tot - p_tot AS DOUBLE)
                           * (n_tot - p_tot)) / n_tot)
                     - (CAST(n_left AS DOUBLE)
                        - (CAST(pos_left AS DOUBLE) * pos_left
                           + CAST(n_left - pos_left AS DOUBLE)
                             * (n_left - pos_left)) / n_left)
                     - (CAST(n_right AS DOUBLE)
                        - (CAST(pos_right AS DOUBLE) * pos_right
                           + CAST(n_right - pos_right AS DOUBLE)
                             * (n_right - pos_right)) / n_right),
                     9) AS gini_gain
            FROM cand
        ), best AS (
            SELECT max(gini_gain) AS bg FROM scored
        ), bestbin AS (
            SELECT min(s.bin) AS bb, max(b.bg) AS bg
            FROM scored s JOIN best b ON s.gini_gain = b.bg
        )
        SELECT CAST(s.bin AS INTEGER) AS bin,
               s.split_at_cents,
               CAST(s.n_left AS BIGINT) AS n_left,
               CAST(s.pos_left AS BIGINT) AS pos_left,
               CAST(s.n_right AS BIGINT) AS n_right,
               CAST(s.pos_right AS BIGINT) AS pos_right,
               s.gini_gain,
               s.gini_gain = b.bg AND s.bin = b.bb AS is_best
        FROM scored s CROSS JOIN bestbin b
        ORDER BY s.bin
    """,
    "ab_ratio_metric_delta": f"""
        WITH users AS (
            SELECT user_id,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 2 AS arm,
                   count(*) AS n_u,
                   sum(CAST(round(value * 1000) AS BIGINT)) AS y_u
            FROM events GROUP BY 1
        ), arms AS (
            SELECT arm, count(*) AS k,
                   sum(y_u) AS sy, sum(n_u) AS sn,
                   sum(CAST(y_u AS HUGEINT) * y_u) AS syy,
                   sum(CAST(n_u AS HUGEINT) * n_u) AS snn,
                   sum(CAST(y_u AS HUGEINT) * n_u) AS syn
            FROM users GROUP BY 1
        ), stats AS (
            SELECT arm, k, sy, sn,
                   sy / CAST(sn AS DOUBLE) AS ratio_milli,
                   CAST(CAST(sn AS HUGEINT) * sn
                            * (CAST(k AS HUGEINT) * syy
                               - CAST(sy AS HUGEINT) * sy)
                        - CAST(2 AS HUGEINT) * sy * sn
                            * (CAST(k AS HUGEINT) * syn
                               - CAST(sy AS HUGEINT) * sn)
                        + CAST(sy AS HUGEINT) * sy
                            * (CAST(k AS HUGEINT) * snn
                               - CAST(sn AS HUGEINT) * sn)
                        AS DOUBLE)
                   / ((k - 1) * CAST(sn AS DOUBLE) * sn * sn * sn)
                       AS var_milli
            FROM arms
        ), wide AS (
            SELECT max(CASE WHEN arm = 0 THEN ratio_milli END) AS rc,
                   max(CASE WHEN arm = 1 THEN ratio_milli END) AS rt,
                   max(CASE WHEN arm = 0 THEN var_milli END) AS vc,
                   max(CASE WHEN arm = 1 THEN var_milli END) AS vt
            FROM stats
        ), wz AS (
            SELECT CASE WHEN vc + vt > 0
                        THEN round((rt - rc) / sqrt(vc + vt), 6)
                   END AS delta_z
            FROM wide
        )
        SELECT s.arm,
               CAST(s.k AS BIGINT) AS n_users,
               CAST(s.sn AS BIGINT) AS n_events,
               CAST(s.sy AS BIGINT) AS sum_value_milli,
               round(s.ratio_milli / 1000.0, 6) AS ratio_per_event,
               round(sqrt(s.var_milli) / 1000.0, 9) AS se_ratio,
               w.delta_z,
               abs(w.delta_z) > 1.96 AS significant
        FROM stats s CROSS JOIN wz w
        ORDER BY s.arm
    """,
    "bleu_neardup_pairs": _SIG_CTE + f"""
        , bands AS ({_BANDS_UNION}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                        AND a.doc_id < b.doc_id
        ),
        toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        uni AS (
            SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
        ),
        lens AS (
            SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY 1
        ),
        big AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' '
                            || string_split(text, ' ')[i + 1])) AS tok
            FROM documents
        ),
        bigc AS (
            SELECT doc_id, tok, count(*) AS c FROM big GROUP BY 1, 2
        ),
        m1 AS (
            SELECT p.doc_a, p.doc_b,
                   sum(least(a.c, b.c)) AS match_1
            FROM pairs p
            JOIN uni a ON a.doc_id = p.doc_a
            JOIN uni b ON b.doc_id = p.doc_b AND b.tok = a.tok
            GROUP BY 1, 2
        ),
        m2 AS (
            SELECT p.doc_a, p.doc_b,
                   sum(least(a.c, b.c)) AS match_2
            FROM pairs p
            JOIN bigc a ON a.doc_id = p.doc_a
            JOIN bigc b ON b.doc_id = p.doc_b AND b.tok = a.tok
            GROUP BY 1, 2
        ),
        joined AS (
            SELECT p.doc_a, p.doc_b,
                   la.n_tok AS len_a, lb.n_tok AS len_b,
                   coalesce(m1.match_1, 0) AS match_1,
                   coalesce(m2.match_2, 0) AS match_2
            FROM pairs p
            JOIN lens la ON la.doc_id = p.doc_a
            JOIN lens lb ON lb.doc_id = p.doc_b
            LEFT JOIN m1 ON m1.doc_a = p.doc_a AND m1.doc_b = p.doc_b
            LEFT JOIN m2 ON m2.doc_a = p.doc_a AND m2.doc_b = p.doc_b
        )
        SELECT doc_a, doc_b, len_a, len_b,
               CAST(match_1 AS BIGINT) AS match_1,
               CAST(match_2 AS BIGINT) AS match_2,
               round(match_1 / CAST(len_a AS DOUBLE), 6) AS p1,
               CASE WHEN len_a > 1
                    THEN round(match_2 / CAST(len_a - 1 AS DOUBLE), 6)
                    ELSE 0.0 END AS p2,
               CASE WHEN match_1 > 0 AND match_2 > 0 AND len_a > 1
                    THEN round(
                        (CASE WHEN len_a > len_b THEN 1.0
                              ELSE exp(1.0 - len_b
                                       / CAST(len_a AS DOUBLE)) END)
                        * sqrt((match_1 / CAST(len_a AS DOUBLE))
                               * (match_2 / CAST(len_a - 1 AS DOUBLE))),
                        6)
                    ELSE 0.0 END AS bleu2
        FROM joined ORDER BY doc_a, doc_b
    """,
}

_RBO_W_CASE = " ".join(f"WHEN {depth} THEN {w!r}"
                       for depth, w in _RBO_W.items())


def _rbo_oracle() -> str:
    # Deferred import so the module never holds a second reference to
    # similarity's ORACLES at import time (same lazy style as the
    # query function's chain imports).
    from .similarity import ORACLES as _sim

    return """
        WITH bf AS (
            SELECT query_id, neighbor_id AS id, rank AS ra
            FROM ({bf_sql}) __bf
        ), ann AS (
            SELECT query_id, neighbor_id AS id, rank AS rb
            FROM ({ann_sql}) __ann
        ), common AS (
            SELECT b.query_id, greatest(b.ra, a.rb) AS dmin
            FROM bf b
            JOIN ann a ON a.query_id = b.query_id AND a.id = b.id
        ), depths AS (
            SELECT unnest(generate_series(1, {k})) AS d
        ), grid AS (
            SELECT q.query_id, dd.d
            FROM (SELECT DISTINCT query_id FROM bf) q
            CROSS JOIN depths dd
        ), cd AS (
            SELECT g.query_id, g.d,
                   sum(CASE WHEN c.dmin <= g.d THEN 1 ELSE 0 END) AS c
            FROM grid g
            LEFT JOIN common c ON c.query_id = g.query_id
            GROUP BY 1, 2
        ), terms AS (
            SELECT query_id, d, c,
                   CAST(round((CASE d {wcase} END) * c / d, 0)
                        AS BIGINT)
                   + CASE WHEN d = {k}
                          THEN CAST(round({extw!r} * c / d, 0)
                                    AS BIGINT)
                          ELSE 0 END AS m
            FROM cd
        ), per AS (
            SELECT query_id, sum(m) AS micro,
                   max(CASE WHEN d = {k} THEN c END) AS overlap_at_k
            FROM terms GROUP BY 1
        ), g2 AS (
            SELECT CAST(count(*) AS BIGINT) AS n_queries,
                   round(sum(micro) / 1e9 / count(*), 6) AS mean_rbo
            FROM per
        )
        SELECT p.query_id,
               CAST(p.overlap_at_k AS BIGINT) AS overlap_at_k,
               round(p.micro / 1e9, 9) AS rbo_ext,
               g2.n_queries, g2.mean_rbo
        FROM per p CROSS JOIN g2
        ORDER BY p.query_id
    """.format(bf_sql=_sim["cosine_topk_bruteforce"],
               ann_sql=_sim["pq_topk"],
               k=_RBO_K, wcase=_RBO_W_CASE, extw=_RBO_EXT_W)


ORACLES["retrieval_rbo_eval"] = _rbo_oracle()
