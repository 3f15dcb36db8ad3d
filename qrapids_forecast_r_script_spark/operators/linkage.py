"""Entity-resolution (record-linkage) pipeline — blocking, field-level
comparison, Fellegi-Sunter-style scoring, and a ground-truth-scored
quality report (north-star extension; the reference R service has no
matching surface — extends SURVEY §2B next to the dedup layer, which
ships the component primitives: `part_name_editdist_pairs` blocking +
Levenshtein, `contrastive_pairs` supervision mining).

The fixture lacks a second customer registry, so the query constructs a
deterministically PERTURBED copy (the `snapshot_table_diff` precedent):
every record re-keyed, a rule-based subset of names character-dropped
and balances jittered.  That gives the pipeline a known ground truth —
the output is the match-quality confusion (verdict × is-same-entity),
i.e. exactly the report a linkage run is judged by (Fellegi & Sunter
1969; Christen 2012's blocking/compare/classify decomposition).

100 TB shape: candidate generation is the blocking equi-join on
(nation, name-SUFFIX) — never A×B; comparison vectors (normalized edit
similarity, balance proximity) run inside whole-stage codegen on
candidates only; the classifier is a threshold on a 6dp-rounded score
of exact-integer-derived terms.  Blocking-key choice is data-driven:
this registry's names share a constant PREFIX ("Customer#…"), so
prefix blocking degenerates to nation-only blocks (measured 37.6 s at
sf0.1 — 9M candidate pairs of O(len²) edit distance); the last-3-chars
key has ~1000× the selectivity and survives the perturbation (which
edits the head, not the tail), cutting candidates to ~1 per record
(measured ~2 s).  Blocking-key cardinality stays the scale knob
(longer suffix / LSH over q-grams), identical plan shape either way;
the blocked join's skew follows key frequency — the
`join_key_skew_profile` read applies before choosing salt vs AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table

_PERTURB_MOD = 7          # every 7th key: drop the name's 4th character
_JITTER_MOD = 5           # balance jitter class: +(key % 5) cents
_W_NAME = 0.7             # Fellegi-Sunter-ish agreement weights
_W_BAL = 0.3
_MATCH_T = 0.95
_POSSIBLE_T = 0.80


def _sides(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(F.col("c_custkey").alias("key_a"),
                    F.col("c_name").alias("name_a"),
                    F.col("c_nationkey").alias("nat"),
                    F.round("c_acctbal", 2).alias("bal_a"))
    perturbed = F.col("c_custkey") % _PERTURB_MOD == 0
    b = cust.select(
        F.col("c_custkey").alias("key_b"),
        F.when(perturbed,
               F.concat(F.substring("c_name", 1, 3),
                        F.substring("c_name", 5, 1_000_000)))
         .otherwise(F.col("c_name")).alias("name_b"),
        F.col("c_nationkey").alias("nat"),
        F.round(F.col("c_acctbal")
                + (F.col("c_custkey") % _JITTER_MOD) * 0.01, 2)
         .alias("bal_b"))
    return a, b


def customer_entity_resolution(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Block on (nation, 3-char name SUFFIX) → compare → classify →
    score against ground truth (same source key = same entity).

    name_sim = 1 − editdist/maxlen (exact integers over exact integers,
    one correctly-rounded division); bal_sim = 1 − min(1, |Δbal|/100)
    with Δbal on the 2dp grid.  score = 0.7·name_sim + 0.3·bal_sim
    rounded 6dp; verdict thresholds 0.95 / 0.80."""
    a, b = _sides(spark, sf_dir)
    cand = a.join(b, (a["nat"] == b["nat"])
                  & (F.substring(a["name_a"], -3, 3)
                     == F.substring(b["name_b"], -3, 3)))
    ed = F.levenshtein("name_a", "name_b")
    maxlen = F.greatest(F.length("name_a"), F.length("name_b"))
    name_sim = 1.0 - ed / maxlen
    bal_sim = 1.0 - F.least(F.lit(1.0), F.abs(F.col("bal_a")
                                              - F.col("bal_b")) / 100.0)
    score = F.round(_W_NAME * name_sim + _W_BAL * bal_sim, 6)
    verdict = (F.when(score >= _MATCH_T, F.lit("match"))
               .when(score >= _POSSIBLE_T, F.lit("possible"))
               .otherwise(F.lit("non_match")))
    return (cand
            .select(verdict.alias("verdict"),
                    (F.col("key_a") == F.col("key_b"))
                    .alias("is_same_entity"),
                    score.alias("score"))
            .groupBy("verdict", "is_same_entity")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.round(F.min("score"), 6).alias("min_score"),
                 F.round(F.max("score"), 6).alias("max_score"))
            .orderBy("verdict", "is_same_entity"))


QUERIES = {
    "customer_entity_resolution": customer_entity_resolution,
}

ORACLES = {
    "customer_entity_resolution": f"""
        WITH a AS (
            SELECT c_custkey AS key_a, c_name AS name_a,
                   c_nationkey AS nat, round(c_acctbal, 2) AS bal_a
            FROM customer
        ), b AS (
            SELECT c_custkey AS key_b,
                   CASE WHEN c_custkey % {_PERTURB_MOD} = 0
                        THEN substr(c_name, 1, 3) || substr(c_name, 5)
                        ELSE c_name END AS name_b,
                   c_nationkey AS nat,
                   round(c_acctbal
                         + (c_custkey % {_JITTER_MOD}) * 0.01, 2) AS bal_b
            FROM customer
        ), cand AS (
            SELECT key_a, name_a, bal_a, key_b, name_b, bal_b,
                   round({_W_NAME} * (1.0 - levenshtein(name_a, name_b)
                         / CAST(greatest(length(name_a), length(name_b))
                                AS DOUBLE))
                         + {_W_BAL} * (1.0 - least(1.0,
                               abs(bal_a - bal_b) / 100.0)), 6) AS score
            FROM a JOIN b USING (nat)
            WHERE right(name_a, 3) = right(name_b, 3)
        )
        SELECT CASE WHEN score >= {_MATCH_T} THEN 'match'
                    WHEN score >= {_POSSIBLE_T} THEN 'possible'
                    ELSE 'non_match' END AS verdict,
               key_a = key_b AS is_same_entity,
               count(*) AS n_pairs,
               round(min(score), 6) AS min_score,
               round(max(score), 6) AS max_score
        FROM cand
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
}


def blocking_quality_metrics(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """REDUCTION RATIO and PAIRS COMPLETENESS of the entity-
    resolution blocking scheme (Christen 2012, ch. 7 — the two
    numbers every blocking design is judged by): RR = 1 −
    |candidates| / |A×B| measures how much comparison work the
    (nation, 3-char name suffix) blocks save, PC = the fraction of
    TRUE matches (key_a = key_b, known by construction here) that
    survive blocking — the recall ceiling no downstream comparator
    can exceed.  The quality-vs-cost frontier read that decides
    whether to widen the blocks (PC up, RR down) before touching
    the Fellegi-Sunter weights.

    Exactness: all four counts are exact integers (|A×B| is a
    product of two counts, never materialized); RR and PC are
    single divisions.

    Scale: the candidate count rides the same blocked equi-join as
    `customer_entity_resolution` (never A×B); true-match counting
    is one key equi-join."""
    a, b = _sides(spark, sf_dir)
    cand = (a.join(b, "nat")
            .where(F.expr("right(name_a, 3) = right(name_b, 3)")))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    n_cand_true = (cand.where(F.col("key_a") == F.col("key_b"))
                   .agg(F.count(F.lit(1)).alias("n_cand_true")))
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    # true matches = the keyed identity pairs (one per customer)
    return (n_cand.crossJoin(F.broadcast(n_cand_true))
            .crossJoin(F.broadcast(na)).crossJoin(F.broadcast(nb))
            .select(
                "n_a", "n_b", "n_cand", "n_cand_true",
                F.round(1.0 - F.col("n_cand")
                        / (F.col("n_a").cast("double")
                           * F.col("n_b")), 6).alias("reduction_ratio"),
                F.round(F.col("n_cand_true")
                        / F.col("n_a").cast("double"), 6)
                .alias("pairs_completeness")))


QUERIES["blocking_quality_metrics"] = blocking_quality_metrics
ORACLES["blocking_quality_metrics"] = f"""
    WITH a AS (
        SELECT c_custkey AS key_a, c_name AS name_a,
               c_nationkey AS nat
        FROM customer
    ), b AS (
        SELECT c_custkey AS key_b,
               CASE WHEN c_custkey % {_PERTURB_MOD} = 0
                    THEN substr(c_name, 1, 3) || substr(c_name, 5)
                    ELSE c_name END AS name_b,
               c_nationkey AS nat
        FROM customer
    ), cand AS (
        SELECT key_a, key_b
        FROM a JOIN b USING (nat)
        WHERE right(name_a, 3) = right(name_b, 3)
    ), c1 AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
    c2 AS (SELECT CAST(count(*) AS BIGINT) AS n_cand_true
           FROM cand WHERE key_a = key_b),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM a),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b)
    SELECT n_a, n_b, n_cand, n_cand_true,
           round(1.0 - n_cand / (CAST(n_a AS DOUBLE) * n_b), 6)
               AS reduction_ratio,
           round(n_cand_true / CAST(n_a AS DOUBLE), 6)
               AS pairs_completeness
    FROM c1 CROSS JOIN c2 CROSS JOIN na CROSS JOIN nb
"""


# ---------------------------------------------------------------------------
# Round 7: phonetic blocking keys — the third classical blocking family
# next to the suffix blocking above and the dedup layer's LSH banding.

def phonetic_token_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHONETIC blocking-key audit over the corpus vocabulary: group
    the distinct alphabetic tokens of `documents` by their American
    SOUNDEX code (Russell 1918/1922; the blocking key of Fellegi-
    Sunter-era record linkage and still Christen 2012's first-listed
    standard blocking scheme) and emit every code holding ≥ 2 distinct
    tokens — the candidate sets a phonetic-blocked linkage or
    spelling-variant expansion would compare, with per-code token and
    occurrence counts sizing each block before the quadratic compare
    step (the `join_key_skew_profile` read, phonetically keyed).

    Spark side: the BUILT-IN `soundex` (JVM whole-stage codegen, no
    UDF).  The oracle replays the exact algorithm relationally —
    translate letters to digit codes (H/W→9), drop the 9s (the H/W
    rule: consonants separated only by H or W collapse), collapse
    adjacent duplicate digits, drop the first code unless the word
    starts with H/W, strip the vowel 0s, pad to 4 — pinned against
    Spark's output over the full corpus vocabulary plus the NARA
    golden words in tests.

    Scale: one token explode (map-side), one vocabulary-bounded
    distinct-token aggregate, one code-keyed regroup — block sizes,
    never candidate pairs, leave the query."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select(F.explode(F.split("text", " ")).alias("tok"))
            .where(F.col("tok").rlike("^[A-Za-z]+$")))
    per_tok = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("occ"))
    coded = per_tok.select(F.soundex(F.upper("tok")).alias("code"),
                           "tok", "occ")
    return (coded.groupBy("code")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("occ").alias("n_occurrences"),
                 F.array_join(F.array_sort(F.collect_list("tok")), ",")
                 .alias("tokens"))
            .where(F.col("n_tokens") >= 2)
            .orderBy("code"))


QUERIES["phonetic_token_groups"] = phonetic_token_groups

# American Soundex letter→code table: vowels (AEIOUY)→0, H/W→9 (the
# removable non-separators), consonant classes 1-6.
_SOUNDEX_TR = "01230129022455012623019202"
# collapse runs of each digit (RE2 has no backreferences)
_SOUNDEX_COLLAPSE = "s1"
for _d in "0123456":
    _SOUNDEX_COLLAPSE = (f"regexp_replace({_SOUNDEX_COLLAPSE}, "
                         f"'{_d}{_d}+', '{_d}', 'g')")

ORACLES["phonetic_token_groups"] = f"""
    WITH toks AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS occ FROM (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents)
        WHERE regexp_full_match(tok, '[A-Za-z]+')
        GROUP BY tok
    ), up AS (
        SELECT tok, occ, upper(tok) AS u FROM toks
    ), c1 AS (
        SELECT tok, occ, u,
               replace(translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                 '{_SOUNDEX_TR}'), '9', '') AS s1
        FROM up
    ), c2 AS (
        SELECT tok, occ, u, {_SOUNDEX_COLLAPSE} AS s2 FROM c1
    ), c3 AS (
        SELECT tok, occ,
               substr(u, 1, 1)
               || substr(replace(CASE WHEN substr(u, 1, 1) IN ('H', 'W')
                                      THEN s2 ELSE substr(s2, 2) END,
                                 '0', '') || '000', 1, 3) AS code
        FROM c2
    )
    SELECT code, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(occ) AS BIGINT) AS n_occurrences,
           string_agg(tok, ',' ORDER BY tok) AS tokens
    FROM c3 GROUP BY code HAVING count(*) >= 2 ORDER BY code
"""
