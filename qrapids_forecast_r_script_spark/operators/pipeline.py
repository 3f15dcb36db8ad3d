"""Composite pipeline operators (north-star extension): the end-to-end
shapes a training-data platform actually runs — a multi-stage corpus
cleaning pass, and relational embedding analytics — each as ONE
declarative Catalyst plan with an exact DuckDB oracle.

Individual stages (quality scoring, dedup, text stats) are oracled
separately in operators/text.py and operators/dedup.py; these queries
verify that the *composition* holds together — filters feeding dedup
feeding aggregation in a single job, the way a 100 TB cleaning pass
would run it (one scan, no intermediate materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .text import _STOP_SQL_HITS, quality_flags


def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style cleaning pass per source: quality filter (length
    band + stopword + repetition — the shared :func:`text.quality_flags`
    verdict, so the pipeline can never drift from the standalone
    scorer) → exact dedup (md5(text), keep lowest doc_id) → per-source
    funnel stats.

    One scan of ``documents``; the quality stage is the exploded-token
    aggregate, dedup is one shuffle on the text hash, the funnel
    aggregates are two partial aggs joined on the (tiny) source key.  At
    100 TB the md5 shuffle is the only wide stage and partitions evenly
    (hash of content).
    """
    docs = load_table(spark, sf_dir, "documents")
    flagged = (quality_flags(docs)
               .join(docs.select("doc_id", "source", "text"), "doc_id")
               .select("doc_id", "source", "text", "n_tokens", "keep"))
    kept = (flagged.where("keep")
            .withColumn("rn", F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id"))))
    agg_all = (flagged.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum(F.when(F.col("keep"), 0).otherwise(1))
                     .alias("n_dropped_quality")))
    agg_kept = (kept.groupBy("source")
                .agg(F.count(F.lit(1)).alias("n_kept"),
                     F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
                      .alias("n_final"),
                     F.round(F.avg(F.when(F.col("rn") == 1,
                                          F.col("n_tokens"))), 4)
                      .alias("avg_tokens_final")))
    return (agg_all.join(agg_kept, "source", "left")
            .select("source", "n_docs", "n_dropped_quality",
                    (F.coalesce(F.col("n_kept"), F.lit(0))
                     - F.coalesce(F.col("n_final"), F.lit(0)))
                    .alias("n_dropped_dup"),
                    F.coalesce(F.col("n_final"), F.lit(0)).alias("n_final"),
                    "avg_tokens_final")
            .orderBy("source"))


def label_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding analytics fully relationally: per-label centroid, then
    each vector's cosine to its label centroid, averaged per label — the
    cluster-cohesion statistic, with zero UDFs.

    Vectors are posexploded to (vec_id, label, pos, v); the centroid is a
    plain avg per (label, pos); dot products and norms are sums per
    vector after an equi-join on (label, pos).  At scale: explode is
    map-side (rows × dim), both aggregations partial-agg before their
    shuffle, and the centroid side of the join is dims × labels — tiny,
    broadcast.  This is the pattern that keeps embedding math inside
    whole-stage codegen instead of a Python UDF per row.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("pos", "v_raw")
    ).select("vec_id", "label", "pos",
             F.col("v_raw").cast("double").alias("v"))
    cent = (expl.groupBy("label", "pos")
            .agg(F.avg("v").alias("c")))
    per_vec = (expl.join(F.broadcast(cent), ["label", "pos"])
               .groupBy("vec_id", "label")
               .agg(F.sum(F.col("v") * F.col("c")).alias("dot"),
                    F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv"),
                    F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nc")))
    return (per_vec
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.round(F.avg(F.col("dot") / (F.col("nv") * F.col("nc"))), 6)
                  .alias("avg_cos_to_centroid"))
            .orderBy("label"))


QUERIES = {
    "corpus_clean_pipeline": corpus_clean_pipeline,
    "label_centroid_cosine": label_centroid_cosine,
}

ORACLES = {
    "corpus_clean_pipeline": f"""
        WITH flagged AS (
            SELECT doc_id, source, text,
                   len(string_split(text, ' ')) AS n_tokens,
                   ({_STOP_SQL_HITS}) AS n_stop,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct
            FROM documents
        ), verdict AS (
            SELECT *,
                   (n_tokens >= 20 AND n_tokens <= 1000
                    AND round(n_stop / CAST(n_tokens AS DOUBLE), 6) >= 0.01
                    AND round(1 - n_distinct / CAST(n_tokens AS DOUBLE), 6)
                        <= 0.9) AS keep
            FROM flagged
        ), kept AS (
            SELECT *, row_number() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn
            FROM verdict WHERE keep
        ), agg_all AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_dropped_quality
            FROM verdict GROUP BY source
        ), agg_kept AS (
            SELECT source, count(*) AS n_kept,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_final,
                   round(avg(CASE WHEN rn = 1 THEN n_tokens END), 4)
                       AS avg_tokens_final
            FROM kept GROUP BY source
        )
        SELECT a.source, a.n_docs, a.n_dropped_quality,
               coalesce(k.n_kept, 0) - coalesce(k.n_final, 0) AS n_dropped_dup,
               coalesce(k.n_final, 0) AS n_final,
               k.avg_tokens_final
        FROM agg_all a LEFT JOIN agg_kept k USING (source)
        ORDER BY a.source
    """,
    "label_centroid_cosine": """
        WITH expl AS (
            SELECT vec_id, label,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ), cent AS (
            SELECT label, pos, avg(v) AS c FROM expl GROUP BY 1, 2
        ), per_vec AS (
            SELECT e.vec_id, e.label,
                   sum(e.v * c.c) AS dot,
                   sqrt(sum(e.v * e.v)) AS nv,
                   sqrt(sum(c.c * c.c)) AS nc
            FROM expl e JOIN cent c USING (label, pos)
            GROUP BY 1, 2
        )
        SELECT label, count(*) AS n_vecs,
               round(avg(dot / (nv * nc)), 6) AS avg_cos_to_centroid
        FROM per_vec
        GROUP BY label ORDER BY label
    """,
}

def observed_clean_pass(spark: SparkSession, sf_dir: str):
    """The cleaning pass instrumented with ``DataFrame.observe`` — the
    production data-quality-gate shape: per-job metrics (docs seen,
    docs kept, tokens kept) ride along with the SAME action that
    produces the output, at zero extra scans.  A 100 TB ingest wires
    these into its circuit breaker (abort the write when the keep rate
    collapses) instead of re-aggregating the corpus to find out.

    Returns ``(df, observation)``; the observation is populated after
    the first action on ``df``.  Demonstration + test surface (the
    metrics equal the directly-aggregated truth); the driver-facing
    result query stays :func:`corpus_clean_pipeline`.
    """
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    flagged = (quality_flags(docs)
               .join(docs.select("doc_id", "source"), "doc_id"))
    obs = Observation("clean_gate")
    observed = flagged.observe(
        obs,
        F.count(F.lit(1)).alias("docs_seen"),
        F.sum(F.col("keep").cast("long")).alias("docs_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens"))
              .otherwise(F.lit(0))).alias("tokens_kept"))
    return observed.where("keep").select("doc_id", "source", "n_tokens"), obs



def embedding_db_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin cluster-separation audit (Davies & Bouldin 1979)
    over the embedding labels: per label the intra-cluster scatter
    (mean Euclidean distance to the centroid), the WORST same-corpus
    partner by the DB ratio (s_i + s_j) / d(c_i, c_j), and that ratio
    — the separation read `label_centroid_cosine` (cohesion only)
    cannot give: a label can be tight AND sit on top of its neighbor.
    The label-space companion of `centroid_label_confusion` (which
    audits assignments; this audits the GEOMETRY the assignments live
    in).

    Centroid coordinates are snapped to 1e-6 before any distance (the
    `embedding_drift_centroids` discipline), so the labels × dims
    table is engine-identical and every downstream distance is IEEE
    arithmetic on identical inputs; per-vector distances and scatters
    round at 6dp.  Scale: one posexplode aggregate for centroids
    (labels × dims, broadcast back), one per-vector distance reduce,
    and a labels² pairwise table that never leaves the driver-tiny
    regime."""
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("pos", "v_raw")
    ).select("vec_id", "label", "pos",
             F.col("v_raw").cast("double").alias("v"))
    # r9 (guide §2.4): cent feeds the scatter join and both pairwise
    # sides, scat feeds both ratio sides and the final join — two
    # label-grain cuts keep the explode/aggregate chain single-run
    cent = (expl.groupBy("label", "pos")
            .agg(F.round(F.avg("v"), 6).alias("c"))
            .localCheckpoint())
    scat = (expl.join(F.broadcast(cent), ["label", "pos"])
            .groupBy("vec_id", "label")
            .agg(F.sqrt(F.sum((F.col("v") - F.col("c"))
                              * (F.col("v") - F.col("c"))))
                 .alias("dist"))
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.round(F.avg("dist"), 6).alias("scatter"))
            .localCheckpoint())
    ca = cent.select(F.col("label").alias("la"), "pos",
                     F.col("c").alias("cva"))
    cb = cent.select(F.col("label").alias("lb"), "pos",
                     F.col("c").alias("cvb"))
    cdist = (ca.join(cb, "pos")
             .where(F.col("la") != F.col("lb"))
             .groupBy("la", "lb")
             .agg(F.round(F.sqrt(F.sum(
                 (F.col("cva") - F.col("cvb"))
                 * (F.col("cva") - F.col("cvb")))), 6).alias("d")))
    sa = scat.select(F.col("label").alias("la"),
                     F.col("scatter").alias("s_a"))
    sb = scat.select(F.col("label").alias("lb"),
                     F.col("scatter").alias("s_b"))
    ratios = (cdist.join(F.broadcast(sa), "la")
              .join(F.broadcast(sb), "lb")
              .select("la", "lb",
                      F.round((F.col("s_a") + F.col("s_b"))
                              / F.col("d"), 6).alias("ratio")))
    from pyspark.sql.window import Window
    w = (Window.partitionBy("la")
         .orderBy(F.col("ratio").desc(), F.col("lb").asc()))
    worst = (ratios.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1)
             .select(F.col("la").alias("label"),
                     F.col("lb").alias("worst_partner"),
                     F.col("ratio").alias("db_ratio")))
    return (scat.join(worst, "label")
            .select("label", "n_vecs", "scatter", "worst_partner",
                    "db_ratio")
            .orderBy("label"))


QUERIES["embedding_db_index"] = embedding_db_index
ORACLES["embedding_db_index"] = """
    WITH expl AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ), cent AS (
        SELECT label, pos, round(avg(v), 6) AS c
        FROM expl GROUP BY 1, 2
    ), scat AS (
        SELECT label, count(*) AS n_vecs,
               round(avg(dist), 6) AS scatter
        FROM (SELECT e.vec_id, e.label,
                     sqrt(sum((e.v - c.c) * (e.v - c.c))) AS dist
              FROM expl e JOIN cent c USING (label, pos)
              GROUP BY 1, 2)
        GROUP BY 1
    ), cdist AS (
        SELECT a.label AS la, b.label AS lb,
               round(sqrt(sum((a.c - b.c) * (a.c - b.c))), 6) AS d
        FROM cent a JOIN cent b USING (pos)
        WHERE a.label != b.label
        GROUP BY 1, 2
    ), ratios AS (
        SELECT cd.la, cd.lb,
               round((sa.scatter + sb.scatter) / cd.d, 6) AS ratio
        FROM cdist cd
        JOIN scat sa ON cd.la = sa.label
        JOIN scat sb ON cd.lb = sb.label
    ), worst AS (
        SELECT la AS label, lb AS worst_partner, ratio AS db_ratio
        FROM (SELECT *, row_number() OVER (PARTITION BY la
                        ORDER BY ratio DESC, lb ASC) AS rn
              FROM ratios)
        WHERE rn = 1
    )
    SELECT s.label, s.n_vecs, s.scatter, w.worst_partner, w.db_ratio
    FROM scat s JOIN worst w ON s.label = w.label
    ORDER BY s.label
"""
