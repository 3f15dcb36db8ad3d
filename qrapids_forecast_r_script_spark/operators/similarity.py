"""Similarity search over the ``embeddings`` table (north-star extension).

- brute-force cosine top-k: the exact baseline — broadcast the (small)
  query set against the corpus, JVM-side dot products via zip_with /
  aggregate (no Python UDF), per-query top-k via ranked window.
- near-dup pairs with label blocking: the exact pairwise method made
  scalable by a blocking key (join within label only).
- LSH-bucketed ANN (random hyperplanes): the scale path — deterministic
  signed-projection buckets; candidates only within a bucket.  The
  hyperplanes are seeded constants so results are reproducible; recall vs
  the brute-force baseline is asserted in tests (not SQL-expressible →
  rows-only driver check).

At 100 TB: brute force is O(Q·N) with Q broadcast (fine for small query
sets); the LSH variant replaces N with the bucket size; both avoid any
driver-side collect.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table

_TOP_K = 10
_N_QUERIES = 5


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for the 5 lowest vec_ids.

    Plan shape: tiny query side broadcast → crossJoin (Q·N rows, map-only)
    → window top-k per query.  All arithmetic in double, JVM-side.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # norms precomputed ONCE per vector: computing them inside the pair
    # expression would re-walk both arrays per candidate (3x the array
    # arithmetic of the dot product alone, x Q on the corpus side)
    queries = (emb.orderBy("vec_id").limit(_N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       _as_double("embedding").alias("qvec"))
               .withColumn("qnorm", _norm(F.col("qvec"))))
    corpus = (emb.select(F.col("vec_id").alias("neighbor_id"),
                         _as_double("embedding").alias("nvec"))
              .withColumn("nnorm", _norm(F.col("nvec"))))
    sim = F.round(_dot(F.col("qvec"), F.col("nvec"))
                  / (F.col("qnorm") * F.col("nnorm")), 6)
    scored = (corpus.crossJoin(F.broadcast(queries))
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id", sim.alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "rank", "neighbor_id", "cosine"))


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within the same label
    (label = blocking key): cosine >= 0.25, a < b."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = (emb.select("vec_id", "label",
                       _as_double("embedding").alias("v"))
            .withColumn("vnorm", _norm(F.col("v"))))
    a = base.select(F.col("vec_id").alias("vec_a"), F.col("label"),
                    F.col("v").alias("va"), F.col("vnorm").alias("na"))
    b = base.select(F.col("vec_id").alias("vec_b"), F.col("label"),
                    F.col("v").alias("vb"), F.col("vnorm").alias("nb"))
    sim = F.round(_dot(F.col("va"), F.col("vb"))
                  / (F.col("na") * F.col("nb")), 6)
    return (a.join(b, "label")
            .where(F.col("vec_a") < F.col("vec_b"))
            .select("label", "vec_a", "vec_b", sim.alias("cosine"))
            .where(F.col("cosine") >= 0.25))


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    rng = np.random.default_rng(20240813)
    return rng.standard_normal((n_planes, dim)).tolist()


def ann_lsh_topk(spark: SparkSession, sf_dir: str, n_planes: int = 8,
                 dim: int = 64) -> DataFrame:
    """ANN top-k via random-hyperplane LSH: bucket = sign bits of 8 seeded
    projections; exact cosine re-rank within each query's bucket.

    Scale path: the crossJoin of brute force becomes a bucket equi-join —
    candidate count drops ~2^planes-fold; recall measured in tests.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes(dim, n_planes)

    def bucket(vec: Column) -> Column:
        bits = []
        for i, plane in enumerate(planes):
            proj = F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(float(v)) for v in plane]),
                           lambda x, y: x * y),
                F.lit(0.0), lambda acc, v: acc + v)
            bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    with_bucket = (emb.select("vec_id", _as_double("embedding").alias("vec"))
                   .withColumn("bucket", bucket(F.col("vec")))
                   .withColumn("vnorm", _norm(F.col("vec"))))
    queries = (with_bucket.orderBy("vec_id").limit(_N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("vec").alias("qvec"),
                       F.col("vnorm").alias("qnorm"),
                       F.col("bucket")))
    sim = F.round(_dot(F.col("qvec"), F.col("vec"))
                  / (F.col("qnorm") * F.col("vnorm")), 6)
    scored = (with_bucket.join(F.broadcast(queries), "bucket")
              .where(F.col("query_id") != F.col("vec_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      sim.alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "rank", "neighbor_id", "cosine"))


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN — the second scale path besides LSH.

    Coarse quantization: centroids are the vectors with ``vec_id % 50 ==
    0`` (deterministic, ~N/50 cells — a stand-in for k-means that keeps
    the query SQL-expressible); every vector is assigned to its
    highest-cosine centroid (rounded, centroid-id tiebreak).  Search
    visits only the query's own cell (nprobe=1) and re-ranks exactly.

    Scale shape: assignment is a broadcast of the centroid set + one
    map-side argmin per vector (no shuffle); search is an equi-join on
    cell id — the brute-force crossJoin's Q·N candidate set shrinks to
    the cell population, and the cell id is a perfect partitioning key
    for a 100 TB corpus.  Recall loss vs brute force comes only from
    nprobe=1, measured in tests.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = (emb.select("vec_id", _as_double("embedding").alias("vec"))
            .withColumn("vnorm", _norm(F.col("vec"))))
    cents = (vecs.where(F.col("vec_id") % 50 == 0)
             .select(F.col("vec_id").alias("centroid_id"),
                     F.col("vec").alias("cvec"),
                     F.col("vnorm").alias("cnorm")))
    csim = F.round(_dot(F.col("vec"), F.col("cvec"))
                   / (F.col("vnorm") * F.col("cnorm")), 6)
    wassign = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc())
    cell = (vecs.crossJoin(F.broadcast(cents))
            .select("vec_id", "vec", "vnorm", "centroid_id",
                    csim.alias("csim"))
            .withColumn("rn", F.row_number().over(wassign))
            .where(F.col("rn") == 1)
            .select("vec_id", "vec", "vnorm", "centroid_id"))
    queries = (cell.where(F.col("vec_id") < _N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("vec").alias("qvec"),
                       F.col("vnorm").alias("qnorm"), "centroid_id"))
    sim = F.round(_dot(F.col("qvec"), F.col("vec"))
                  / (F.col("qnorm") * F.col("vnorm")), 6)
    scored = (cell.join(F.broadcast(queries), "centroid_id")
              .where(F.col("query_id") != F.col("vec_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      sim.alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_K)
            .select("query_id", "rank", "neighbor_id", "cosine"))


QUERIES = {
    "cosine_topk_bruteforce": cosine_topk_bruteforce,
    "embedding_neardup_pairs": embedding_neardup_pairs,
    "ann_lsh_topk": ann_lsh_topk,        # rows-only (seeded planes not SQL)
    "ivf_topk": ivf_topk,
}

_COSINE = ("list_dot_product(a.emb, b.emb) "
           "/ (sqrt(list_dot_product(a.emb, a.emb)) "
           "* sqrt(list_dot_product(b.emb, b.emb)))")

ORACLES = {
    "cosine_topk_bruteforce": f"""
        WITH vecs AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ), queries AS (
            SELECT vec_id AS query_id, emb FROM vecs ORDER BY vec_id LIMIT {_N_QUERIES}
        ), scored AS (
            SELECT q.query_id, v.vec_id AS neighbor_id,
                   round(list_dot_product(q.emb, v.emb)
                         / (sqrt(list_dot_product(q.emb, q.emb))
                            * sqrt(list_dot_product(v.emb, v.emb))), 6) AS cosine
            FROM queries q CROSS JOIN vecs v
            WHERE q.query_id != v.vec_id
        )
        SELECT query_id, rank, neighbor_id, cosine FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored)
        WHERE rank <= {_TOP_K}
    """,
    "ivf_topk": f"""
        WITH vecs AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ), cents AS (
            SELECT vec_id AS centroid_id, emb AS cemb FROM vecs
            WHERE vec_id % 50 = 0
        ), assigned AS (
            SELECT vec_id, emb, centroid_id,
                   row_number() OVER (PARTITION BY vec_id ORDER BY
                       round(list_dot_product(emb, cemb)
                             / (sqrt(list_dot_product(emb, emb))
                                * sqrt(list_dot_product(cemb, cemb))), 6) DESC,
                       centroid_id ASC) AS rn
            FROM vecs CROSS JOIN cents
        ), cell AS (
            SELECT vec_id, emb, centroid_id FROM assigned WHERE rn = 1
        ), scored AS (
            SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                   round(list_dot_product(q.emb, v.emb)
                         / (sqrt(list_dot_product(q.emb, q.emb))
                            * sqrt(list_dot_product(v.emb, v.emb))), 6) AS cosine
            FROM cell q JOIN cell v ON q.centroid_id = v.centroid_id
            WHERE q.vec_id < {_N_QUERIES} AND q.vec_id != v.vec_id
        )
        SELECT query_id, rank, neighbor_id, cosine FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored)
        WHERE rank <= {_TOP_K}
    """,
    "embedding_neardup_pairs": """
        WITH vecs AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        )
        SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.emb, b.emb)
                     / (sqrt(list_dot_product(a.emb, a.emb))
                        * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cosine
        FROM vecs a JOIN vecs b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.emb, b.emb)
                    / (sqrt(list_dot_product(a.emb, a.emb))
                       * sqrt(list_dot_product(b.emb, b.emb))), 6) >= 0.25
    """,
}
