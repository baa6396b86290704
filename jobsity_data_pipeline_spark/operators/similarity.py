"""Similarity search over the ``embeddings`` table (array<float>, d=64).

Brute-force cosine top-k is the correctness baseline (query set joined
as a broadcast, so the big side streams — never table x table shuffle);
random-hyperplane LSH is the scale path that bounds candidate sets.
All vector math is zip_with/aggregate in double precision — JVM-side,
no Python, and bit-identical to the DuckDB oracle's ordered sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine
from ..session import read_table

N_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", as_double("embedding").alias("v"), "label")


def emb_cosine_topk(spark: SparkSession, sf_dir: str, n_queries: int = 8,
                    k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: for each query vector (vec_id <
    n_queries), the k nearest other vectors.

    The query set is tiny and broadcast; each corpus partition computes
    its local scores and the final top-k is one small shuffle on qid.
    Ties break on neighbor id after rounding so ranking is stable
    across engines.
    """
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "nid", F.round("cos", 4).alias("cos"), "rnk")
    )


def emb_near_dup(spark: SparkSession, sf_dir: str,
                 threshold: float = 0.8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cos >= t).

    Correctness baseline is the full pair comparison; at scale the same
    verify runs only on LSH-bucket candidates (emb_lsh_ann buckets).
    """
    emb = _emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos")
        )
        .where(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
    )


def _hyperplane(plane: int, dim: int = 64) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from md5 parity — no
    RNG, so every engine/run derives the identical planes."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"{plane}:{j}".encode()).hexdigest()
        out.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
    return out


def emb_lsh_buckets(spark: SparkSession, sf_dir: str,
                    n_planes: int = N_PLANES) -> DataFrame:
    """Random-hyperplane LSH signature per vector: n_planes sign bits
    packed into one long bucket id. Sign = dot(v, ±1-plane) >= 0,
    computed with zip_with over a literal plane array (JVM-side)."""
    emb = _emb(spark, sf_dir)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(p)])
        d = F.aggregate(
            F.zip_with(F.col("v"), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return emb.select("vec_id", bucket.alias("bucket"), "label")


def emb_lsh_ann(spark: SparkSession, sf_dir: str, n_queries: int = 8,
                k: int = 5) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the query's
    bucket; cosine rank within candidates only.

    The scale path: the corpus is hash-partitioned by bucket once; each
    query touches one bucket instead of the whole corpus. Recall is
    tunable via n_planes / multi-probe (round 2).
    """
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    buckets = emb_lsh_buckets(spark, sf_dir)
    vecs = emb.join(buckets.select("vec_id", "bucket"), "vec_id")
    q = vecs.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cand = vecs.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        cand.select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "nid", F.round("cos", 4).alias("cos"), "rnk")
    )
