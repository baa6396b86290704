"""Similarity search over the ``embeddings`` table (array<float>).

Brute-force cosine is computed with Arrow-batched ``mapInPandas`` +
numpy GEMM against a broadcast matrix: per-pair JVM expressions cannot
express a 64-wide dot product efficiently (the unrolled expression
exceeds HotSpot's JIT method limits and runs as interpreted bytecode at
~2 us/pair; the BLAS path is ~3 orders of magnitude faster and is the
standard Spark pattern for dense vector math). The broadcast side is
the whole corpus here — the CORRECTNESS baseline; the 100 TB scale path
is emb_lsh_buckets: hash-partition by bucket, then run the same GEMM
verify per bucket's bounded candidate set.

Cosine is dot/(|a||b|) in float64, rounded to 6 before thresholding and
4 in output — numerically aligned with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double
from ..session import ensure_parallelism, read_table

N_PLANES = 8

# embedding width per sf_dir, probed once per process (one head() job)
_DIM_CACHE: dict[str, int] = {}


def _emb_dim(spark: SparkSession, sf_dir: str) -> int:
    if sf_dir not in _DIM_CACHE:
        row = read_table(spark, sf_dir, "embeddings").select("embedding").head()
        _DIM_CACHE[sf_dir] = len(row[0])
    return _DIM_CACHE[sf_dir]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = ensure_parallelism(spark, read_table(spark, sf_dir, "embeddings"))
    return e.select("vec_id", as_double("embedding").alias("v"), "label")


_MATRIX_CACHE: dict[tuple, tuple] = {}


def _matrix(df: DataFrame, cache_key: tuple | None = None):
    """Driver-side (ids, matrix, norms) of a SMALL embedding set, sorted
    by id for determinism. This is the broadcast side of the GEMM —
    same role as the build side of a broadcast join. Cached per key so
    repeated invocations (bench, retries) skip the collect."""
    import numpy as np

    if cache_key is not None and cache_key in _MATRIX_CACHE:
        return _MATRIX_CACHE[cache_key]
    rows = df.select("vec_id", "v").collect()
    rows.sort(key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype="int64")
    mat = np.array([r[1] for r in rows], dtype="float64")
    norms = np.sqrt((mat * mat).sum(axis=1))
    out = (ids, mat, norms)
    if cache_key is not None:
        _MATRIX_CACHE[cache_key] = out
    return out


def emb_near_dup(spark: SparkSession, sf_dir: str,
                 threshold: float = 0.35) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cos >= t).

    Two stages (the approximate-then-exact pattern):
    1. GEMM prefilter — each Arrow batch scores against the broadcast
       corpus matrix and emits candidates above ``threshold - margin``.
       BLAS uses blocked summation, whose last-bit differences from a
       sequential loop can flip rounding at the exact threshold
       boundary (observed ~2 in 12.5M pairs), so it only PREFILTERS.
    2. Exact verify — candidates join back to their vectors and the
       cosine is recomputed with the sequential JVM fold, which is
       bit-identical to the oracle's loop; that value decides
       membership and is the reported score.
    The margin (1e-4) is ~1e5x the worst-case GEMM-vs-loop divergence,
    so stage 1 never drops a true pair; stage 2 runs on only the
    candidate set.
    """
    import numpy as np

    from ..functions.vectors import dot, norm

    margin = 1e-4
    emb = _emb(spark, sf_dir)
    ids_b, mat_b, norms_b = _matrix(emb, cache_key=(sf_dir, "corpus"))
    bc = spark.sparkContext.broadcast((ids_b, mat_b, norms_b))

    def gen(batches):
        import pandas as pd

        jds, jmat, jnorms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype="int64")
            A = np.stack(pdf["v"].to_numpy())
            anorm = np.sqrt((A * A).sum(axis=1))
            nn = anorm[:, None] * jnorms[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(nn > 0, (A @ jmat.T) / nn, 0.0)
            ai, bj = np.nonzero(
                (cos >= threshold - margin) & (ids[:, None] < jds[None, :])
            )
            yield pd.DataFrame({"vec_a": ids[ai], "vec_b": jds[bj]})

    cand = emb.mapInPandas(gen, "vec_a long, vec_b long")
    va = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("_va"))
    vb = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("_vb"))
    joined = cand.join(va, "vec_a").join(vb, "vec_b")
    nn = norm(F.col("_va")) * norm(F.col("_vb"))
    exact = F.when(nn > 0, dot(F.col("_va"), F.col("_vb")) / nn).otherwise(F.lit(0.0))
    # round ONCE from the raw value for both the gate and the output:
    # round(round(x,6),4) lands on decimal ".50" ties that Spark
    # (HALF_UP on the decimal repr) and other engines (binary scaling)
    # resolve differently; a raw cosine never ties at either precision.
    return (
        joined.select(
            "vec_a", "vec_b",
            F.round(exact, 6).alias("cos6"),
            F.round(exact, 4).alias("cos"),
        )
        .where(F.col("cos6") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def emb_cosine_topk(spark: SparkSession, sf_dir: str, n_queries: int = 8,
                    k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: for each query vector (vec_id <
    n_queries), the k nearest other vectors.

    The tiny query set is broadcast-joined against the corpus and
    scored with the sequential JVM fold — n_queries x corpus rows is
    small enough that exactness beats BLAS here, and the ranking is
    then bit-identical to any sequential-loop engine. Ties break on
    neighbor id after rounding. (For huge query sets, score with the
    GEMM prefilter + fold verify like emb_near_dup.)
    """
    from pyspark.sql import Window

    from ..functions.vectors import dot, norm

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    nn = norm(F.col("qv")) * norm(F.col("v"))
    cos = F.when(nn > 0, dot(F.col("qv"), F.col("v")) / nn).otherwise(F.lit(0.0))
    scored = emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("nid"),
        F.round(cos, 6).alias("cos6"),
        F.round(cos, 4).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos6").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "nid", "cos", "rnk")
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
    packed into one long bucket id (sign of dot(v, ±1-plane)).

    Computed in the same Arrow batch pass (signs = V @ P.T >= 0) — one
    scan, no shuffle; the bucket id is the partition key for the
    scale-path ANN.
    """
    import numpy as np

    dim = _emb_dim(spark, sf_dir)
    planes = np.array([_hyperplane(p, dim) for p in range(n_planes)])
    emb = _emb(spark, sf_dir)
    bc = spark.sparkContext.broadcast(planes)

    def gen(batches):
        import pandas as pd

        P = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["v"].to_numpy())
            signs = (A @ P.T) >= 0  # (n, planes)
            bucket = (signs * (1 << np.arange(P.shape[0]))[None, :]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype="int64"),
                    "bucket": bucket.astype("int64"),
                    "label": pdf["label"].to_numpy(dtype="int32"),
                }
            )

    return emb.mapInPandas(gen, "vec_id long, bucket long, label int")


def emb_lsh_ann(spark: SparkSession, sf_dir: str, n_queries: int = 8,
                k: int = 5) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the query's
    bucket; cosine rank within candidates only.

    The scale path: the corpus is hash-partitioned by bucket once; each
    query touches one bucket instead of the whole corpus. Recall is
    tunable via n_planes / multi-probe. The per-bucket scoring reuses
    the same GEMM verify as the exact operators.
    """
    import numpy as np

    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    buckets = emb_lsh_buckets(spark, sf_dir)
    vecs = emb.join(buckets.select("vec_id", "bucket"), "vec_id")
    qside = vecs.where(F.col("vec_id") < n_queries)
    qrows = qside.select("vec_id", "v", "bucket").collect()
    qrows.sort(key=lambda r: r[0])
    qids = np.array([r[0] for r in qrows], dtype="int64")
    qmat = np.array([r[1] for r in qrows], dtype="float64")
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qbucket = np.array([r[2] for r in qrows], dtype="int64")
    bc = spark.sparkContext.broadcast((qids, qmat, qnorm, qbucket))

    def gen(batches):
        import pandas as pd

        qd, qm, qn, qb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype="int64")
            bk = pdf["bucket"].to_numpy(dtype="int64")
            A = np.stack(pdf["v"].to_numpy())
            anorm = np.sqrt((A * A).sum(axis=1))
            nn = qn[:, None] * anorm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(nn > 0, (qm @ A.T) / nn, 0.0)
            cos6 = np.round(cos, 6)
            mask = (qb[:, None] == bk[None, :]) & (qd[:, None] != ids[None, :])
            qi, nj = np.nonzero(mask)
            yield pd.DataFrame(
                {"qid": qd[qi], "nid": ids[nj], "cos": cos6[qi, nj]}
            )

    scored = vecs.select("vec_id", "v", "bucket").mapInPandas(
        gen, "qid long, nid long, cos double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "nid", F.round("cos", 4).alias("cos"), "rnk")
    )


def emb_ivf_ann(spark: SparkSession, sf_dir: str, n_queries: int = 8,
                k: int = 5, n_probe: int = 2) -> DataFrame:
    """IVF (inverted-file) approximate top-k: label-centroids act as the
    coarse quantizer; each vector is assigned to its nearest centroid
    cell, and a query scans only its ``n_probe`` nearest cells.

    The Spark shape of FAISS-style IVF: cell assignment is one Arrow
    batch pass (GEMM against the small centroid matrix), the corpus is
    then hash-partitioned by cell, and each query's candidate set is
    bounded by its probed cells instead of the whole table. Rows-only
    check (approximate op). Recall rises with n_probe; n_probe = #cells
    degenerates to exact brute force.
    """
    import numpy as np

    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    ids, mat, norms = _matrix(emb, cache_key=(sf_dir, "corpus"))
    # coarse quantizer: per-label mean vectors (deterministic, no RNG)
    lab_rows = emb.select("vec_id", "label").collect()
    lab = {r.vec_id: r.label for r in lab_rows}
    klabels = sorted({r.label for r in lab_rows})
    C = np.stack([
        mat[[i for i, v in enumerate(ids) if lab[v] == kl]].mean(axis=0)
        for kl in klabels
    ])
    bc = spark.sparkContext.broadcast((ids, mat, norms, C))

    qmask = ids < n_queries
    qids, qmat, qnorms = ids[qmask], mat[qmask], norms[qmask]
    # query-side probe cells (distances to centroids; tiny, driver-side)
    qd2 = ((qmat[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    qcells = np.argsort(qd2, axis=1)[:, :n_probe]
    bq = spark.sparkContext.broadcast((qids, qmat, qnorms, qcells))

    def gen(batches):
        import pandas as pd

        jds, jmat, jnorms, cen = bc.value
        qd, qm, qn, qc = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bids = pdf["vec_id"].to_numpy(dtype="int64")
            A = np.stack(pdf["v"].to_numpy())
            anorm = np.sqrt((A * A).sum(axis=1))
            cell = ((A[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
            nn = qn[:, None] * anorm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(nn > 0, (qm @ A.T) / nn, 0.0)
            # candidate mask: corpus row's cell is among the query's probes
            probe = (qc[:, :, None] == cell[None, None, :]).any(axis=1)
            mask = probe & (qd[:, None] != bids[None, :])
            qi, nj = np.nonzero(mask)
            yield pd.DataFrame(
                {"qid": qd[qi], "nid": bids[nj], "cos": np.round(cos[qi, nj], 6)}
            )

    scored = emb.mapInPandas(gen, "qid long, nid long, cos double")
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "nid", F.round("cos", 4).alias("cos"), "rnk")
    )
