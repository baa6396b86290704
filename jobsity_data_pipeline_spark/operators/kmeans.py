"""Iterative k-means over an embedding DataFrame.

The Spark shape of Lloyd's algorithm: per round, the k x dim centroid
matrix broadcasts out, ONE Arrow pass assigns every vector to its
nearest centroid, and the centroid update is a distributed
posexplode+sum/count aggregation (map-side partial agg) whose result —
k x dim scalar rows — is all that ever crosses back to the driver. No
vector is ever collected; per-round driver state is k x dim + k counts,
so the loop is identical at 500 rows and at 100 TB (each round = one
scan + one shuffle of (cell, pos, x) triples).

Determinism: initialization is the label-mean centroid (no RNG), float
math is fixed-order within the aggregation tree up to Spark's partial
aggregation, and ties in argmin break toward the lower cell index —
the same corpus converges to the same centroids on every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pq_code_distances(x: DataFrame, cent: DataFrame,
                      group_cols: list[str]) -> DataFrame:
    """THE pinned PQ comparison quantity, defined once: per
    (group_cols..., subspace, code), ``round(sum((x-c)^2) * 1e6)`` as
    BIGINT micro-units. Used by training assignment, corpus encoding,
    and every ADC distance table (raw and residual) — a single
    definition so a pinning change can never diverge between copies
    and silently break oracle hash-parity. ``x`` carries
    (group_cols..., pos, x); ``cent`` (subspace, code, pos, c) rows
    exist only for the subspace owning each pos, so the pos equi-join
    is sufficient and the output inherits cent's subspace."""
    return (
        x.join(F.broadcast(cent), "pos")
        .groupBy(*group_cols, "subspace", "code")
        .agg(
            F.round(
                F.sum(
                    (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
                ) * 1e6, 0
            ).cast("long").alias("d6")
        )
    )


def pq_nearest_code(d: DataFrame, group_cols: list[str]) -> DataFrame:
    """Argmin over the micro-unit distances: min-struct on (d6, code)
    per (group_cols..., subspace) — integer compare, ties to the lower
    code, identical to the oracle's row_number ORDER BY d6, code."""
    return (
        d.groupBy(*group_cols, "subspace")
        .agg(F.min(F.struct("d6", "code")).alias("m"))
        .select(*group_cols, "subspace", F.col("m.code").alias("code"))
    )


def _centroid_matrix(rows, k: int, dim: int):
    import numpy as np

    C = np.zeros((k, dim))
    for r in rows:
        C[r[0], r[1]] = r[2]
    return C


def label_mean_init(emb: DataFrame):
    """Deterministic init: per-label mean vectors via distributed
    posexplode+avg; collects only k x dim scalars."""
    rows = (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .collect()
    )
    k = max(r.label for r in rows) + 1
    dim = max(r.pos for r in rows) + 1
    return _centroid_matrix([(r.label, r.pos, r.c) for r in rows], k, dim)


def assign_cells(spark: SparkSession, emb: DataFrame, C) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment in one Arrow pass
    against the broadcast k x dim matrix (numpy argmin breaks ties
    toward the lower cell)."""
    import numpy as np

    bc = spark.sparkContext.broadcast(np.asarray(C, dtype="float64"))

    def gen(batches):
        import pandas as pd

        cen = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["v"].to_numpy())
            cell = ((A[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype="int64"),
                    "v": pdf["v"],
                    "cell": cell.astype("int32"),
                }
            )

    return emb.mapInPandas(gen, "vec_id long, v array<double>, cell int")


def kmeans_fit(spark: SparkSession, emb: DataFrame, max_iter: int = 20,
               tol: float = 1e-8):
    """Lloyd iterations until the max centroid movement is < ``tol``
    or ``max_iter`` rounds.

    ``emb`` needs (vec_id, v: array<double>, label); k comes from the
    label-mean init. Empty cells retain their previous centroid (the
    deterministic alternative to re-seeding). Returns (C, n_iters,
    last_delta) with C the final k x dim numpy matrix.
    """
    import numpy as np

    C = label_mean_init(emb)
    k, dim = C.shape
    delta = float("inf")
    it = 0
    for it in range(1, max_iter + 1):
        assigned = assign_cells(spark, emb, C)
        stats = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_C = C.copy()  # empty cells keep their previous centroid
        for r in stats:
            new_C[r.cell, r.pos] = r.s / r.n
        delta = float(np.abs(new_C - C).max())
        C = new_C
        if delta < tol:
            break
    return C, it, delta


def emb_kmeans_fit(spark: SparkSession, sf_dir: str, max_iter: int = 20,
                   tol: float = 1e-8) -> DataFrame:
    """Converged k-means centroids of the embeddings table as a
    DataFrame (cell, pos, centroid) — the iterative extension of
    relational4.emb_kmeans_assign's single assignment step."""
    from ..session import ensure_parallelism, read_table

    e = ensure_parallelism(spark, read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    C, _, _ = kmeans_fit(spark, e, max_iter=max_iter, tol=tol)
    rows = [
        (int(cell), int(pos), float(C[cell, pos]))
        for cell in range(C.shape[0])
        for pos in range(C.shape[1])
    ]
    return spark.createDataFrame(rows, "cell int, pos int, centroid double")


def emb_kmeans_fit_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract variant of emb_kmeans_fit with a bounded round
    budget (6 Lloyd iterations, tol 1e-6): centroid movement decays
    geometrically, so the first handful of rounds buys nearly all of
    the convergence — the remaining drift is far below the 1e-4
    centroid rounding. Bounding rounds keeps the bench cost of the
    iterative path proportionate (each round is a full corpus pass);
    production convergence runs use emb_kmeans_fit directly.
    """
    return emb_kmeans_fit(spark, sf_dir, max_iter=6, tol=1e-6)


def emb_kmeans_fit_exact(spark: SparkSession, sf_dir: str,
                         rounds: int = 3) -> DataFrame:
    """Engine-exact fixed-round Lloyd fit — the oracle-checkable
    variant of emb_kmeans_fit: because the round count is FIXED and
    every engine-divergent quantity is pinned (6-dp rounded centroids,
    integer micro-unit distances via the shared pq_code_distances
    kernel, argmin ties to the lower cell), the entire training
    unrolls into one lazy Catalyst plan that a SQL oracle replays
    round for round. This is the PQ-training convention
    (pq_train_codebooks) applied to the full-dimension fit, closing
    the last rows-only key in the driver contract; the
    convergence-criterion variant (emb_kmeans_fit) stays for
    production use and unit tests, where the stopping rule is the
    point and a SQL twin is unaffordable.

    Init is the 6-dp-rounded label-mean centroid (no RNG); empty
    cells keep their previous centroid via left-join coalesce. Per
    round the corpus is scanned once and only k x dim centroid
    scalars shuffle — identical at 500 rows and 100 TB. Returns
    (cell, pos, centroid) like emb_kmeans_fit.
    """
    from ..session import ensure_parallelism, read_table

    e = ensure_parallelism(
        spark, read_table(spark, sf_dir, "embeddings")
    ).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )
    x = e.select("vec_id", F.posexplode("v").alias("pos", "x"))
    cent = (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .select(
            F.lit(0).alias("subspace"),
            F.col("label").cast("int").alias("code"),
            "pos", "c",
        )
    )
    for _ in range(rounds):
        d = pq_code_distances(x, cent, ["vec_id"])
        assigned = pq_nearest_code(d, ["vec_id"])
        stats = (
            x.join(assigned.select("vec_id", "code"), "vec_id")
            .groupBy("code", "pos")
            .agg(F.round(F.avg("x"), 6).alias("cn"))
        )
        cent = (
            cent.join(stats, ["code", "pos"], "left")
            .select(
                "subspace", "code", "pos",
                F.coalesce("cn", "c").alias("c"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        cent.select(
            F.col("code").alias("cell"), "pos",
            F.col("c").alias("centroid"),
        )
        .orderBy("cell", "pos")
    )


def pq_train_codebooks(spark: SparkSession, emb: DataFrame,
                       n_subspaces: int = 4, n_codes: int = 16,
                       iters: int = 2, dim: int = 64) -> DataFrame:
    """Per-subspace PQ codebook training: independent k-means in each
    contiguous ``dim // n_subspaces``-wide block, run jointly (the
    subspace id is just another grouping key). Because the round count
    is FIXED, the whole training unrolls into ONE lazy Catalyst plan —
    no driver loop, no collect: per round, assign every (vector,
    subspace) to its nearest code with a partial-agg min-struct (the
    same plan shape as relational8.emb_pq_codes) and re-average; empty
    codes keep their previous centroid via a left-join coalesce.
    Lineage is truncated per round with a lazy localCheckpoint so the
    unrolled plan stays linear in ``iters``.

    Init is deterministic (subvectors of the ``n_codes`` lowest
    vec_ids); argmin ties break toward the lower code. Production uses
    n_codes=256 — the knob trades distance-table size for
    within-cluster discrimination (the label-centroid codebooks of
    emb_pq_ann cannot separate vectors inside one label cluster;
    trained ones can — measured in emb_ann_recall pq vs pq_trained).

    Returns a DataFrame (subspace, code, pos, c) with ``pos`` the
    GLOBAL dimension index, ready for the ADC join on pos; only
    n_subspaces x n_codes x block centroid scalars ever materialize
    per round, never a vector.
    """
    from pyspark.sql.window import Window

    block = dim // n_subspaces
    x = emb.select(
        "vec_id", F.posexplode("v").alias("pos", "x")
    ).withColumn("subspace", F.expr(f"pos div {block}").cast("int"))
    # seeds: the n_codes lowest vec_ids -> code 0..n_codes-1 (the
    # row_number window runs over an n_codes-row frame)
    ids = (
        emb.select("vec_id").orderBy("vec_id").limit(n_codes)
        .select(
            "vec_id",
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            .cast("int").alias("code"),
        )
    )
    cent = (
        x.join(F.broadcast(ids), "vec_id")
        .select("subspace", "code", "pos", F.col("x").alias("c"))
    )
    # Distances compare as rounded micro-units (pq_code_distances) and
    # re-averaged centroids round to 6 dp each round: the training is
    # then engine-exact up to sums landing within ~1 ulp of a .5
    # micro-unit boundary (a SQL oracle replays the same rounds), where unrounded partial-agg float order could flip
    # a near-equidistant assignment between engines/runs.
    for _ in range(iters):
        d = pq_code_distances(
            x.select("vec_id", "pos", "x"), cent, ["vec_id"]
        )
        assigned = pq_nearest_code(d, ["vec_id"])
        stats = (
            x.join(assigned, ["vec_id", "subspace"])
            .groupBy("subspace", "code", "pos")
            .agg(F.round(F.avg("x"), 6).alias("cn"))
        )
        cent = (
            cent.join(stats, ["subspace", "code", "pos"], "left")
            .select(
                "subspace", "code", "pos",
                F.coalesce("cn", "c").alias("c"),
            )
            .localCheckpoint(eager=False)
        )
    return cent
