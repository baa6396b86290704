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


def pq_dist_structs(vslice, codes: list[int],
                    cb_block: list[list[float]]):
    """Array-form twin of pq_code_distances for ONE subspace: an
    array<struct<d6,code>> column with ``round(sum((x-c)^2)*1e6)`` as
    BIGINT micro-units per codebook entry, computed as an in-row left
    fold in pos order. Bit-identical to the hash-aggregate path: each
    (group, subspace, code)'s rows arrive pos-ascending from a single
    explode partition there, so its F.sum IS the same left-to-right
    IEEE fold this expression performs. The codebook enters as ONE
    literal array-of-arrays (driver-bounded state — subspaces x codes
    x block doubles — the docs_bpe_encode / emb_top_pcs posture), so
    the whole assignment is a scan-side projection: no posexplode
    blow-up, no (corpus x codes)-row join, no aggregation exchange
    (guide §2.3/§2.4; §8 "move decisions to lightweight proxies")."""
    from ._pq import lit_ints, lit_matrix

    cb_lit = lit_matrix(cb_block)
    codes_lit = lit_ints(codes)
    return F.zip_with(
        cb_lit, codes_lit,
        lambda carr, c: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(vslice, carr, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, x: acc + x,
                ) * 1e6, 0
            ).cast("long").alias("d6"),
            c.alias("code"),
        ),
    )


def pq_assign_code(vslice, codes: list[int],
                   cb_block: list[list[float]]):
    """Argmin code over pq_dist_structs — array_min on (d6, code)
    structs is the same integer compare with ties to the lower code as
    pq_nearest_code's min-struct aggregate."""
    return F.array_min(pq_dist_structs(vslice, codes, cb_block))["code"]


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
    cells keep their previous centroid driver-side. Per round the
    corpus is scanned once and only k x dim centroid scalars cross to
    the driver — identical at 500 rows and 100 TB. Returns
    (cell, pos, centroid) like emb_kmeans_fit.

    r14 shape: the k x dim round state is DRIVER-BOUNDED (the
    kmeans_fit / pq_train_codebook_arrays posture), so assignment is
    a scan-side projection against the literal centroid matrix
    (pq_assign_code over the full dim as one "subspace") and each
    round is ONE corpus pass + one k x dim partial-agg collect —
    r13's lazy-chain form paid a (corpus x k)-row broadcast-join
    blow-up, an argmin exchange, and a corpus-keyed re-join per round
    (guide §2.3/§2.4). Distances/argmin are bit-identical
    (pq_dist_structs); re-averages are the same round(avg, 6) with
    the usual order-absorption.
    """
    from ..session import ensure_parallelism, read_table

    e = ensure_parallelism(
        spark, read_table(spark, sf_dir, "embeddings")
    ).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    # the exact output schema of the former plan form (pos from
    # posexplode is non-nullable) — createDataFrame must reproduce it
    # so the declared schema is unchanged
    out_schema = StructType([
        StructField("cell", IntegerType(), True),
        StructField("pos", IntegerType(), False),
        StructField("centroid", DoubleType(), True),
    ])
    init_rows = (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .collect()
    )
    if not init_rows:
        return spark.createDataFrame([], out_schema)
    dim = max(r["pos"] for r in init_rows) + 1
    cent: dict[int, list[float]] = {}
    for r in init_rows:
        cent.setdefault(int(r["label"]), [0.0] * dim)[r["pos"]] = float(
            r["c"]
        )
    from ._pq import assign_codes_arrow

    codes = sorted(cent)
    for _ in range(rounds):
        # one "subspace" covering the full dim; positional argmin maps
        # back through the ascending codes list (order-isomorphic
        # tie-break)
        assigned = assign_codes_arrow(
            e, [[cent[c] for c in codes]], dim, micro=True,
            keep_cols=["v"],
        ).select(F.element_at("codes", 1).alias("ci"), "v")
        stats = (
            assigned.select("ci", F.posexplode("v").alias("pos", "x"))
            .groupBy("ci", "pos")
            .agg(F.round(F.avg("x"), 6).alias("cn"))
            .collect()
        )
        new_cent = {c: list(arr) for c, arr in cent.items()}
        for r in stats:
            new_cent[codes[int(r["ci"])]][r["pos"]] = float(r["cn"])
        cent = new_cent
    rows = [
        (int(c), pos, float(cent[c][pos]))
        for c in codes
        for pos in range(dim)
    ]
    return spark.createDataFrame(rows, out_schema).orderBy("cell", "pos")


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
    GLOBAL dimension index (built from the arrays form below — kept
    for callers/tests that want the frame shape).
    """
    cb = pq_train_codebook_arrays(
        spark, emb, n_subspaces=n_subspaces, n_codes=n_codes,
        iters=iters, dim=dim,
    )
    block = dim // n_subspaces
    rows = [
        (s, c, s * block + j, float(v))
        for s, codes in enumerate(cb)
        for c, arr in enumerate(codes)
        for j, v in enumerate(arr)
    ]
    return spark.createDataFrame(
        rows, "subspace int, code int, pos int, c double"
    )


def pq_train_codebook_arrays(spark: SparkSession, emb: DataFrame,
                             n_subspaces: int = 4, n_codes: int = 16,
                             iters: int = 2,
                             dim: int = 64) -> list[list[list[float]]]:
    """pq_train_codebooks with the per-round codebook carried as
    DRIVER-BOUNDED state (n_subspaces x n_codes x block doubles — the
    emb_kmeans_fit / docs_bpe_encode posture) instead of a
    lazily-checkpointed frame chain. Per round the corpus is scanned
    ONCE: assignment is a scan-side projection against the literal
    codebook (pq_assign_code — no posexplode x codes join, no argmin
    exchange, no corpus-keyed re-join for the re-average), the
    re-average is one partial-agg groupBy collecting only
    subspaces x codes x block scalars, and empty codes keep their
    previous centroid driver-side. r13's lazy-chain form paid three
    corpus-scale shuffles plus a (corpus x codes)-row broadcast-join
    blow-up per round (guide §2.3/§2.4).

    Numerics: distances and argmin are bit-identical to the aggregate
    form (pq_dist_structs); the re-averaged centroids are the same
    round(avg, 6) over the same value sets — partial-sum order may
    differ from the old join layout, the same order-absorption the
    6-dp rounding has always provided between Spark and the SQL
    oracle's replay. Returns cb[subspace][code] = block-length list.
    """
    block = dim // n_subspaces
    # seeds: the n_codes lowest vec_ids -> code 0..n_codes-1, their
    # subvectors collected (n_codes x dim doubles — bounded)
    seed_rows = emb.select("vec_id", "v").orderBy("vec_id").limit(
        n_codes
    ).collect()
    cb = [
        [
            [float(x) for x in r["v"][s * block:(s + 1) * block]]
            for r in seed_rows
        ]
        for s in range(n_subspaces)
    ]
    from ._pq import assign_codes_arrow

    for _ in range(iters):
        assigned = assign_codes_arrow(
            emb, cb, block, micro=True, keep_cols=["v"]
        )
        stats = (
            assigned.select(
                F.col("codes").alias("_ca"),
                F.posexplode("v").alias("pos", "x"),
            )
            .select(
                F.expr(f"pos div {block}").cast("int").alias("subspace"),
                F.element_at(
                    "_ca", F.expr(f"pos div {block}").cast("int") + 1
                ).alias("code"),
                "pos", "x",
            )
            .groupBy("subspace", "code", "pos")
            .agg(F.round(F.avg("x"), 6).alias("cn"))
            .collect()
        )
        new_cb = [[list(arr) for arr in codes_s] for codes_s in cb]
        for r in stats:
            new_cb[r["subspace"]][r["code"]][
                r["pos"] - r["subspace"] * block
            ] = float(r["cn"])
        cb = new_cb
    return cb
