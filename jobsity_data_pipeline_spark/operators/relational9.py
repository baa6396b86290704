"""Round-3 close-out wave: semantic dedup and corpus tiering — the two
standard curation passes (SemDeDup, CCNet) a 100-TB LLM-training-data
pipeline runs after exact/fuzzy dedup, layered on the reference's
ingest scope (src/sqls/create_objects.sql) like the rest of the
LLM-pipeline family.

- emb_semdedup: SemDeDup (Abbas et al., 2023, arXiv:2303.09540) —
  cluster the embedding space, call a pair of same-cluster vectors
  semantic duplicates when their cosine exceeds a threshold, keep one
  representative per duplicated vector set.
- docs_quality_tiers: CCNet-style (Wenzek et al., 2020) head / middle /
  tail split of each source by the composite quality score, assigned
  with the distributed exact NTILE (no per-source single-task sort).

Scale notes (100 TB):
- semdedup's all-pairs work is *within cluster only* — the published
  method's point: k grows with N so cluster sizes stay bounded, and the
  per-cluster GEMM is embarrassingly parallel over clusters. Clusters
  above MAX_CLUSTER_BLOCK_ROWS additionally fan out over sub-block
  pairs (the emb_near_dup blocked shape), so even a degenerate giant
  cluster is bounded per task. No corpus-wide pair join in the plan.
  Candidate pairs (a sparse set) are re-scored with the sequential-
  order JVM fold so reported cosines are bit-stable vs the oracle.
- quality tiering avoids Window.partitionBy(source): with a handful of
  huge sources that window sorts each source in ONE task. The grouped
  distributed_ntile fans each source over `blocks` range-partitions
  (see operators/ranking.py) — identical NTILE semantics, no
  single-partition Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.vectors import as_double, cosine
from ..session import ensure_parallelism, read_table
from .ranking import distributed_ntile
from .textops import quality_frame

SEMDEDUP_TAU = 0.3
# A cluster larger than this fans out over ceil(n/cap) sub-blocks in
# the pair stage instead of GEMMing in one applyInPandas task. The
# published method's k-grows-with-N assumption keeps clusters bounded
# in the expected case, but a degenerate giant cluster (all-identical
# embeddings, bad k) must not OOM a single task at 100 TB.
MAX_CLUSTER_BLOCK_ROWS = 4096


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return ensure_parallelism(spark, read_table(spark, sf_dir, name))


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cl, v): nearest label-centroid assignment, centroids
    from a distributed posexplode+avg aggregate (k x dim scalars driver-
    side, broadcast once). Ties on distance resolve to the lowest
    cluster id — same rule as the oracle's row_number ORDER BY d2, cl
    and numpy argmin's first-match.

    Centroid coordinates are rounded to 6 dp (the emb_label_centroids
    convention) BEFORE the distance pass on both engines: an unrounded
    F.avg depends on partial-aggregation order, so a vector near-
    equidistant to two centroids could flip clusters between runs or
    engines at the ULP level and flake the exact parity hash."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", as_double("embedding").alias("v"), "label")
    cents = (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .collect()
    )
    k = max(r.label for r in cents) + 1
    dim = max(r.pos for r in cents) + 1
    C = np.zeros((k, dim))
    for r in cents:
        C[r.label, r.pos] = r.c
    bc = spark.sparkContext.broadcast(C)

    def gen(batches):
        import pandas as pd

        M = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["v"].to_numpy())
            d2 = ((A[:, None, :] - M[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cl": d2.argmin(axis=1).astype("int32"),
                    "v": pdf["v"],
                }
            )

    # r13 (guide §4.1): gen reads only (vec_id, v) — drop the label
    # column before the Arrow boundary so it is neither serialized nor
    # carried by the opaque node
    return e.select("vec_id", "v").mapInPandas(
        gen, "vec_id long, cl int, v array<double>"
    )


def _cluster_pairs(asg: DataFrame, tau: float,
                   max_block_rows: int = MAX_CLUSTER_BLOCK_ROWS,
                   margin: float = 1e-3) -> DataFrame:
    """Same-cluster candidate pairs (cl, vec_a < vec_b) whose GEMM
    cosine clears ``tau - margin`` — the prefilter stage of SemDeDup,
    shaped like emb_near_dup's blocked pair join but per cluster:

    1. Per-cluster block count ``ceil(n / max_block_rows)`` from a tiny
       count aggregate (broadcast back); rows hash into blocks.
    2. Pack each (cluster, block) into one matrix row; the unordered
       block pairs of a cluster meet through an EQUI-join on
       (cl, pa, pb) — shuffle-hash, never a broadcast of packed
       matrices, never a whole-cluster single task.
    3. Each pair task GEMMs exactly two bounded blocks. The expected
       case (cluster <= cap) degenerates to one block per cluster =
       the original one-task-per-cluster plan.
    """
    import numpy as np

    sizes = asg.groupBy("cl").agg(F.count("*").alias("_n"))
    nblk = F.greatest(
        F.ceil(F.col("_n") / F.lit(max_block_rows)), F.lit(1)
    ).cast("int")
    blocked = (
        asg.join(F.broadcast(sizes.select("cl", nblk.alias("_nblk"))), "cl")
        .withColumn(
            "blk", F.pmod(F.xxhash64("vec_id"), F.col("_nblk")).cast("int")
        )
    )

    def pack(pdf):
        import pandas as pd

        return pd.DataFrame(
            {
                "cl": [int(pdf["cl"].iloc[0])],
                "blk": [int(pdf["blk"].iloc[0])],
                "nblk": [int(pdf["_nblk"].iloc[0])],
                "ids": [pdf["vec_id"].to_numpy(dtype="int64").tolist()],
                "vecs": [[list(map(float, v)) for v in pdf["v"]]],
            }
        )

    packed = blocked.groupBy("cl", "blk").applyInPandas(
        pack,
        "cl int, blk int, nblk int, ids array<long>, "
        "vecs array<array<double>>",
    ).localCheckpoint()
    left = packed.select(
        "cl",
        F.col("blk").alias("pa"),
        F.explode(
            F.sequence(F.col("blk"), F.col("nblk") - 1)
        ).alias("pb"),
        F.col("ids").alias("aids"),
        F.col("vecs").alias("avecs"),
    )
    right = packed.select(
        "cl",
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("pa"),
        F.col("blk").alias("pb"),
        F.col("ids").alias("bids"),
        F.col("vecs").alias("bvecs"),
    )
    pairs = left.join(right.hint("shuffle_hash"), ["cl", "pa", "pb"]).select(
        "cl", "aids", "avecs", "bids", "bvecs"
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for cl, aids, avecs, bids, bvecs in zip(
                pdf["cl"], pdf["aids"], pdf["avecs"],
                pdf["bids"], pdf["bvecs"],
            ):
                ai = np.asarray(aids, dtype="int64")
                bi = np.asarray(bids, dtype="int64")
                A = np.array([np.asarray(v) for v in avecs],
                             dtype="float64")
                Bm = np.array([np.asarray(v) for v in bvecs],
                              dtype="float64")
                an = np.sqrt((A * A).sum(axis=1))
                an[an == 0] = 1.0
                bn = np.sqrt((Bm * Bm).sum(axis=1))
                bn[bn == 0] = 1.0
                S = (A / an[:, None]) @ (Bm / bn[:, None]).T
                ia, jb = np.nonzero(
                    (S >= tau - margin) & (ai[:, None] != bi[None, :])
                )
                lo = np.minimum(ai[ia], bi[jb])
                hi = np.maximum(ai[ia], bi[jb])
                # the diagonal block pair sees each unordered pair
                # twice ((i,j) and (j,i)): dedupe after normalizing
                uniq = np.unique(np.stack([lo, hi], axis=1), axis=0) \
                    if len(lo) else np.empty((0, 2), dtype="int64")
                yield pd.DataFrame(
                    {
                        "cl": np.full(len(uniq), int(cl), dtype="int32"),
                        "vec_a": uniq[:, 0],
                        "vec_b": uniq[:, 1],
                    }
                )

    return pairs.mapInPandas(gen, "cl int, vec_a long, vec_b long")


def emb_semdedup(spark: SparkSession, sf_dir: str,
                 tau: float = SEMDEDUP_TAU) -> DataFrame:
    """SemDeDup per-cluster report: cluster size, semantic-duplicate
    pairs (same-cluster cosine >= tau), vectors removed under the
    deterministic keep-lowest-id rule, vectors kept, and the mean
    duplicate cosine.

    Two-stage scoring keeps it both fast and oracle-exact: a blocked
    per-cluster float64 GEMM (_cluster_pairs — sub-blocks clusters
    above MAX_CLUSTER_BLOCK_ROWS so a degenerate giant cluster cannot
    OOM one task) prefilters pairs with a 1e-3 margin; survivors are
    re-scored with the sequential JVM fold (functions/vectors.cosine)
    so the reported value adds terms in the same order as DuckDB's
    loop, then the exact round(cos, 6) >= tau gate is applied — the
    emb_near_dup convention (operators/similarity.py).
    """
    # four consumers below (pair generation, both vector sides of the
    # re-score join, cluster sizes) — materialize the assignment once
    # instead of re-running the scan + Arrow distance pass per consumer
    # (the orders_customer_rfm lesson: lineage re-evaluation compounds)
    asg = _assigned(spark, sf_dir).localCheckpoint()

    cand = _cluster_pairs(asg, tau)

    va = asg.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("av"))
    vb = asg.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("bv"))
    scored = (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos", cosine(F.col("av"), F.col("bv")))
        .where(F.round("cos", 6) >= tau)
        .select("cl", "vec_a", "vec_b", "cos")
    )

    sizes = asg.groupBy("cl").agg(F.count("*").alias("n_vecs"))
    pair_stats = scored.groupBy("cl").agg(
        F.count("*").alias("n_dup_pairs"),
        F.round(F.avg("cos"), 4).alias("avg_dup_cos"),
    )
    removed = (
        scored.select("cl", "vec_b").distinct()
        .groupBy("cl")
        .agg(F.count("*").alias("n_removed"))
    )
    return (
        sizes.join(pair_stats, "cl", "left")
        .join(removed, "cl", "left")
        .select(
            "cl",
            "n_vecs",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            (F.col("n_vecs") - F.coalesce("n_removed", F.lit(0))).alias(
                "n_kept"
            ),
            "avg_dup_cos",
        )
    )


N_SHARDS = 16


def docs_shard_plan(spark: SparkSession, sf_dir: str,
                    n_shards: int = N_SHARDS) -> DataFrame:
    """Deterministic corpus sharding plan + balance audit: assign every
    doc to md5(doc_id) % n_shards (same doc -> same shard on every
    run/cluster — the stable-split idiom of docs_train_val_test) and
    report per-shard volume and its balance against the ideal equal
    split. The training-job packing question at 100 TB is exactly
    this: are the shards even enough that no data-parallel worker
    starves? One scan + one n_shards-row aggregate; the grand total
    folds in via a one-row broadcast crossJoin (no driver action).
    """
    docs = _t(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
            16, 10,
        ).cast("long") % n_shards
    )
    per = (
        docs.select(
            shard.alias("shard"),
            F.size(TX.tokens("text")).cast("long").alias("n_toks"),
            "source",
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
    )
    tot = per.agg(
        F.sum("total_tokens").alias("grand_tokens"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            "n_sources",
            TX.round_ratio(
                F.col("total_tokens") / F.col("grand_tokens")
            ).alias("token_share"),
            TX.round_ratio(
                F.col("total_tokens")
                / (F.col("grand_tokens") / F.lit(float(n_shards)))
            ).alias("balance"),
        )
    )


def docs_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus tiering: per source, split documents into
    head / middle / tail thirds by the composite quality score
    (NTILE(3) PARTITION BY source ORDER BY quality DESC, doc_id), and
    report each tier's volume and score band. The tier assignment uses
    the grouped distributed exact NTILE — a per-source window would
    sort each (huge, low-cardinality) source in one task at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    q = quality_frame(docs, "source").select(
        "doc_id", "source", "n_tokens", "quality"
    )
    # exact_values: the composite score takes only ~8 distinct values,
    # so value-range blocking would collapse onto the tied classes and
    # each class would sort in one task — block on (value class x
    # doc_id range) instead
    tiered = distributed_ntile(
        q, 3, "quality", ["doc_id"], descending=True, blocks=16,
        out_col="tier", group_cols=["source"], exact_values=True,
    )
    tier_name = (
        F.when(F.col("tier") == 1, F.lit("head"))
        .when(F.col("tier") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    # the tier average accumulates EXACT e4 integer units: quality is
    # already a 4-dp rounded double, so q4 = round(quality*1e4) is an
    # exact integer on both engines, and the half-up integer-div mean
    # can never sit on the float-sum half-ulp boundary a plain
    # avg(double) lands on (observed flipping with accumulation order)
    return (
        tiered.withColumn(
            "q4", F.round(F.col("quality") * 10000, 0).cast("long")
        )
        .groupBy("source", "tier")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.expr("(2 * sum(q4) + count(*)) div (2 * count(*))")
             / 10000.0).alias("avg_quality"),
            F.round(F.min("quality"), 4).alias("min_quality"),
            F.round(F.max("quality"), 4).alias("max_quality"),
        )
        .withColumn("tier_name", tier_name)
    )
