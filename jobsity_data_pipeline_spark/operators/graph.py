"""Iterative graph operators over DataFrame edge lists — no graph
library, just joins + aggregates per round with checkpointed lineage.

Both operators keep per-round driver state at zero (connected
components) or O(1) scalars (PageRank's node count): each iteration is
one equi-join on the edge list plus one aggregate, the standard Spark
shape for bounded-iteration graph analytics at warehouse scale. Rounds
are bounded by graph diameter (components) or a fixed iteration count
(PageRank), and every round's result is localCheckpoint-ed so lineage
stays flat no matter how many rounds run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirect(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """(u, v) edge list with both directions from an (a, b) pair list."""
    return (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    )


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(id, component) for every vertex of an undirected (u, v) edge
    list; component = the minimum vertex id reachable. Iterative
    min-label propagation, converged when no label changes — rounds =
    graph diameter. Deterministic: min() over a fixed vertex set."""
    # self-loops fold the "keep my own label" case into the neighbor
    # min, so a round is ONE join + ONE min-aggregate (no left-join
    # back). r13 note: the repartition("v") does NOT survive the
    # checkpoint for PLANNING (a localCheckpoint comes back as a
    # LogicalRDD with UnknownPartitioning, so every round's join
    # re-exchanges this side) — but it still pays for itself as a
    # LAYOUT pass: the union's natural partitioning is the
    # concatenation of both children's (many uneven partitions), and
    # every one of the diameter-many rounds launches one map task per
    # checkpoint partition. Measured at sf0.1: removing it made the
    # 11-round near-dup consumer ~0.8s SLOWER (6.0 -> 6.8) while
    # saving only the single build-time exchange.
    nodes = edges.select(F.col("u").alias("id")).distinct()
    # r14: both seed frames are LAZY checkpoints — round 1's count is
    # the materializing action, so the two up-front materialization
    # jobs fold into it (the checkpointed partitions persist exactly as
    # before; guide §2.4 fewer driver round-trips per iteration)
    looped = (
        edges.union(nodes.select(F.col("id").alias("u"), F.col("id").alias("v")))
        .repartition(F.col("v"))
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint(
        eager=False
    )
    for _ in range(max_iter):
        # r13 perf: the convergence check rides the SAME join+aggregate
        # as the label update — the self-loop row (v == u) carries each
        # node's old label into its group, so min(when(v==u, label))
        # recovers it without the second labels-vs-labels join+count
        # the old form paid per round (one join + one count job fewer
        # per iteration; the changed-count now scans the checkpointed
        # node-sized frame)
        # r14: the checkpoint is LAZY — the convergence count is the
        # round's single materializing action (it computes and persists
        # the full new_labels RDD, then counts the changed rows on
        # top), so each round schedules ONE job where the eager form
        # paid a materialization job plus a count job
        new_labels = (
            looped.join(labels, looped["v"] == labels["id"])
            .groupBy(F.col("u").alias("id"))
            .agg(
                F.min("label").alias("label"),
                F.min(
                    F.when(F.col("v") == F.col("u"), F.col("label"))
                ).alias("_old"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where(
            F.col("label") != F.col("_old")
        ).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("component"))


def pagerank(edges: DataFrame, damping: float = 0.85,
             iters: int = 10) -> DataFrame:
    """(node, rank) after a FIXED number of power iterations on an
    undirected (u, v) edge list (fixed count keeps the result
    deterministic and oracle-replicable; convergence-tested variants
    just add the delta check from connected_components).

    Per round: rank/out_degree flows along edges (one equi-join), sums
    per destination (one aggregate), and re-mixes with the teleport
    term. Undirected edges mean no dangling nodes. Only the node count
    crosses to the driver.
    """
    edges = edges.localCheckpoint()
    # deg's keys ARE the node set (undirected edges: every node has an
    # out-edge), so it both rides the edge join and seeds the rank
    # vector — the former separate nodes-distinct aggregation was a
    # second full-edge pass for a frame deg already contains (guide
    # §2.4: fewer passes over the fat side)
    deg = edges.groupBy("u").agg(F.count("*").alias("d")).localCheckpoint()
    # degree is loop-invariant: attach it to the edge list ONCE so each
    # iteration is exactly one join (ranks) + one aggregate. r13: the
    # former repartition("u") before the checkpoint was WASTED work —
    # a localCheckpoint comes back as a LogicalRDD with
    # UnknownPartitioning (verified empirically: every round's join
    # re-exchanges the edge side regardless), so the pre-shuffle
    # bought nothing and cost one full edge-list exchange per call
    ed = edges.join(deg, "u").localCheckpoint()
    n = deg.count()
    ranks = deg.select(
        F.col("u").alias("node"), F.lit(1.0 / n).alias("rank")
    ).localCheckpoint()
    # no per-round checkpoint: unlike connected_components there is no
    # mid-loop action, so the single downstream action runs each round's
    # join+agg exactly once — eager checkpoints would just add one
    # materialization job per round
    for _ in range(iters):
        contrib = ed.join(ranks, ed["u"] == ranks["node"]).select(
            F.col("v").alias("node"), (F.col("rank") / F.col("d")).alias("c")
        )
        ranks = contrib.groupBy("node").agg(
            (
                F.lit((1.0 - damping) / n) + F.lit(damping) * F.sum("c")
            ).alias("rank")
        )
    return ranks


def triangle_stats(pairs: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact triangle count + global clustering coefficient for an
    undirected graph given as a CANONICAL pair list (a < b, distinct).

    Compact-forward with adjacency intersection: orient every edge
    from its lower-(degree, id) endpoint to the higher one — capping
    every vertex's OUT-degree at O(sqrt(m)) regardless of raw skew, so
    a degree-10^6 hub contributes nothing at its apex — then count,
    per oriented edge (u, v), the common out-neighbors
    |N+(u) ∩ N+(v)|. Each triangle {u<v<w by rank} is counted exactly
    once, at its (u, v) base edge. The intersection runs on collected
    out-adjacency ARRAYS (each ≤ O(sqrt(m)) long), so no wedge set is
    ever materialized or shuffled — the wedge-join variant moved ~20M
    intermediate rows on this data and ran 1.5× slower.

    Returns one row: nodes, edges, wedges (Σ d·(d-1)/2), triangles,
    and the global clustering coefficient 3·triangles / wedges.
    """
    # deg (node-sized) is checkpointed for its 3 uses; und is pinned
    # LAZILY (r13): its upstream is not a scan but a corpus self-join
    # + distinct (parts_triangles), and re-running that per reference
    # (the degree pass AND the orientation pass) was measured at 2x
    # the query's input bytes — one executor-local copy of the edge
    # list (two longs per edge) is the cheaper side of that trade at
    # any scale where the edge list fits the cluster's disks
    und = pairs.select(
        F.col(a).alias("x"), F.col(b).alias("y")
    ).distinct().localCheckpoint(eager=False)
    deg = (
        undirect(und, "x", "y").groupBy("u").agg(F.count("*").alias("d"))
        .localCheckpoint()
    )
    dx = deg.select(F.col("u").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("u").alias("y"), F.col("d").alias("dy"))
    e = und.join(dx, "x").join(dy, "y")
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    oe = e.select(
        F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
    ).localCheckpoint()
    # r13: the adjacency frame feeds BOTH sides of the closing join —
    # pin it lazily so the collect_list aggregation runs once
    adj = oe.groupBy("src").agg(
        F.collect_list("dst").alias("nbrs")
    ).localCheckpoint(eager=False)
    au = adj.select(F.col("src").alias("u_"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("src").alias("v_"), F.col("nbrs").alias("nv"))
    closed = (
        oe.join(au, oe["src"] == F.col("u_"))
        # highest-ranked vertices have no out-edges: left join + 0
        .join(av, oe["dst"] == F.col("v_"), "left")
        .select(
            F.when(F.col("nv").isNull(), F.lit(0))
            .otherwise(F.size(F.array_intersect("nu", "nv")))
            .alias("c")
        )
    )
    # one-row lazy aggregate folded in by broadcast crossJoin — keeps
    # the whole op a single job (no eager scalar fetch on the driver)
    tri = closed.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("triangles")
    )
    stats = (
        deg.agg(
            F.count("*").alias("nodes"),
            (F.sum("d") / 2).cast("long").alias("edges"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias(
                "wedges"
            ),
        )
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "nodes",
        "edges",
        "wedges",
        "triangles",
        F.round(F.lit(3.0) * F.col("triangles") / F.col("wedges"), 6).alias(
            "global_clustering"
        ),
    )
