"""Distributed exact global ranking / NTILE.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the whole frame
through ONE task — correct, but a single-partition sort that dies at
100x scale. This module computes the exact same NTILE assignment with
no global sort:

1. **Monotone value-range blocking**: split the sort-value domain into
   ``blocks`` ranges via ``percentile_approx`` cutoffs. Exactness does
   NOT depend on the cutoffs — they only balance work. Equal values
   always land in the same block (strict ``cut < v`` comparison), so
   blocks partition the global order.
2. **Local ranks**: ``row_number`` per block (shuffle on the block key,
   ``blocks``-way parallel — the only data-sized shuffle).
3. **Block offsets**: per-block counts (tiny, ``blocks`` rows) expanded
   to cumulative offsets with a broadcast self-join — no
   single-partition Exchange anywhere in the plan.
4. ``global_rank = offset + local_rank``; the NTILE bucket follows from
   the standard remainder rule (first ``n % k`` buckets get one extra
   row), evaluated per row from (rank, n).

Matches ANSI/DuckDB ``NTILE(k) OVER (ORDER BY v [DESC], tiebreaks)``
bit-for-bit, so oracle SQL keeps plain NTILE.

``group_cols`` generalizes this to ``NTILE(k) OVER (PARTITION BY g
ORDER BY ...)`` for LOW-cardinality groups (sources, segments): a plain
``Window.partitionBy(g)`` would sort each group's full frame in ONE
task — the same scale-killer when groups are few and huge. Here the
cutoffs/blocks/offsets all become per-group, so every group fans out
over ``blocks`` tasks.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_NUMERIC_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "boolean",
}


def _monotone_key(df: DataFrame, col: str) -> Column:
    """A numeric projection of ``col`` that is monotone non-decreasing
    in the column's sort order — the block key for exact_values mode.

    Blocking only needs monotonicity, not injectivity: rows tied on
    the projection stay in one block (strict ``cut < v``), and the
    in-block row_number orders them by the full tiebreak. A blind
    ``cast("double")`` on a non-numeric column yields null for every
    row, silently collapsing each value class back to one task — the
    exact skew the mode exists to remove — so non-castable types get
    an explicit projection or a loud error."""
    dt = df.schema[col].dataType.simpleString()
    c = F.col(col)
    if dt in _NUMERIC_TYPES or dt.startswith("decimal"):
        return c.cast("double")
    if dt in ("timestamp", "timestamp_ntz"):
        return c.cast("double")  # epoch seconds — monotone
    if dt == "date":
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if dt == "string":
        # Big-endian integer of the first 8 UTF-8 bytes: UTF-8 byte
        # order equals code-point order, so this is monotone; strings
        # sharing an 8-byte prefix tie (same block) and resolve via
        # the in-block sort. Rounding through double keeps monotone.
        h = F.hex(F.encode(F.substring(c, 1, 8), "UTF-8"))
        return F.conv(
            F.substring(F.rpad(h, 16, "0"), 1, 16), 16, 10
        ).cast("double")
    raise ValueError(
        f"exact_values tiebreak column {col!r} has unsupported type "
        f"{dt}: provide a numeric/string/date/timestamp first tiebreak"
    )


def distributed_ntile(
    df: DataFrame,
    n_buckets: int,
    value_col: str,
    tiebreak_cols: list[str],
    *,
    descending: bool = False,
    blocks: int = 64,
    out_col: str = "bucket",
    group_cols: list[str] | None = None,
    exact_values: bool = False,
) -> DataFrame:
    """Append ``out_col`` = exact NTILE(n_buckets) over
    [PARTITION BY *group_cols] ORDER BY value_col [DESC], *tiebreak_cols
    — without a global (or per-group single-task) sort.

    ``value_col`` must be numeric and non-null (negation implements
    DESC). Ties on the value are broken by ``tiebreak_cols`` ascending,
    exactly as the equivalent window spec would. ``group_cols`` must be
    low-cardinality (the cutoff/offset side tables are
    groups x blocks rows and are broadcast) and NON-NULL (the
    per-group joins are plain equi-joins — a NULL group key would
    drop its rows rather than form its own partition; coalesce a
    sentinel upstream if a nullable key must be bucketed).
    """
    if exact_values and not tiebreak_cols:
        raise ValueError(
            "exact_values mode requires at least one tiebreak column: "
            "tied value classes fan out over ranges of the first "
            "tiebreak, so without one every class would funnel through "
            "a single task"
        )
    g = list(group_cols or [])
    sv = F.col(value_col).cast("double")
    if descending:
        sv = -sv
    d0 = df.withColumn("_sv", sv)

    fracs = [i / blocks for i in range(1, blocks)]
    if exact_values:
        # Heavy-tie mode: with a LOW-cardinality sort value (scores,
        # grades), value-range cutoffs collapse onto the few distinct
        # values and each tied class still funnels through one task.
        # Here the primary block IS the exact value class, and each
        # class fans out over `blocks` ranges of the FIRST tiebreak
        # (numeric). Sub-splitting by tiebreak is only order-preserving
        # WITHIN a value class — across classes a high tiebreak in a
        # lower class would outrank a low tiebreak in a higher class —
        # which is exactly why the primary key must be the exact value,
        # not a value range. Side tables grow to
        # groups x n_distinct_values x blocks rows: the documented
        # low-cardinality requirement keeps them broadcast-small.
        d0 = d0.withColumn("_tb", _monotone_key(df, tiebreak_cols[0]))
        cuts = d0.groupBy(*g).agg(
            F.percentile_approx("_tb", fracs, 10000).alias("_cuts")
        )
        if g:
            d = d0.join(F.broadcast(cuts), on=g)
        else:
            d = d0.crossJoin(F.broadcast(cuts))
        d = d.withColumn(
            "_blk",
            F.size(F.filter(F.col("_cuts"), lambda c: c < F.col("_tb"))),
        )
        # the class key is the ORIGINAL value column, NOT its double
        # projection: distinct BIGINTs above 2^53 collapse onto one
        # double, and a collapsed class sub-blocked by tiebreak ranges
        # would order across-block by tiebreak where the true order is
        # by value first (the >2^53 fix, exact_values edition)
        blk_keys = [value_col, "_blk"]
        vc, vc2 = F.col(value_col), F.col(f"{value_col}2")
        # ordering across composite blocks: value class first (DESC
        # inverts the class comparison), then tiebreak range
        cls_lt = (vc2 > vc) if descending else (vc2 < vc)
        before = cls_lt | (
            (vc2 == vc) & (F.col("_blk2") < F.col("_blk"))
        )
    else:
        cuts = d0.groupBy(*g).agg(
            F.percentile_approx("_sv", fracs, 10000).alias("_cuts")
        )
        # Strict `c < v`: rows sharing a value can never straddle a
        # block boundary, so blocks are monotone in the (per-group)
        # order. The lambda runs over a bounded (blocks-1)-element
        # array, not a token stream.
        if g:
            d = d0.join(F.broadcast(cuts), on=g)
        else:
            d = d0.crossJoin(F.broadcast(cuts))
        d = d.withColumn(
            "_blk",
            F.size(F.filter(F.col("_cuts"), lambda c: c < F.col("_sv"))),
        )
        blk_keys = ["_blk"]
        before = F.col("_blk2") < F.col("_blk")

    # In-block order by the ORIGINAL value column, not its double
    # projection: distinct integers above 2^53 collapse to one double
    # and would silently hand their relative order to the tiebreaks
    # (the distributed_cumsum fix, applied to the sibling). _sv keeps
    # its blocking role — the cast is monotone, so values that collapse
    # always share a block and block-monotonicity is preserved.
    ov = (F.col(value_col).desc() if descending
          else F.col(value_col).asc())
    w_local = Window.partitionBy(*g, *blk_keys).orderBy(
        ov, *[F.col(c).asc() for c in tiebreak_cols]
    )
    d = d.withColumn("_lrn", F.row_number().over(w_local))

    sizes = d.groupBy(*g, *blk_keys).agg(F.count("*").alias("_c"))
    other = sizes.select(
        *[F.col(c).alias(f"_g2_{c}") for c in g],
        *[F.col(k).alias(f"{k}2") for k in blk_keys],
        F.col("_c").alias("_c2"),
    )
    # (groups x blocks)^2 broadcast join (tiny): per-group cumulative
    # offset and group total in one aggregate, no SinglePartition
    # Exchange, no driver collect.
    if g:
        join_cond = None
        for c in g:
            eq = F.col(c) == F.col(f"_g2_{c}")
            join_cond = eq if join_cond is None else (join_cond & eq)
        paired = sizes.join(F.broadcast(other), join_cond)
    else:
        paired = sizes.crossJoin(F.broadcast(other))
    offs = (
        paired.groupBy(*g, *blk_keys)
        .agg(
            F.sum(
                F.when(before, F.col("_c2")).otherwise(F.lit(0))
            ).alias("_off"),
            F.sum("_c2").alias("_n"),
        )
    )

    ranked = d.join(F.broadcast(offs), [*g, *blk_keys]).withColumn(
        "_rank", F.col("_off") + F.col("_lrn")
    )

    k = F.lit(n_buckets)
    q = F.floor(F.col("_n") / k)
    r = F.col("_n") % k
    # First r buckets have q+1 rows, the rest q (ANSI NTILE remainder
    # rule). greatest(q,1) guards the (n < k) edge where the otherwise
    # branch is never taken but still type-checked.
    bucket = (
        F.when(
            F.col("_rank") <= (q + 1) * r,
            F.floor((F.col("_rank") - 1) / (q + 1)) + 1,
        )
        .otherwise(
            r
            + F.floor(
                (F.col("_rank") - (q + 1) * r - 1) / F.greatest(q, F.lit(1))
            )
            + 1
        )
        .cast("int")
    )
    return ranked.withColumn(out_col, bucket).drop(
        "_sv", "_tb", "_cuts", "_blk", "_lrn", "_off", "_n", "_rank"
    )


def distributed_cumsum(
    df: DataFrame,
    sum_col: str,
    order_col: str,
    tiebreak_cols: list[str],
    *,
    descending: bool = False,
    blocks: int = 64,
    out_col: str = "cum",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Append ``out_col`` = exact running SUM(sum_col) OVER
    ([PARTITION BY *group_cols] ORDER BY order_col [DESC], *tiebreaks
    ROWS UNBOUNDED PRECEDING) — the segmented-scan form: value-range
    blocks (approximate cutoffs, only balance matters; ties stay in
    one block via strict comparison), a per-block window for the
    local prefix, and the tiny per-block totals expanded to broadcast
    offsets. No single task ever holds the full frame, unlike the
    bare global-orderBy window.

    ``group_cols`` generalizes the scan to per-group running sums for
    LOW-cardinality groups (segments, sources, nations) — exactly as
    ``distributed_ntile`` grew them: a plain
    ``Window.partitionBy(g)`` would put each group's full frame
    through ONE sort task when groups are few and huge; here the
    cutoffs, blocks and offsets all become per-group (the side tables
    are groups x blocks rows, broadcast), so every group fans out
    over ``blocks`` tasks.

    ``sum_col`` and ``order_col`` must be numeric non-null (they may
    be the same column — the ABC-analysis shape). ``group_cols``
    values must be NON-NULL too: the per-group cutoff/offset joins
    are plain equi-joins, so a NULL group key would drop its rows
    instead of forming its own partition the way
    ``Window.partitionBy`` does — coalesce a sentinel upstream if a
    nullable key must be scanned."""
    g = list(group_cols or [])
    sv = F.col(order_col).cast("double")
    if descending:
        sv = -sv
    d0 = df.withColumn("_sv", sv)
    fracs = [i / blocks for i in range(1, blocks)]
    cuts = d0.groupBy(*g).agg(
        F.percentile_approx("_sv", fracs, 10000).alias("_cuts")
    )
    if g:
        d = d0.join(F.broadcast(cuts), on=g)
    else:
        d = d0.crossJoin(F.broadcast(cuts))
    d = d.withColumn(
        "_blk",
        F.size(F.filter(F.col("_cuts"), lambda c: c < F.col("_sv"))),
    )
    # Block by the double projection (monotone, so ties never straddle
    # blocks) but ORDER the in-block scan by the ORIGINAL column: a
    # double collapses distinct integers above 2^53 onto one value and
    # would silently hand ordering to the tiebreaks, diverging from
    # the documented exact ORDER BY order_col semantics.
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [oc] + [F.col(c).asc() for c in tiebreak_cols]
    w_loc = (
        Window.partitionBy(*g, "_blk")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("_lcum", F.sum(sum_col).over(w_loc))
    sizes = d.groupBy(*g, "_blk").agg(F.sum(sum_col).alias("_bsum"))
    other = sizes.select(
        *[F.col(c).alias(f"_g2_{c}") for c in g],
        F.col("_blk").alias("_b2"),
        F.col("_bsum").alias("_s2"),
    )
    # (groups x blocks)^2 broadcast pairing — tiny; per-group
    # cumulative offsets with no SinglePartition Exchange
    if g:
        join_cond = None
        for c in g:
            eq = F.col(c) == F.col(f"_g2_{c}")
            join_cond = eq if join_cond is None else (join_cond & eq)
        paired = sizes.join(F.broadcast(other), join_cond)
    else:
        paired = sizes.crossJoin(F.broadcast(other))
    offs = (
        paired.groupBy(*g, "_blk")
        .agg(
            F.sum(
                F.when(F.col("_b2") < F.col("_blk"), F.col("_s2"))
                .otherwise(F.lit(0))
            ).alias("_off")
        )
    )
    return (
        d.join(F.broadcast(offs), [*g, "_blk"])
        .withColumn(out_col, F.col("_off") + F.col("_lcum"))
        .drop("_sv", "_cuts", "_blk", "_lcum", "_off")
    )


# merge-tree fan-in for grouped_topk: one reduce buffer never collects
# more than _MERGE_FANIN truncated arrays (_MERGE_FANIN * k structs)
_MERGE_FANIN = 256

# stage-1 shard space per salt: input-split ids are folded in modulo
# this, so the shard id stays bounded without probing the real
# partition count (pmod degrades gracefully — two splits sharing a
# residue merely share a buffer)
_SPLIT_SPACE = 1 << 20


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    payload_cols: list[Column],
    k: int,
    salt_expr: Column,
    *,
    n_salts: int | None = None,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact top-k per group as a MERGEABLE two-stage aggregate — the
    scale-safe replacement for ``row_number() OVER (PARTITION BY g
    ORDER BY ...) <= k`` when a group's frame is corpus-sized (few
    query ids, each scoring the whole corpus: one WindowExec task
    would sort ~N rows per group at 100 TB).

    The plan is the bottom-k sketch's own mergeability (k smallest of
    a union = k smallest of the per-shard k-smallest), the exact
    pattern events_kmv_distinct proved out: rows are salted into
    ``n_salts`` shards by ``salt_expr``, each (group, salt) shard
    keeps its k smallest ``order_cols`` structs inside one aggregation
    buffer (``slice(array_sort(collect_list(...)), 1, k)``), and the
    shards reduce through a capped-fan-in merge TREE. No window
    anywhere; every stage is a map-side-combinable hash aggregate.

    Buffer discipline (the part that makes the 100 TB claim honest):
    the stage-1 shard key is (salt, input-split id) — ``collect_list``
    has no partial truncation, so grouping by salt alone would
    concatenate every map task's partial list for a (group, salt)
    shard into ONE reduce buffer, O(shard) = O(corpus/n_salts) rows;
    a skewed ``salt_expr`` or a small cluster makes that a JVM OOM.
    Folding ``spark_partition_id()`` into the shard means each
    stage-1 key is only ever produced by ONE map task, so its reduce
    buffer holds at most one input split's rows for that (group,
    salt) — bounded by ``maxPartitionBytes``, independent of corpus
    size and of ``n_salts`` sizing. ``n_salts`` (default 8 shards per
    cluster core via defaultParallelism — deliberately NOT a df.rdd /
    executedPlan probe: under AQE those MATERIALIZE the query's
    shuffle stages just to read a partition count, measured as
    running every consumer twice) still matters for merge-tree
    parallelism and stays a live knob. Split ids fold in modulo
    ``_SPLIT_SPACE`` (2^20) so the shard-id domain is statically
    bounded; beyond 2^20 input splits, splits sharing a residue share
    a buffer — graceful, not wrong. The merge runs as a tree whose
    depth scales with ``n_salts`` (a projection first compacts the
    sparse split dimension to its mod-256 residue, so the tree never
    pays levels for the static 2^20 domain); an UNCONDITIONAL
    residue-merge level then restores the per-buffer <=
    _MERGE_FANIN*k cap — populated splits are bounded by INPUT
    SPLITS, not parallelism, so a many-small-files corpus on a small
    cluster needs the level just as much as a big cluster does (and
    it is a cheap hash aggregate on an already k-truncated frame).
    Top-k merge is associative, so the tree is exact at any shape.

    ``order_cols`` is the ASCENDING composite sort (negate a column
    for descending) and must be a total order within each group (end
    with a unique id) — payloads ride along in a nested struct and
    must never decide placement. Output: ``group_cols`` + the payload
    columns (callers alias them) + ``rank_col`` = 1-based dense
    position, matching ``row_number`` on the same order exactly.
    """
    if n_salts is None:
        n_salts = max(
            32, 8 * df.sparkSession.sparkContext.defaultParallelism
        )
    item = F.struct(
        *[c.alias(f"_o{i}") for i, c in enumerate(order_cols)],
        F.struct(*payload_cols).alias("_p"),
    )
    shard = (
        F.pmod(salt_expr, F.lit(n_salts)).cast("long") * F.lit(_SPLIT_SPACE)
        + F.pmod(F.spark_partition_id(), F.lit(_SPLIT_SPACE)).cast("long")
    )
    cur = (
        df.withColumn("_shard", shard)
        .groupBy(*group_cols, "_shard")
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("_tk"))
    )
    # compact the sparse (salt, split) domain before the merge tree:
    # stage-1 keys keep FULL split precision (one split per buffer,
    # the structural guarantee), but sizing the tree to the static
    # 2^20 split space would force ceil(log_256(n_salts * 2^20)) = 3
    # near-empty shuffle levels on EVERY call (measured at sf0.1:
    # the whole ANN/mining family inflated, emb_ann_recall alone
    # +several seconds). A pure projection folds the split id to its
    # residue mod _MERGE_FANIN (2^20 is a multiple of 256, so pmod
    # extracts the split residue exactly); tree depth then scales
    # with n_salts — the REAL parallelism knob — not the worst-case
    # constant. The first div level after this merges, per (group,
    # salt) key, the one-split arrays of every populated residue:
    # fan-in = populated splits. That count is bounded by INPUT
    # SPLITS, not parallelism — a small cluster reading a many-small-
    # files corpus (splits >> 256, parallelism <= 256) would
    # otherwise see O(splits*k)-struct buffers at the first merge
    # level — so the residue-merge level that restores the per-buffer
    # <= _MERGE_FANIN*k cap runs UNCONDITIONALLY: it is a cheap hash
    # aggregate on an already k-truncated frame, and it is the only
    # way the cap holds independent of file-count pathology.
    cur = cur.withColumn(
        "_shard",
        F.expr(
            f"(_shard div {_SPLIT_SPACE}) * {_MERGE_FANIN}"
            f" + pmod(_shard, {_MERGE_FANIN})"
        ),
    )
    cur = cur.groupBy(*group_cols, "_shard").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_tk"))), 1, k
        ).alias("_tk")
    )
    shards = n_salts * _MERGE_FANIN
    while shards > _MERGE_FANIN:
        shards = -(-shards // _MERGE_FANIN)
        cur = (
            cur.withColumn(
                "_shard", F.expr(f"_shard div {_MERGE_FANIN}")
            )
            .groupBy(*group_cols, "_shard")
            .agg(
                F.slice(
                    F.array_sort(F.flatten(F.collect_list("_tk"))), 1, k
                ).alias("_tk")
            )
        )
    merged = cur.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_tk"))), 1, k
        ).alias("_tk")
    )
    return merged.select(
        *group_cols, F.posexplode("_tk").alias("_pos", "_it")
    ).select(
        *group_cols,
        F.col("_it._p.*"),
        (F.col("_pos") + 1).cast("long").alias(rank_col),
    )
