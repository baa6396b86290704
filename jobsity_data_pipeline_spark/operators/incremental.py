"""Incremental view maintenance: keep an aggregate table current by
merging partial aggregates from each new delta batch instead of
recomputing from the full fact table.

The reference refreshes its weekly-average materialized view with a
full REFRESH (create_objects.sql:24-38 + README refresh note); at
100 TB a full recompute per ingest is impossible. The Spark-native
answer is the algebraic-aggregate merge: store the MERGEABLE partial
state (count, sum — never avg) per group, aggregate only the delta,
and combine with a key-wise sum. Cost per refresh is O(delta) + a
shuffle on the (small) aggregate table, independent of the fact
table's total size. The same merge runs inside foreachBatch for the
streaming path (streaming/stream.py upsert pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_partials(events: DataFrame) -> DataFrame:
    """Partial-aggregate state for the hourly rollup: (event_type,
    hour) -> count + sum(value). These are the algebraic pieces every
    derived metric (avg, rate) is computed FROM at read time; storing
    avg itself would make the state non-mergeable."""
    return events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum("value").alias("sum_value"),
    )


def merge_partials(state: DataFrame, delta_partials: DataFrame) -> DataFrame:
    """Merge a delta batch's partial aggregates into the stored state:
    union + key-wise sum. Commutative + associative, so batches can
    arrive in any order, be replayed (with idempotent batch ids
    upstream), or be merged tree-wise across shards. One shuffle on
    the group key, sized by the AGGREGATE table, not the fact table."""
    return (
        state.unionByName(delta_partials)
        .groupBy("event_type", "h")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_value").alias("sum_value"),
        )
    )


def feed_partials(feed: DataFrame) -> DataFrame:
    """SIGNED partial aggregates from a snapshot change feed
    (sources/snapshot.change_feed): inserts contribute +1/+value,
    deletes -1/-value. The classic incremental-view-maintenance
    treatment of deletions — a GDPR delete on the base table propagates
    to the aggregate view at O(delta) cost through the same mergeable
    state, no refresh. Count/sum are abelian-group aggregates, so
    signed merge is exact; MIN/MAX-style views are not maintainable
    under deletes this way and need a recompute of affected groups."""
    sign = F.when(
        F.col("_change_type") == "insert", F.lit(1)
    ).otherwise(F.lit(-1))
    return feed.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(sign).alias("cnt"),
        F.sum(sign * F.col("value")).alias("sum_value"),
    )


def merge_feed(state: DataFrame, feed: DataFrame) -> DataFrame:
    """Apply a change feed to the stored state: signed merge, then
    drop groups whose rows have all been deleted (cnt == 0) so the
    state table never accretes tombstone groups."""
    merged = merge_partials(state, feed_partials(feed))
    return merged.where(F.col("cnt") > 0)


def read_view(state: DataFrame) -> DataFrame:
    """Derive presentation metrics from the mergeable state at read
    time (avg = sum/count) — the stored table never holds
    non-mergeable columns."""
    return state.select(
        "event_type",
        "h",
        "cnt",
        F.round(F.col("sum_value") / F.col("cnt"), 6).alias("avg_value"),
    )
