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

import json
import os
import uuid

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


def refresh_view(spark, table_dir: str, view_dir: str,
                 key: str = "event_id") -> dict:
    """One poll step of a crash-safe incremental materialized view
    over a snapshot table — the lakehouse composition of
    sources/snapshot.change_feed + the signed merge above:

    1. read the view's cursor ({base table version, state path});
    2. derive the change feed since that version (O(delta) for
       appends-only ranges);
    3. merge it into the LAST COMMITTED state (signed partials, so
       deletes propagate);
    4. write the merged state to a fresh versioned directory
       ``state-v{N}``;
    5. atomically replace the cursor to point at it.

    Effectively-once without idempotent merges: a crash anywhere
    before step 5 leaves the old cursor, and the retry re-derives the
    SAME feed and re-applies it to the SAME old state (the partially
    written ``state-v{N}`` is simply overwritten) — the feed is never
    applied to a state that already contains it. This is the O(delta)
    maintained form of the reference's REFRESH MATERIALIZED VIEW
    (create_objects.sql:24-38) for a table that also takes deletes.

    The bootstrap reads the PINNED version resolved at the top of the
    step, never "the latest" — re-resolving could absorb a concurrent
    publish into the state while committing the older cursor,
    double-applying that publish on the next poll. If a vacuum retired
    the cursor's manifest (change_feed raises), the view self-heals
    with a full rebuild from the pinned version. After the commit, the
    superseded state directory is removed — only the committed one is
    ever read again.

    Contract: ONE refresher per view_dir (a scheduled poll, the usual
    materialized-view cadence). Concurrent refreshers would race the
    post-commit state-dir removal — a lagging refresher could find its
    merge-base directory deleted by the winner mid-write.
    """
    import shutil

    from ..sources import snapshot as SN

    os.makedirs(view_dir, exist_ok=True)
    cpath = os.path.join(view_dir, "cursor.json")
    cur = {"version": 0, "state": None}
    try:
        with open(cpath) as f:
            cur = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    man = SN.latest_manifest(table_dir)
    if man is None or man["version"] <= cur["version"]:
        return {"refreshed": False, "version": cur["version"]}
    latest = man["version"]

    def full_rebuild():
        """Partials of the PINNED version; None only when that
        manifest is unresolvable. An EMPTY file list is a real state
        (the table was emptied — change_feed models it as all-deletes),
        NOT absence: conflating the two would leave the view serving
        stale pre-delete rows forever."""
        man_pin = SN._manifest_at(table_dir, latest)
        if man_pin is None:
            return None
        if not man_pin["files"]:
            if cur["state"] is not None:
                return spark.read.parquet(cur["state"]).limit(0)
            return None  # no rows and no prior schema: nothing to view
        base = SN._read_files(spark, man_pin["files"])
        return feed_partials(
            base.select("*", F.lit("insert").alias("_change_type"))
        )

    if cur["version"] == 0:
        merged = full_rebuild()
        if merged is None:
            return {"refreshed": False, "version": 0}
    else:
        try:
            feed = SN.change_feed(
                spark, table_dir, cur["version"], latest, key=key
            )
        except ValueError:
            # cursor's manifest vacuumed: incremental is impossible —
            # rebuild from scratch rather than silently skip the hole
            feed = None
            merged = full_rebuild()
            if merged is None:
                return {"refreshed": False, "version": cur["version"]}
        else:
            state = (
                spark.read.parquet(cur["state"])
                if cur["state"] is not None else None
            )
            if feed is None:
                merged = state
            else:
                partials = feed_partials(feed)
                merged = (
                    merge_partials(state, partials)
                    if state is not None else partials
                )
    merged = merged.where(F.col("cnt") > 0)
    new_state = os.path.join(view_dir, f"state-v{latest:06d}")
    merged.write.mode("overwrite").parquet(new_state)
    tmp = cpath + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump({"version": latest, "state": new_state}, f)
    os.replace(tmp, cpath)  # commit: cursor now owns the new state
    if cur["state"] and cur["state"] != new_state:
        shutil.rmtree(cur["state"], ignore_errors=True)
    return {"refreshed": True, "version": latest, "state": new_state}


def read_current_view(spark, view_dir: str) -> DataFrame | None:
    """The last committed state of a refresh_view view (None before
    the first successful refresh)."""
    try:
        with open(os.path.join(view_dir, "cursor.json")) as f:
            cur = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None
    if not cur.get("state"):
        return None
    return read_view(spark.read.parquet(cur["state"]))
