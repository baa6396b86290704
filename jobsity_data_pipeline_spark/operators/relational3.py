"""Third operator wave: as-of join, pivot, moving averages, and the
candidate-then-verify near-dup composition — plus the SQL-string
interface mirroring the reference's .sql-file workflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _doc_shingles, docs_minhash_pairs
from ..session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def events_asof_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join within the event stream: each purchase picks up the
    most recent PRIOR view's value for the same user.

    Spark has no ASOF JOIN; the scalable encoding is a single window
    pass — ``last(value ignorenulls=True)`` over a time-ordered,
    key-partitioned frame. One shuffle on user_id; no range join, no
    fan-out. (Between two tables the same shape applies after a tagged
    unionByName.)
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.withColumn(
        "view_val", F.when(F.col("event_type") == "view", F.col("value"))
    )
    return (
        tagged.withColumn(
            "last_view_value", F.last("view_val", ignorenulls=True).over(w)
        )
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("value").alias("purchase_value"),
            "last_view_value",
        )
    )


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts into one column per event type per user.

    Explicit pivot values keep the plan single-pass (no distinct-scan
    to discover columns) — required at scale anyway.
    """
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = ev.groupBy("user_id").pivot("event_type", types).count()
    out = pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types],
    )
    return out


def events_daily_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily event counts per type — windowed
    time series over a pre-aggregated (tiny) frame, so the global
    ordering window never sees raw events."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "day", "event_type", "n", F.round(F.avg("n").over(w), 4).alias("ma7")
    )


def docs_near_dup_verified(spark: SparkSession, sf_dir: str,
                           threshold: float = 0.12) -> DataFrame:
    """The production near-dup composition: MinHash-LSH candidates,
    then EXACT Jaccard verification on candidates only.

    This is the 100 TB pattern — the exact set intersection runs on the
    (tiny) candidate set, never all pairs; both stages are equi-joins.
    """
    pairs = docs_minhash_pairs(spark, sf_dir)
    sh = _doc_shingles(spark, sf_dir).localCheckpoint()
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(sa, "doc_a").join(sb, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        joined.select(
            "doc_a", "doc_b", F.round(inter / union, 4).alias("jaccard")
        )
        .where(F.col("jaccard") >= threshold)
    )


# --- SQL-string interface (the reference drives everything from .sql
# files piped to psql; the Spark twin registers views and runs SparkSQL)

def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


# The reference's summarized_trip_data view (create_objects.sql:24-38)
# as literal SparkSQL under the events mapping — exercises the SQL
# entrypoint end-to-end with the same oracle as weekly_avg_by_region.
WEEKLY_AVG_SQL = """
    WITH t AS (
        SELECT concat('region_', CAST(user_id % 8 AS STRING)) AS region,
               ts AS date_time
        FROM events
    ),
    c AS (
        SELECT region,
               concat(date_format(date_time, 'yyyy-MM'), '-0',
                      CAST(CAST(ceil(dayofmonth(date_time) / 7.0) AS INT)
                           AS STRING)) AS week_of_month,
               count(*) AS cnt
        FROM t GROUP BY 1, 2
    )
    SELECT region, week_of_month,
           CAST(ceil(avg(cnt)) AS BIGINT) AS weekly_avg
    FROM c GROUP BY 1, 2
"""


def sql_weekly_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, WEEKLY_AVG_SQL)
