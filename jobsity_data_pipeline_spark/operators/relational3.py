"""Third operator wave: as-of join, pivot, moving averages, and the
candidate-then-verify near-dup composition — plus the SQL-string
interface mirroring the reference's .sql-file workflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import docs_minhash_pairs
from ..functions import money as M
from ..functions import text as TX
from ..session import ensure_parallelism, read_table


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
    from .dedup import _doc_shingles_exploded

    pairs = docs_minhash_pairs(spark, sf_dir)
    ex = _doc_shingles_exploded(spark, sf_dir).localCheckpoint()
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    ea = ex.select(F.col("doc_id").alias("doc_a"), "shingle")
    eb = ex.select(F.col("doc_id").alias("_db"), F.col("shingle").alias("shingle_b"))
    common = (
        pairs.join(ea, "doc_a")
        .join(
            eb,
            (F.col("doc_b") == F.col("_db"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            TX.round_ratio(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
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


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all grouping-set combinations."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        (F.sum(M.cents("o_totalprice")) / 100.0).alias("total_price"),
    )


def events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension enrichment: events joined to the customer dim
    (user_id as customer key) — broadcast the dim, aggregate revenue
    proxy per market segment."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev["user_id"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum(M.cents("value")) / 100.0).alias("total_value"),
        )
    )


def docs_clean_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data cleaning pipeline: exact-dedup (keep
    lowest doc_id per content hash), drop low-quality docs, then report
    per-language corpus stats — the end-to-end shape of a data-prep
    job, still one declarative plan (dedup via min-id semi filter,
    quality as a scan-stage predicate)."""
    d = ensure_parallelism(spark, read_table(spark, sf_dir, "documents"))
    staged = d.select(
        "doc_id", "lang", F.length("text").alias("n_chars"),
        F.md5("text").alias("h"), TX.tokens("text").alias("tk"),
    )
    feat = staged.select(
        "doc_id", "lang", "n_chars", "h",
        F.size("tk").cast("long").alias("n_tokens"),
        (TX.stopword_hits(F.col("tk")) / F.greatest(F.size("tk"), F.lit(1))).alias("sraw"),
    )
    keeper = feat.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    kept = feat.join(keeper, (feat["h"] == keeper["h"]) & (feat["doc_id"] == keeper["keep_id"]))
    cleaned = kept.where((F.col("n_chars") >= 100) & (F.col("n_tokens") >= 10))
    return cleaned.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg("sraw"), 4).alias("avg_stopword_ratio"),
    )
