"""Round-7 wave — analytics additions, each with an exact DuckDB
oracle twin:

- events_welch_ttest: Welch's unequal-variance t-test between every
  pair of event types' value distributions — the A/B-testing
  primitive a product-analytics warehouse serves constantly. One
  partial-agg pass to per-type moments, then a tiny self-join; the
  statistic itself is computed on |types|^2 rows.
- orders_open_backlog: the order-fulfillment backlog timeline — per
  day, how many orders have been placed but not yet fully shipped.
  The interval-count problem (events_concurrency's shape) on the
  orders/lineitem join: +1/-1 boundary deltas, one groupBy(day), and
  a running sum over the bounded per-day aggregate.

Reference parity note: the reference pipeline (119 lines of
Postgres SQL/loader) has no statistics or backlog surface; these
extend the warehouse the way its weekly-average view
(create_objects.sql:24-38) extends raw trips — pre-aggregated
decision tables over the fact stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_parallelism, read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return ensure_parallelism(spark, read_table(spark, sf_dir, name))


def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t-test (unequal variances) between every ordered pair
    of event types' ``value`` distributions: t statistic and the
    Welch-Satterthwaite degrees of freedom, plus the mean difference.

    Plan: ONE partial-aggregable scan reduces the corpus to
    |types| moment rows (count, mean, sample variance); the pairwise
    statistics are a broadcast self-join on that tiny frame — at
    100 TB the corpus is read once and everything pairwise happens on
    |types|^2 rows. Outputs are rounded (4 dp for t, 2 dp for df,
    6 dp for the mean gap) so last-ulp distributed-sum noise sits
    below the reported precision, the repo's float-aggregate
    convention (orders_price_corr)."""
    e = _t(spark, sf_dir, "events")
    st = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    a = st.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = st.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    dfw = (se2 * se2) / (
        (F.col("va") / F.col("na")) * (F.col("va") / F.col("na"))
        / (F.col("na") - 1)
        + (F.col("vb") / F.col("nb")) * (F.col("vb") / F.col("nb"))
        / (F.col("nb") - 1)
    )
    return (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "na",
            "nb",
            F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
            F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 4)
            .alias("t_stat"),
            F.round(dfw, 2).alias("df"),
        )
        .orderBy("type_a", "type_b")
    )


def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-backlog timeline: for every day on which the
    backlog changes, the number of orders opened that day, fully
    shipped that day, and the running count of open orders (placed,
    not yet past their last line's ship date — half-open: an order
    counts as open ON its last ship day and not after).

    Scale shape: per-order bounds are one partial-agg over lineitem
    joined (shuffle on the order key, the natural co-partition) with
    orders; each order then contributes two boundary DELTAS (+1 at
    open, -1 the day after close) so the corpus reduces to a
    per-day aggregate bounded by the calendar, and the running sum
    is a window over that BOUNDED aggregate (the HDR-bucket
    precedent), never a corpus-sized frame."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("open_day")
    )
    li = _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("close_day")
    )
    spans = o.join(
        li, F.col("o_orderkey") == F.col("l_orderkey"), "inner"
    ).select("open_day", "close_day")
    deltas = (
        spans.select(
            F.col("open_day").alias("day"),
            F.lit(1).alias("d"),
            F.lit(1).alias("opened"),
            F.lit(0).alias("closed"),
        )
        .unionByName(
            spans.select(
                F.date_add("close_day", 1).alias("day"),
                F.lit(-1).alias("d"),
                F.lit(0).alias("opened"),
                F.lit(0).alias("closed"),
            )
        )
        .unionByName(
            spans.select(
                F.col("close_day").alias("day"),
                F.lit(0).alias("d"),
                F.lit(0).alias("opened"),
                F.lit(1).alias("closed"),
            )
        )
    )
    per_day = deltas.groupBy("day").agg(
        F.sum("d").alias("net"),
        F.sum("opened").alias("opened"),
        F.sum("closed").alias("closed"),
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_day.withColumn("open_backlog", F.sum("net").over(w))
        .select("day", "opened", "closed", "open_backlog")
        .orderBy("day")
    )
