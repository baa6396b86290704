"""Fifth operator wave: the remaining TPC-H query shapes expressible on
the driver tables (scan-only q6, market-share q8, outer-join
distribution q13, scalar-max q15, correlated-avg q17, disjunctive q19,
anti-join + scalar subquery q22) plus range-frame rolling windows,
built-in session windows, and unpivot.

Same conventions as relational.py: (spark, sf_dir) -> lazy DataFrame,
broadcast the dimension side, alias every output to the oracle's name,
keep integers int64 and round floats. Timestamps that must survive the
cross-engine hash compare are emitted as unix microseconds (longs), not
formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money as M
from ..session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _rev() -> F.Column:
    """price*(1-disc) as exact 1e-4 dollar units (functions.money)."""
    return M.rev_e4()


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-and-aggregate — every predicate is a
    min/max-prunable range that reaches the parquet scan (the canonical
    'is pushdown working' probe), no join, one partial-agg exchange."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return (
        li.agg(
            F.sum(M.cents("l_extendedprice") * M.pct("l_discount"))
            .alias("rev_e4"),
            F.count("*").alias("n_items"),
        )
        .select(
            (F.expr("(rev_e4 + 50) div 100") / 100.0).alias("revenue"),
            "n_items",
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str, region: str = "ASIA",
                    nation: str = "NATION_9") -> DataFrame:
    """TPC-H Q8 shape: one nation's share of supplier revenue into a
    region's customers, per order year — conditional-aggregate ratio
    over a star join (no self-join, single pass)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == region)
    # customers restricted to the target region (dim-side reduction
    # BEFORE touching the fact table, as in q7)
    cust_r = (
        cust.join(
            F.broadcast(nat.select("n_nationkey", "n_regionkey")),
            cust["c_nationkey"] == F.col("n_nationkey"),
        )
        .join(F.broadcast(reg), F.col("n_regionkey") == reg["r_regionkey"])
        .select("c_custkey")
    )
    sup_n = sup.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("sn_key"),
                               F.col("n_name").alias("supp_nation"))),
        sup["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust_r), orders["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(sup_n), li["l_suppkey"] == F.col("s_suppkey"))
    )
    rev = _rev()
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == nation, rev).otherwise(F.lit(0))
            ).alias("nn_e4"),
            F.sum(rev).alias("dd_e4"),
        )
        .withColumn("nn_c", F.expr("(nn_e4 + 50) div 100"))
        .withColumn("dd_c", F.expr("(dd_e4 + 50) div 100"))
        .select(
            "o_year",
            (F.expr("(2 * nn_c * 10000 + dd_c) div (2 * dd_c)") / 1e4)
            .alias("mkt_share"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer — LEFT
    OUTER join (customers with zero orders count as 0) then a
    double aggregation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    the scalar-subquery-on-an-aggregate pattern (broadcast the 1-row
    max back against the per-supplier revenue)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("rev_e4"))
        .select("l_suppkey", F.expr("(rev_e4 + 50) div 100").alias("rev_c"))
    )
    mx = rev.agg(F.max("rev_c").alias("_mx"))
    sup = _t(spark, sf_dir, "supplier")
    # the argmax equality joins on the exact integer cents, not a
    # rounded double
    return (
        rev.join(F.broadcast(mx), rev["rev_c"] == F.col("_mx"))
        .join(F.broadcast(sup), rev["l_suppkey"] == sup["s_suppkey"])
        .select(
            "s_suppkey", "s_name",
            (F.col("rev_c") / 100.0).alias("total_revenue"),
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str,
                               brand: str = "Brand#3") -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one
    brand's parts, where 'small' is a correlated per-part threshold
    (0.2 * avg quantity of THAT part) — decorrelated into a per-part
    aggregate joined back on partkey."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == brand)
    # qty < 0.2*avg(qty) cross-multiplies to the exact integer
    # comparison 5*cnt*qty_c < sum_qty_c (cnt > 0) — no float boundary
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(M.cents("l_quantity")).alias("sum_qc"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(thr, li["l_partkey"] == F.col("t_partkey"))
        .where(
            5 * F.col("cnt") * M.cents("l_quantity") < F.col("sum_qc")
        )
        .agg(
            F.sum(M.cents("l_extendedprice")).alias("ep_c"),
            F.count("*").alias("n_items"),
        )
        .select(
            (F.expr("(2 * ep_c + 7) div 14") / 100.0).alias("avg_yearly"),
            "n_items",
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides —
    the disjunction stays a single join with a composite residual
    filter (no union-of-three-scans rewrite needed)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .where(cond)
        .agg(
            F.sum(_rev()).alias("rev_e4"),
            F.count("*").alias("n_items"),
        )
        .select(
            (F.expr("(rev_e4 + 50) div 100") / 100.0).alias("revenue"),
            "n_items",
        )
    )


def q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average (positive) balance
    and no orders — scalar aggregate subquery + left-anti join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    # bal > avg(bal) cross-multiplies to bal_c * n > sum_c — exact
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(M.cents("c_acctbal")).alias("_sum_c"),
        F.count("*").alias("_n"),
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(M.cents("c_acctbal") * F.col("_n") > F.col("_sum_c"))
        .join(orders.select("o_custkey"),
              cust["c_custkey"] == F.col("o_custkey"), "left_anti")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(M.cents("c_acctbal")).alias("bal_c"),
        )
        .select(
            "n_cust",
            (F.col("bal_c") / 100.0).alias("total_bal"),
        )
    )


def events_value_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame window: per event, the sum of the same user's values
    in the trailing hour — RANGE BETWEEN on unix microseconds, the
    time-based frame ROWS frames cannot express (peers at the same
    timestamp are all included, and gaps are real gaps)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us.alias("us"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(M.cents("value")).over(w) / 100.0).alias("rolling_1h"),
    )


def events_session_window(spark: SparkSession, sf_dir: str,
                          gap: str = "30 minutes") -> DataFrame:
    """Built-in session windows (F.session_window): per-user gap-merged
    sessions with start/end/count/value — the declarative twin of the
    applyInPandasWithState sessionizer, usable identically in batch and
    streaming. Window end is last-event-time + gap (half-open), so two
    events exactly ``gap`` apart do NOT merge."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), gap), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(M.cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


def events_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the value column and the JSON props.k field
    become (metric, x) rows via stack() — one scan, no union of two
    reads — then per (event_type, metric) stats."""
    ev = _t(spark, sf_dir, "events")
    melted = ev.select(
        "event_type",
        F.expr(
            "stack(2, 'value', value, "
            "'k', cast(get_json_object(props, '$.k') as double)) "
            "as (metric, x)"
        ),
    )
    return melted.groupBy("event_type", "metric").agg(
        F.count("x").alias("n"),
        F.round(F.avg("x"), 4).alias("avg_x"),
    )


def events_retention(spark: SparkSession, sf_dir: str,
                     max_k: int = 14) -> DataFrame:
    """Cohort retention: users grouped by their first active day; for
    each cohort, how many are active again k days later (k <= max_k).
    Two aggregates + one join — the (user, day) activity set is derived
    once and reused for both the cohort assignment and the return
    visits."""
    ev = _t(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    first_day = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = activity.join(first_day, "user_id").select(
        "user_id",
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
        F.datediff("day", "cohort_day").cast("long").alias("k"),
    )
    return (
        joined.where(F.col("k") <= max_k)
        .groupBy("cohort", "k")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: yearly aggregate then a lag
    window over the (tiny) per-year frame — the window runs on an
    already-reduced input, never on the fact table."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(F.sum(M.cents("o_totalprice")).alias("rev_c"))
    w = Window.orderBy("o_year")
    # growth rounds half-away in integer space over the exact cents
    g = (
        yearly.withColumn("prev_c", F.lag("rev_c").over(w))
        .withColumn("gnum", (F.col("rev_c") - F.col("prev_c")) * 10000)
    )
    sgn = F.when(F.col("gnum") < 0, F.lit(-1)).otherwise(F.lit(1))
    return g.select(
        "o_year",
        (F.col("rev_c") / 100.0).alias("revenue"),
        (
            sgn * F.expr("(2 * abs(gnum) + prev_c) div (2 * prev_c)") / 1e4
        ).alias("yoy_growth"),
    )


def events_anomaly_zscore(spark: SparkSession, sf_dir: str,
                          threshold: float = 2.0) -> DataFrame:
    """Daily-volume anomalies per event type: z-score of each day's
    count against the type's mean/stddev (window over the small
    per-type-day aggregate), keeping |z| >= threshold. The filter
    applies to the ROUNDED z so the survivor set is engine-stable."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    z = (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w)
    scored = daily.select(
        "day", "event_type", "n", F.round(z, 3).alias("zscore")
    )
    return scored.where(F.abs(F.col("zscore")) >= threshold)


def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form ROLLUP/CUBE specialize):
    per-type totals, per-day totals, and the grand total in ONE pass —
    via the SQL interface, like the reference's .sql workflow."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs_src")
    return spark.sql(
        """
        SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS day,
               count(*) AS n_events,
               sum(CAST(round(value * 100, 0) AS BIGINT))
                   / CAST(100 AS DOUBLE) AS total_value
        FROM events_gs_src
        GROUP BY GROUPING SETS ((event_type), (date_format(ts, 'yyyy-MM-dd')), ())
        """
    )


def orders_part_pairs(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs appearing in the
    same order — distinct items self-joined on the order key. Fan-out
    per order is items² (orders hold a handful of lines), so the join
    grows linearly in orders; a hot-part cap is unnecessary because the
    key is the ORDER, not the part."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(k)
    )


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral first-order transition matrix: counts and
    probabilities of event-type bigrams per user stream (lag window
    ordered by time, then two aggregates). The probability denominator
    is a window over the already-tiny transition-count frame."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 4).alias("p"),
    )


def events_kmv_distinct(spark: SparkSession, sf_dir: str, k: int = 64,
                        n_salts: int = 32) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event type,
    next to the exact count: estimate = (k-1)/h_k where h_k is the
    k-th smallest normalized hash of the distinct members.

    The deterministic alternative to HLL when results must be
    reproducible across engines/runs (md5, no RNG). The plan is the
    sketch's OWN mergeability (k smallest of a union = k smallest of
    the per-shard k-smallest) as a two-stage aggregate: salt the
    distinct members into ``n_salts`` shards, keep the k smallest
    hashes per (type, salt) shard, then merge the <= n_salts*k
    survivors per type. No window anywhere — the former plan's
    per-type ``row_number`` sort put a whole type (~1/8 of the corpus
    at the 8-value mapping) through one WindowExec task; here the only
    per-type state that ever meets a single task is the k*n_salts
    bottom-k array. Size n_salts so a (type, salt) shard's distinct
    members fit one aggregation buffer (salts scale with corpus, the
    merged state stays k*n_salts). When a type has fewer than k
    members the sketch is exact by construction.
    """
    from .relational14 import kmv_sketches

    ev = _t(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    merged = kmv_sketches(du, k=k, n_salts=n_salts)
    agg = merged.select(
        "event_type",
        F.element_at("mins", F.size("mins")).alias("h_k"),
        F.size("mins").alias("m"),
    )
    exact = du.groupBy("event_type").agg(F.count("*").alias("n_exact"))
    est = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("h_k"))
    return exact.join(agg, "event_type").select(
        "event_type", "n_exact", F.round(est, 2).alias("kmv_est")
    )


def parts_pagerank(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """PageRank over the part co-occurrence graph (parts linked when
    they appear in the same order): 10 fixed power iterations of
    join + aggregate per round (operators/graph.py). Ranks round to 6
    decimals and tie-break on part key so the top-k is engine-stable."""
    from .graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("part_a").alias("u"), F.col("part_b").alias("v")).union(
        pairs.select(F.col("part_b").alias("u"), F.col("part_a").alias("v"))
    )
    ranks = pagerank(edges)
    return (
        ranks.select(F.col("node").alias("p_partkey"), F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "p_partkey")
        .limit(k)
    )
