"""Second wave of analytical operators: nation-pair volume, returned-item
reporting, large-order having-filters, conditional-aggregate ratios,
distinct-count rollups, ordered funnels, token frequency, per-group
percentiles, and label centroids.

Same conventions as relational.py: (spark, sf_dir) -> lazy DataFrame,
broadcast the dimension side, alias every output to the oracle's name,
keep integers int64 and round floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money as M
from ..functions import text as TX
from ..session import ensure_parallelism, read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def q7_volume_shipping(spark: SparkSession, sf_dir: str,
                       nation_a: str = "NATION_9",
                       nation_b: str = "NATION_10") -> DataFrame:
    """TPC-H Q7 shape: revenue between two nations by year (supplier
    nation -> customer nation flows, both directions).

    The nation pair is filtered on the NATION DIM SCAN (pushed-down
    In-filter), and supplier/customer join the reduced dim FIRST — so
    the lineitem-side joins see only the ~2/N of suppliers/customers in
    the named nations, instead of filtering after all five joins.
    """
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin(nation_a, nation_b)
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    sup_n = sup.join(F.broadcast(n1), sup["s_nationkey"] == F.col("s_nkey")).select(
        "s_suppkey", "supp_nation"
    )
    cust_n = cust.join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nkey")).select(
        "c_custkey", "cust_nation"
    )
    joined = (
        li.join(F.broadcast(sup_n), li["l_suppkey"] == F.col("s_suppkey"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust_n), orders["o_custkey"] == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(F.sum(M.rev_e4()).alias("rev_e4"))
        .select(
            "supp_nation", "cust_nation", "l_year",
            (F.expr("(rev_e4 + 50) div 100") / 100.0).alias("revenue"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(M.rev_e4()).alias("rev_e4"))
        .select(
            "c_custkey", "c_name", "n_name",
            (F.expr("(rev_e4 + 50) div 100") / 100.0).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (groupBy + HAVING), joined back to the customer."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(M.cents("l_quantity")).alias("qty_c"))
        # integer threshold: the former float compare (> 60 on a
        # rounded double sum) sat exactly on a representability edge
        .where(F.col("qty_c") > 6000)
        .select("l_orderkey", (F.col("qty_c") / 100.0).alias("total_qty"))
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            (M.cents("o_totalprice") / 100.0).alias("o_totalprice"),
            "total_qty",
        )
    )


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO parts per month —
    conditional aggregation as one scan (no self-join)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = M.rev_e4()
    # exact longs end to end: promo/total revenue round to cents in
    # integer space, then the pct rounds to 4 dp by half-up division
    # (cents first keeps 2*pn*1e6 far from the long boundary)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
            ).alias("pn_e4"),
            F.sum(rev).alias("pd_e4"),
        )
        .withColumn("pn_c", F.expr("(pn_e4 + 50) div 100"))
        .withColumn("pd_c", F.expr("(pd_e4 + 50) div 100"))
        .select(
            "ship_month",
            (F.expr("(2 * pn_c * 1000000 + pd_c) div (2 * pd_c)") / 1e4)
            .alias("promo_pct"),
        )
    )


def events_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user rollup per day and event type (exact distinct —
    the approx_count_distinct twin is a drop-in at scale)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase per user: min event time
    per stage, then strict ordering — one shuffle on user_id, no joins."""
    ev = _t(spark, sf_dir, "events")
    stage_min = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    reached_click = (F.col("t_view").isNotNull() & F.col("t_click").isNotNull()
                     & (F.col("t_view") < F.col("t_click")))
    reached_purchase = reached_click & F.col("t_purchase").isNotNull() & (
        F.col("t_click") < F.col("t_purchase")
    )
    return stage_min.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).cast("long").alias("n_view"),
        F.sum(F.when(reached_click, 1).otherwise(0)).cast("long").alias("n_view_click"),
        F.sum(F.when(reached_purchase, 1).otherwise(0)).cast("long").alias(
            "n_view_click_purchase"
        ),
    )


def docs_top_tokens(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    """Corpus-wide token frequency top-k — the canonical word count,
    partial-agg + single small top-k (ties broken by token asc)."""
    d = ensure_parallelism(spark, read_table(spark, sf_dir, "documents"))
    toks = d.select(F.explode(TX.tokens("text")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )


def docs_len_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc length distribution (exact interpolated
    percentiles)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(F.percentile("n_chars", 0.5), 4).alias("p50"),
        F.round(F.percentile("n_chars", 0.9), 4).alias("p90"),
        F.count("*").alias("n_docs"),
    )


def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors, one row per (label,
    dim position) — the aggregation step of k-means/classification,
    expressed as posexplode + groupBy (map-side partial avg; scales to
    any corpus since state is labels x dims)."""
    e = ensure_parallelism(spark, read_table(spark, sf_dir, "embeddings"))
    pos = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    return (
        pos.groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(F.round(F.avg("x"), 6).alias("centroid"))
    )
