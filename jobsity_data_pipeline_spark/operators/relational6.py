"""Final wave of TPC-H shapes, completing the 22-query dialect on this
schema. The testdata has no ``partsupp`` table and no
commitdate/receiptdate/shipmode columns, so the classic queries that
need them are re-expressed on derivable analogs:

- part-supplier pairs (``_part_supplier``) come from ``lineitem``
  (min unit price observed = the pair's "supply cost", summed quantity
  = its "volume");
- lateness is ship latency (``l_shipdate - o_orderdate``) instead of
  commit-vs-receipt;
- ship "mode" classes are latency buckets (FAST/SLOW).

Reference parity: the reference answers its analytics with Postgres
views/SQL (src/sqls/create_objects.sql:24-38, latest_datasource.sql);
these queries extend that surface with the remaining canonical OLAP
shapes, each a Catalyst-plan with broadcast dims, pushed filters, and
partial aggregation (verified in tests/test_plans.py patterns).

Scale notes (100 TB): every query joins the big fact on an equi-key
with small dims broadcast; the only wide shuffles are fact-fact equi
joins on l_orderkey (co-partitionable / bucketable) and the one-row
scalar aggregates are crossJoin-broadcast, never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import money as M
from ..session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _rev() -> F.Column:
    """price*(1-disc) as exact 1e-4 dollar units (functions.money)."""
    return M.rev_e4()


# per-row unit price (price/qty) half-up-rounded to 1e-6 dollar units
# IN INTEGER SPACE — a float ratio + round() can land on a half-ulp
_UC_E6 = (
    "(2 * CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 1000000"
    " + CAST(round(l_quantity * 100, 0) AS BIGINT))"
    " div (2 * CAST(round(l_quantity * 100, 0) AS BIGINT))"
)


def _part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp analog: one row per (part, supplier) observed in
    lineitem, with the min unit price as supply cost (exact long of
    1e-6 dollar units) and total shipped quantity in exact cents. One
    hash-aggregate shuffle on the pair key; partial-agg (min/sum)
    combines map-side."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.expr(_UC_E6)).alias("uc_e6"),
        F.sum(M.cents("l_quantity")).alias("qty_c"),
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str,
                         region: str = "ASIA") -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part (correlated-min via a
    window over the pair key), restricted to STANDARD mid-size parts and
    suppliers of one region. The window min replaces the correlated
    subquery; part/supplier/nation dims broadcast onto the derived pair
    table, so the only wide exchange is the pair aggregation itself."""
    ps = _part_supplier(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size").between(10, 20))
    )
    nation = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == region)
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(reg), nation["n_regionkey"] == reg["r_regionkey"]
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        ps.join(F.broadcast(part.select("p_partkey")),
                ps["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(supp), ps["l_suppkey"] == supp["s_suppkey"])
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("uc_e6").over(w))
        .where(F.col("uc_e6") == F.col("min_cost"))
        .select(
            (M.cents("s_acctbal") / 100.0).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            (F.expr("(uc_e6 + 50) div 100") / 1e4).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(50)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders of one quarter having
    at least one late lineitem (shipped >90 days after order date).
    Spark left_semi with the lateness predicate inside the join
    condition: the probe side never duplicates order rows, so no
    distinct is needed and the join output is already per-order."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.date_add(orders["o_orderdate"], 90)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str,
                      name_like: str = "%red%") -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for one
    product family. Profit = discounted revenue minus a 60%-of-retail
    cost estimate (no supplycost column in this schema). part/supplier/
    nation broadcast; the lineitem-orders equi-join on l_orderkey is the
    single wide shuffle and is bucketable at scale."""
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like(name_like))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_retailprice")),
                li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        # profit*5 in exact 1e-4 units: 5*rev_e4 - 3*(retail_c*qty_c)
        # (0.6 = 3/5; retail_c*qty_c is already e4 units)
        .withColumn(
            "profit_5e4",
            5 * _rev()
            - 3 * M.cents("p_retailprice") * M.cents("l_quantity"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum("profit_5e4").alias("p5"))
        # half-away to cents: |p5| / 500, sign restored
        .select(
            "nation", "o_year",
            (
                F.when(F.col("p5") < 0, F.lit(-1)).otherwise(F.lit(1))
                * F.expr("(2 * abs(p5) + 500) div 1000") / 100.0
            ).alias("sum_profit"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_stock(spark: SparkSession, sf_dir: str,
                        nation: str = "NATION_3",
                        mult: float = 2.0) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value (unit_cost × qty summed
    over one nation's suppliers) exceeds ``mult`` × the mean part value
    (a scale-invariant analog of Q11's total-fraction threshold — a
    fixed fraction of the grand total selects ~0 parts as the catalog
    grows). The scalar threshold is a one-row aggregate crossJoin'ed
    (broadcast) back — never collected to the driver.

    ``mult`` must be an integral value (2.0, 3.0, ...): the threshold
    compare is cross-multiplied to exact integers; raises ValueError
    otherwise."""
    ps = _part_supplier(spark, sf_dir)
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == nation)
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    # stock value in exact 1e-8 dollar units (uc_e6 * qty_c); the
    # mean-multiple threshold cross-multiplies to integers
    val = (
        ps.join(F.broadcast(supp.select("s_suppkey")),
                ps["l_suppkey"] == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("uc_e6") * F.col("qty_c")).alias("v8"))
    )
    total = val.agg(
        F.sum("v8").alias("_tot8"), F.count("*").alias("_n")
    )
    m2 = int(mult)
    if float(m2) != mult:
        raise ValueError(
            f"q11_important_stock: mult must be an integral value for "
            f"the exact cross-multiplied threshold (got {mult!r})"
        )
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("v8") * F.col("_n") > m2 * F.col("_tot8"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.expr("(2 * v8 + 1000000) div 2000000") / 100.0)
            .alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


def q12_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship-latency class (FAST ≤30d else SLOW),
    how many high- vs low-priority orders shipped in 1997. The classic
    CASE-sum conditional aggregation; single equi-join shuffle on
    l_orderkey (no shipmode column — latency buckets stand in)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.withColumn(
            "ship_class",
            F.when(F.datediff("l_shipdate", "o_orderdate") <= 30, "FAST")
            .otherwise("SLOW"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    for non-PROMO parts of selected sizes, excluding flagged suppliers
    (negative account balance stands in for the complaints NOT IN).
    The exclusion is an anti-join on a broadcast dim; the distinct
    count shuffles once on the group key."""
    ps = _part_supplier(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0.0)
    return (
        ps.join(F.broadcast(bad.select("s_suppkey")),
                ps["l_suppkey"] == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
              ps["l_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str,
                           name_like: str = "red%",
                           share: float = 0.2) -> DataFrame:
    """TPC-H Q20 shape: semi-join chain — suppliers who shipped more
    than ``share`` of a part family's 1996 volume (availqty > ½·shipped
    in the original; the per-part share threshold is the analog).
    Per-part totals come from a second aggregate joined back on the
    part key; the final projection is supplier-level distinct.

    ``share`` must be the reciprocal of an integer (0.5, 0.25, 0.2,
    ...): the share compare is cross-multiplied to exact integers;
    raises ValueError otherwise."""
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like(name_like))
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).join(F.broadcast(part.select("p_partkey")),
           F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(M.cents("l_quantity")).alias("pair_qc")
    )
    tot = li.groupBy("l_partkey").agg(
        F.sum(M.cents("l_quantity")).alias("part_qc")
    )
    # share=0.2 cross-multiplies to the exact 5*pair > part comparison
    inv = int(round(1 / share))
    if abs(inv * share - 1.0) >= 1e-12:
        raise ValueError(
            f"q20_dominant_suppliers: share must be the reciprocal of "
            f"an integer for the exact cross-multiplied comparison "
            f"(got {share!r})"
        )
    dom = (
        pair.join(tot, "l_partkey")
        .where(inv * F.col("pair_qc") > F.col("part_qc"))
        .select("l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(dom), supp["s_suppkey"] == dom["l_suppkey"],
                  "left_semi")
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str,
                          late_days: int = 60, k: int = 20) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier failed order (EXISTS other supplier / NOT EXISTS
    other late supplier). Expressed as one per-(order, supplier)
    aggregate then a per-order conditional aggregate — two hash
    shuffles, no correlated subqueries, no self-join fan-out."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_supp = (
        li.join(orders.select("o_orderkey", "o_orderdate"),
                li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(F.datediff("l_shipdate", "o_orderdate")).alias("max_lat")
        )
        .withColumn("is_late", (F.col("max_lat") > late_days).cast("int"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    blamed = per_order.where(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        blamed.groupBy("late_supp")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")),
              F.col("late_supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )
