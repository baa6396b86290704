"""Data-quality gate: declarative constraint checks over the warehouse
tables, reported as one (check, n_bad) frame — the admission control a
pipeline runs before trusting a batch.

Checks against the same table fuse into a single conditional-aggregate
scan (one pass over orders, one over lineitem); referential integrity
is a left-anti join. Everything is a count — no floats, so the report
hash-compares bit-exactly across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import read_table


def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cust = read_table(spark, sf_dir, "customer")

    def bad(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    # one fused pass per table: each violation class is a conditional agg
    orders_checks = orders.agg(
        bad(F.col("o_custkey").isNull()).alias("orders_null_custkey"),
        bad(F.col("o_totalprice") <= 0).alias("orders_nonpositive_price"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias(
            "orders_dup_orderkey"
        ),
    )
    li_checks = li.agg(
        bad(F.col("l_extendedprice") <= 0).alias("lineitem_nonpositive_price"),
        bad(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
        ).alias("lineitem_bad_discount"),
        bad(F.col("l_quantity") <= 0).alias("lineitem_nonpositive_qty"),
    )
    cust_checks = cust.agg(
        (F.count("*") - F.countDistinct("c_custkey")).alias("customer_dup_custkey"),
    )
    # referential integrity: lineitems pointing at no order, orders at
    # no customer — left-anti joins, counted
    orphan_li = li.join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count("*").alias("lineitem_orphan_orderkey"))
    orphan_orders = orders.join(
        cust.select("c_custkey"),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count("*").alias("orders_orphan_custkey"))

    def melt(df: DataFrame) -> DataFrame:
        cols = df.columns
        pairs = ", ".join(f"'{c}', `{c}`" for c in cols)
        return df.select(
            F.expr(f"stack({len(cols)}, {pairs}) as (check, n_bad)")
        )

    report = (
        melt(orders_checks)
        .unionByName(melt(li_checks))
        .unionByName(melt(cust_checks))
        .unionByName(melt(orphan_li))
        .unionByName(melt(orphan_orders))
    )
    return report
