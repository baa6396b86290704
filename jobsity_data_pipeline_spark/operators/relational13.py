"""Round-8 wave — statistical / planning analytics, each with an
exact DuckDB oracle twin:

- lineitem_ols_elasticity: grouped simple OLS regression (quantity on
  discount per part brand) — the missing regression primitive next to
  orders_price_corr's correlation. One partial-agg pass to six moment
  sums per brand; slope / intercept / r² on |brands| rows.
- orders_priority_chi2: chi-squared test of independence between
  order priority and return flag — the categorical counterpart to
  events_welch_ttest. One join+scan to the |priorities| x |flags|
  contingency cells; expectations on the tiny cell frame.
- orders_seasonal_decompose: classical additive seasonal
  decomposition (centered 2x12 moving-average trend, month-of-year
  seasonal index, residual) of monthly order revenue — windows run
  ONLY over the calendar-bounded monthly aggregate.
- events_markov_stationary: stationary distribution of the
  first-order event-type Markov chain (events_transition_matrix's
  chain) by fixed-round integer power iteration — the PageRank-style
  "where does a user stream settle" summary.
- part_type_hhi: Herfindahl–Hirschman supplier-concentration index of
  revenue per part type — the procurement-risk audit; shares in exact
  half-up basis points so the index is an integer sum.
- emb_ivf_balance: cell-occupancy audit of the IVF index
  (similarity._ivf_assigned_and_probes): per-cell counts and shares —
  the skew diagnostic that decides whether an IVF layout's tail
  latency is acceptable before anyone runs a query against it.

Reference parity note: the reference pipeline (119 lines of Postgres
SQL/loader) has no statistics surface; these extend the warehouse in
the same pre-aggregated-decision-table spirit as its weekly-average
view (create_objects.sql:24-38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import money as M
from ..session import ensure_parallelism, read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return ensure_parallelism(spark, read_table(spark, sf_dir, name))


def lineitem_ols_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of quantity on discount — "does discounting move
    volume, and where": slope (units per discount point), intercept
    (units at zero discount) and r² of the fit, per part brand.

    Plan: the lineitem/part equi-join shuffles on partkey (AQE picks
    broadcast when part fits), then ONE partial-aggregable pass
    reduces the corpus to six exact-integer moment sums per brand —
    count, Σx, Σy, Σxy, Σx², Σy² over discount points and quantity
    cents (both exact longs of 2-dp doubles, the money.py convention)
    — so the regression itself runs on |brands| rows. The statistics
    are IDENTICAL double expressions over those exact longs in both
    engines (the events_welch_ttest convention): deterministic IEEE
    ops on identical inputs, rounded well below where half-ulp noise
    could sit. Degenerate brands (no discount variance) are filtered,
    not emitted as NULL statistics.

    Exactness bound: the moment sums stay exact longs while
    n · max(y)² < 2^63 per brand — with quantity cents ≤ 5e3 that is
    ~3.7e11 lineitem rows per brand (≈ 60 TB of lineitem per brand);
    past it, ANSI mode (the Spark 4 default) fails the sum loudly
    and the accumulation shards (moment frames add).
    """
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    j = li.join(pt, li.l_partkey == pt.p_partkey).select(
        "p_brand",
        M.pct("l_discount").alias("x"),
        M.cents("l_quantity").alias("y"),
    )
    g = j.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd, sxd, syd = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxxd, sxyd, syyd = [
        F.col(c).cast("double") for c in ("sxx", "sxy", "syy")
    ]
    cov_n = nd * sxyd - sxd * syd
    varx_n = nd * sxxd - sxd * sxd
    vary_n = nd * syyd - syd * syd
    slope = cov_n / varx_n
    return (
        g.where((F.col("n") >= 2) & (varx_n > 0) & (vary_n > 0))
        .select(
            F.col("p_brand").alias("brand"),
            F.col("n").cast("long").alias("n"),
            # x is discount points, y is quantity cents: /100 back to
            # whole quantity units per discount point
            F.round(slope / 100.0, 6).alias("slope_qty_per_pct"),
            F.round((syd - slope * sxd) / nd / 100.0, 4).alias(
                "intercept_qty"),
            F.round(cov_n * cov_n / (varx_n * vary_n), 6).alias("r2"),
        )
        .orderBy("brand")
    )


def orders_priority_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence cells for order priority x return
    flag — "do urgent orders come back more": per contingency cell
    the observed count, the independence expectation, and the cell's
    χ² contribution.

    Plan: the orders/lineitem equi-join then ONE partial-aggregable
    pass reduces the corpus to the |priorities| x |flags| (5x3) cell
    counts; row totals, column totals and the grand total are
    re-aggregations of that tiny frame, joined back broadcast. The
    expectation and contribution are identical double expressions
    over exact long counts in both engines; no float crosses a cell
    boundary (each row is its own statistic — consumers sum the
    contribution column for the test statistic, a choice documented
    here rather than baked into a float total whose addend order
    could differ).
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(F.count("*").alias("obs"))
    )
    rt = cells.groupBy("o_orderpriority").agg(F.sum("obs").alias("rt"))
    ct = cells.groupBy("l_returnflag").agg(F.sum("obs").alias("ct"))
    nn = cells.agg(F.sum("obs").alias("nn"))
    j = (
        cells.join(F.broadcast(rt), "o_orderpriority")
        .join(F.broadcast(ct), "l_returnflag")
        .crossJoin(F.broadcast(nn))
    )
    exp = (F.col("rt").cast("double") * F.col("ct").cast("double")
           / F.col("nn").cast("double"))
    obs_d = F.col("obs").cast("double")
    return j.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("l_returnflag").alias("returnflag"),
        F.col("obs").cast("long").alias("observed"),
        F.round(exp, 4).alias("expected"),
        F.round((obs_d - exp) * (obs_d - exp) / exp, 6).alias(
            "chi2_contrib"),
    ).orderBy("priority", "returnflag")


def orders_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of monthly order
    revenue: trend = centered 2x12 moving average, seasonal = mean
    detrended value per month-of-year, residual = the rest. The
    demand-planning view every forecast (orders_forecast_snaive)
    starts from.

    Plan: one partial-agg pass reduces orders to the |months| monthly
    revenue-cents frame (calendar-bounded — ~84 rows regardless of
    SF); every window (the 13-month weighted MA, nothing else) runs
    over that aggregate, satisfying the global-window plan gate. All
    arithmetic is exact integers: revenue in cents, the 2x12 MA as a
    half-up division of the non-negative weighted 13-month sum by 24,
    the seasonal index as a half-up mean of shifted (non-negative)
    detrended values — cents monthly totals sit far below the 1e15
    shift, and the shifted sum over the bounded month frame far below
    2^63. Edge months (first/last 6) have no centered trend and are
    DROPPED from the output (a NULL-free contract: cross-engine NULL
    formatting is a hash hazard, and a decomposition row without a
    trend carries no information). Months are assumed calendar-dense
    (every month present), which the orders stream satisfies; the
    ROWS window is positional by design.
    """
    from pyspark.sql import Window

    # shift for the seasonal half-up mean: far above any monthly cents
    # total the calendar-bounded frame can see, far below BIGINT
    # overflow when summed over the <= ~100-month frame (lockstep with
    # the oracle's _SEAS_SHIFT)
    shift = 1_000_000_000_000_000
    o = _t(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.sum(M.cents("o_totalprice")).alias("rev_c"))
    )
    w = Window.orderBy("month")
    inner = Window.orderBy("month").rowsBetween(-5, 5)
    # 2x12 centered MA numerator: half-weight end months — NULL when
    # the 13-month window is incomplete (lag/lead 6 off the calendar)
    trend_num = (
        2 * F.sum("rev_c").over(inner)
        + F.lag("rev_c", 6).over(w)
        + F.lead("rev_c", 6).over(w)
    )
    t = m.select("month", "rev_c", trend_num.alias("trend_num"))
    det = (
        t.where(F.col("trend_num").isNotNull())
        .select(
            "month", "rev_c",
            F.expr("(2 * trend_num + 24) div 48").alias("trend_c"),
        )
        .withColumn("detr_c", F.col("rev_c") - F.col("trend_c"))
    )
    moy = det.withColumn("moy", F.substring("month", 6, 2))
    seas = (
        moy.groupBy("moy")
        .agg(F.expr(
            f"(2 * sum(detr_c + {shift}) + count(*))"
            f" div (2 * count(*)) - {shift}"
        ).alias("seasonal_c"))
    )
    return (
        moy.join(F.broadcast(seas), "moy")
        .select(
            "month",
            "rev_c",
            "trend_c",
            "seasonal_c",
            (F.col("detr_c") - F.col("seasonal_c")).alias("resid_c"),
        )
        .orderBy("month")
    )


_MARKOV_ROUNDS = 24
# bounded-model precondition: the |types|^2 count frame is collected
# to the driver, so refuse high-cardinality category columns loudly
_MARKOV_MAX_TYPES = 256


def events_markov_stationary(spark: SparkSession, sf_dir: str,
                             rounds: int = _MARKOV_ROUNDS) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain (the long-run fraction of a user stream spent in each event
    type) by power iteration on the transition counts.

    Plan: the corpus-scale work is ONE lag-window pass over the
    user-partitioned stream (high-cardinality partition key) reduced
    to the |types|² transition-count frame; that frame is bounded
    model state (≤ 64 rows at the 8-type mapping — the k-means
    centroid precedent), so the iteration itself runs driver-side in
    exact Python integers: π carried in 1e-6 units, each round
    π'_j = Σ_i halfup(π_i · c_ij / r_i), a deterministic integer
    recurrence both engines replay bit-for-bit (the oracle unrolls
    the same ``rounds`` steps as chained CTEs).

    Contract: π is the stationary distribution of the chain
    RESTRICTED to types with outgoing transitions. Mass flowing into
    a sink type (one that appears as next_type but never as
    prev_type) is DROPPED each round — both engines apply the same
    restriction (the oracle's ``next_type IN prev_types`` mirrors the
    ``dst in nxt`` guard), so parity holds, but with real sinks Σπ
    shrinks by the absorbed mass per round, not just the few
    micro-units of half-up rounding drift.

    The collect is bounded MODEL state, not data: |types|² transition
    counts (64 rows at the events mapping). A loud cap enforces that
    precondition — pointed at a high-cardinality category column the
    operator would silently become an O(|types|²·rounds) driver
    computation (the distributed_ntile document-then-enforce
    precedent).
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n"))
    # bounded collect: pull at most cap^2+1 rows in ONE job (a
    # distinct-count pre-probe would run the lag window twice); the
    # sentinel row proves the cap was exceeded without ever holding
    # an unbounded frame on the driver
    cap_rows = _MARKOV_MAX_TYPES * _MARKOV_MAX_TYPES
    collected = counts.limit(cap_rows + 1).collect()
    if len(collected) > cap_rows:
        raise ValueError(
            f"events_markov_stationary: > {cap_rows} transition "
            f"pairs (cap {_MARKOV_MAX_TYPES} types); the |types|^2 "
            f"driver iteration is for low-cardinality category "
            f"columns only"
        )
    rows = {}
    for r in collected:  # bounded: |types|^2 rows
        rows.setdefault(r["prev_type"], {})[r["next_type"]] = int(r["n"])
    types = sorted(rows)
    if not types:
        # no transitions (empty table / single-event users): the
        # oracle's LEFT JOIN over an empty r yields zero rows — match
        # it instead of dividing 1e6 by zero types
        return spark.createDataFrame(
            [], "event_type string, pi_e6 long, n_out long")
    rsum = {t: sum(rows[t].values()) for t in types}
    k = len(types)
    base, rem = divmod(1_000_000, k)
    pi = {t: base + (1 if i < rem else 0) for i, t in enumerate(types)}
    for _ in range(rounds):
        nxt = {t: 0 for t in types}
        for src in types:
            for dst, c in rows[src].items():
                if dst in nxt:
                    # half-up of pi*c/rsum in integers
                    nxt[dst] += (2 * pi[src] * c + rsum[src]) // (
                        2 * rsum[src])
        pi = nxt
    out = [(t, pi[t], rsum[t]) for t in types]
    return spark.createDataFrame(
        out, "event_type string, pi_e6 long, n_out long"
    ).orderBy("event_type")


def part_type_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index of revenue
    per part type — the procurement-risk score (10000·Σ share² in
    basis points; one supplier owning a type scores 10^8).

    Plan: lineitem/part equi-join, ONE partial-agg pass to the
    (type, supplier) revenue frame — dimension-scale, not
    corpus-scale — then per-type totals as a tiny re-aggregation
    joined back broadcast (|types| rows; no window anywhere). Shares
    are half-up integer basis points of exact 1e-4-unit revenue, so
    the index is an order-independent integer sum.

    Exactness bound: the share division's 2·rev·10000 term needs
    tot < 2^63/2e4 ≈ 4.6e14 e-4 units — 4.6e10 dollars of revenue
    per part type; ANSI mode (the Spark 4 default) fails loudly past
    it (scale the unit down if a corpus ever gets there).
    """
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    g = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum(M.rev_e4()).alias("rev"))
    )
    tot = g.groupBy("p_type").agg(F.sum("rev").alias("tot"))
    share = g.join(F.broadcast(tot), "p_type").select(
        "p_type",
        F.expr("(2 * rev * 10000 + tot) div (2 * tot)").alias("share_bp"),
    )
    return (
        share.groupBy("p_type")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.sum(F.col("share_bp") * F.col("share_bp")).alias("hhi"),
        )
        .orderBy("p_type")
    )


def emb_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-occupancy audit of the IVF index: per cell, how many
    vectors landed there and the half-up permille share of the corpus
    — the skew diagnostic run BEFORE serving queries from an IVF
    layout (a hot cell is a hot probe is tail latency; emb_key_skew's
    lesson applied to the ANN index).

    Plan: reads the same cached assignment table every IVF-family
    search uses (similarity._ivf_assigned_and_probes — in production
    the persisted index), one groupBy(cell) plus a broadcast 1-row
    total. Output is |cells| rows.
    """
    from .similarity import _ivf_assigned_and_probes

    assigned, _ = _ivf_assigned_and_probes(spark, sf_dir, 8, 3)
    per = assigned.groupBy("cell").agg(F.count("*").alias("n_vecs"))
    tot = per.agg(F.sum("n_vecs").alias("tot"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("cell").cast("long").alias("cell"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.expr("(2 * n_vecs * 1000 + tot) div (2 * tot)").alias(
                "share_pm"),
        )
        .orderBy("cell")
    )
