"""Unit tests for the round-11 late audit wave
(operators/relational16.py): exact expected rows on tiny literal
frames, independent float references (numpy/pandas ranks) on the real
smoke tables, loud-cap checks for the scale guards, and parity
against the R14-staged DuckDB oracles
(__spark_entry__._mk_sql/_kw_sql/_cramers_sql/_logrank_sql).
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from jobsity_data_pipeline_spark.operators import relational16 as R16
from tests.conftest import SF_SMOKE


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _duck(sf_dir: str, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _nc(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return str(v)


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_nc(r[i]) for i in order) for r in rows)


def _parity(spark_df, con, sql):
    a = _norm(spark_df.columns, [tuple(r) for r in spark_df.collect()])
    cur = con.execute(sql)
    b = _norm([d[0] for d in cur.description], cur.fetchall())
    assert a == b


def _smoke_daily_series():
    """The zero-filled daily count series of the smoke events table,
    computed independently in DuckDB + Python."""
    con = _duck(SF_SMOKE, ("events",))
    rows = con.execute(
        "SELECT CAST(ts AS DATE) d, count(*) FROM events GROUP BY 1"
    ).fetchall()
    byd = dict(rows)
    d0, d1 = min(byd), max(byd)
    return [byd.get(d0 + dt.timedelta(days=i), 0)
            for i in range((d1 - d0).days + 1)]


class TestMannKendall:
    def test_monotonic_ramp_is_all_concordant(self, spark, tmp_path):
        # strictly rising daily counts: every pair concordant, so
        # S = n(n-1)/2, tau_b = 1 exactly, z > 0
        t0 = dt.datetime(2024, 1, 1, 6)
        rows, eid = [], 0
        for day in range(8):
            for _ in range(day + 1):
                eid += 1
                rows.append(
                    (eid, t0 + dt.timedelta(days=day), 1, "a", 1.0, "{}")
                )
        r = R16.events_trend_mannkendall(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert r.n_days == 8
        assert r.s_stat == 8 * 7 // 2 == 28
        assert r.tau_b == 1.0
        assert r.z_stat > 0

    def test_constant_series_degenerates_to_zero(self, spark, tmp_path):
        # every day the same count: all pairs tied, var18 = 0 — the
        # guarded CASE reports S = 0, z = 0, tau_b = 0 (not NaN/raise)
        t0 = dt.datetime(2024, 1, 1, 6)
        rows = [
            (day * 3 + k, t0 + dt.timedelta(days=day), 1, "a", 1.0, "{}")
            for day in range(5) for k in range(3)
        ]
        r = R16.events_trend_mannkendall(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert (r.s_stat, r.var_s, r.z_stat, r.tau_b) \
            == (0, 0.0, 0.0, 0.0)

    def test_matches_naive_reference_on_smoke(self, spark):
        xs = _smoke_daily_series()
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n) for j in range(i + 1, n)
        )
        tg = Counter(xs)
        tie_var = sum(t * (t - 1) * (2 * t + 5) for t in tg.values())
        var = (n * (n - 1) * (2 * n + 5) - tie_var) / 18.0
        if var <= 0:
            z = 0.0
        elif s > 0:
            z = (s - 1) / math.sqrt(var)
        elif s < 0:
            z = (s + 1) / math.sqrt(var)
        else:
            z = 0.0
        d0 = n * (n - 1) / 2.0
        d1 = d0 - sum(t * (t - 1) for t in tg.values()) / 2.0
        tau = s / math.sqrt(d1 * d0) if d1 > 0 else 0.0
        r = R16.events_trend_mannkendall(spark, SF_SMOKE).collect()[0]
        assert r.n_days == n
        assert r.s_stat == s
        assert r.var_s == round(var, 4)
        assert r.z_stat == round(z, 4)
        assert r.tau_b == round(tau, 6)

    def test_span_cap_fails_loudly(self, spark, tmp_path):
        import jobsity_data_pipeline_spark.operators.relational16 as M

        t0 = dt.datetime(2024, 1, 1, 6)
        rows = [(1, t0, 1, "a", 1.0, "{}"),
                (2, t0 + dt.timedelta(days=9), 1, "a", 1.0, "{}")]
        e = spark.read.parquet(
            _write_events(spark, tmp_path, rows) + "/events.parquet")
        from jobsity_data_pipeline_spark.operators.relational15 import (
            daily_counts,
        )
        orig = M.MK_MAX_DAYS
        M.MK_MAX_DAYS = 5
        try:
            with pytest.raises(Exception) as ei:
                M.mannkendall_from_daily(
                    spark, daily_counts(e)).collect()
            assert "aggregate to weeks/months" in str(ei.value)
        finally:
            M.MK_MAX_DAYS = orig

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R16.events_trend_mannkendall(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("events",)),
            entrymod._mk_sql(),
        )


class TestKruskalWallis:
    def test_known_two_group_case(self, spark, tmp_path):
        # values a:{1,2}, b:{3,4} (cents 100..400, no ties): pooled
        # ranks a={1,2}, b={3,4}; H = 12/(4*5)*(3^2/2 + 7^2/2) - 15
        #   = 0.6*(4.5+24.5) - 15 = 2.4; no ties so H_c = H
        t0 = dt.datetime(2024, 1, 1, 6)
        rows = [
            (1, t0, 1, "a", 1.00, "{}"), (2, t0, 1, "a", 2.00, "{}"),
            (3, t0, 1, "b", 3.00, "{}"), (4, t0, 1, "b", 4.00, "{}"),
        ]
        out = {
            r.event_type: r
            for r in R16.events_kruskalwallis(
                spark, _write_events(spark, tmp_path, rows)).collect()
        }
        assert out["a"].n == 2 and out["b"].n == 2
        assert out["a"].mean_rank == 1.5
        assert out["b"].mean_rank == 3.5
        assert out["a"].h_stat == 2.4
        assert out["a"].h_tie_corrected == 2.4
        assert out["a"].df == 1
        # contributions are additive to H (the chi2-cell convention)
        assert round(out["a"].h_contrib + out["b"].h_contrib, 4) == 2.4

    def test_all_values_tied_reports_null_corrected(
        self, spark, tmp_path
    ):
        # every value identical: C = 1 - (N^3-N)/(N^3-N) = 0 — the
        # tie-corrected H is undefined and reports NULL, not a raise
        t0 = dt.datetime(2024, 1, 1, 6)
        rows = [
            (i, t0, 1, "ab"[i % 2], 5.00, "{}") for i in range(6)
        ]
        for r in R16.events_kruskalwallis(
            spark, _write_events(spark, tmp_path, rows)
        ).collect():
            assert r.h_tie_corrected is None
            assert r.h_stat == 0.0

    def test_matches_pandas_rank_reference_on_smoke(self, spark):
        con = _duck(SF_SMOKE, ("events",))
        df = con.execute(
            "SELECT event_type, CAST(round(value * 100, 0) AS BIGINT)"
            " vc FROM events"
        ).df()
        df["rank"] = df["vc"].rank(method="average")
        n = len(df)
        g = df.groupby("event_type")["rank"].agg(["sum", "count", "mean"])
        h = 12.0 / (n * (n + 1)) * float(
            (g["sum"] ** 2 / g["count"]).sum()
        ) - 3 * (n + 1)
        ties = Counter(df["vc"])
        c = 1 - sum(t ** 3 - t for t in ties.values()) / (n ** 3 - n)
        rows = R16.events_kruskalwallis(spark, SF_SMOKE).collect()
        assert len(rows) == len(g)
        for r in rows:
            assert r.n == int(g.loc[r.event_type, "count"])
            assert r.mean_rank == pytest.approx(
                float(g.loc[r.event_type, "mean"]), abs=5e-6)
        assert rows[0].h_stat == pytest.approx(h, abs=5e-4)
        assert rows[0].h_tie_corrected == pytest.approx(h / c, abs=5e-4)
        # contributions are additive to H
        assert sum(r.h_contrib for r in rows) == pytest.approx(
            rows[0].h_stat, abs=5e-3)

    def test_pooled_rank_is_distributed_and_exact(self, spark, tmp_path):
        # round-12 (r11 verdict task 5): the pooled rank rides the
        # segmented prefix scan — no global-window Exchange
        # SinglePartition anywhere in the plan, so the old KW_MAX_GRID
        # cap is gone — and the doubled ranks stay exact integers:
        # grids far wider than the retired cap's test bound give the
        # same H as a literal pooled-rank computation
        from jobsity_data_pipeline_spark.operators.relational15 import (
            mw_counts,
        )

        t0 = dt.datetime(2024, 1, 1, 6)
        rows = [
            (i, t0, 1, "ab"[i % 2], float(i % 97), "{}")
            for i in range(300)
        ]
        e = spark.read.parquet(
            _write_events(spark, tmp_path, rows) + "/events.parquet")
        df = R16.kw_from_counts(mw_counts(e))
        # the pooled rank window is partitioned by the scan block key,
        # never a bare global ORDER BY vc (the single-task shape the
        # retired cap used to guard). Since r13 the kernel PINS the
        # pooled grid and the ranked frame (session.pin), so the rank
        # window lives inside a checkpointed subtree the final plan no
        # longer shows — assert the property on the ranking kernel
        # itself, exactly as kw_from_counts invokes it
        from jobsity_data_pipeline_spark.operators.ranking import (
            distributed_cumsum,
        )

        pooled = mw_counts(e).groupBy("vc").agg(F.sum("c").alias("t"))
        plan = distributed_cumsum(
            pooled, "t", "vc", [], out_col="_cum"
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "windowspecdefinition(_blk" in plan
        assert "windowspecdefinition(vc" not in plan

        got = {r.event_type: r for r in df.collect()}
        # literal reference: pooled average ranks over the 97 distinct
        # values, H in the standard (undoubled) form
        vals = sorted({i % 97 for i in range(300)})
        pooled = Counter(i % 97 for i in range(300))
        rank, cum = {}, 0
        for v in vals:
            t = pooled[v]
            rank[v] = cum + (t + 1) / 2.0
            cum += t
        groups = {"a": [], "b": []}
        for i in range(300):
            groups["ab"[i % 2]].append(rank[i % 97])
        n = 300
        h = sum(
            12.0 * sum(r) ** 2 / (n * (n + 1) * len(r))
            for r in groups.values()
        ) - 3 * (n + 1)
        assert got["a"].h_stat == pytest.approx(h, abs=5e-4)
        assert got["a"].n == len(groups["a"])
        assert got["b"].mean_rank == pytest.approx(
            sum(groups["b"]) / len(groups["b"]), abs=5e-6)

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R16.events_kruskalwallis(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("events",)),
            entrymod._kw_sql(),
        )


class TestCramersV:
    def test_perfect_association_is_one(self, spark, tmp_path):
        # each source hosts exactly one lang: V = 1
        rows = [
            (1, "t", "en", "web", 10), (2, "t", "en", "web", 20),
            (3, "t", "de", "wiki", 10), (4, "t", "de", "wiki", 30),
            (5, "t", "fr", "forum", 10), (6, "t", "fr", "forum", 40),
        ]
        r = R16.docs_cramers_v(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert (r.n_docs, r.n_langs, r.n_sources, r.df) == (6, 3, 3, 4)
        assert r.cramers_v == 1.0

    def test_exact_independence_is_zero(self, spark, tmp_path):
        # 2x2 with perfectly proportional cells: chi2 = 0, V = 0
        rows = [
            (1, "t", "en", "web", 10), (2, "t", "en", "web", 20),
            (3, "t", "de", "web", 10),
            (4, "t", "en", "wiki", 10), (5, "t", "en", "wiki", 20),
            (6, "t", "de", "wiki", 10),
        ]
        r = R16.docs_cramers_v(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert r.chi2 == 0.0
        assert r.cramers_v == 0.0

    def test_single_source_reports_null(self, spark, tmp_path):
        # min(r-1, c-1) = 0: V undefined — NULL, not a raise
        rows = [(1, "t", "en", "web", 10), (2, "t", "de", "web", 20)]
        r = R16.docs_cramers_v(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert r.cramers_v is None
        assert r.chi2 == 0.0

    def test_null_categories_excluded(self, spark, tmp_path):
        # r12 ADVICE fix: NULL lang/source rows are dropped BEFORE the
        # contingency table — they are not a category, and including
        # them inflated N and the marginals while their observed
        # counts fell out of the null-unsafe grid join. The result
        # must equal the same corpus with those rows absent.
        clean = [
            (1, "t", "en", "web", 10), (2, "t", "en", "web", 20),
            (3, "t", "de", "wiki", 10), (4, "t", "de", "wiki", 30),
        ]
        noisy = clean + [
            (5, "t", None, "web", 10),
            (6, "t", "en", None, 20),
            (7, "t", None, None, 30),
        ]
        want = R16.docs_cramers_v(
            spark, _write_docs(spark, tmp_path / "a", clean)
        ).collect()[0]
        got = R16.docs_cramers_v(
            spark, _write_docs(spark, tmp_path / "b", noisy)
        ).collect()[0]
        assert got == want
        assert got.n_docs == 4

    def test_matches_numpy_reference_on_smoke(self, spark):
        con = _duck(SF_SMOKE, ("documents",))
        ct = con.execute(
            "SELECT lang, source, count(*) c FROM documents GROUP BY 1, 2"
        ).fetchall()
        langs = sorted({r[0] for r in ct})
        srcs = sorted({r[1] for r in ct})
        obs = {(r[0], r[1]): r[2] for r in ct}
        nn = sum(obs.values())
        nl = {lg: sum(v for (a, _), v in obs.items() if a == lg)
              for lg in langs}
        ns = {sc: sum(v for (_, b), v in obs.items() if b == sc)
              for sc in srcs}
        chi2 = sum(
            (obs.get((lg, sc), 0) - nl[lg] * ns[sc] / nn) ** 2
            / (nl[lg] * ns[sc] / nn)
            for lg in langs for sc in srcs
        )
        v = math.sqrt(
            chi2 / (nn * min(len(langs) - 1, len(srcs) - 1)))
        r = R16.docs_cramers_v(spark, SF_SMOKE).collect()[0]
        assert (r.n_docs, r.n_langs, r.n_sources) \
            == (nn, len(langs), len(srcs))
        assert r.chi2 == pytest.approx(chi2, abs=5e-4)
        assert r.cramers_v == pytest.approx(v, abs=5e-6)

    def test_zero_cells_participate(self, spark, tmp_path):
        # a lang absent from one source still contributes its
        # expectation: chi2 > 0 even though every OBSERVED cell is
        # proportionally consistent within its own row
        rows = [
            (1, "t", "en", "web", 10), (2, "t", "de", "web", 20),
            (3, "t", "en", "wiki", 10),
        ]
        r = R16.docs_cramers_v(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        # hand check: cells (en,web)=1 (de,web)=1 (en,wiki)=1
        # (de,wiki)=0; N=3, n_en=2, n_de=1, n_web=2, n_wiki=1
        # chi2 = sum (o - rl*cs/N)^2/(rl*cs/N) = 0.75; V = sqrt(.75/3)
        assert r.chi2 == 0.75
        assert r.cramers_v == round(math.sqrt(0.75 / 3.0), 6)

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R16.docs_cramers_v(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("documents",)),
            entrymod._cramers_sql(),
        )


def _write_orders_li(spark, tmp_path, orders, lis):
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string"
    )
    l_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    )
    spark.createDataFrame(orders, o_schema).coalesce(1).write.mode(
        "overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(lis, l_schema).coalesce(1).write.mode(
        "overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _li(k, day_base, days):
    return (k, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
            day_base + dt.timedelta(days=days))


class TestLogrank:
    def test_identical_groups_give_zero_z(self, spark, tmp_path):
        # two priorities with IDENTICAL duration/event multisets: at
        # every event time r_a = r_b and d_a = d_b, so each per-time
        # O-E is exactly 0 and z = 0.0 (not just approximately)
        t0 = dt.datetime(2024, 1, 1)
        orders, lis = [], []
        for g, prio in enumerate(["1-URGENT", "2-HIGH"]):
            for i in range(4):
                k = g * 10 + i
                status = "F" if i < 3 else "O"
                orders.append((k, 1, status, 1.0, t0, prio))
                lis.append(_li(k, t0, 2 + i * 3))
        r = R16.orders_logrank_priority(
            spark, _write_orders_li(spark, tmp_path, orders, lis)
        ).collect()
        assert len(r) == 1
        assert (r[0].n_a, r[0].n_b) == (4, 4)
        assert r[0].o_a == 3
        assert r[0].e_a == 3.0
        assert r[0].z_stat == 0.0

    def test_no_co_at_risk_events_reports_null(self, spark, tmp_path):
        # group b is censored strictly BEFORE group a's only event
        # time: every event row has r_b = 0, so V1 = 0 and z is NULL
        t0 = dt.datetime(2024, 1, 1)
        orders = [
            (1, 1, "F", 1.0, t0, "1-URGENT"),
            # no line items -> censored at horizon (t0+5); ordering
            # at horizon-2 gives duration 2 < 5
            (2, 1, "O", 1.0, t0 + dt.timedelta(days=3), "2-HIGH"),
        ]
        lis = [_li(1, t0, 5)]
        r = R16.orders_logrank_priority(
            spark, _write_orders_li(spark, tmp_path, orders, lis)
        ).collect()
        assert len(r) == 1
        assert r[0].o_a == 1
        assert r[0].z_stat is None

    def test_negative_duration_clamped_to_zero(self, spark, tmp_path):
        # r12 ADVICE fix: an order dated AFTER the global max-ship
        # horizon (or after its own last ship) is a duration-0
        # subject, never a negative-duration one
        t0 = dt.datetime(2024, 1, 1)
        orders = [
            (1, 1, "F", 1.0, t0, "1-URGENT"),
            # dated 10 days past the horizon (t0+5): censored, t
            # would be -5 unclamped
            (2, 1, "O", 1.0, t0 + dt.timedelta(days=15), "2-HIGH"),
            (3, 1, "O", 1.0, t0, "2-HIGH"),
        ]
        lis = [_li(1, t0, 5)]
        sf = _write_orders_li(spark, tmp_path, orders, lis)
        o = spark.read.parquet(sf + "/orders.parquet")
        done = (
            spark.read.parquet(sf + "/lineitem.parquet")
            .groupBy("l_orderkey")
            .agg(F.max("l_shipdate").alias("last_ship"))
        )
        per = R16.surv_removals(o, done, "o_orderpriority").collect()
        ts = {r.t for r in per}
        assert min(ts) >= 0
        assert 0 in ts  # the clamped subject landed at t = 0

    def test_matches_subject_level_reference_on_smoke(self, spark):
        # independent per-subject loop (no grids, no windows) over the
        # same event/censoring semantics, all C(5,2) priority pairs
        con = _duck(SF_SMOKE, ("orders", "lineitem"))
        subs = con.execute("""
            WITH done AS (
                SELECT l_orderkey, CAST(max(l_shipdate) AS DATE)
                    AS last_ship
                FROM lineitem GROUP BY 1
            ),
            hz AS (
                SELECT CAST(max(l_shipdate) AS DATE) AS horizon
                FROM lineitem
            )
            SELECT o.o_orderpriority,
                GREATEST(0,
                CASE WHEN o.o_orderstatus = 'F'
                          AND d.last_ship IS NOT NULL
                     THEN d.last_ship - CAST(o.o_orderdate AS DATE)
                     ELSE hz.horizon - CAST(o.o_orderdate AS DATE)
                END) AS t,
                (o.o_orderstatus = 'F' AND d.last_ship IS NOT NULL)
                    AS ev
            FROM orders o
            LEFT JOIN done d ON d.l_orderkey = o.o_orderkey
            CROSS JOIN hz
        """).fetchall()

        def ref(ga, gb):
            a = [(t, e) for g, t, e in subs if g == ga]
            b = [(t, e) for g, t, e in subs if g == gb]
            o1 = e1 = v1 = 0.0
            for t in sorted({t for t, e in a + b if e}):
                ra = sum(1 for tt, _ in a if tt >= t)
                rb = sum(1 for tt, _ in b if tt >= t)
                da = sum(1 for tt, e in a if tt == t and e)
                db = sum(1 for tt, e in b if tt == t and e)
                d, n = da + db, ra + rb
                if d == 0 or n == 0:
                    continue
                o1 += da
                e1 += d * ra / n
                if n > 1:
                    v1 += d * (ra / n) * (rb / n) * (n - d) / (n - 1)
            z = (o1 - e1) / math.sqrt(v1) if v1 > 0 else None
            return int(o1), e1, z

        rows = R16.orders_logrank_priority(spark, SF_SMOKE).collect()
        n_groups = len({s[0] for s in subs})
        assert len(rows) == n_groups * (n_groups - 1) // 2
        for r in rows:
            o1, e1, z = ref(r.priority_a, r.priority_b)
            assert r.o_a == o1
            assert r.e_a == pytest.approx(e1, abs=5e-4)
            assert r.z_stat == pytest.approx(z, abs=5e-4)

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R16.orders_logrank_priority(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("orders", "lineitem")),
            entrymod._logrank_sql(),
        )
