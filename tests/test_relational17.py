"""Unit tests for the round-12 staged wave
(operators/relational17.py): exact expected rows on tiny literal
frames, degenerate-input cases, independent references (python math /
pandas ranks) on the real smoke tables, and parity against the
R13-staged DuckDB oracles
(__spark_entry__._theilsu_sql/_na_sql/_spearman_sql).
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from jobsity_data_pipeline_spark.operators import relational17 as R17
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


def _duck(sf_dir: str, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _parity(sdf, con, sql):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = con.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)

    def norm(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            cells = []
            for i in order:
                v = r[i]
                if isinstance(v, float):
                    cells.append("nan" if math.isnan(v) else repr(v))
                else:
                    cells.append(str(v))
            out.append(tuple(cells))
        return sorted(out)

    assert norm(scols, srows) == norm(dcols, drows)


class TestTheilsU:
    def test_source_determines_lang_not_conversely(self, spark, tmp_path):
        # each source hosts ONE language, but 'en' spans two sources:
        # U(lang|source) = 1 exactly, U(source|lang) < 1 — the
        # directional answer Cramér's V cannot give
        rows = [
            (1, "t", "en", "web", 10), (2, "t", "en", "web", 20),
            (3, "t", "de", "wiki", 10),
            (4, "t", "en", "forum", 10),
        ]
        r = R17.docs_theils_u(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert (r.n_docs, r.n_langs, r.n_sources) == (4, 2, 3)
        assert r.u_lang_given_source == 1.0
        assert r.u_source_given_lang < 1.0
        assert r.u_source_given_lang > 0.0

    def test_exact_independence_is_zero(self, spark, tmp_path):
        # perfectly proportional 2x2: MI = 0, both coefficients 0
        rows = [
            (1, "t", "en", "web", 10), (2, "t", "en", "web", 20),
            (3, "t", "de", "web", 10),
            (4, "t", "en", "wiki", 10), (5, "t", "en", "wiki", 20),
            (6, "t", "de", "wiki", 10),
        ]
        r = R17.docs_theils_u(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert r.mutual_info == 0.0
        assert r.u_lang_given_source == 0.0
        assert r.u_source_given_lang == 0.0
        assert r.u_symmetric == 0.0

    def test_single_lang_reports_null(self, spark, tmp_path):
        # H(lang) = 0: U(lang|source) undefined — NULL, not a raise;
        # the other direction is a well-defined 0
        rows = [(1, "t", "en", "web", 10), (2, "t", "en", "wiki", 20)]
        r = R17.docs_theils_u(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert r.u_lang_given_source is None
        assert r.u_source_given_lang == 0.0
        assert r.h_lang == 0.0

    def test_null_categories_excluded(self, spark, tmp_path):
        # the cramers_from_classes r12 posture: NULL lang/source rows
        # are not categories — result equals the clean corpus
        clean = [
            (1, "t", "en", "web", 10), (2, "t", "en", "web", 20),
            (3, "t", "de", "wiki", 10), (4, "t", "de", "wiki", 30),
        ]
        noisy = clean + [
            (5, "t", None, "web", 10), (6, "t", "en", None, 20),
        ]
        want = R17.docs_theils_u(
            spark, _write_docs(spark, tmp_path / "a", clean)
        ).collect()[0]
        got = R17.docs_theils_u(
            spark, _write_docs(spark, tmp_path / "b", noisy)
        ).collect()[0]
        assert got == want
        assert got.n_docs == 4

    def test_matches_reference_on_smoke(self, spark):
        # independent python recomputation from the raw contingency
        con = _duck(SF_SMOKE, ("documents",))
        cells = Counter()
        for lang, src in con.execute(
            "SELECT lang, source FROM documents "
            "WHERE lang IS NOT NULL AND source IS NOT NULL"
        ).fetchall():
            cells[(lang, src)] += 1
        n = sum(cells.values())
        nl = Counter()
        ns = Counter()
        for (lang, src), o in cells.items():
            nl[lang] += o
            ns[src] += o

        def h(counts):
            return -sum(
                (c / n) * math.log(c / n) for c in counts.values()
            )

        hl, hs, hj = h(nl), h(ns), h(cells)
        mi = hl + hs - hj
        r = R17.docs_theils_u(spark, SF_SMOKE).collect()[0]
        assert r.n_docs == n
        assert r.h_lang == pytest.approx(hl, abs=5e-6)
        assert r.h_source == pytest.approx(hs, abs=5e-6)
        assert r.mutual_info == pytest.approx(mi, abs=5e-6)
        assert r.u_lang_given_source == pytest.approx(mi / hl, abs=5e-5)
        assert r.u_source_given_lang == pytest.approx(mi / hs, abs=5e-5)

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R17.docs_theils_u(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("documents",)),
            entrymod._theilsu_sql(),
        )


class TestHazardNA:
    def test_exact_tiny_case(self, spark, tmp_path):
        # 4 completed orders, durations 2, 2, 5, 7: hand-computed NA
        t0 = dt.datetime(2024, 1, 1)
        orders = [
            (k, 1, "F", 1.0, t0, "1-URGENT") for k in (1, 2, 3, 4)
        ]
        lis = [_li(1, t0, 2), _li(2, t0, 2), _li(3, t0, 5),
               _li(4, t0, 7)]
        rows = R17.orders_hazard_na(
            spark, _write_orders_li(spark, tmp_path, orders, lis)
        ).collect()
        assert [(r.t_days, r.at_risk, r.events) for r in rows] == [
            (2, 4, 2), (5, 2, 1), (7, 1, 1),
        ]
        assert [r.na_cumhaz for r in rows] == [0.5, 1.0, 2.0]
        assert rows[0].na_se == round(math.sqrt(2 / 16), 6)
        assert rows[1].na_se == round(math.sqrt(2 / 16 + 1 / 4), 6)
        assert rows[2].na_se == round(math.sqrt(2 / 16 + 1 / 4 + 1), 6)

    def test_censored_subjects_stay_at_risk(self, spark, tmp_path):
        # an open order (censored at the horizon) raises at-risk at
        # early event times without ever contributing an event row
        t0 = dt.datetime(2024, 1, 1)
        orders = [
            (1, 1, "F", 1.0, t0, "1-URGENT"),
            (2, 1, "O", 1.0, t0, "2-HIGH"),  # censored at horizon (5)
        ]
        lis = [_li(1, t0, 2), _li(2, t0, 5)]
        rows = R17.orders_hazard_na(
            spark, _write_orders_li(spark, tmp_path, orders, lis)
        ).collect()
        assert [(r.t_days, r.at_risk, r.events) for r in rows] == [
            (2, 2, 1),
        ]
        assert rows[0].na_cumhaz == 0.5

    def test_matches_subject_level_reference_on_smoke(self, spark):
        # independent per-subject loop over the same clamped
        # event/censoring semantics as the log-rank reference
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
            SELECT GREATEST(0,
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
        times = sorted({t for t, e in subs if e})
        cum = se2 = 0.0
        want = {}
        for t in times:
            n = sum(1 for tt, _ in subs if tt >= t)
            d = sum(1 for tt, e in subs if tt == t and e)
            cum += d / n
            se2 += d / (n * n)
            want[t] = (n, d, cum, math.sqrt(se2))
        rows = R17.orders_hazard_na(spark, SF_SMOKE).collect()
        assert len(rows) == len(times)
        for r in rows:
            n, d, cum, se = want[r.t_days]
            assert (r.at_risk, r.events) == (n, d)
            assert r.na_cumhaz == pytest.approx(cum, abs=5e-6)
            assert r.na_se == pytest.approx(se, abs=5e-6)

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R17.orders_hazard_na(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("orders", "lineitem")),
            entrymod._na_sql(),
        )


class TestSpearmanACF:
    def test_monotone_series_is_exactly_one(self, spark, tmp_path):
        # strictly increasing daily counts: ranks are linear in time,
        # so the rank autocorrelation is EXACTLY 1.0 at every lag —
        # the property the raw Pearson ACF lacks
        t0 = dt.datetime(2024, 1, 1, 6)
        rows = []
        k = 0
        for day in range(10):
            for _ in range(day + 1):
                rows.append(
                    (k, t0 + dt.timedelta(days=day), 1, "view",
                     1.0, "{}"))
                k += 1
        out = R17.events_spearman_acf(
            spark, _write_events(spark, tmp_path, rows)).collect()
        assert [r.lag for r in out] == list(range(1, 8))
        assert [r.n_pairs for r in out] == [10 - lag
                                            for lag in range(1, 8)]
        assert all(r.spearman_rho == 1.0 for r in out)

    def test_constant_series_reports_null(self, spark, tmp_path):
        # every day identical: zero rank variance — NULL, not a raise
        # (the guard the raw ACF does not need but ranks can hit)
        t0 = dt.datetime(2024, 1, 1, 6)
        rows = [
            (d, t0 + dt.timedelta(days=d), 1, "view", 1.0, "{}")
            for d in range(9)
        ]
        out = R17.events_spearman_acf(
            spark, _write_events(spark, tmp_path, rows)).collect()
        assert all(r.spearman_rho is None for r in out)

    def test_rank_scan_is_distributed(self, spark):
        # the pooled rank rides the segmented prefix scan (the
        # round-12 Kruskal-Wallis shape): block-partitioned window,
        # never a bare global ORDER BY c. Since r13 the kernel pins
        # the tie grid's rank frame (session.pin), so the window lives
        # inside a checkpointed subtree the final plan no longer shows
        # — assert the property on the ranking kernel itself, over the
        # same (c, t) tie-grid shape the operator ranks
        from jobsity_data_pipeline_spark.operators.ranking import (
            distributed_cumsum,
        )
        from jobsity_data_pipeline_spark.operators.relational15 import (
            daily_counts,
        )
        from jobsity_data_pipeline_spark.session import read_table

        daily = daily_counts(read_table(spark, SF_SMOKE, "events"))
        grid = daily.groupBy("c").agg(F.count("*").alias("t"))
        plan = distributed_cumsum(
            grid, "t", "c", [], out_col="_cum"
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "windowspecdefinition(_blk" in plan
        assert "windowspecdefinition(c#" not in plan

    def test_matches_pandas_reference_on_smoke(self, spark):
        import pandas as pd

        con = _duck(SF_SMOKE, ("events",))
        daily = dict(con.execute(
            "SELECT CAST(ts AS DATE) AS d, count(*) FROM events "
            "GROUP BY 1"
        ).fetchall())
        d0, d1 = min(daily), max(daily)
        series = []
        d = d0
        while d <= d1:
            series.append(daily.get(d, 0))
            d += dt.timedelta(days=1)
        s = pd.Series(series, dtype="float64")
        ranks = s.rank(method="average")
        out = R17.events_spearman_acf(spark, SF_SMOKE).collect()
        for r in out:
            a = ranks[: len(ranks) - r.lag].reset_index(drop=True)
            b = ranks[r.lag:].reset_index(drop=True)
            want = a.corr(b)
            assert r.n_pairs == len(ranks) - r.lag
            assert r.spearman_rho == pytest.approx(want, abs=5e-5)

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R17.events_spearman_acf(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("events",)),
            entrymod._spearman_sql(),
        )


class TestBenfordMAD:
    def test_exact_benford_sample_is_close(self, spark, tmp_path):
        # counts proportional to the Benford expectations (scaled to
        # integers) sit well inside the 'close' band
        import math as m

        t0 = dt.datetime(2024, 1, 1, 6)
        rows = []
        k = 0
        for d in range(1, 10):
            # ~1000·p_d events with first digit d (value d.00)
            for _ in range(round(1000 * m.log10(1 + 1 / d))):
                rows.append((k, t0, 1, "view", float(d), "{}"))
                k += 1
        r = R17.events_benford_mad(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert r.n_values == k
        assert r.conformity == "close"
        assert r.mad < 0.006

    def test_single_digit_is_nonconforming(self, spark, tmp_path):
        # every value starts with 9: the worst digit is 9 (deviation
        # 1 − p_9 ≈ 0.954) and the verdict is nonconforming
        t0 = dt.datetime(2024, 1, 1, 6)
        rows = [(i, t0, 1, "view", 9.0, "{}") for i in range(50)]
        r = R17.events_benford_mad(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert r.conformity == "nonconforming"
        assert r.worst_digit == 9
        assert r.max_abs_dev == round(
            1 - math.log10(1 + 1 / 9), 6)

    def test_empty_input_reports_nulls(self, spark, tmp_path):
        # no positive values: N = 0, NULL statistics, NULL verdict —
        # not a raise, not a fake 'nonconforming'
        t0 = dt.datetime(2024, 1, 1, 6)
        rows = [(1, t0, 1, "view", 0.0, "{}"),
                (2, t0, 1, "view", -3.0, "{}")]
        r = R17.events_benford_mad(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert r.n_values == 0
        assert r.mad is None
        assert r.worst_digit is None
        assert r.conformity is None

    def test_matches_reference_on_smoke(self, spark):
        # independent python recomputation from the raw digit counts
        con = _duck(SF_SMOKE, ("events",))
        digits = Counter()
        for (d,) in con.execute("""
            SELECT CAST(substr(CAST(CAST(round(value * 100, 0)
                AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)
            FROM events WHERE round(value * 100, 0) > 0
        """).fetchall():
            digits[d] += 1
        n = sum(digits.values())
        devs = {
            d: abs(digits.get(d, 0) / n - math.log10(1 + 1 / d))
            for d in range(1, 10)
        }
        mad = sum(devs.values()) / 9
        r = R17.events_benford_mad(spark, SF_SMOKE).collect()[0]
        assert r.n_values == n
        assert r.mad == pytest.approx(mad, abs=5e-6)
        assert r.max_abs_dev == pytest.approx(max(devs.values()),
                                              abs=5e-6)
        assert r.worst_digit == max(
            devs, key=lambda d: (devs[d], -d))

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R17.events_benford_mad(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("events",)),
            entrymod._benford_mad_sql(),
        )


class TestJSDivergence:
    def test_identical_distributions_are_zero(self, spark, tmp_path):
        # same length profile in both sources: JSD = 0 exactly after
        # the shared clamp + rounding
        rows = [
            (1, "t", "en", "web", 10), (2, "t", "en", "web", 20),
            (3, "t", "en", "web", 20),
            (4, "t", "en", "wiki", 10), (5, "t", "en", "wiki", 20),
            (6, "t", "en", "wiki", 20),
        ]
        r = R17.docs_js_divergence(
            spark, _write_docs(spark, tmp_path, rows)).collect()
        assert len(r) == 1
        assert (r[0].source_a, r[0].source_b) == ("web", "wiki")
        assert (r[0].n_a, r[0].n_b, r[0].n_values) == (3, 3, 2)
        assert r[0].js_divergence == 0.0
        assert r[0].js_distance == 0.0

    def test_disjoint_supports_are_ln2(self, spark, tmp_path):
        # no shared length values: JSD = ln 2 (the bound), where KL
        # would diverge — the property that makes JS usable on
        # arbitrary source pairs
        rows = [
            (1, "t", "en", "web", 10), (2, "t", "en", "web", 20),
            (3, "t", "en", "wiki", 30), (4, "t", "en", "wiki", 40),
        ]
        r = R17.docs_js_divergence(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert r.js_divergence == round(math.log(2), 6)
        assert r.js_distance == round(math.sqrt(math.log(2)), 6)

    def test_matches_reference_on_smoke(self, spark):
        # independent python recomputation from the raw counts, all
        # source pairs
        con = _duck(SF_SMOKE, ("documents",))
        cnt = Counter()
        for src, x in con.execute(
            "SELECT source, n_chars FROM documents"
        ).fetchall():
            cnt[(src, x)] += 1
        n = Counter()
        for (src, _), c in cnt.items():
            n[src] += c

        def jsd(a, b):
            xs = {x for (s, x) in cnt if s in (a, b)}
            out = 0.0
            for x in xs:
                pa = cnt.get((a, x), 0) / n[a]
                pb = cnt.get((b, x), 0) / n[b]
                m = (pa + pb) / 2
                if pa:
                    out += pa * math.log(pa / m) / 2
                if pb:
                    out += pb * math.log(pb / m) / 2
            return out

        rows = R17.docs_js_divergence(spark, SF_SMOKE).collect()
        srcs = sorted(n)
        assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
        for r in rows:
            want = jsd(r.source_a, r.source_b)
            assert r.js_divergence == pytest.approx(want, abs=5e-6)
            assert 0.0 <= r.js_divergence <= math.log(2) + 1e-9

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R17.docs_js_divergence(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("documents",)),
            entrymod._js_sql(),
        )


def test_wave_in_registered_registry():
    # registered in round 13 (the whole six-operator round-12 wave
    # promoted from the staged registry at once)
    import __spark_entry__ as entrymod

    sq = entrymod.staged_queries()
    so = entrymod.staged_oracle_sql()
    assert set(sq) == set(so)
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    for key in ("docs_theils_u", "orders_hazard_na",
                "events_spearman_acf", "docs_js_divergence",
                "events_benford_mad", "orders_forecast_theta"):
        assert key in q and key in o
    # staged and registered surfaces are disjoint
    assert not set(sq) & set(q)
