"""Unit tests for the round-13 staged wave
(operators/relational18.py): exact expected rows on tiny literal
frames, degenerate-input cases, independent references (numpy /
python loops) on the real smoke tables, loud-cap posture, and parity
against the R14-staged DuckDB oracles
(__spark_entry__._cliffs_sql/_gk_sql/_runs_sql/_cvm_sql/_rmst_sql).
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from jobsity_data_pipeline_spark.operators import relational18 as R18
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


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


class TestCliffsDelta:
    def test_complete_separation(self, spark, tmp_path):
        # every a-value below every b-value: delta = -1, 'large'
        rows = [
            (1, T0, 1, "a", 1.0, "{}"), (2, T0, 1, "a", 2.0, "{}"),
            (3, T0, 1, "a", 3.0, "{}"),
            (4, T0, 1, "b", 4.0, "{}"), (5, T0, 1, "b", 5.0, "{}"),
        ]
        r = R18.events_cliffs_delta(
            spark, _write_events(spark, tmp_path, rows)).collect()
        assert len(r) == 1
        row = r[0]
        assert (row.type_a, row.type_b, row.n_a, row.n_b) == \
            ("a", "b", 3, 2)
        assert row.cliffs_delta == -1.0
        assert row.magnitude == "large"

    def test_ties_hand_computed(self, spark, tmp_path):
        # a = [1, 2, 2], b = [2, 3]: #(a>b) = 0, #(a=b) = 2,
        # #(a<b) = 4 -> delta = (0 - 4)/6 = -0.666667
        rows = [
            (1, T0, 1, "a", 0.01, "{}"), (2, T0, 1, "a", 0.02, "{}"),
            (3, T0, 1, "a", 0.02, "{}"),
            (4, T0, 1, "b", 0.02, "{}"), (5, T0, 1, "b", 0.03, "{}"),
        ]
        row = R18.events_cliffs_delta(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert row.cliffs_delta == round(-4.0 / 6.0, 6)
        assert row.magnitude == "large"

    def test_identical_distributions_negligible(self, spark, tmp_path):
        rows = []
        for i, v in enumerate((1.0, 2.0, 3.0)):
            rows.append((2 * i, T0, 1, "a", v, "{}"))
            rows.append((2 * i + 1, T0, 1, "b", v, "{}"))
        row = R18.events_cliffs_delta(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert row.cliffs_delta == 0.0
        assert row.magnitude == "negligible"

    def test_single_type_no_pairs(self, spark, tmp_path):
        rows = [(1, T0, 1, "a", 1.0, "{}")]
        assert R18.events_cliffs_delta(
            spark, _write_events(spark, tmp_path, rows)).count() == 0

    def test_cap_fails_loudly(self, spark, tmp_path):
        from jobsity_data_pipeline_spark.operators.relational15 import (
            mw_counts,
        )

        rows = []
        for i in range(8):
            rows.append((2 * i, T0, 1, "a", 1.0 + i * 0.01, "{}"))
            rows.append((2 * i + 1, T0, 1, "b", 5.0 + i * 0.01, "{}"))
        e = spark.read.parquet(
            _write_events(spark, tmp_path, rows) + "/events.parquet"
        )
        with pytest.raises(Exception) as ei:
            R18.cliffs_from_counts(mw_counts(e), max_grid=10).collect()
        msg = str(ei.value)
        assert "distinct value-cents" in msg
        assert "coarsen the value quantization" in msg

    def test_numpy_reference_on_smoke(self, spark):
        import numpy as np

        got = {
            (r.type_a, r.type_b): (r.n_a, r.n_b, r.cliffs_delta)
            for r in R18.events_cliffs_delta(spark, SF_SMOKE).collect()
        }
        ev = _duck(SF_SMOKE, ("events",)).execute(
            "SELECT event_type, CAST(round(value * 100, 0) AS BIGINT)"
            " FROM events"
        ).fetchall()
        by_type: dict = {}
        for t, vc in ev:
            by_type.setdefault(t, []).append(vc)
        types = sorted(by_type)
        assert len(got) == len(types) * (len(types) - 1) // 2
        for i, ta in enumerate(types):
            for tb in types[i + 1:]:
                a = np.sort(np.array(by_type[ta], dtype=np.int64))
                b = np.sort(np.array(by_type[tb], dtype=np.int64))
                gt = int(np.searchsorted(b, a, side="left").sum())
                le = int(np.searchsorted(b, a, side="right").sum())
                eq = le - gt
                lt = len(a) * len(b) - gt - eq
                ref = (gt - lt) / (len(a) * len(b))
                na, nb, delta = got[(ta, tb)]
                assert (na, nb) == (len(a), len(b))
                # published delta is rounded to 6 dp
                assert abs(delta - ref) < 5e-7

    def test_oracle_parity(self, spark):
        _parity(
            R18.events_cliffs_delta(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("events",)),
            __import__("__spark_entry__")._cliffs_sql(),
        )


class TestGKLambda:
    def test_hand_computed(self, spark, tmp_path):
        # web: en 6 / de 2; wiki: de 5 / en 1. N = 14.
        # lambda(lang|source) = (6+5 - 7)/(14 - 7) = 4/7
        # lambda(source|lang) = (6+5 - 8)/(14 - 8) = 1/2
        # lambda_sym = (11+11-7-8)/(28-7-8) = 7/13
        rows = []
        i = 0
        for lang, src, k in (("en", "web", 6), ("de", "web", 2),
                             ("de", "wiki", 5), ("en", "wiki", 1)):
            for _ in range(k):
                rows.append((i, "t", lang, src, 10))
                i += 1
        r = R18.docs_gk_lambda(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert (r.n_docs, r.n_langs, r.n_sources) == (14, 2, 2)
        assert r.lambda_lang_given_source == round(4.0 / 7.0, 6)
        assert r.lambda_source_given_lang == 0.5
        assert r.lambda_symmetric == round(7.0 / 13.0, 6)

    def test_single_lang_degenerate_null(self, spark, tmp_path):
        # one language owns the corpus: guessing it is already
        # error-free -> lambda(lang|source) NULL by INTEGER guard;
        # the converse is still defined
        rows = [
            (1, "t", "en", "web", 10), (2, "t", "en", "web", 10),
            (3, "t", "en", "wiki", 10),
        ]
        r = R18.docs_gk_lambda(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert r.lambda_lang_given_source is None
        assert r.lambda_source_given_lang is not None
        assert r.lambda_symmetric is not None

    def test_null_categories_excluded(self, spark, tmp_path):
        rows = [
            (1, "t", "en", "web", 10), (2, "t", "de", "wiki", 10),
            (3, "t", None, "web", 10), (4, "t", "en", None, 10),
        ]
        r = R18.docs_gk_lambda(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert r.n_docs == 2

    def test_empty_input(self, spark, tmp_path):
        rows = [(1, "t", None, None, 10)]
        r = R18.docs_gk_lambda(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert r.n_docs == 0
        assert r.lambda_symmetric is None

    def test_python_reference_on_smoke(self, spark):
        r = R18.docs_gk_lambda(spark, SF_SMOKE).collect()[0]
        rows = _duck(SF_SMOKE, ("documents",)).execute(
            "SELECT lang, source FROM documents"
            " WHERE lang IS NOT NULL AND source IS NOT NULL"
        ).fetchall()
        cells = Counter(rows)
        nl = Counter(); ns = Counter()
        for (lang, src), k in cells.items():
            nl[lang] += k
            ns[src] += k
        n = sum(cells.values())
        ssm = sum(
            max(k for (lg, s), k in cells.items() if s == src)
            for src in ns
        )
        slm = sum(
            max(k for (lg, s), k in cells.items() if lg == lang)
            for lang in nl
        )
        max_l = max(nl.values())
        max_s = max(ns.values())
        assert r.n_docs == n
        assert r.lambda_lang_given_source == pytest.approx(
            (ssm - max_l) / (n - max_l), abs=1e-6)
        assert r.lambda_source_given_lang == pytest.approx(
            (slm - max_s) / (n - max_s), abs=1e-6)

    def test_oracle_parity(self, spark):
        _parity(
            R18.docs_gk_lambda(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("documents",)),
            __import__("__spark_entry__")._gk_sql(),
        )


class TestRunsTest:
    def _events_for_daily(self, counts):
        rows = []
        eid = 0
        for day, c in enumerate(counts):
            for _ in range(c):
                rows.append((
                    eid, T0 + dt.timedelta(days=day), 1, "a", 1.0, "{}",
                ))
                eid += 1
        return rows

    def test_alternating_series(self, spark, tmp_path):
        # counts [5,0,5,0,5,1] (the 0-count days exist via the
        # zero-filled calendar; the last day carries an event so the
        # span reaches it): sorted [0,0,1,5,5,5] -> m2 = 1+5 = 6;
        # above/below alternate -> R = 6, n1 = n2 = 3,
        # z = (6-4)/sqrt(1.2)
        rows = self._events_for_daily([5, 0, 5, 0, 5, 1])
        r = R18.events_runs_test(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert (r.n_days, r.n_above, r.n_below, r.n_excluded,
                r.n_runs) == (6, 3, 3, 0, 6)
        assert r.z_stat == round(2.0 / math.sqrt(1.2), 4)

    def test_clustered_series(self, spark, tmp_path):
        rows = self._events_for_daily([5, 5, 5, 0, 0, 1])
        r = R18.events_runs_test(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert r.n_runs == 2
        assert r.z_stat == round(-2.0 / math.sqrt(1.2), 4)

    def test_median_days_excluded_and_degenerate(self, spark, tmp_path):
        # counts [1,2,3]: median 2 excluded; n1 = n2 = 1 and
        # a = 2 = N -> variance 0 -> NULL z by INTEGER guard
        rows = self._events_for_daily([1, 2, 3])
        r = R18.events_runs_test(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert (r.n_days, r.n_above, r.n_below, r.n_excluded,
                r.n_runs) == (3, 1, 1, 1, 2)
        assert r.z_stat is None

    def test_constant_series_all_excluded(self, spark, tmp_path):
        rows = self._events_for_daily([2, 2, 2])
        r = R18.events_runs_test(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert (r.n_above, r.n_below, r.n_excluded, r.n_runs) == \
            (0, 0, 3, 0)
        assert r.z_stat is None

    def test_python_reference_on_smoke(self, spark):
        r = R18.events_runs_test(spark, SF_SMOKE).collect()[0]
        daily = dict(_duck(SF_SMOKE, ("events",)).execute(
            "SELECT CAST(ts AS DATE) AS d, count(*) FROM events"
            " GROUP BY 1"
        ).fetchall())
        d0, d1 = min(daily), max(daily)
        series = [
            daily.get(d0 + dt.timedelta(days=i), 0)
            for i in range((d1 - d0).days + 1)
        ]
        n = len(series)
        srt = sorted(series)
        m2 = srt[(n + 1) // 2 - 1] + srt[n // 2]
        signs = [2 * c > m2 for c in series if 2 * c != m2]
        runs = sum(
            1 for i, s in enumerate(signs) if i == 0 or s != signs[i - 1]
        )
        n1 = sum(signs)
        n2 = len(signs) - n1
        assert (r.n_days, r.n_above, r.n_below, r.n_runs) == \
            (n, n1, n2, runs)
        a, nk = 2 * n1 * n2, n1 + n2
        if n1 >= 1 and n2 >= 1 and a > nk:
            z = (runs - (1 + a / nk)) / math.sqrt(
                a * (a - nk) / (nk * nk * (nk - 1)))
            assert r.z_stat == pytest.approx(z, abs=1e-4)

    def test_oracle_parity(self, spark):
        _parity(
            R18.events_runs_test(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("events",)),
            __import__("__spark_entry__")._runs_sql(),
        )


class TestCvM:
    def test_identical_distributions_zero(self, spark, tmp_path):
        rows = [
            (1, "t", "en", "a", 10), (2, "t", "en", "a", 20),
            (3, "t", "en", "b", 10), (4, "t", "en", "b", 20),
        ]
        r = R18.docs_cvm_source_drift(
            spark, _write_docs(spark, tmp_path, rows)).collect()
        assert len(r) == 1
        assert r[0].cvm_t == 0.0

    def test_hand_computed_shift(self, spark, tmp_path):
        # a = [1, 2], b = [3, 4]: T = 24/64 = 0.375,
        # E = (1 + 1/4)/6 = 0.208333
        rows = [
            (1, "t", "en", "a", 1), (2, "t", "en", "a", 2),
            (3, "t", "en", "b", 3), (4, "t", "en", "b", 4),
        ]
        row = R18.docs_cvm_source_drift(
            spark, _write_docs(spark, tmp_path, rows)).collect()[0]
        assert row.cvm_t == 0.375
        assert row.e_null == round(1.25 / 6.0, 6)
        assert row.n_values == 4

    def test_degenerate_single_value_filtered(self, spark, tmp_path):
        rows = [
            (1, "t", "en", "a", 10), (2, "t", "en", "b", 10),
        ]
        assert R18.docs_cvm_source_drift(
            spark, _write_docs(spark, tmp_path, rows)).count() == 0

    def test_numpy_reference_on_smoke(self, spark):
        import numpy as np

        got = {
            (r.source_a, r.source_b): r.cvm_t
            for r in R18.docs_cvm_source_drift(spark, SF_SMOKE).collect()
        }
        rows = _duck(SF_SMOKE, ("documents",)).execute(
            "SELECT source, n_chars FROM documents"
        ).fetchall()
        by_src: dict = {}
        for s, x in rows:
            by_src.setdefault(s, []).append(x)
        srcs = sorted(by_src)
        for i, sa in enumerate(srcs):
            for sb in srcs[i + 1:]:
                a = np.array(sorted(by_src[sa]), dtype=np.float64)
                b = np.array(sorted(by_src[sb]), dtype=np.float64)
                pooled = np.unique(np.concatenate([a, b]))
                if len(pooled) < 2:
                    assert (sa, sb) not in got
                    continue
                fa = np.searchsorted(a, pooled, side="right") / len(a)
                fb = np.searchsorted(b, pooled, side="right") / len(b)
                cnt = (
                    np.searchsorted(a, pooled, side="right")
                    - np.searchsorted(a, pooled, side="left")
                    + np.searchsorted(b, pooled, side="right")
                    - np.searchsorted(b, pooled, side="left")
                )
                n, m = len(a), len(b)
                ref = (n * m / (n + m) ** 2) * float(
                    (cnt * (fa - fb) ** 2).sum()
                )
                assert got[(sa, sb)] == pytest.approx(ref, abs=1e-6)

    def test_oracle_parity(self, spark):
        _parity(
            R18.docs_cvm_source_drift(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("documents",)),
            __import__("__spark_entry__")._cvm_sql(),
        )


class TestRMST:
    def test_from_literal_curve(self, spark):
        # curve: S = 1 until t=2 (666667 ppm after), then 333334 after
        # t=5 -> RMST = 2*1e6 + 666667*3 = 4000001 ppm-days
        curve = spark.createDataFrame(
            [(2, 3, 1, 666667), (5, 2, 1, 333334)],
            "t_days long, n_risk long, d_events long, survival_ppm long",
        )
        r = R18.rmst_from_curve(curve).collect()[0]
        assert (r.n_times, r.tau_days) == (2, 5)
        assert r.rmst_ppm_days == 4000001
        assert r.rmst_days == 4.000001

    def test_empty_curve(self, spark):
        curve = spark.createDataFrame(
            [],
            "t_days long, n_risk long, d_events long, survival_ppm long",
        )
        r = R18.rmst_from_curve(curve).collect()[0]
        assert r.n_times == 0
        assert r.tau_days is None
        assert r.rmst_ppm_days is None
        assert r.rmst_days is None

    def test_subject_level_reference(self, spark, tmp_path):
        # independent KM + RMST from subject-level (duration, event)
        # pairs: 4 completed orders, 1 censored mid-calendar
        base = dt.datetime(2024, 1, 1)
        orders = [
            (1, 1, "F", 1.0, base, "1-URGENT"),
            (2, 1, "F", 1.0, base, "1-URGENT"),
            (3, 1, "F", 1.0, base + dt.timedelta(days=1), "2-HIGH"),
            (4, 1, "F", 1.0, base, "2-HIGH"),
            (5, 1, "O", 1.0, base + dt.timedelta(days=2), "2-HIGH"),
        ]
        lis = [
            _li(1, base, 2), _li(2, base, 5), _li(3, base, 4),
            _li(4, base, 9),
        ]
        sf = _write_orders_li(spark, tmp_path, orders, lis)
        r = R18.orders_survival_rmst(spark, sf).collect()[0]

        # reference: durations/events per km_table semantics
        horizon = base + dt.timedelta(days=9)
        subs = [(2, True), (5, True), (3, True), (9, True),
                ((horizon - (base + dt.timedelta(days=2))).days, False)]
        times = sorted({t for t, ev in subs if ev})
        s = 1_000_000
        removed = 0
        curve = []
        for t in sorted({t for t, _ in subs}):
            n_risk = len(subs) - removed
            d = sum(1 for tt, ev in subs if tt == t and ev)
            if d > 0:
                s = (2 * s * (n_risk - d) + n_risk) // (2 * n_risk)
                curve.append((t, s))
            removed += sum(1 for tt, _ in subs if tt == t)
        ppm = curve[0][0] * 1_000_000
        for (t_i, s_i), (t_j, _) in zip(curve, curve[1:]):
            ppm += s_i * (t_j - t_i)
        assert r.n_times == len(curve)
        assert r.tau_days == curve[-1][0]
        assert r.rmst_ppm_days == ppm

    def test_oracle_parity(self, spark):
        _parity(
            R18.orders_survival_rmst(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("orders", "lineitem")),
            __import__("__spark_entry__")._rmst_sql(),
        )


def test_wave_in_staged_registry():
    import __spark_entry__ as entrymod

    sq = entrymod.staged_queries()
    so = entrymod.staged_oracle_sql()
    assert set(sq) == set(so) == {
        "events_cliffs_delta", "docs_gk_lambda", "events_runs_test",
        "docs_cvm_source_drift", "orders_survival_rmst",
    }
    # staged and registered surfaces are disjoint
    assert not set(sq) & set(entrymod.queries())
