"""Unit tests for the round-11 late audit wave
(operators/relational16.py): exact expected rows on tiny literal
frames, independent float references (numpy/pandas ranks) on the real
smoke tables, loud-cap checks for the scale guards, and parity
against the R14-staged DuckDB oracles
(__spark_entry__._mk_sql/_kw_sql/_cramers_sql).
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb
import pytest

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

    def test_grid_cap_fails_loudly(self, spark, tmp_path):
        from jobsity_data_pipeline_spark.operators.relational15 import (
            mw_counts,
        )

        t0 = dt.datetime(2024, 1, 1, 6)
        rows = [
            (i, t0, 1, "ab"[i % 2], float(i), "{}") for i in range(10)
        ]
        e = spark.read.parquet(
            _write_events(spark, tmp_path, rows) + "/events.parquet")
        with pytest.raises(Exception) as ei:
            R16.kw_from_counts(mw_counts(e), max_grid=4).collect()
        assert "coarsen the value quantization" in str(ei.value)

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
