"""Unit tests for the round-10 distribution-drift / audit wave
(operators/relational15.py): exact expected rows on tiny literal
frames, invariants on the real tables, plan-shape checks for the
scale-critical joins, and parity against the R12-staged DuckDB
oracles (__spark_entry__._kanon_sql/_acf_sql/_ks_sql/_benford_sql).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from jobsity_data_pipeline_spark.operators import relational15 as R15
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


class TestKAnonymity:
    def test_known_distribution(self, spark, tmp_path):
        rows = [
            # three docs in one (en, web, bucket 0) class
            (1, "t", "en", "web", 10),
            (2, "t", "en", "web", 20),
            (3, "t", "en", "web", 255),
            # singleton classes: a bucket-1 doc and a de doc
            (4, "t", "en", "web", 300),
            (5, "t", "de", "web", 10),
        ]
        out = {
            r.k: (r.n_classes, r.n_docs, r.docs_pm, r.at_risk)
            for r in R15.docs_k_anonymity(
                spark, _write_docs(spark, tmp_path, rows)
            ).collect()
        }
        # k=1: two singleton classes, 2/5 docs -> 400 pm; k=3: one class
        assert out == {1: (2, 2, 400, True), 3: (1, 3, 600, True)}

    def test_invariants_on_smoke(self, spark):
        rows = R15.docs_k_anonymity(spark, SF_SMOKE).collect()
        total = sum(r.n_docs for r in rows)
        con = _duck(SF_SMOKE, ("documents",))
        assert total == con.execute(
            "SELECT count(*) FROM documents").fetchone()[0]
        for r in rows:
            assert r.n_docs == r.k * r.n_classes
            assert r.at_risk == (r.k < R15.KANON_RISK_K)

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R15.docs_k_anonymity(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("documents",)),
            entrymod._kanon_sql(),
        )


class TestAcf:
    def test_alternating_series(self, spark, tmp_path):
        # daily counts [2, 0, 2, 0, 2] — day 2 and 4 have NO rows, the
        # zero-filled calendar must treat them as real zeros
        t = dt.datetime(2024, 1, 1, 6)
        rows, eid = [], 0
        for day in (0, 2, 4):
            for _ in range(2):
                eid += 1
                rows.append(
                    (eid, t + dt.timedelta(days=day), 1, "a", 1.0, "{}")
                )
        out = {
            r.lag: (r.n_pairs, r.acf)
            for r in R15.events_acf(
                spark, _write_events(spark, tmp_path, rows), max_lag=2
            ).collect()
        }
        # perfectly anti-phase at lag 1, in-phase at lag 2
        assert out == {1: (4, -1.0), 2: (3, 1.0)}

    def test_bounds_on_smoke(self, spark):
        rows = R15.events_acf(spark, SF_SMOKE).collect()
        assert [r.lag for r in rows] == list(range(1, R15.ACF_MAX_LAG + 1))
        for r in rows:
            assert abs(r.acf) <= 1.0 + 1e-9
        # each extra lag drops exactly one pair off the calendar span
        for a, b in zip(rows, rows[1:]):
            assert a.n_pairs == b.n_pairs + 1

    def test_plan_broadcasts_day_frames(self, spark):
        plan = R15.events_acf(spark, SF_SMOKE)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R15.events_acf(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("events",)),
            entrymod._acf_sql(),
        )


class TestKsSourceDrift:
    def test_disjoint_and_identical(self, spark, tmp_path):
        rows = [
            (1, "t", "en", "a", 1), (2, "t", "en", "a", 2),
            (3, "t", "en", "b", 3), (4, "t", "en", "b", 4),
            (5, "t", "en", "c", 1), (6, "t", "en", "c", 2),
        ]
        out = {
            (r.source_a, r.source_b): r
            for r in R15.docs_ks_source_drift(
                spark, _write_docs(spark, tmp_path, rows)
            ).collect()
        }
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
        # disjoint supports: D = 1; identical distributions: D = 0
        assert out[("a", "b")].ks_d == 1.0
        assert out[("a", "c")].ks_d == 0.0
        assert out[("b", "c")].ks_d == 1.0
        # scaling at n=2,2: sqrt(4/4) = 1
        assert out[("a", "b")].ks_scaled == 1.0
        assert out[("a", "c")].ks_scaled == 0.0

    def test_pairs_and_bounds_on_smoke(self, spark):
        rows = R15.docs_ks_source_drift(spark, SF_SMOKE).collect()
        srcs = set()
        for r in rows:
            assert r.source_a < r.source_b
            assert 0.0 <= r.ks_d <= 1.0
            srcs.add(r.source_a)
            srcs.add(r.source_b)
        n = len(srcs)
        assert len(rows) == n * (n - 1) // 2

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R15.docs_ks_source_drift(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("documents",)),
            entrymod._ks_sql(),
        )


class TestBenford:
    def test_known_digits(self, spark, tmp_path):
        t = dt.datetime(2024, 1, 1)
        vals = [1.00, 1.23, 25.00, 0.09, -3.0, 0.0]
        rows = [
            (i + 1, t, 1, "a", v, "{}") for i, v in enumerate(vals)
        ]
        out = {
            r.digit: r
            for r in R15.events_benford(
                spark, _write_events(spark, tmp_path, rows)
            ).collect()
        }
        assert sorted(out) == list(range(1, 10))
        # cents: 100 -> 1, 123 -> 1, 2500 -> 2, 9 -> 9; <=0 excluded
        obs = {d: out[d].observed for d in out}
        assert obs == {1: 2, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0,
                       9: 1}
        n = 4
        for d in range(1, 10):
            want = round(n * R15.BENFORD_P[d - 1], 4)
            assert out[d].expected == pytest.approx(want, abs=5e-5)

    def test_totals_on_smoke(self, spark):
        rows = R15.events_benford(spark, SF_SMOKE).collect()
        assert [r.digit for r in rows] == list(range(1, 10))
        n = sum(r.observed for r in rows)
        # expectations must sum to ~n (Benford probabilities sum to 1)
        assert sum(r.expected for r in rows) == pytest.approx(n, abs=0.01)
        con = _duck(SF_SMOKE, ("events",))
        want = con.execute(
            "SELECT count(*) FROM events "
            "WHERE CAST(round(value * 100, 0) AS BIGINT) > 0"
        ).fetchone()[0]
        assert n == want

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R15.events_benford(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("events",)),
            entrymod._benford_sql(),
        )


def _write_orders_lineitem(spark, tmp_path, orders, lineitems):
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(
        lineitems,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    return str(tmp_path)


class TestSurvivalKm:
    def test_kernel_hand_example(self):
        # events at t=1 (1 of 4) and t=3 (2 of 2 remaining after a
        # censoring at t=2 removed one subject)
        rows = [(1, True, 1), (2, False, 1), (3, True, 2)]
        assert R15.km_curve(rows) == [
            (1, 4, 1, 750000), (3, 2, 2, 0),
        ]

    def test_censored_at_event_time_still_at_risk(self):
        rows = [(5, True, 1), (5, False, 1)]
        assert R15.km_curve(rows) == [(5, 2, 1, 500000)]

    def test_operator_known_curve(self, spark, tmp_path):
        import datetime as dt

        d = lambda day: dt.datetime(2024, 1, day)  # noqa: E731
        li_extra = (1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O")
        orders = [
            (1, 1, "F", 1.0, d(1), "1-URGENT"),   # event t=2
            (2, 1, "F", 1.0, d(1), "1-URGENT"),   # event t=4
            (3, 1, "O", 1.0, d(2), "1-URGENT"),   # censored t=3
            (4, 1, "F", 1.0, d(1), "1-URGENT"),   # no lines -> censored t=4
        ]
        lis = [
            (1, *li_extra, d(2)), (1, *li_extra, d(3)),  # last ship Jan 3
            (2, *li_extra, d(5)),                        # horizon Jan 5
        ]
        got = [
            tuple(r)
            for r in R15.orders_survival_km(
                spark, _write_orders_lineitem(spark, tmp_path, orders, lis)
            ).collect()
        ]
        assert got == [(2, 4, 1, 750000), (4, 2, 1, 375000)]

    def test_monotone_on_smoke(self, spark):
        rows = R15.orders_survival_km(spark, SF_SMOKE).collect()
        assert rows
        prev_s, prev_n = 1_000_000, None
        for r in rows:
            assert r.survival_ppm <= prev_s
            assert r.d_events >= 1
            if prev_n is not None:
                assert r.n_risk < prev_n
            prev_s, prev_n = r.survival_ppm, r.n_risk

    def test_cap_raises(self, spark, monkeypatch):
        monkeypatch.setattr(R15, "KM_MAX_TIMES", 1)
        with pytest.raises(ValueError, match="duration grids"):
            R15.orders_survival_km(spark, SF_SMOKE)

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R15.orders_survival_km(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("orders", "lineitem")),
            entrymod._km_sql(),
        )


class TestKmKernelProperties:
    """Hypothesis properties of the pure product-limit kernel: the
    exact integer recurrence must track a float KM reference within
    per-step rounding error, and the structural invariants must hold
    for ANY censoring pattern."""

    @staticmethod
    def _float_km(rows):
        total = sum(c for _, _, c in rows)
        at_t, d_t = {}, {}
        for t, ev, c in rows:
            at_t[t] = at_t.get(t, 0) + c
            if ev:
                d_t[t] = d_t.get(t, 0) + c
        s, removed, out = 1.0, 0, []
        for t in sorted(at_t):
            n = total - removed
            d = d_t.get(t, 0)
            if d > 0:
                s *= (n - d) / n
                out.append((t, n, d, s))
            removed += at_t[t]
        return out

    def test_tracks_float_reference(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.lists(
            st.tuples(st.integers(0, 30), st.booleans(),
                      st.integers(1, 5)),
            min_size=1, max_size=40,
        ))
        def check(rows):
            got = R15.km_curve(rows)
            ref = self._float_km(rows)
            assert [(g[0], g[1], g[2]) for g in got] \
                == [(r[0], r[1], r[2]) for r in ref]
            # half-up per step: cumulative drift bounded by one ppm
            # per event step (each step rounds once)
            for i, (g, r) in enumerate(zip(got, ref)):
                assert abs(g[3] - r[3] * 1e6) <= i + 1
            # structural invariants
            prev = 1_000_000
            for _t, n, d, s in got:
                assert 0 <= s <= prev
                assert 1 <= d <= n
                prev = s

        check()

    def test_no_censoring_equals_ecdf_complement(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=100, deadline=None)
        @given(st.lists(st.integers(0, 20), min_size=1, max_size=30))
        def check(times):
            rows = [(t, True, 1) for t in times]
            got = R15.km_curve(rows)
            n = len(times)
            # with zero censoring, KM reduces to 1 - ECDF: after the
            # last event time S = 0, and at each event time
            # S = (subjects with time > t) / n up to rounding
            for t, n_risk, d, s in got:
                exact = sum(1 for x in times if x > t)
                # the recurrence rounds each step; allow the same
                # cumulative ppm bound
                assert abs(s - exact * 1_000_000 // n) <= len(got)
            assert got[-1][3] == 0

        check()


class TestSurvivalKmGrouped:
    def test_each_stratum_equals_filtered_flat_curve(self, spark):
        # the grouped form is the per-group identity of km_table:
        # stratum g's rows == the flat curve over g's orders alone
        # (same global horizon — done is corpus-wide in both paths)
        from jobsity_data_pipeline_spark.session import read_table

        grouped = R15.orders_survival_km_by_priority(spark, SF_SMOKE)
        by_g: dict = {}
        for r in grouped.collect():
            by_g.setdefault(r.o_orderpriority, []).append(
                (r.t_days, r.n_risk, r.d_events, r.survival_ppm))
        o = read_table(spark, SF_SMOKE, "orders")
        li = read_table(spark, SF_SMOKE, "lineitem")
        done = R15.lastship_counts(li)
        assert by_g
        for g, rows in list(by_g.items())[:2]:  # two strata suffice
            flat = [
                tuple(r) for r in R15.km_table(
                    spark, o.where(F.col("o_orderpriority") == g), done
                ).collect()
            ]
            assert rows == flat

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R15.orders_survival_km_by_priority(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("orders", "lineitem")),
            entrymod._km_grouped_sql(),
        )


class TestMannWhitney:
    def test_hand_example_with_ties(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "a", 1.00, "{}"), (2, t0, 1, "a", 2.00, "{}"),
            (3, t0, 1, "b", 2.00, "{}"), (4, t0, 1, "b", 3.00, "{}"),
        ]
        out = R15.events_mannwhitney(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
        assert len(out) == 1
        r = out[0]
        # ranks 1, 2.5 | 2.5, 4 -> R1 = 3.5, U1 = 0.5; tie term 6;
        # var = (4/12)*(5 - 6/12) = 1.5; z = -1.5/sqrt(1.5)
        assert (r.type_a, r.type_b, r.n_a, r.n_b) == ("a", "b", 2, 2)
        assert r.u_stat == 0.5
        assert r.z_stat == pytest.approx(-1.2247, abs=1e-4)

    def test_symmetry_gives_zero_z(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for i, v in enumerate([1.0, 2.0, 5.0, 9.0]):
            rows.append((2 * i, t0, 1, "a", v, "{}"))
            rows.append((2 * i + 1, t0, 1, "b", v, "{}"))
        out = R15.events_mannwhitney(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()
        r = out[0]
        # identical multisets: U1 = n1*n2/2 exactly -> z = 0
        assert r.u_stat == 8.0
        assert r.z_stat == 0.0

    def test_complete_separation(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1)
        rows = [(i, t0, 1, "a", float(i + 1), "{}") for i in range(5)]
        rows += [(10 + i, t0, 1, "b", float(100 + i), "{}")
                 for i in range(5)]
        r = R15.events_mannwhitney(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()[0]
        # every a-value below every b-value: U1 = 0, strongly negative z
        assert r.u_stat == 0.0
        assert r.z_stat < -2.5

    def test_pairs_on_smoke(self, spark):
        rows = R15.events_mannwhitney(spark, SF_SMOKE).collect()
        types = set()
        for r in rows:
            assert r.type_a < r.type_b
            types.add(r.type_a)
            types.add(r.type_b)
        n = len(types)
        assert len(rows) == n * (n - 1) // 2

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R15.events_mannwhitney(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("events",)),
            entrymod._mw_sql(),
        )


class TestAcfNumpyReference:
    def test_matches_numpy_pearson(self, spark, tmp_path):
        """Independent float reference: the engine's exact-integer
        sufficient-sum ACF must agree with numpy's Pearson correlation
        of the lagged series to a rounding ulp, for deterministic
        pseudo-random daily counts (LCG — no RNG in tests)."""
        import numpy as np

        t0 = dt.datetime(2024, 3, 1)
        # 40-day series from a fixed LCG, including zeros
        x, counts = 12345, []
        for _ in range(40):
            x = (1103515245 * x + 12345) % (1 << 31)
            counts.append((x >> 16) % 7)  # 0..6 events that day
        rows, eid = [], 0
        for day, c in enumerate(counts):
            for _ in range(c):
                eid += 1
                rows.append(
                    (eid, t0 + dt.timedelta(days=day, hours=eid % 20),
                     1, "a", 1.0, "{}")
                )
        # day 0 and the last day must be non-empty so the observed
        # span equals the constructed one
        assert counts[0] > 0 and counts[-1] > 0
        got = {
            r.lag: (r.n_pairs, r.acf)
            for r in R15.events_acf(
                spark, _write_events(spark, tmp_path, rows), max_lag=5
            ).collect()
        }
        arr = np.array(counts, dtype=float)
        for lag in range(1, 6):
            a, b = arr[:-lag], arr[lag:]
            want = float(np.corrcoef(a, b)[0, 1])
            n_pairs, acf = got[lag]
            assert n_pairs == len(arr) - lag
            assert acf == pytest.approx(want, abs=1e-6)


class TestMwNaiveReference:
    def test_matches_naive_rank_implementation(self, spark, tmp_path):
        """Independent reference: the doubled-integer rank algebra
        must agree with a naive float implementation (sort, average
        ranks over tie runs, textbook U and tie-corrected z) on
        deterministic LCG-generated values with heavy ties."""
        t0 = dt.datetime(2024, 1, 1)
        x, rows, vals = 777, [], {"a": [], "b": []}
        for i in range(120):
            x = (1103515245 * x + 12345) % (1 << 31)
            side = "a" if i % 2 == 0 else "b"
            v = ((x >> 12) % 15) / 4.0 + (0.25 if side == "b" else 0.0)
            vals[side].append(round(v * 100))  # cents
            rows.append((i, t0, 1, side, v, "{}"))
        r = R15.events_mannwhitney(
            spark, _write_events(spark, tmp_path, rows)
        ).collect()[0]

        av, bv = vals["a"], vals["b"]
        pooled = sorted(
            [(v, "a") for v in av] + [(v, "b") for v in bv]
        )
        ranks, i = {}, 0
        while i < len(pooled):
            j = i
            while j < len(pooled) and pooled[j][0] == pooled[i][0]:
                j += 1
            avg = (i + 1 + j) / 2.0  # average of ranks i+1..j
            ranks[pooled[i][0]] = avg
            i = j
        r1 = sum(ranks[v] for v in av)
        n1, n2 = len(av), len(bv)
        u1 = r1 - n1 * (n1 + 1) / 2.0
        n = n1 + n2
        from collections import Counter

        tie = sum(t ** 3 - t for t in Counter(v for v, _ in pooled).values())
        var = (n1 * n2 / 12.0) * ((n + 1) - tie / (n * (n - 1)))
        z = (u1 - n1 * n2 / 2.0) / (var ** 0.5)
        assert (r.n_a, r.n_b) == (n1, n2)
        assert r.u_stat == u1
        assert r.z_stat == pytest.approx(z, abs=1e-4)


class TestMwGridGuard:
    def test_under_cap_unchanged(self, spark, tmp_path):
        # a tiny corpus well under any cap returns the same rows with
        # the guard in the plan (the guard is value-transparent)
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "a", 1.00, "{}"), (2, t0, 1, "a", 2.00, "{}"),
            (3, t0, 1, "b", 2.00, "{}"), (4, t0, 1, "b", 3.00, "{}"),
        ]
        e = spark.read.parquet(
            _write_events(spark, tmp_path, rows) + "/events.parquet"
        )
        r = R15.mw_from_counts(R15.mw_counts(e), max_grid=3).collect()[0]
        assert r.u_stat == 0.5

    def test_high_cardinality_fails_loudly(self, spark, tmp_path):
        # a synthetic high-cardinality pair (more distinct value-cents
        # than max_grid) raises AT EXECUTION with the remediation
        # named — the loud posture for the single-task rank window
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(12):  # 12 distinct cents per side -> grid 24
            rows.append((2 * i, t0, 1, "a", 1.0 + i * 0.01, "{}"))
            rows.append((2 * i + 1, t0, 1, "b", 5.0 + i * 0.01, "{}"))
        e = spark.read.parquet(
            _write_events(spark, tmp_path, rows) + "/events.parquet"
        )
        with pytest.raises(Exception) as ei:
            R15.mw_from_counts(R15.mw_counts(e), max_grid=10).collect()
        msg = str(ei.value)
        assert "distinct value-cents" in msg
        assert "coarsen the value quantization" in msg

    def test_guard_reuses_exchange_no_extra_scan(self, spark):
        # the grid-count consumer must not rescan the corpus. Before
        # r13 this rode a ReusedExchange of the counts aggregation
        # (asserted here); since r13 the kernel PINS the counts and
        # the pair grid (session.pin), which is strictly stronger:
        # the corpus scan lives only inside the checkpointed counts
        # subtree (computed once), and every downstream consumer —
        # the type list, both fan-out legs, the guard — reads the
        # pinned RDD. The final plan therefore scans ExistingRDDs
        # and contains NO parquet scan at all.
        df = R15.events_mannwhitney(spark, SF_SMOKE)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "ExistingRDD" in plan, plan[:4000]
        assert "Scan parquet" not in plan, plan[:4000]


class TestKmGroupedStratumTypes:
    def test_null_stratum_sorts_last_not_typeerror(self, spark):
        from jobsity_data_pipeline_spark.session import read_table

        o = read_table(spark, SF_SMOKE, "orders").withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("o_orderpriority")),
        )
        li = read_table(spark, SF_SMOKE, "lineitem")
        out = R15.km_table_grouped(
            spark, o, R15.lastship_counts(li), "o_orderpriority"
        ).collect()
        gs = [r.o_orderpriority for r in out]
        assert None in gs
        # NULL stratum rows are present and the non-null strata intact
        assert {g for g in gs if g is not None}

    def test_int_stratum_keeps_input_type(self, spark):
        from jobsity_data_pipeline_spark.session import read_table

        o = read_table(spark, SF_SMOKE, "orders").withColumn(
            "ship_bucket", (F.col("o_orderkey") % 2).cast("int")
        )
        li = read_table(spark, SF_SMOKE, "lineitem")
        out = R15.km_table_grouped(
            spark, o, R15.lastship_counts(li), "ship_bucket"
        )
        assert out.schema["ship_bucket"].dataType.simpleString() == "int"
        assert out.count() > 0


class TestAdSourceDrift:
    """Round-11 staged: two-sample Anderson-Darling drift audit —
    textbook-reference cross-check, degenerate filtering, staged
    oracle parity, and the shared-sufficient-statistic property."""

    @staticmethod
    def _ad2_naive(xs, ys):
        # Scholz-Stephens A2akN (k=2, midrank/tie version) written the
        # textbook per-sample-loop way — deliberately NOT the shared
        # cumulative-count shape the operator uses
        pooled = sorted(set(xs) | set(ys))
        n1, n2 = len(xs), len(ys)
        N = n1 + n2
        total = 0.0
        bprev = 0
        for z in pooled:
            f1 = sum(1 for v in xs if v == z)
            f2 = sum(1 for v in ys if v == z)
            lj = f1 + f2
            if lj == 0:
                continue
            m1 = sum(1 for v in xs if v < z) + f1 / 2.0
            m2 = sum(1 for v in ys if v < z) + f2 / 2.0
            ba = bprev + lj / 2.0
            den = ba * (N - ba) - N * lj / 4.0
            if den > 0:
                total += (lj / N) * (
                    (N * m1 - n1 * ba) ** 2 / den / n1
                    + (N * m2 - n2 * ba) ** 2 / den / n2
                )
            bprev += lj
        return (N - 1) / N * total

    def test_matches_textbook_reference_on_smoke(self, spark):
        con = _duck(SF_SMOKE, ("documents",))
        raw = con.execute(
            "SELECT source, n_chars FROM documents").fetchall()
        by_src: dict = {}
        for s, x in raw:
            by_src.setdefault(s, []).append(x)
        got = {(r.source_a, r.source_b): r.ad_a2
               for r in R15.docs_ad_source_drift(spark, SF_SMOKE)
               .collect()}
        assert got
        for (a, b), v in got.items():
            want = self._ad2_naive(by_src[a], by_src[b])
            assert v == pytest.approx(want, abs=5e-4), (a, b)

    def test_identical_samples_give_small_a2(self, spark, tmp_path):
        # same distribution -> E[A2] ~ 1; identical multisets land low
        rows = [(i, "t", "en", "a" if i % 2 == 0 else "b", 10 + i % 7)
                for i in range(200)]
        out = R15.docs_ad_source_drift(
            spark, _write_docs(spark, tmp_path, rows)).collect()
        assert len(out) == 1
        assert out[0].ad_a2 < 1.0

    def test_tail_shift_scores_high(self, spark, tmp_path):
        # c == a except its top 30% is 10x longer (a pure tail drift),
        # while b == a shifted by nothing: the drifted pair's A2 must
        # sit far above the undrifted pair's (same n, same body)
        rows = []
        for i in range(100):
            rows.append((i, "t", "en", "a", 100 + i))
            rows.append((1000 + i, "t", "en", "b", 100 + i))
            nc_ = 100 + i if i < 70 else (100 + i) * 10
            rows.append((2000 + i, "t", "en", "c", nc_))
        out = {(r.source_a, r.source_b): r.ad_a2
               for r in R15.docs_ad_source_drift(
                   spark, _write_docs(spark, tmp_path, rows)).collect()}
        # identical multisets: the tie-adjusted A2 is exactly its
        # degenerate floor; the 30% tail drift scores far above it
        assert out[("a", "c")] > 2.0
        assert out[("a", "c")] > out[("a", "b")] + 2.0
        assert out[("a", "c")] == out[("b", "c")]

    def test_degenerate_single_value_pair_filtered(self, spark,
                                                   tmp_path):
        # every doc in both sources has the same length: fewer than
        # two distinct pooled values -> the pair is filtered (the
        # mw_from_counts convention), not a division by zero
        rows = [(1, "t", "en", "a", 10), (2, "t", "en", "a", 10),
                (3, "t", "en", "b", 10), (4, "t", "en", "b", 10)]
        out = R15.docs_ad_source_drift(
            spark, _write_docs(spark, tmp_path, rows)).collect()
        assert out == []

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R15.docs_ad_source_drift(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("documents",)),
            entrymod._ad_sql(),
        )

    def test_shares_ks_sufficient_statistic(self, spark):
        # ad_from_counts over the KS audit's counts reduction equals
        # the operator — the streaming KS state serves AD corpus-free
        from jobsity_data_pipeline_spark.session import read_table

        cnt = R15.ks_counts(read_table(spark, SF_SMOKE, "documents"))
        a = [tuple(r) for r in R15.ad_from_counts(cnt).collect()]
        b = [tuple(r) for r in
             R15.docs_ad_source_drift(spark, SF_SMOKE).collect()]
        assert a == b


class TestTheilSenStaged:
    def test_matches_naive_reference_on_smoke(self, spark):
        import datetime as _dt

        con = _duck(SF_SMOKE, ("events",))
        days = dict(con.execute(
            "SELECT CAST(ts AS DATE) d, count(*) FROM events GROUP BY 1"
        ).fetchall())
        d0, d1 = min(days), max(days)
        span = [(i, days.get(d0 + _dt.timedelta(days=i), 0))
                for i in range((d1 - d0).days + 1)]

        def hup(num, den):
            if num >= 0:
                return (2 * num + den) // (2 * den)
            return -((2 * (-num) + den) // (2 * den))

        slopes = sorted(
            hup((span[y][1] - span[x][1]) * 1_000_000,
                span[y][0] - span[x][0])
            for x in range(len(span)) for y in range(x + 1, len(span))
        )
        n = len(slopes)
        want = round(
            (slopes[(n + 1) // 2 - 1] + slopes[n // 2]) / 2.0 / 1e6, 6)
        r = R15.events_trend_theilsen(spark, SF_SMOKE).collect()[0]
        assert r.n_pairs == n
        assert r.sen_slope_per_day == want

    def test_robust_to_single_outlier(self, spark, tmp_path):
        # a clean +2/day ramp with ONE 1000x spike day: OLS would be
        # dragged far off; the Sen slope stays exactly 2.0
        t0 = dt.datetime(2024, 1, 1, 6)
        rows, eid = [], 0
        for day in range(12):
            c = 2 * (day + 1) if day != 6 else 2000
            for _ in range(c):
                eid += 1
                rows.append(
                    (eid, t0 + dt.timedelta(days=day), 1, "a", 1.0, "{}")
                )
        r = R15.events_trend_theilsen(
            spark, _write_events(spark, tmp_path, rows)).collect()[0]
        assert r.sen_slope_per_day == 2.0

    def test_span_cap_fails_loudly(self, spark, tmp_path):
        import jobsity_data_pipeline_spark.operators.relational15 as M

        t0 = dt.datetime(2024, 1, 1, 6)
        rows = [(1, t0, 1, "a", 1.0, "{}"),
                (2, t0 + dt.timedelta(days=9), 1, "a", 1.0, "{}")]
        e = spark.read.parquet(
            _write_events(spark, tmp_path, rows) + "/events.parquet")
        orig = M.TS_MAX_DAYS
        M.TS_MAX_DAYS = 5
        try:
            with pytest.raises(Exception) as ei:
                M.theilsen_from_daily(
                    spark, M.daily_counts(e)).collect()
            assert "aggregate to weeks/months" in str(ei.value)
        finally:
            M.TS_MAX_DAYS = orig

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R15.events_trend_theilsen(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("events",)),
            entrymod._theilsen_sql(),
        )


class TestLDiversityStaged:
    def test_known_distribution(self, spark, tmp_path):
        rows = [
            # class (web, bucket 0): en + de -> l = 2, 3 docs
            (1, "t", "en", "web", 10),
            (2, "t", "en", "web", 20),
            (3, "t", "de", "web", 30),
            # class (wiki, bucket 0): en only -> l = 1 (UNIFORM), 2
            # docs — passes k-anonymity at k=2 yet fully discloses lang
            (4, "t", "en", "wiki", 10),
            (5, "t", "en", "wiki", 40),
        ]
        out = {
            r.l: (r.n_classes, r.n_docs, r.docs_pm, r.at_risk)
            for r in R15.docs_l_diversity(
                spark, _write_docs(spark, tmp_path, rows)
            ).collect()
        }
        assert out == {1: (1, 2, 400, True), 2: (1, 3, 600, False)}

    def test_invariants_on_smoke(self, spark):
        rows = R15.docs_l_diversity(spark, SF_SMOKE).collect()
        con = _duck(SF_SMOKE, ("documents",))
        assert sum(r.n_docs for r in rows) == con.execute(
            "SELECT count(*) FROM documents").fetchone()[0]
        n_langs = con.execute(
            "SELECT count(DISTINCT lang) FROM documents").fetchone()[0]
        for r in rows:
            assert 1 <= r.l <= n_langs
            assert r.at_risk == (r.l < R15.LDIV_RISK_L)

    def test_shares_kanon_sufficient_statistic(self, spark):
        from jobsity_data_pipeline_spark.session import read_table

        classes = R15.kanon_classes(
            read_table(spark, SF_SMOKE, "documents"))
        a = [tuple(r) for r in R15.ldiv_dist(classes).collect()]
        b = [tuple(r) for r in
             R15.docs_l_diversity(spark, SF_SMOKE).collect()]
        assert a == b

    def test_oracle_parity(self, spark):
        import __spark_entry__ as entrymod

        _parity(
            R15.docs_l_diversity(spark, SF_SMOKE),
            _duck(SF_SMOKE, ("documents",)),
            entrymod._ldiv_sql(),
        )
