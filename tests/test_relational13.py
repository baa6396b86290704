"""Semantic tests for the round-8 analytics wave (operators/
relational13). Cross-engine value parity is covered by
tests/test_oracle_parity.py; these pin what parity can't: the
statistics against NumPy closed forms, the decomposition's identity
laws, the Markov iteration against a pure-Python replay, and the
index-audit's conservation laws.
"""

from __future__ import annotations

import numpy as np

from jobsity_data_pipeline_spark.operators import relational13 as R13
from jobsity_data_pipeline_spark.session import read_table

SF_SMOKE = "/root/testdata/sf0.001"


def test_ols_matches_numpy_closed_form(spark):
    rows = R13.lineitem_ols_elasticity(spark, SF_SMOKE).collect()
    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_discount", "l_quantity").collect()
    pt = {
        r.p_partkey: r.p_brand
        for r in read_table(spark, SF_SMOKE, "part").collect()
    }
    by: dict = {}
    for r in li:
        b = pt[r.l_partkey]
        by.setdefault(b, []).append(
            (round(float(r.l_discount) * 100),
             round(float(r.l_quantity) * 100)))
    assert rows, "no brands survived the degeneracy filter"
    for r in rows:
        xy = np.array(by[r.brand], dtype=float)
        x, y = xy[:, 0], xy[:, 1]
        assert r.n == len(xy)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r.slope_qty_per_pct - slope / 100) < 1e-4
        assert abs(r.intercept_qty - intercept / 100) < 1e-2
        cc = np.corrcoef(x, y)[0, 1]
        assert abs(r.r2 - cc * cc) < 1e-4


def test_chi2_cells_and_marginals(spark):
    rows = R13.orders_priority_chi2(spark, SF_SMOKE).collect()
    # expectations reproduce the observed marginals exactly: summing
    # expected over a row/column recovers that row/column's observed
    # total (the defining property of the independence model)
    tot_obs = sum(r.observed for r in rows)
    assert abs(sum(r.expected for r in rows) - tot_obs) < 1e-2
    by_p: dict = {}
    by_f: dict = {}
    for r in rows:
        by_p.setdefault(r.priority, [0.0, 0])
        by_p[r.priority][0] += r.expected
        by_p[r.priority][1] += r.observed
        by_f.setdefault(r.returnflag, [0.0, 0])
        by_f[r.returnflag][0] += r.expected
        by_f[r.returnflag][1] += r.observed
    for e, o in list(by_p.values()) + list(by_f.values()):
        assert abs(e - o) < 1e-2
    # per-cell contribution matches the closed form
    for r in rows:
        want = (r.observed - r.expected) ** 2 / r.expected
        assert abs(r.chi2_contrib - want) < 1e-3


def test_seasonal_decompose_identities(spark):
    rows = R13.orders_seasonal_decompose(spark, SF_SMOKE).orderBy(
        "month").collect()
    # independent monthly revenue replay (exact cents)
    o = read_table(spark, SF_SMOKE, "orders").select(
        "o_orderdate", "o_totalprice").collect()
    monthly: dict = {}
    for r in o:
        m = str(r.o_orderdate)[:7]
        monthly[m] = monthly.get(m, 0) + round(
            float(r.o_totalprice) * 100)
    all_months = sorted(monthly)
    rev = [monthly[m] for m in all_months]
    # edge months (first/last 6, no centered trend) are dropped
    assert [r.month for r in rows] == all_months[6:-6]
    for i, r in enumerate(rows, start=6):
        assert r.rev_c == rev[i]
        # trend replay: centered 2x12 MA (half-weight ends), half-up
        num = rev[i - 6] + rev[i + 6] + 2 * sum(rev[i - 5:i + 6])
        assert r.trend_c == (2 * num + 24) // 48
        # additive identity: rev = trend + seasonal + resid
        assert r.rev_c == r.trend_c + r.seasonal_c + r.resid_c
    # every month-of-year shares one seasonal index
    by_moy: dict = {}
    for r in rows:
        by_moy.setdefault(r.month[5:7], set()).add(r.seasonal_c)
    assert all(len(v) == 1 for v in by_moy.values())


def test_markov_stationary_python_replay_and_fixed_point(spark):
    rows = R13.events_markov_stationary(spark, SF_SMOKE).collect()
    ev = read_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type").collect()
    seqs: dict = {}
    for r in ev:
        seqs.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type))
    counts: dict = {}
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            counts.setdefault(a, {})[b] = counts.get(a, {}).get(b, 0) + 1
    types = sorted(counts)
    rsum = {t: sum(counts[t].values()) for t in types}
    k = len(types)
    base, rem = divmod(1_000_000, k)
    pi = {t: base + (1 if i < rem else 0) for i, t in enumerate(types)}
    for _ in range(24):
        nxt = {t: 0 for t in types}
        for src in types:
            for dst, c in counts[src].items():
                if dst in nxt:
                    nxt[dst] += (2 * pi[src] * c + rsum[src]) // (
                        2 * rsum[src])
        pi = nxt
    got = {r.event_type: (r.pi_e6, r.n_out) for r in rows}
    assert got == {t: (pi[t], rsum[t]) for t in types}
    # a distribution: non-negative, sums to 1e6 within rounding drift
    total = sum(v for v, _ in got.values())
    assert abs(total - 1_000_000) <= 2 * len(types) * 24
    assert all(v >= 0 for v, _ in got.values())
    # fixed point: one more exact-rational step moves pi only within
    # accumulated rounding noise (well under 0.05% of the mass)
    for t in types:
        flow = sum(
            pi[src] * counts[src].get(t, 0) / rsum[src] for src in types
        )
        assert abs(flow - pi[t]) <= 500


def test_hhi_bounds_and_single_supplier_limit(spark):
    rows = R13.part_type_hhi(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # HHI in bp^2: 1e8 for a monopoly, ~1e8/n at perfect split
        assert r.n_suppliers >= 1
        lo = 10_000 * 10_000 // r.n_suppliers - 2 * 10_000
        assert lo <= r.hhi <= 100_000_000 + 2 * 10_000
        if r.n_suppliers == 1:
            assert r.hhi == 100_000_000


def test_ivf_balance_conserves_corpus(spark):
    rows = R13.emb_ivf_balance(spark, SF_SMOKE).collect()
    n_emb = read_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_emb
    # half-up permille shares of a partition sum to ~1000
    assert abs(sum(r.share_pm for r in rows) - 1000) <= len(rows)
    assert all(r.n_vecs > 0 for r in rows)
