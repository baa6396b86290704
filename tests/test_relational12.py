"""Semantic tests for the round-7 analytics wave (operators/
relational12 + events_dau_mau). Cross-engine value parity is covered
by tests/test_oracle_parity.py; these pin what parity can't: the
statistics' mathematical invariants, the backlog's conservation laws,
and pure-Python replays of the window logic.
"""

from __future__ import annotations

import datetime as dt

import numpy as np

from jobsity_data_pipeline_spark.operators import relational12 as R12
from jobsity_data_pipeline_spark.session import read_table

SF_SMOKE = "/root/testdata/sf0.001"


def test_welch_ttest_matches_closed_form(spark):
    rows = R12.events_welch_ttest(spark, SF_SMOKE).collect()
    ev = read_table(spark, SF_SMOKE, "events").select(
        "event_type", "value"
    ).collect()
    by = {}
    for r in ev:
        by.setdefault(r.event_type, []).append(float(r.value))
    types = sorted(by)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        a, b = np.array(by[r.type_a]), np.array(by[r.type_b])
        na, nb = len(a), len(b)
        assert (r.na, r.nb) == (na, nb)
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / na + vb / nb
        t = (a.mean() - b.mean()) / np.sqrt(se2)
        df = se2 * se2 / ((va / na) ** 2 / (na - 1)
                          + (vb / nb) ** 2 / (nb - 1))
        assert abs(r.t_stat - t) < 1e-3
        assert abs(r.df - df) < 0.02
        # Welch-Satterthwaite bounds: min(n)-1 <= df <= n1+n2-2
        assert min(na, nb) - 1 <= r.df <= na + nb - 2 + 0.01


def test_open_backlog_conservation_laws(spark):
    rows = R12.orders_open_backlog(spark, SF_SMOKE).orderBy(
        "day"
    ).collect()
    # never negative, starts positive, and ends at zero once every
    # order's last ship day has passed (total opened == total closed)
    assert all(r.open_backlog >= 0 for r in rows)
    assert rows[0].open_backlog == rows[0].opened
    assert rows[-1].open_backlog == 0
    assert sum(r.opened for r in rows) == sum(r.closed for r in rows)
    # opened tally equals the orders that have at least one lineitem
    o = read_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    li = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    with_lines = o.join(
        li.distinct(), o["o_orderkey"] == li["l_orderkey"], "left_semi"
    ).count()
    assert sum(r.opened for r in rows) == with_lines


def test_interpurchase_gaps_python_replay(spark):
    rows = {
        r.c_mktsegment: r
        for r in R12.customer_interpurchase_gaps(spark, SF_SMOKE).collect()
    }
    o = read_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderdate"
    ).collect()
    c = {
        r.c_custkey: r.c_mktsegment
        for r in read_table(spark, SF_SMOKE, "customer").collect()
    }
    by = {}
    for r in o:
        by.setdefault(r.o_custkey, []).append(r.o_orderdate.date())
    seg = {}
    for cust, days in by.items():
        days.sort()
        gaps = [(b - a).days for a, b in zip(days, days[1:])]
        if not gaps:
            continue
        s = seg.setdefault(c[cust], {"n": 0, "sum": 0, "max": 0,
                                     "cust": 0})
        s["cust"] += 1
        s["n"] += len(gaps)
        s["sum"] += sum(gaps)
        s["max"] = max(s["max"], max(gaps))
    assert set(rows) == set(seg)
    for k, s in seg.items():
        r = rows[k]
        assert r.repeat_customers == s["cust"]
        assert r.n_gaps == s["n"]
        assert r.mean_gap_days == (2 * s["sum"] + s["n"]) // (2 * s["n"])
        assert r.max_gap_days == s["max"]


def test_knn_classify_python_replay(spark):
    rows = {
        r.true_label: r
        for r in R12.emb_knn_classify(spark, SF_SMOKE).collect()
    }
    emb = read_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb}
    labels = {r.vec_id: r.label for r in emb}

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    per_label = {}
    for qid in sorted(vecs):
        if qid >= 64:
            break
        qv = vecs[qid]
        qn = np.sqrt(seq_dot(qv, qv))
        scored = []
        for nid, v in vecs.items():
            if nid == qid:
                continue
            nn = qn * np.sqrt(seq_dot(v, v))
            cos = seq_dot(qv, v) / nn if nn > 0 else 0.0
            scored.append((-round(cos, 6), nid))
        scored.sort()
        votes = {}
        for _, nid in scored[:3]:
            votes[labels[nid]] = votes.get(labels[nid], 0) + 1
        pred = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        s = per_label.setdefault(labels[qid], [0, 0])
        s[0] += 1
        s[1] += int(pred == labels[qid])
    assert set(rows) == set(per_label)
    for lab, (n, ok) in per_label.items():
        r = rows[lab]
        assert (r.n_eval, r.n_correct) == (n, ok)
        assert r.acc_pm == (2 * 1000 * ok + n) // (2 * n)


def test_dau_mau_bounds_and_exactness_regime(spark):
    rows = R12.events_dau_mau(spark, SF_SMOKE).orderBy("day").collect()
    assert len(rows) > 0
    for r in rows:
        # register max-merge only grows the estimate (both branches of
        # the small-range correction are monotone in the register
        # state), so MAU >= DAU up to the 4-dp rounding and the
        # branch-switch edge — allow a small slack
        assert r.mau_est >= r.dau_est - 0.51
        assert 0 < r.stickiness <= 1.01
    # MAU at the last observed day covers a superset of every single
    # day's users: it must be >= the max DAU
    assert max(r.mau_est for r in rows) >= max(r.dau_est for r in rows)
