"""Invariant tests for the round-6 wave (operators/relational11).
Cross-engine value parity is covered by tests/test_oracle_parity.py;
these pin the semantics parity can't: SCD2 chain laws against an
independent pure-Python replay, M4 archetype bounds, the HDR sketch's
relative-error guarantee, the group split's zero-leakage property,
and hard-negative label exclusion vs a numpy brute force.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from jobsity_data_pipeline_spark.operators import relational11 as R11
from jobsity_data_pipeline_spark.session import read_table
from tests.conftest import SF_SMOKE


def test_orders_scd2_matches_pure_python_replay(spark):
    rows = R11.orders_scd2(spark, SF_SMOKE).collect()
    orders = read_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    ).collect()

    # independent replay: sort each customer's orders, collapse runs
    by_cust: dict = {}
    for o in orders:
        by_cust.setdefault(o.o_custkey, []).append(o)
    want = {}
    for ck, os_ in by_cust.items():
        os_.sort(key=lambda o: (o.o_orderdate, o.o_orderkey))
        runs = []
        for o in os_:
            if not runs or runs[-1]["p"] != o.o_orderpriority:
                runs.append({"p": o.o_orderpriority, "from": o.o_orderdate,
                             "n": 1})
            else:
                runs[-1]["n"] += 1
        for i, r in enumerate(runs):
            to = runs[i + 1]["from"] if i + 1 < len(runs) else None
            want[(ck, i + 1)] = (r["p"], r["from"], to, r["n"], to is None)
    got = {
        (r.o_custkey, r.version): (
            r.priority, r.effective_from, r.effective_to, r.n_orders,
            r.is_current,
        )
        for r in rows
    }
    assert got == want


def test_orders_scd2_chain_laws(spark):
    rows = R11.orders_scd2(spark, SF_SMOKE).collect()
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    n_orders_total = 0
    for ck, rs in by_cust.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r.is_current for r in rs) == 1 and rs[-1].is_current
        for a, b in zip(rs, rs[1:]):
            assert a.priority != b.priority  # runs are maximal
            assert a.effective_to == b.effective_from
            assert a.effective_from <= a.effective_to
        n_orders_total += sum(r.n_orders for r in rs)
    total = read_table(spark, SF_SMOKE, "orders").count()
    assert n_orders_total == total


def test_m4_downsample_bounds_and_totals(spark):
    rows = R11.events_m4_downsample(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.min_cents <= r.first_cents <= r.max_cents
        assert r.min_cents <= r.last_cents <= r.max_cents
        assert r.n >= 1
    total = read_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n for r in rows) == total
    # first/last really are time-ordered archetypes: spot-check one
    # bucket against a direct sort of its raw rows
    r0 = max(rows, key=lambda r: r.n)
    ev = read_table(spark, SF_SMOKE, "events").where(
        (F.col("event_type") == r0.event_type)
        & (F.expr("unix_micros(ts) div 21600000000") == r0.bucket)
    ).select("ts", "event_id", F.expr(
        "CAST(round(value * 100, 0) AS BIGINT)").alias("c")).collect()
    ev.sort(key=lambda e: (e.ts, e.event_id))
    assert ev[0].c == r0.first_cents and ev[-1].c == r0.last_cents


def test_hdr_quantiles_relative_error_bound(spark):
    rows = R11.events_hdr_quantiles(spark, SF_SMOKE).collect()
    assert rows
    ev = read_table(spark, SF_SMOKE, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("c"),
    ).where(F.col("c") >= 1).collect()
    by_type: dict = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e.c)
    for r in rows:
        cs = sorted(by_type[r.event_type])
        assert r.n == len(cs)
        rank = math.ceil(r.q_permille * r.n / 1000)
        exact = cs[rank - 1]
        # the estimate is the selected bucket's upper bound: it can
        # never undershoot, and overshoots by at most one sub-bucket
        # width (base/4 rounded up) => rel err <= ~25% + tiny slack
        assert r.est_cents >= exact
        assert r.est_cents <= exact + (exact // 4) + 2


def test_group_split_never_leaks_clusters(spark):
    from jobsity_data_pipeline_spark.operators.dedup import (
        docs_dedup_clusters,
    )

    res = {r.split: r for r in R11.docs_group_split(spark, SF_SMOKE).collect()}
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id").collect()
    cc = {r.doc_id: r.cluster_id
          for r in docs_dedup_clusters(spark, SF_SMOKE).collect()}

    def bucket(x: int) -> int:
        return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) % 100

    def split_of(b: int) -> str:
        return "train" if b < 80 else ("val" if b < 90 else "test")

    clusters: dict = {}
    for d in docs:
        cl = cc.get(d.doc_id, d.doc_id)
        clusters.setdefault(cl, []).append(d.doc_id)

    # zero leakage: every cluster's docs land in ONE split
    group_splits = {cl: split_of(bucket(cl)) for cl in clusters}
    counts = {"train": [0, 0, 0], "val": [0, 0, 0], "test": [0, 0, 0]}
    for cl, members in clusters.items():
        s = group_splits[cl]
        counts[s][0] += len(members)
        counts[s][1] += 1
        if len(members) > 1:
            counts[s][2] += len(members)
    for s, (nd, nc, nm) in counts.items():
        assert res[s].n_docs == nd
        assert res[s].n_clusters == nc
        assert res[s].n_multi_docs == nm
    assert sum(r.n_docs for r in res.values()) == len(docs)

    # contrast: whenever a multi-doc cluster's members hash to
    # different doc-level buckets, the naive per-doc split would have
    # leaked the pair across splits — the group split never can (every
    # cluster got exactly one split above, by exact-count equality)
    doc_leaky = [
        cl for cl, members in clusters.items()
        if len(members) > 1
        and len({split_of(bucket(d)) for d in members}) > 1
    ]
    for cl in doc_leaky:
        assert len({group_splits[cl]}) == 1


def test_scd2_asof_matches_interval_scan(spark):
    """The union+last-window as-of attribution equals a direct
    per-lineitem interval lookup against the SCD2 runs."""
    rows = R11.lineitem_scd2_asof(spark, SF_SMOKE).collect()
    li_total = read_table(spark, SF_SMOKE, "lineitem").count()
    assert sum(r.n_items for r in rows) == li_total

    runs = R11.orders_scd2(spark, SF_SMOKE).collect()
    by_cust: dict = {}
    for r in runs:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for rs in by_cust.values():
        rs.sort(key=lambda r: r.version)

    orders = {o.o_orderkey: o.o_custkey
              for o in read_table(spark, SF_SMOKE, "orders").collect()}
    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_shipdate",
        F.expr("CAST(round(l_quantity * 100, 0) AS BIGINT)").alias("qc"),
        F.expr(
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
            " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
        ).alias("rev_e4"),
    ).collect()
    agg: dict = {}
    for item in li:
        ck = orders[item.l_orderkey]
        regime = None
        for r in by_cust[ck]:  # versions ascending: last match wins,
            if r.effective_from <= item.l_shipdate:  # = highest version
                regime = r.priority
        a = agg.setdefault(regime, [0, 0, 0])
        a[0] += 1
        a[1] += item.qc
        a[2] += item.rev_e4
    want = {
        p: (n, qc, (2 * rev + 100) // 200)
        for p, (n, qc, rev) in agg.items()
    }
    got = {r.priority: (r.n_items, r.qty_c, r.revenue_cents)
           for r in rows}
    assert got == want


def test_bpe_fertility_rolls_up_encode(spark):
    from jobsity_data_pipeline_spark.operators import textops as TO

    rows = TO.docs_bpe_fertility(spark, SF_SMOKE).collect()
    per_doc = TO.docs_bpe_encode(spark, SF_SMOKE).collect()
    langs = {d.doc_id: d.lang
             for d in read_table(spark, SF_SMOKE, "documents").collect()}
    agg: dict = {}
    for r in per_doc:
        a = agg.setdefault(langs[r.doc_id], [0, 0, 0])
        a[0] += 1
        a[1] += r.ws_tokens
        a[2] += r.bpe_tokens
    assert {r.lang: (r.n_docs, r.ws_tokens, r.bpe_tokens)
            for r in rows} == {k: tuple(v) for k, v in agg.items()}
    for r in rows:
        # a word is at least one subword: fertility is >= 1000 permille
        assert r.fertility_permille >= 1000
        assert r.fertility_permille == (
            2 * 1000 * r.bpe_tokens + r.ws_tokens
        ) // (2 * r.ws_tokens)


def test_forecast_snaive_matches_pure_python(spark):
    rows = R11.orders_forecast_snaive(spark, SF_SMOKE).collect()
    assert rows
    orders = read_table(spark, SF_SMOKE, "orders").select(
        "o_orderdate",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("c"),
    ).collect()
    monthly: dict = {}
    for o in orders:
        k = (o.o_orderdate.year, o.o_orderdate.month)
        monthly[k] = monthly.get(k, 0) + o.c
    want = {}
    by_month: dict = {}
    for (y, mo), rev in sorted(monthly.items()):
        by_month.setdefault(mo, []).append((y, rev))
    for mo, seq in by_month.items():
        for (py, prev), (y, rev) in zip(seq, seq[1:]):
            ape = (2 * 1000 * abs(rev - prev) + rev) // (2 * rev)
            want[(y, mo)] = (rev, prev, ape)
    got = {(r.o_year, r.o_month): (r.rev_c, r.forecast_c, r.ape_permille)
           for r in rows}
    assert got == want


def test_containment_catches_subset_dup_jaccard_misses(spark, tmp_path):
    """The operator's reason to exist: a short doc quoted whole inside
    a long one has containment 1000 permille but Jaccard under the
    near-dup threshold."""
    from jobsity_data_pipeline_spark.operators.dedup import (
        docs_containment_pairs, docs_ngram_jaccard,
    )

    long_words = " ".join(f"w{i}" for i in range(400))
    short_words = " ".join(f"w{i}" for i in range(20))
    other = " ".join(f"z{i}" for i in range(50))
    spark.createDataFrame(
        [(0, long_words, "en", "t", len(long_words)),
         (1, short_words, "en", "t", len(short_words)),
         (2, other, "en", "t", len(other))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    pairs = docs_containment_pairs(spark, str(tmp_path)).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.doc_a, p.doc_b) == (0, 1)
    # every shingle of the short doc appears in the long one
    assert p.n_common == p.n_b == 17 and p.n_a == 397
    assert p.cont_b_in_a_pm == 1000
    assert p.cont_a_in_b_pm == (2 * 1000 * 17 + 397) // (2 * 397)
    # Jaccard (17/397 ~ 0.043) misses it at the 0.12 threshold
    assert docs_ngram_jaccard(spark, str(tmp_path)).count() == 0


def test_containment_bounds(spark):
    from jobsity_data_pipeline_spark.operators.dedup import (
        docs_containment_pairs,
    )

    rows = docs_containment_pairs(spark, SF_SMOKE,
                                  min_permille=0).collect()
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 1 <= r.n_common <= min(r.n_a, r.n_b)
        assert 0 < r.cont_a_in_b_pm <= 1000
        assert 0 < r.cont_b_in_a_pm <= 1000
        assert r.cont_a_in_b_pm == (2 * 1000 * r.n_common + r.n_a) \
            // (2 * r.n_a)


def test_kcenter_gonzalez_invariants(spark):
    rows = R11.emb_kcenter_sample(spark, SF_SMOKE).collect()
    assert [r.pick_rank for r in rows] == list(range(8))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == 8

    emb = read_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    assert ids[0] == min(vecs)
    assert rows[0].d6 is None

    def d6(a, b):
        s = 0.0
        for x, c in zip(a, b):
            c6 = round(c, 6)
            s += (x - c6) * (x - c6)
        return round(s * 1e6)

    # each pick's d6 is its max-min distance to the prior set; the
    # covering radius is non-increasing (Gonzalez invariant)
    radii = [r.d6 for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    for i, r in enumerate(rows[1:], start=1):
        want = min(d6(vecs[r.vec_id], vecs[ids[j]]) for j in range(i))
        assert abs(r.d6 - want) <= 1  # half-ulp rounding tolerance
    # 2-approx structure: chosen points are pairwise >= the last radius
    for i in range(8):
        for j in range(i + 1, 8):
            assert d6(vecs[ids[i]], vecs[ids[j]]) >= radii[-1] - 1


def test_abc_xyz_matches_pure_python(spark):
    rows = R11.parts_abc_xyz(spark, SF_SMOKE).collect()
    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_shipdate",
        F.expr("CAST(round(l_quantity * 100, 0) AS BIGINT)").alias("qc"),
        F.expr(
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
            " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
        ).alias("rev"),
    ).collect()
    rev: dict = {}
    monthly: dict = {}
    for r in li:
        rev[r.l_partkey] = rev.get(r.l_partkey, 0) + r.rev
        mk = (r.l_partkey, r.l_shipdate.year, r.l_shipdate.month)
        monthly[mk] = monthly.get(mk, 0) + r.qc
    tot = sum(rev.values())
    cum = 0
    abc = {}
    for pk in sorted(rev, key=lambda p: (-rev[p], p)):
        cum += rev[pk]
        abc[pk] = ("A" if 5 * cum <= 4 * tot
                   else "B" if 20 * cum <= 19 * tot else "C")
    stats: dict = {}
    for (pk, _, _), qc in monthly.items():
        s = stats.setdefault(pk, [0, 0, 0])
        s[0] += 1
        s[1] += qc
        s[2] += qc * qc
    xyz = {}
    for pk, (m, s1, s2) in stats.items():
        d = m * s2 - s1 * s1
        xyz[pk] = "X" if 4 * d <= s1 * s1 else ("Y" if d <= s1 * s1
                                                else "Z")
    want: dict = {}
    for pk in rev:
        cell = want.setdefault((abc[pk], xyz[pk]), [0, 0])
        cell[0] += 1
        cell[1] += rev[pk]
    got = {(r.abc, r.xyz): (r.n_parts, r.rev_share_permille)
           for r in rows}
    assert got == {
        k: (n, (2 * 1000 * rv + tot) // (2 * tot))
        for k, (n, rv) in want.items()
    }
    assert sum(r.n_parts for r in rows) == len(rev)
    # shares sum to ~1000 permille (rounding slack per cell)
    assert abs(sum(r.rev_share_permille for r in rows) - 1000) \
        <= len(rows)


def test_top_pc_matches_replay_and_eigenvector(spark):
    rows = R11.emb_top_pc(spark, SF_SMOKE).collect()
    emb = read_table(spark, SF_SMOKE, "embeddings").collect()
    X = np.array([[float(x) for x in r.embedding] for r in emb])
    n, dim = X.shape
    assert len(rows) == dim

    # exact replay with the operator's pinned roundings
    m = np.round(X.mean(axis=0), 6)
    Xc = X - m
    b = np.full(dim, round(1.0 / math.sqrt(dim), 6))
    for _ in range(5):
        s = np.round(Xc @ b, 6)
        w = Xc.T @ s
        nrm = math.sqrt(float(w @ w))
        b = np.round(w / nrm, 6)
    got_load = np.array([r.loading for r in sorted(rows,
                                                   key=lambda r: r.pos)])
    # group-sum order can differ in the last ulp; the 6-dp rounding
    # absorbs it except exactly ON a boundary — allow one step
    assert np.max(np.abs(got_load - b)) <= 1e-6 + 1e-9
    ev = rows[0].eigenvalue_e6
    assert abs(ev - round(nrm * 1e6)) <= 2
    share = rows[0].ev_share_e6
    tv = float((Xc * Xc).sum())
    assert abs(share - round(nrm / tv * 1e6)) <= 2
    assert 0 < share <= 1_000_000

    # every round is an ascent step: the achieved Rayleigh quotient
    # beats the start vector's
    S = Xc.T @ Xc
    b_start = np.full(dim, round(1.0 / math.sqrt(dim), 6))
    assert float(got_load @ S @ got_load) > float(b_start @ S @ b_start)
    # unit norm (to rounding)
    assert abs(np.linalg.norm(got_load) - 1.0) < 1e-4

    # convergence regime: this synthetic corpus is near-isotropic
    # (lambda2/lambda1 ~ 0.93), so 5 rounds cannot align — 30 do
    rows30 = R11.emb_top_pc(spark, SF_SMOKE, rounds=30).collect()
    got30 = np.array([r.loading for r in sorted(rows30,
                                                key=lambda r: r.pos)])
    top = np.linalg.eigh(S)[1][:, -1]
    assert abs(float(got30 @ top)) > 0.9


def test_hard_negatives_labels_and_bruteforce(spark):
    rows = R11.emb_hard_negatives(spark, SF_SMOKE).collect()
    emb = read_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    labels = {r.vec_id: r.label for r in emb}

    for r in rows:
        assert r.n_label != r.q_label
        assert 1 <= r.rnk <= 5
        assert -1.0001 <= r.cos <= 1.0001

    # pure-python brute force with the same left-to-right IEEE fold
    # the JVM aggregate runs (numpy's pairwise summation could flip a
    # 6-dp boundary), same rounding + tie rules
    def seq_dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    for qid in {r.qid for r in rows}:
        qv = vecs[qid]
        cands = []
        for nid, v in vecs.items():
            if nid == qid or labels[nid] == labels[qid]:
                continue
            nn = math.sqrt(seq_dot(qv, qv)) * math.sqrt(seq_dot(v, v))
            cos = seq_dot(qv, v) / nn if nn > 0 else 0.0
            cands.append((-round(cos, 6), nid))
        cands.sort()
        want = [nid for _, nid in cands[:5]]
        got = [r.nid for r in sorted(rows, key=lambda r: r.rnk)
               if r.qid == qid]
        assert got == want


def test_top_pc_plan_is_round_count_invariant(spark):
    """r13 driver-state optimization gate: the power-iteration round
    state crosses the driver as O(dim) literals (the docs_bpe_encode
    bounded-state posture), so the RETURNED frame's compiled plan no
    longer nests one broadcast subtree + checkpoint per round — its
    node structure is independent of the round count. Under the old
    broadcast-chain form the rounds=5 plan was strictly deeper than
    the rounds=2 one."""
    def plan_lines(rounds):
        df = R11.emb_top_pc(spark, SF_SMOKE, rounds=rounds)
        return len(
            df._jdf.queryExecution().executedPlan().toString()
            .splitlines()
        )

    assert plan_lines(2) == plan_lines(5)


def test_kcenter_pick_states_are_driver_bounded(spark):
    """r13 driver-state optimization gate: the k-center selection's
    per-round argmax is O(1) driver state, so the RETURNED frame is a
    k-row local relation — no join, no exchange, no corpus scan left
    in the result plan (every corpus pass ran during construction,
    against the pinned coordinate frame)."""
    df = R11.emb_kcenter_sample(spark, SF_SMOKE, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Scan parquet" not in plan  # corpus never re-enters
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert df.count() == 3


def test_top_pc_cache_postures_agree(spark):
    """The cache-vs-recompute strategy for the centered corpus is a
    pure performance choice: both paths must produce identical rows
    at any round count (the 6-dp normalize-then-round convention
    absorbs aggregation-order noise either way)."""
    for rounds in (2, 5):
        cached = R11.emb_top_pc(
            spark, SF_SMOKE, rounds=rounds, cache_centered=True
        ).collect()
        recomputed = R11.emb_top_pc(
            spark, SF_SMOKE, rounds=rounds, cache_centered=False
        ).collect()
        assert [tuple(r) for r in cached] == [tuple(r) for r in recomputed]


def test_top_pcs_deflation_matches_numpy_replay(spark):
    """emb_top_pcs == a NumPy replay of the same pinned-rounding
    deflation (engine parity), eigenvalue estimates are
    non-increasing across components, and at 30 rounds the extracted
    directions are near-orthogonal and span the same subspace as
    numpy.linalg.eigh's top components."""
    comps, rounds = 3, 4
    rows = R11.emb_top_pcs(
        spark, SF_SMOKE, components=comps, rounds=rounds
    ).collect()
    emb = read_table(spark, SF_SMOKE, "embeddings").collect()
    X = np.array([[float(x) for x in r.embedding] for r in emb])
    n, dim = X.shape
    assert len(rows) == comps * dim

    m = np.round(X.mean(axis=0), 6)
    Xc = X - m
    tv = float((Xc * Xc).sum())
    want = {}
    R = Xc.copy()
    for c in range(1, comps + 1):
        b = np.full(dim, round(1.0 / math.sqrt(dim), 6))
        nrm = None
        for _ in range(rounds):
            s = np.round(R @ b, 6)
            w = R.T @ s
            nrm = math.sqrt(float(w @ w))
            b = np.round(w / nrm, 6)
        want[c] = (b, nrm)
        sdef = np.round(R @ b, 6)
        R = R - np.outer(sdef, b)

    evs = []
    for c in range(1, comps + 1):
        got = np.array([
            r.loading for r in sorted(
                (r for r in rows if r.component == c),
                key=lambda r: r.pos,
            )
        ])
        b, nrm = want[c]
        assert np.max(np.abs(got - b)) <= 1e-6 + 1e-9, f"component {c}"
        ev = next(r.eigenvalue_e6 for r in rows if r.component == c)
        assert abs(ev - round(nrm * 1e6)) <= 2
        share = next(r.ev_share_e6 for r in rows if r.component == c)
        assert abs(share - round(nrm / tv * 1e6)) <= 2
        evs.append(ev)

    # long-horizon regime: near-orthogonal directions spanning the
    # eigh top subspace, with non-increasing Rayleigh estimates (the
    # ordering is only guaranteed once components CONVERGE — at few
    # rounds on this flat synthetic spectrum, deflating a half-aligned
    # b1 legitimately leaves component 3 a bigger Rayleigh than 2)
    rows30 = R11.emb_top_pcs(
        spark, SF_SMOKE, components=2, rounds=30
    ).collect()
    evs30 = [
        next(r.eigenvalue_e6 for r in rows30 if r.component == c)
        for c in (1, 2)
    ]
    assert evs30 == sorted(evs30, reverse=True)
    B = np.stack([
        np.array([
            r.loading for r in sorted(
                (r for r in rows30 if r.component == c),
                key=lambda r: r.pos,
            )
        ])
        for c in (1, 2)
    ])
    assert abs(float(B[0] @ B[1])) < 0.05
    S = Xc.T @ Xc
    top2 = np.linalg.eigh(S)[1][:, -2:]
    # each extracted direction lies (almost) in the eigh top-2 span
    for i in range(2):
        proj = top2 @ (top2.T @ B[i])
        assert float(np.linalg.norm(proj)) > 0.85
