"""Invariant tests for the round-3 curation wave (operators/relational9)
and the grouped distributed NTILE it rides on.

Cross-engine value parity is covered by tests/test_oracle_parity.py;
these tests pin what parity can't: the grouped NTILE's bit-equality
with the window spec it replaces, semdedup's accounting identities, and
the keep-lowest-id rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jobsity_data_pipeline_spark.operators import relational9 as R9
from jobsity_data_pipeline_spark.operators.ranking import distributed_ntile
from tests.conftest import SF_SMOKE


def test_grouped_ntile_matches_window_spec(spark):
    # the distributed grouped NTILE must equal
    # NTILE(k) OVER (PARTITION BY g ORDER BY v DESC, id) exactly —
    # including the remainder rule and tie-breaks — on a frame with
    # heavy ties and uneven group sizes.
    rows = [
        (g, i, float(v))
        for g in ("a", "b", "c")
        for i, v in enumerate([5, 5, 5, 3, 3, 2, 2, 2, 2, 1, 1][: 11 - 2 * ord(g) % 3])
    ]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
    want = df.withColumn("t", F.ntile(4).over(w))
    wl = {(r.g, r.id): r.t for r in want.collect()}
    # both blocking modes must be bit-equal to the window spec —
    # exact_values (value class x tiebreak range) is the heavy-tie path
    for exact in (False, True):
        got = distributed_ntile(
            df, 4, "v", ["id"], descending=True, blocks=4,
            out_col="t", group_cols=["g"], exact_values=exact,
        )
        gl = {(r.g, r.id): r.t for r in got.collect()}
        assert gl == wl, f"exact_values={exact}"


def test_grouped_ntile_plan_has_no_single_partition_sort(spark):
    df = spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").alias("id"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    got = distributed_ntile(
        df, 3, "v", ["id"], blocks=8, out_col="t", group_cols=["g"]
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_semdedup_accounting(spark):
    rows = R9.emb_semdedup(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_kept + r.n_removed == r.n_vecs
        assert r.n_removed <= r.n_dup_pairs
        if r.n_dup_pairs > 0:
            # reported mean duplicate cosine must clear the gate
            assert r.avg_dup_cos >= R9.SEMDEDUP_TAU
        else:
            assert r.avg_dup_cos is None and r.n_removed == 0


def test_semdedup_keep_lowest_id_rule(spark):
    # keep-lowest-id: removed = vectors appearing as the HIGHER id of a
    # duplicate pair — re-derive the dup pairs with numpy at the
    # operator's tau and check both the removed count and that the
    # minimum vec_id of every cluster is never removed.
    import numpy as np

    rows = R9._assigned(spark, SF_SMOKE).collect()
    per_cl = {r.cl: r.n_vecs for r in R9.emb_semdedup(spark, SF_SMOKE).collect()}
    assert sum(per_cl.values()) == len(rows)

    by_cl = {}
    for r in rows:
        by_cl.setdefault(r.cl, []).append((r.vec_id, np.array(r.v)))
    want_removed = {}
    for cl, vs in by_cl.items():
        vs.sort()
        removed = set()
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                a, b = vs[i][1], vs[j][1]
                na, nb = np.linalg.norm(a), np.linalg.norm(b)
                cos = float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0
                if round(cos, 6) >= R9.SEMDEDUP_TAU:
                    removed.add(vs[j][0])  # higher id of the pair
        # cluster-min id is never the higher element of any pair
        assert min(v for v, _ in vs) not in removed
        want_removed[cl] = len(removed)
    got = {r.cl: r.n_removed for r in R9.emb_semdedup(spark, SF_SMOKE).collect()}
    assert got == want_removed


def test_quality_tiers_shapes(spark):
    rows = R9.docs_quality_tiers(spark, SF_SMOKE).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, {})[r.tier] = r
    for src, tiers in by_src.items():
        assert set(tiers) <= {1, 2, 3}
        # NTILE remainder rule: tier sizes differ by at most 1
        sizes = [t.n_docs for t in tiers.values()]
        assert max(sizes) - min(sizes) <= 1
        # head quality dominates tail quality
        if 1 in tiers and 3 in tiers:
            assert tiers[1].min_quality >= tiers[3].max_quality
        names = {t.tier: t.tier_name for t in tiers.values()}
        assert names.get(1, "head") == "head"
        assert names.get(3, "tail") == "tail"


def test_ivfpq_ann_invariants(spark):
    from jobsity_data_pipeline_spark.operators.similarity import (
        emb_ivfpq_ann,
    )

    rows = emb_ivfpq_ann(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert len(rs) <= 5
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        # ADC distances ascend with rank; self never returned
        adcs = [r.adc for r in rs]
        assert adcs == sorted(adcs)
        assert all(r.vec_id != qid for r in rs)


def test_semdedup_plan_has_no_corpus_pair_join(spark):
    # all-pairs work must stay inside the per-cluster applyInPandas
    # groups; the only joins in the plan are equi-joins (candidates
    # back to vectors, per-cluster aggregates) — never a cartesian /
    # nested-loop pair join over the corpus.
    from jobsity_data_pipeline_spark.operators.relational9 import (
        emb_semdedup,
    )

    df = emb_semdedup(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_values_requires_tiebreak():
    import pytest

    from jobsity_data_pipeline_spark.operators.ranking import (
        distributed_ntile,
    )

    # without a tiebreak, every tied value class would funnel through
    # one task — the mode must refuse loudly, not silently degrade
    with pytest.raises(ValueError, match="tiebreak"):
        distributed_ntile(None, 3, "v", [], exact_values=True)


def test_exact_values_string_tiebreak_matches_window(spark):
    # a non-numeric first tiebreak must NOT silently cast to null
    # (collapsing each value class to one block): the monotone
    # byte-prefix projection keeps blocking correct for strings,
    # bit-equal to the window spec including shared-prefix ties.
    rows = [
        (i, float(v), s)
        for i, (v, s) in enumerate(
            [(5, "apple"), (5, "apricot"), (5, "banana"), (5, "apple2"),
             (3, "cherry"), (3, "apple"), (2, "zz"), (2, "aa"),
             (2, "longsharedprefix-a"), (2, "longsharedprefix-b"),
             (1, "x"), (1, "y")]
        )
    ]
    df = spark.createDataFrame(rows, "id int, v double, s string")
    w = Window.orderBy(F.col("v").desc(), F.col("s").asc())
    want = {r.id: r.t for r in
            df.withColumn("t", F.ntile(4).over(w)).collect()}
    got = distributed_ntile(
        df, 4, "v", ["s"], descending=True, blocks=4,
        out_col="t", exact_values=True,
    )
    assert {r.id: r.t for r in got.collect()} == want


def test_exact_values_unsupported_tiebreak_type_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, 1.0, [1])], "id int, v double, arr array<int>"
    )
    with pytest.raises(ValueError, match="unsupported type"):
        distributed_ntile(df, 2, "v", ["arr"], exact_values=True)


def test_cluster_pairs_blocked_equals_single_task(spark):
    """A cluster above MAX_CLUSTER_BLOCK_ROWS must sub-block into a
    pair join yet produce exactly the candidate set of the one-task
    plan: one artificial giant cluster (120 rows, cap 16 -> 8 blocks,
    36 block-pair tasks) plus a small control cluster, compared
    against the uncapped run and a numpy brute force."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    vecs = {}
    for i in range(120):
        v = rng.normal(size=8)
        vecs[i] = v
        rows.append((i, 0, [float(x) for x in v]))
    for i in range(120, 130):
        v = rng.normal(size=8)
        vecs[i] = v
        rows.append((i, 1, [float(x) for x in v]))
    asg = spark.createDataFrame(
        rows, "vec_id long, cl int, v array<double>"
    )
    tau = 0.3
    blocked = {
        (r.cl, r.vec_a, r.vec_b)
        for r in R9._cluster_pairs(asg, tau, max_block_rows=16).collect()
    }
    single = {
        (r.cl, r.vec_a, r.vec_b)
        for r in R9._cluster_pairs(asg, tau, max_block_rows=10**9).collect()
    }
    assert blocked == single
    # brute force at the prefilter threshold contains every true pair
    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0

    by_cl = {0: range(120), 1: range(120, 130)}
    want_true = {
        (cl, i, j)
        for cl, ids in by_cl.items()
        for i in ids
        for j in ids
        if i < j and cos(vecs[i], vecs[j]) >= tau
    }
    assert want_true <= blocked  # margin never drops a true pair
    # and nothing below the margin sneaks in
    for cl, a, b in blocked:
        assert cos(vecs[a], vecs[b]) >= tau - 1e-3
