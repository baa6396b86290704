"""Deterministic convergence tests for the iterative k-means loop."""

from __future__ import annotations

import pytest


def _clustered_df(spark):
    # two tight clusters around (0,...,0) and (10,...,10), 4-dim;
    # labels deliberately WRONG for 4 of 20 points so the label-mean
    # init starts displaced and the loop has real work to do
    rows = []
    for i in range(10):
        off = (i % 5) * 0.1
        rows.append((i, [0.0 + off] * 4, 0 if i < 8 else 1))
    for i in range(10, 20):
        off = (i % 5) * 0.1
        rows.append((i, [10.0 + off] * 4, 1 if i < 18 else 0))
    return spark.createDataFrame(rows, "vec_id long, v array<double>, label int")


def test_kmeans_converges_to_true_means(spark):
    import numpy as np

    from jobsity_data_pipeline_spark.operators.kmeans import kmeans_fit

    emb = _clustered_df(spark)
    C, iters, delta = kmeans_fit(spark, emb, max_iter=20, tol=1e-9)
    assert 1 < iters < 20  # mislabeled init forces >1 round, then stops
    assert delta < 1e-9
    true0 = np.mean([[0.0 + (i % 5) * 0.1] * 4 for i in range(10)], axis=0)
    true1 = np.mean([[10.0 + (i % 5) * 0.1] * 4 for i in range(10, 20)], axis=0)
    np.testing.assert_allclose(C[0], true0, atol=1e-12)
    np.testing.assert_allclose(C[1], true1, atol=1e-12)


def test_kmeans_deterministic_across_runs(spark):
    import numpy as np

    from jobsity_data_pipeline_spark.operators.kmeans import kmeans_fit

    emb = _clustered_df(spark)
    C1, i1, _ = kmeans_fit(spark, emb)
    C2, i2, _ = kmeans_fit(spark, emb)
    assert i1 == i2
    np.testing.assert_array_equal(C1, C2)


def test_assign_cells_matches_numpy(spark):
    import numpy as np

    from jobsity_data_pipeline_spark.operators.kmeans import assign_cells

    emb = _clustered_df(spark)
    C = np.array([[0.2] * 4, [10.2] * 4])
    got = {r.vec_id: r.cell for r in assign_cells(spark, emb, C).collect()}
    assert all(got[i] == 0 for i in range(10))
    assert all(got[i] == 1 for i in range(10, 20))


def test_emb_kmeans_fit_table(spark):
    from jobsity_data_pipeline_spark.operators.kmeans import emb_kmeans_fit

    df = emb_kmeans_fit(spark, "/root/testdata/sf0.001", max_iter=3)
    rows = df.collect()
    # k labels x 64 dims
    assert len(rows) == len({(r.cell, r.pos) for r in rows})
    assert len({r.cell for r in rows}) >= 2


def test_pq_train_codebooks_shape_and_improvement(spark):
    """Trained per-subspace codebooks: full (subspace, code, pos) grid,
    global pos indexing, and a recall@k at least as good as the
    label-centroid codebooks at the SAME scan fraction (codes-only ADC,
    no rerank) — the reason to train at all."""
    from pyspark.sql import functions as F

    from jobsity_data_pipeline_spark.operators.kmeans import (
        pq_train_codebooks,
    )
    from jobsity_data_pipeline_spark.session import read_table
    from tests.conftest import SF_SMOKE

    emb = read_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    rows = pq_train_codebooks(spark, emb, n_subspaces=4, n_codes=8,
                              iters=2).collect()
    assert len(rows) == 4 * 8 * 16
    assert {r[0] for r in rows} == set(range(4))
    assert {r[1] for r in rows} == set(range(8))
    # pos is the GLOBAL dim index: subspace s covers [16s, 16s+16)
    for s, c, pos, _ in rows:
        assert s * 16 <= pos < (s + 1) * 16

    from jobsity_data_pipeline_spark.operators.relational8 import (
        emb_pq_ann,
        emb_pq_trained_ann,
    )
    from jobsity_data_pipeline_spark.operators.similarity import (
        emb_cosine_topk,
    )

    exact = {
        (r.qid, r.nid)
        for r in emb_cosine_topk(spark, SF_SMOKE, 8, 5).collect()
    }
    plain = {
        (r.qid, r.vec_id)
        for r in emb_pq_ann(spark, SF_SMOKE, 8, 5).collect()
    }
    trained = {
        (r.qid, r.vec_id)
        for r in emb_pq_trained_ann(spark, SF_SMOKE, 8, 5).collect()
    }
    assert len(trained & exact) >= len(plain & exact)
    assert len(trained & exact) > 0


def test_emb_kmeans_fit_exact_tracks_float_fit(spark):
    """The engine-exact fixed-round fit (driver-contract key) must
    stay within rounding distance of the float Lloyd fit at the same
    round budget: identical init, same assignment rule, only 6-dp
    centroid rounding and micro-unit argmin pinning differ."""
    from jobsity_data_pipeline_spark.operators.kmeans import (
        emb_kmeans_fit,
        emb_kmeans_fit_exact,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r.cell, r.pos): r.centroid
        for r in emb_kmeans_fit_exact(spark, sf, rounds=2).collect()
    }
    flt = {
        (r.cell, r.pos): r.centroid
        for r in emb_kmeans_fit(spark, sf, max_iter=2, tol=0.0).collect()
    }
    assert set(exact) == set(flt)
    worst = max(abs(exact[k] - flt[k]) for k in exact)
    # 2 rounds of 6-dp rounding can drift at most a few 1e-6 per round
    # unless an assignment flips; no flip happens on this corpus
    assert worst < 1e-3, worst
