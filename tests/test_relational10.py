"""Invariant tests for the round-4 curation wave
(operators/relational10). Cross-engine value parity is covered by
tests/test_oracle_parity.py; these pin the semantics parity can't:
flag consistency, the DSIR separation property, recall bounds, and
cluster accounting.
"""

from __future__ import annotations

from jobsity_data_pipeline_spark.operators import relational10 as R10
from tests.conftest import SF_SMOKE


def test_gopher_flags_consistent(spark):
    rows = R10.docs_gopher_rules(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        flags = (r.word_count_ok, r.mean_word_ok, r.symbol_ok,
                 r.alpha_ok, r.stop_ok)
        assert all(f in (0, 1) for f in flags)
        assert r.keep == (1 if all(flags) else 0)
    # the battery must discriminate: not all docs share one verdict
    keeps = {r.keep for r in rows}
    assert keeps == {0, 1} or len(rows) < 5


def test_dsir_targets_score_higher_on_average(spark):
    rows = R10.docs_dsir_weights(spark, SF_SMOKE).collect()
    assert rows
    t = [r.dsir_weight for r in rows if r.is_target == 1]
    o = [r.dsir_weight for r in rows if r.is_target == 0]
    assert t and o
    # target docs resemble the target LM more than raw docs do —
    # the separation that makes importance resampling work
    assert sum(t) / len(t) > sum(o) / len(o)


def test_matryoshka_recall_bounds(spark):
    rows = R10.emb_matryoshka_recall(spark, SF_SMOKE).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert abs(r.recall_at_k - r.n_hits / 5) < 1e-9
    # truncation keeps SOME signal: not every query loses every hit
    assert any(r.n_hits > 0 for r in rows)


def test_prefix_clusters_account_for_every_doc(spark):
    from jobsity_data_pipeline_spark.session import read_table

    total = read_table(spark, SF_SMOKE, "documents").count()
    rows = R10.docs_prefix_clusters(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.n_docs >= 1 and r.keep_doc_id >= 0


def test_capped_vocab_preserves_totals_and_bounds_broadcast(spark):
    from pyspark.sql import functions as F

    from jobsity_data_pipeline_spark.functions import text as TX
    from jobsity_data_pipeline_spark.session import read_table

    d = read_table(spark, SF_SMOKE, "documents")
    toks = d.select("source", F.explode(TX.tokens("text")).alias("tok"))
    is_t = F.col("source").isin(["src0", "src1"])
    vocab = toks.groupBy("tok").agg(
        F.count("*").alias("r_freq"),
        F.sum(is_t.cast("long")).alias("t_freq"),
    )
    full_v = vocab.count()
    capped = R10.capped_vocab(vocab, 10)
    assert capped.count() <= 11  # head + one <unk> row
    assert full_v > 11  # the cap actually bit on this corpus
    # count mass is preserved exactly (counts are integers)
    a = vocab.agg(F.sum("r_freq"), F.sum("t_freq")).first()
    b = capped.agg(F.sum("r_freq"), F.sum("t_freq")).first()
    assert tuple(a) == tuple(b)
    # the head is the true top-100 by (freq desc, tok)
    want_head = {
        r.tok for r in vocab.orderBy(
            F.col("r_freq").desc(), "tok"
        ).limit(10).collect()
    }
    got_head = {r.tok for r in capped.collect() if r.tok != "<unk>"}
    assert got_head == want_head


def test_dsir_capped_scores_stay_ordered(spark):
    full = {
        r.doc_id: r.dsir_weight
        for r in R10.docs_dsir_weights(spark, SF_SMOKE).collect()
    }
    capped = {
        r.doc_id: r.dsir_weight
        for r in R10.docs_dsir_weights(
            spark, SF_SMOKE, vocab_cap=20
        ).collect()
    }
    assert set(full) == set(capped)
    # capping coarsens scores but must keep the broad target/raw
    # separation: rank correlation of the two scorings stays positive
    import numpy as np

    ids = sorted(full)
    a = np.argsort(np.argsort([full[i] for i in ids]))
    b = np.argsort(np.argsort([capped[i] for i in ids]))
    n = len(ids)
    rho = 1 - 6 * float(((a - b) ** 2).sum()) / (n * (n * n - 1))
    assert rho > 0.5


def test_watermark_lateness_monotone_buckets(spark):
    rows = R10.events_watermark_lateness(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # buckets nest: > 15m implies > 5m implies > 1m implies > 0
        assert r.late_gt_15m <= r.late_gt_5m <= r.late_gt_1m <= r.n_late
        assert r.n_late <= r.n_events
        if r.n_late == 0:
            assert r.max_late_s == 0
        else:
            assert r.max_late_s >= 0
