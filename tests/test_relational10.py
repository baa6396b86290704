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
