"""Round-9 wave tests: the trained quality classifier (pure-Python
replay of the exact integer/double recurrence), KMV set-algebra
overlap, and the SES forecast backtest."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from jobsity_data_pipeline_spark.operators import relational14 as R14
from tests.conftest import SF_SMOKE


def _py_features(sf_dir: str):
    """Independent feature extraction (DuckDB staging + pure-Python
    rule replay) mirroring relational14._qc_features' contract."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    rows = con.execute("""
        WITH staged AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '#|\\.\\.\\.'))
                       AS n_symbols,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               t -> t <> '') AS tk
            FROM documents),
        ws AS (
            SELECT doc_id, count(*) AS n_words,
                   CAST(sum(length(w)) AS BIGINT) AS char_sum,
                   CAST(sum(CASE WHEN regexp_matches(w, '[A-Za-z]')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_alpha,
                   count(DISTINCT CASE WHEN w IN
                       ('the','and','of','to','a','in','is','it',
                        'for','on') THEN w END) AS n_stop
            FROM (SELECT doc_id, unnest(tk) AS w FROM staged)
            GROUP BY doc_id)
        SELECT s.doc_id, CAST(s.n_symbols AS BIGINT),
               coalesce(ws.n_words, 0), coalesce(ws.char_sum, 0),
               coalesce(ws.n_alpha, 0), coalesce(ws.n_stop, 0)
        FROM staged s LEFT JOIN ws USING (doc_id)
    """).fetchall()
    feats = []
    for _, nsym, n, cs, na, nst in rows:
        keep = (
            50 <= n <= 100_000
            and cs >= 3 * n and cs <= 10 * n and n > 0
            and 10 * nsym <= n
            and 10 * na >= 8 * n
            and nst >= 2
        )
        feats.append((
            1_000_000 if keep else 0,
            (1000,
             min(n, 100) * 10 - 500,
             min((cs * 100) // max(n, 1), 1000) - 450,
             (na * 1000) // max(n, 1) - 800,
             min((nsym * 1000) // max(n, 1), 1000) - 100,
             min(nst, 10) * 100 - 150),
        ))
    return feats


def _py_train(feats, lr: float, rounds: int):
    """The classifier recurrence in pure Python — the third
    independent implementation (next to the Spark plan and the
    DuckDB oracle) of the exact same integer/double arithmetic."""
    w = [0.0] * 6
    out = []
    n = len(feats)
    for r in range(rounds + 1):
        g = [0] * 6
        agree = 0
        pred_pos = 0
        for y, xs in feats:
            z = 0.0
            for wj, xj in zip(w, xs):
                z = z + wj * (xj / 1000.0)
            p = 0.5 + (0.5 * z) / (1.0 + abs(z))
            pe6 = math.floor(p * 1e6 + 0.5)
            if pe6 >= 500_000:
                pred_pos += 1
            if (pe6 >= 500_000) == (y == 1_000_000):
                agree += 1
            for j in range(6):
                g[j] += (pe6 - y) * xs[j]
        out.append((r, *w, pred_pos, (2 * 1000 * agree + n) // (2 * n)))
        w = [
            R14._halfup6(w[j] - lr * (g[j] / (n * 1e9)))
            for j in range(6)
        ]
    return out


class TestQualityClassifier:
    def test_matches_python_replay_exactly(self, spark):
        got = [
            tuple(r)
            for r in R14.docs_quality_classifier(spark, SF_SMOKE)
            .orderBy("round").collect()
        ]
        want = _py_train(
            _py_features(SF_SMOKE), R14.QC_LR, R14.QC_ROUNDS
        )
        assert got == want  # bit-for-bit: weights, yield, agreement

    def test_training_improves_agreement(self, spark):
        rows = (
            R14.docs_quality_classifier(spark, SF_SMOKE)
            .orderBy("round").collect()
        )
        first, last = rows[0], rows[-1]
        # round 0 is the zero-weight majority baseline; the trained
        # model must clearly beat it (distilling two active rules)
        assert last["agree_permille"] >= first["agree_permille"] + 100
        assert last["agree_permille"] >= 800

    def test_round0_is_zero_weights(self, spark):
        r0 = (
            R14.docs_quality_classifier(spark, SF_SMOKE)
            .where(F.col("round") == 0).collect()[0]
        )
        for wn in R14.QC_WEIGHTS:
            assert r0[wn] == 0.0
        # zero weights => p = 0.5 => everything predicted positive
        total = (
            R14._qc_features(spark, SF_SMOKE).count()
        )
        assert r0["pred_pos"] == total

    def test_halfup6_sign_symmetry(self):
        assert R14._halfup6(0.0000005) == 0.000001
        assert R14._halfup6(-0.0000005) == -0.000001
        assert R14._halfup6(1.2345674) == 1.234567
        assert R14._halfup6(-1.2345674) == -1.234567
