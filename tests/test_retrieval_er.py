"""Unit tests for the round-5 additions: BM25 lexical retrieval and
blocked edit-distance entity resolution. The oracle-parity gate covers
engine-exactness; these tests pin the SEMANTICS against independent
pure-Python reimplementations (brute-force BM25; textbook Levenshtein
DP) and the structural contracts (blocking cap, ordering, bounds).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb

from jobsity_data_pipeline_spark.operators.dedup import parts_er_pairs
from jobsity_data_pipeline_spark.operators.textops import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    docs_bm25_topk,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def _py_bm25_topk(sf_dir: str, terms, k: int):
    """Brute-force BM25 over the parquet text, independent of both
    engines: python floats, per-term micro-unit rounding, integer sum."""
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    docs = {i: [t for t in re.split(r"\s+", txt) if t != ""] for i, txt in rows}
    docs = {i: t for i, t in docs.items() if t}  # N over docs with >=1 token
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = Counter()
    for toks in docs.values():
        for term in set(toks) & set(terms):
            df[term] += 1
    scores = {}
    for i, toks in docs.items():
        tf = Counter(t for t in toks if t in terms)
        s = 0
        for term, f in tf.items():
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            comp = (
                idf
                * (f * (BM25_K1 + 1.0))
                / (f + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (len(toks) / avgdl)))
            )
            s += round(comp * 1000000.0)
        if s:
            scores[i] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i, s, r + 1) for r, (i, s) in enumerate(top)]


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_bm25_matches_bruteforce(spark):
    got = [tuple(r) for r in docs_bm25_topk(spark, SF_SMOKE).collect()]
    want = _py_bm25_topk(SF_SMOKE, BM25_TERMS, 25)
    assert got == want


def test_bm25_rank_contract(spark):
    rows = docs_bm25_topk(spark, SF_ORACLE).collect()
    assert [r.rnk for r in rows] == list(range(1, 26))
    pairs = [(-r.score_e6, r.doc_id) for r in rows]
    assert pairs == sorted(pairs)
    assert all(r.score_e6 > 0 for r in rows)


def test_er_pairs_scores_match_python_lev(spark):
    rows = parts_er_pairs(spark, SF_ORACLE).collect()
    assert rows, "expected candidate pairs at sf0.01"
    names = dict(
        duckdb.sql(
            f"SELECT p_partkey, p_name FROM '{SF_ORACLE}/part.parquet'"
        ).fetchall()
    )
    for r in sorted(rows, key=lambda r: (r.part_a, r.part_b))[:50]:
        assert r.part_a < r.part_b
        na, nb = names[r.part_a], names[r.part_b]
        lev = _py_lev(na, nb)
        ml = max(len(na), len(nb))
        assert r.lev == lev
        assert r.sim_permille == (2 * 1000 * (ml - lev) + ml) // (2 * ml)
        assert r.sim_permille >= 500


def test_er_block_cap_zero_blocks_everything(spark):
    assert parts_er_pairs(spark, SF_ORACLE, cap=0).count() == 0


def test_er_pairs_require_shared_block(spark):
    """Every emitted pair must share (brand, size, name token) — the
    blocking contract that makes candidate generation an equi-join."""
    rows = parts_er_pairs(spark, SF_ORACLE).collect()
    meta = {
        k: (b, s, set(re.split(r"\s+", n.strip())))
        for k, n, b, s in duckdb.sql(
            f"SELECT p_partkey, p_name, p_brand, p_size"
            f" FROM '{SF_ORACLE}/part.parquet'"
        ).fetchall()
    }
    for r in rows[:200]:
        ba, sa, ta = meta[r.part_a]
        bb, sb, tb = meta[r.part_b]
        assert ba == bb and sa == sb and (ta & tb)
