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


def _py_bpe_merges(sf_dir: str, vocab_cap: int, rounds: int):
    """Textbook Sennrich BPE trainer on the word-frequency table —
    greedy left-to-right merge, max-count pair with (left, right)
    lexicographic tie-break — independent of both engines."""
    words = Counter()
    for (txt,) in duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall():
        words.update(t for t in re.split(r"\s+", txt) if t != "")
    top = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap]
    seqs = {w: [*w, "</w>"] for w, _ in top}
    freqs = dict(top)
    merges = []
    for rnd in range(1, rounds + 1):
        counts = Counter()
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] += freqs[w]
        if not counts:
            break
        (p1, p2), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rnd, p1, p2, cnt))
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == p1 and seq[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_merges_match_textbook_trainer(spark):
    from jobsity_data_pipeline_spark.operators.textops import (
        BPE_ROUNDS,
        BPE_VOCAB_CAP,
        docs_bpe_merges,
    )

    got = sorted(tuple(r) for r in docs_bpe_merges(spark, SF_SMOKE).collect())
    want = sorted(_py_bpe_merges(SF_SMOKE, BPE_VOCAB_CAP, BPE_ROUNDS))
    assert got == want
    assert len(got) == BPE_ROUNDS


def test_bpe_merge_handles_overlapping_runs(spark):
    """The xx-in-xxxx overlap case: greedy left-to-right must merge
    floor(run/2) pairs from the left — pinned on literal frames
    through the REAL merge helper (both the tuple fast-path and the
    broadcast pair-frame path), including a mid-word run restart."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from jobsity_data_pipeline_spark.operators.textops import _bpe_apply_pair

    words = ["aaaa", "baa", "aabaaa"]
    df = spark.createDataFrame(
        [
            (w, 1, i, s)
            for w in words
            for i, s in enumerate([*w, "</w>"])
        ],
        "w string, freq long, pos int, sym string",
    )
    w_order = Window.partitionBy("w").orderBy("pos")
    adj = df.withColumn("nxt", F.lead("sym").over(w_order))
    expected = {
        "aaaa": ["aa", "aa", "</w>"],
        "baa": ["b", "aa", "</w>"],
        "aabaaa": ["aa", "b", "aa", "a", "</w>"],
    }
    for pair in (
        ("a", "a"),
        spark.createDataFrame([("a", "a")], "ls string, rs string"),
    ):
        out = (
            _bpe_apply_pair(adj, pair)
            .orderBy("w", "pos")
            .collect()
        )
        by_word = {}
        for r in out:
            by_word.setdefault(r.w, []).append(r.sym)
        assert by_word == expected
        # positions renumber densely for the next round
        for w in words:
            n = len(expected[w])
            assert [r.pos for r in out if r.w == w] == list(range(n))


def test_bpe_encode_matches_textbook_encoder(spark):
    """Apply the textbook trainer's merges with a textbook encoder and
    compare per-doc token accounting — independent of both engines."""
    from jobsity_data_pipeline_spark.operators.textops import (
        BPE_ROUNDS,
        BPE_VOCAB_CAP,
        docs_bpe_encode,
    )

    merges = [
        (p1, p2) for _, p1, p2, _ in
        _py_bpe_merges(SF_SMOKE, BPE_VOCAB_CAP, BPE_ROUNDS)
    ]

    def encode_len(word: str) -> int:
        seq = [*word, "</w>"]
        for p1, p2 in merges:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == p1 and seq[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        # marker counts out only if it survived unmerged at the end
        return len(seq) - (1 if seq and seq[-1] == "</w>" else 0)

    want = {}
    for doc_id, txt in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall():
        toks = [t for t in re.split(r"\s+", txt) if t != ""]
        if not toks:
            continue
        ws = len(toks)
        bpe = sum(encode_len(t) for t in toks)
        want[doc_id] = (ws, bpe, (2 * 1000 * bpe + ws) // (2 * ws))

    got = {
        r.doc_id: (r.ws_tokens, r.bpe_tokens, r.expansion_permille)
        for r in docs_bpe_encode(spark, SF_SMOKE).collect()
    }
    assert got == want
