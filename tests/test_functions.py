"""Property/unit tests for the expression libraries (hashing, text,
vectors) — cross-checked against plain-Python reference implementations
on hypothesis-generated inputs.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from jobsity_data_pipeline_spark.functions import text as TX
from jobsity_data_pipeline_spark.functions.hashing import (
    hamming32,
    record_key,
    simhash32,
    token_hashes32,
)

WORDS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=0, max_size=30
)


def _py_tokens(s: str) -> list[str]:
    return [t for t in __import__("re").split(r"\s+", s) if t != ""]


def _py_simhash32(tokens: list[str]) -> int:
    hashes = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in tokens]
    out = 0
    for bit in range(32):
        vote = sum(1 if (h >> bit) & 1 else -1 for h in hashes)
        if vote > 0:
            out |= 1 << bit
    return out


@settings(max_examples=12, deadline=None)
@given(WORDS)
def test_simhash_matches_python(spark, words):
    text = " ".join(words)
    df = spark.createDataFrame([Row(text=text)])
    toks = df.select(TX.tokens("text").alias("tk"))
    hashed = toks.select(token_hashes32(F.col("tk")).alias("th"))
    got = hashed.select(simhash32(F.col("th")).alias("sh")).first().sh
    assert got == _py_simhash32(_py_tokens(text))


@settings(max_examples=12, deadline=None)
@given(st.text(alphabet="ab \t\nxyz.", max_size=60))
def test_tokens_match_python(spark, text):
    df = spark.createDataFrame([Row(text=text)])
    got = df.select(TX.tokens("text").alias("t")).first().t
    assert got == _py_tokens(text)


def test_record_key_is_md5_of_pipe_join(spark):
    df = spark.createDataFrame([Row(a="x", b="y")])
    got = df.select(record_key("a", "b").alias("k")).first().k
    assert got == hashlib.md5(b"x|y").hexdigest()


def test_hamming32(spark):
    df = spark.createDataFrame([Row(a=0b1011, b=0b0001)])
    got = df.select(hamming32(F.col("a"), F.col("b")).alias("h")).first().h
    assert got == 2


def test_shingles_window(spark):
    df = spark.createDataFrame([Row(text="a b c d e")])
    staged = df.select(TX.tokens("text").alias("tk"))
    got = staged.select(
        TX.shingles_from_tokens(F.col("tk"), 4).alias("s")
    ).first().s
    assert got == ["a b c d", "b c d e"]
    short = spark.createDataFrame([Row(text="a b c")])
    got2 = (
        short.select(TX.tokens("text").alias("tk"))
        .select(TX.shingles_from_tokens(F.col("tk"), 4).alias("s"))
        .first()
        .s
    )
    assert got2 == []


def test_lang_id_basics(spark):
    rows = [
        Row(text="the cat and the dog is on it"),
        Row(text="el que la de y en un por"),
        Row(text="我是人了的"),
        Row(text="qqq zzz www"),
    ]
    df = spark.createDataFrame(rows)
    staged = df.select("text", TX.tokens("text").alias("tk"))
    got = [
        r.p
        for r in staged.select(
            TX.lang_id(F.col("text"), F.col("tk")).alias("p")
        ).collect()
    ]
    assert got == ["en", "es", "zh", "und"]


def test_quality_monotonicity(spark):
    good = "the quick brown fox jumps over the lazy dog and it is fine " * 5
    bad = "!!! ??? ### $$$ %%%"
    df = spark.createDataFrame([Row(text=good), Row(text=bad)])
    got = [r.q for r in df.select(TX.quality_score("text").alias("q")).collect()]
    assert got[0] > got[1]


def test_bpe_ish_counts(spark):
    df = spark.createDataFrame([Row(text="hello world42, x!")])
    got = df.select(TX.bpe_ish_token_count("text").alias("n")).first().n
    # hello | world | 42 | , | x | !
    assert got == 6


def test_redact_pii(spark):
    from jobsity_data_pipeline_spark.operators.textops import redact_pii

    df = spark.createDataFrame(
        [Row(text="mail a.b+c@ex-1.com or call 555-123-4567 ok")]
    )
    got = df.select(redact_pii("text").alias("t")).first().t
    assert got == "mail <EMAIL> or call <PHONE> ok"


def test_ivf_ann_structure_and_recall(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    ivf = {(r.qid, r.nid) for r in E.queries()["emb_ivf_ann"](spark, sf).collect()}
    exact = {(r.qid, r.nid) for r in E.queries()["emb_cosine_topk"](spark, sf).collect()}
    assert len(ivf) > 0
    # approximate: some overlap with exact neighbors, never more rows
    assert len(ivf & exact) / len(exact) >= 0.2
    assert len(ivf) <= len(exact)


def test_ngram_jaccard_hot_shingle_cap(spark, tmp_path):
    from jobsity_data_pipeline_spark.operators.dedup import docs_ngram_jaccard

    # 60 docs sharing an 8-token boilerplate prefix + unique tails: the
    # 5 boilerplate shingles have doc-frequency 60 and would alone fan
    # the self-join out to 60^2 rows each at scale
    shared = " ".join(f"s{i}" for i in range(8))
    rows = [(i, f"{shared} u{i}a u{i}b u{i}c u{i}d") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    # capped (default 50): hot shingles dropped, no surviving overlap
    assert docs_ngram_jaccard(spark, str(tmp_path)).count() == 0
    # cap disabled: every pair shares the boilerplate (jaccard 5/13)
    uncapped = docs_ngram_jaccard(spark, str(tmp_path), max_doc_freq=10**9)
    assert uncapped.count() == 60 * 59 // 2


def test_simhash_banded_retrieval_is_exhaustive(spark):
    """Pigeonhole guarantee: every pair within hamming distance 3 of
    32-bit simhashes shares one of the 4 8-bit bands, so the banded
    equi-join must find EXACTLY the brute-force pair set."""
    from pyspark.sql import functions as F

    from jobsity_data_pipeline_spark.operators.dedup import (
        docs_simhash,
        docs_simhash_pairs,
    )
    from tests.conftest import SF_SMOKE

    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in docs_simhash_pairs(spark, SF_SMOKE).collect()
    }
    sims = docs_simhash(spark, SF_SMOKE)
    a = sims.select(F.col("doc_id").alias("da"), F.col("simhash").alias("sa"))
    b = sims.select(F.col("doc_id").alias("db"), F.col("simhash").alias("sb"))
    brute = {
        (r.da, r.db, r.h)
        for r in a.join(b, F.col("da") < F.col("db"))
        .select(
            "da",
            "db",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int").alias("h"),
        )
        .where(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute
    assert len(banded) > 0


def test_char_entropy_bounds(spark):
    """Shannon entropy of a char distribution lies in [0, log2(alphabet
    size)]; uniform text hits the top, single-char text hits 0."""
    from jobsity_data_pipeline_spark.operators import textops as TO

    df = spark.createDataFrame(
        [(1, "aaaa", "x", "s", 4), (2, "abab", "x", "s", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import jobsity_data_pipeline_spark.operators.textops as tmod
    orig = tmod._docs
    tmod._docs = lambda spark, sf_dir: df
    try:
        rows = TO.docs_char_entropy(spark, "ignored").collect()
    finally:
        tmod._docs = orig
    assert len(rows) == 1
    r = rows[0]
    assert r.min_entropy_bits == 0.0   # "aaaa"
    assert r.max_entropy_bits == 1.0   # "abab": two equiprobable chars


def test_geohash_known_vectors(spark):
    from jobsity_data_pipeline_spark.functions.geo import geohash

    df = spark.createDataFrame(
        [
            (57.64911, 10.40744),  # classic wiki example
            (48.669, -4.329),
            (0.0, 0.0),
            (90.0, 180.0),   # upper edge clamps to all-1 bits
            (-90.0, -180.0),
        ],
        "lat double, lon double",
    )
    out = [
        r.gh for r in df.select(
            geohash(F.col("lat"), F.col("lon"), 11).alias("gh")
        ).collect()
    ]
    assert out == [
        "u4pruydqqvj", "gbsuv7ztqzp", "s0000000000",
        "zzzzzzzzzzz", "00000000000",
    ]
    # prefix containment: coarser precision is a strict prefix
    out5 = [
        r.gh for r in df.select(
            geohash(F.col("lat"), F.col("lon"), 5).alias("gh")
        ).collect()
    ]
    assert all(full.startswith(p5) for full, p5 in zip(out, out5))


class TestKmvOverlapProperties:
    """Hypothesis: KMV pair set-algebra is EXACT whenever the union
    sketch holds every distinct hash (k >= |A ∪ B|) — for any two
    integer key sets."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    def _overlap(spark, a, b, k):
        from pyspark.sql import functions as F

        from jobsity_data_pipeline_spark.operators.relational14 import (
            kmv_pair_overlap, kmv_sketches,
        )

        du = spark.createDataFrame(
            [("A", u) for u in sorted(a)] + [("B", u) for u in sorted(b)],
            "event_type string, user_id long",
        )
        rows = kmv_pair_overlap(kmv_sketches(du, k=k), k=k).collect()
        return rows[0] if rows else None

    @given(
        a=st.sets(st.integers(0, 200), min_size=1, max_size=30),
        b=st.sets(st.integers(0, 200), min_size=1, max_size=30),
    )
    @settings(max_examples=8, deadline=None)
    def test_exact_when_union_fits(self, spark, a, b):
        r = self._overlap(spark, a, b, k=128)
        union, inter = len(a | b), len(a & b)
        # md5-prefix collisions between distinct keys are possible in
        # principle (~2^-32) but not at these sizes
        assert r["kmv_union_est"] == float(union)
        assert r["kmv_inter_est"] == float(inter)
        assert r["kmv_jaccard_pm"] == (
            2 * 1000 * inter + union) // (2 * union)
