"""Near-duplicate detection over ``documents``: n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design: nothing here is ever all-pairs on the full corpus —
candidates come from equi-joins on shingle / band-hash / simhash-band
keys (one hash shuffle each), and the exact Jaccard verify runs only on
candidate pairs. At 100 TB the only knobs are the shingle width, the
number of bands, and a frequency cap on hot shingles (drop shingles
shared by >F docs before the self-join to bound skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.hashing import lsh_bands, minhash_signature, simhash32, token_hashes32
from ..session import read_table

SHINGLE_K = 4
NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = 4


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.array_distinct(TX.shingles("text", SHINGLE_K)).alias("sh")
    ).where(F.size("sh") > 0)


def docs_ngram_jaccard(spark: SparkSession, sf_dir: str,
                       threshold: float = 0.12) -> DataFrame:
    """N-gram-shingle Jaccard near-dup pairs (doc_a < doc_b).

    Explode distinct shingles -> self-equi-join on shingle (shuffle on
    the shingle key; Catalyst plans a shuffled hash join) -> count
    common -> Jaccard = common / (|A| + |B| - common). The join fans out
    only where shingles collide, so cost tracks true overlap, not n^2.
    """
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    exploded = sh.select("doc_id", F.explode("sh").alias("shingle"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def docs_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash LSH band hashes (doc_id, band_id, band_hash).

    The signature is NUM_HASHES md5-permutation minima computed with
    array expressions (no explode); bands hash ROWS_PER_BAND signature
    rows together. This is the shuffle key for candidate generation.
    """
    sh = _doc_shingles(spark, sf_dir)
    sig = sh.select(
        "doc_id", minhash_signature(F.col("sh"), NUM_HASHES).alias("sig")
    )
    banded = sig.select(
        "doc_id",
        F.explode(lsh_bands(F.col("sig"), NUM_BANDS, ROWS_PER_BAND)).alias("band"),
    )
    return banded.select(
        "doc_id",
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_hash").alias("band_hash"),
    )


def docs_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing >=1 band bucket.

    Equi-join on (band_id, band_hash) — one shuffle, never all-pairs.
    Downstream exact-Jaccard verify would run on exactly these pairs.
    """
    bands = docs_minhash_bands(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit SimHash over whitespace tokens.

    Token hashes are materialized once per doc (token_hashes32), then
    the 32 bit-votes aggregate over that small int array — single scan,
    no shuffle. Near-dup retrieval at scale joins on rotated band keys
    of the simhash (round 2); hamming distance is bit_count(xor).
    """
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", TX.tokens("text").alias("toks"))
    hashed = toks.withColumn("th", token_hashes32(F.col("toks")))
    return hashed.select("doc_id", simhash32(F.col("th")).alias("simhash"))
