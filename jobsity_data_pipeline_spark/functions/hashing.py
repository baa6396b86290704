"""Deterministic hashing primitives for dedup: MinHash, SimHash, keys.

Everything is built on ``md5`` of UTF-8 strings because its hex output
is byte-identical across Spark, DuckDB, and Python — which lets the
DuckDB oracle replicate signatures exactly. A seeded "permutation" is
``md5(seed || '|' || value)``; the MinHash element is the lexicographic
MIN of those hex strings (a min over a uniform hash is a valid min-hash
regardless of whether you compare as int or hex).

Scale: each doc's signature is computed with array expressions only
(no explode, no UDF); the LSH band join shuffles once on the band
bucket key — never an all-pairs comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def record_key(*cols: Column | str) -> Column:
    """Deterministic business key: md5 over '|'-joined columns.

    Mirrors the reference's ``trip_key = CONCAT(region, origin_coord,
    destination_coord, date_time, datasource)`` (populate_postgres.sql:
    10-13) but hashed so the key is fixed-width at 100 TB scale.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.md5(F.concat_ws("|", *cs))


def minhash_signature(shingles_col: Column, num_hashes: int = 16) -> Column:
    """Array of ``num_hashes`` min-hash elements over a shingle array.

    Element i = min over shingles of md5(i || '|' || shingle). Null-safe:
    empty shingle arrays produce an array of nulls (callers filter).
    """
    def seeded(i: int):
        # closure factory: a plain 1-arg lambda (a 2-arg lambda would be
        # interpreted by Spark as the (element, index) form)
        return lambda s: F.md5(F.concat_ws("|", F.lit(str(i)), s))

    return F.array(
        *[F.array_min(F.transform(shingles_col, seeded(i))) for i in range(num_hashes)]
    )


def lsh_bands(sig_col: Column, num_bands: int = 4, rows_per_band: int = 4) -> Column:
    """Array of (band_id, band_hash) structs for LSH bucketing.

    Docs sharing ANY band hash become candidate pairs via an equi-join
    on (band_id, band_hash) — a single hash shuffle, never O(n^2).
    """
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|", *[sig_col[b * rows_per_band + r] for r in range(rows_per_band)]
                    )
                ).alias("band_hash"),
            )
            for b in range(num_bands)
        ]
    )


def token_hashes32(tokens_col: Column) -> Column:
    """Map a string array to 32-bit int hashes (first 8 hex of md5).

    Materialize this ONCE (withColumn) before calling simhash32 so the
    md5s aren't re-evaluated per bit position.
    """
    return F.transform(
        tokens_col, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )


def simhash32(hashes_col: Column) -> Column:
    """32-bit SimHash over an array<long> of 32-bit token hashes.

    Each bit of each hash votes +1/-1; result bit is 1 iff the vote sum
    is positive. Pure array expressions (aggregate per bit over the
    pre-hashed int array) — JVM-side, oracle-replicable via range(32).
    """
    def voter(mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    out = F.lit(0).cast("long")
    for bit in range(32):
        vote = F.aggregate(hashes_col, F.lit(0), voter(1 << bit))
        out = out + F.when(vote > 0, F.lit(1 << bit)).otherwise(F.lit(0)).cast("long")
    return out


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
