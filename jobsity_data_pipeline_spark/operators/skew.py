"""Skew-handling join utilities.

AQE's skew-join split handles most cases at runtime; explicit salting is
for the pathological key (one region/null-bucket holding half the data)
where even split partitions overwhelm a task. Salting the big side and
exploding the small side keeps the join an equi-join with S-way key
fan-out — the standard remedy when a broadcast is impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SALT_COL = "__jdp_salt"


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``key``, spreading each hot
    key over ``salt`` sub-keys.

    The big side gets a deterministic salt from md5 of all its columns
    (row identity is NOT needed — any per-row spreader works; hashing
    keeps it deterministic); the small side is exploded salt-fold.
    Output columns match a plain ``big.join(small, key, how)``.

    Only ``inner`` and ``left`` are sound: the small side is exploded
    ``salt`` times, so right/full outer would emit each UNMATCHED
    small-side row once per salt replica. For those, salt the other
    way around or fall back to AQE skew-join handling.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "outer joins would duplicate unmatched exploded small-side rows"
        )
    for df, side in ((big, "big"), (small, "small")):
        if SALT_COL in df.columns:
            raise ValueError(f"{side} side already has a {SALT_COL} column")
    b = big.withColumn(
        SALT_COL,
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", *[F.col(c) for c in big.columns])), 1, 8),
                16,
                10,
            ).cast("long")
            % salt
        ).cast("int"),
    )
    s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = b.join(s, on=[key, SALT_COL], how=how)
    return joined.drop(SALT_COL)


BLOOM_COL = "__jdp_bloom"


def _bloom_pos(col: str, i: int, m_bits: int):
    """Deterministic md5-derived Bloom bit position for hash seed
    ``i`` — the docs_bloom_probe formula (relational7.py), engine-
    portable (no RNG, no JVM-internal hash)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(str(i)), F.col(col).cast("string")
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % m_bits
    )


def bloom_pruned_join(fact: DataFrame, small: DataFrame, fact_key: str,
                      small_key: str, m_bits: int = 1 << 16,
                      k_hashes: int = 3,
                      how: str = "inner") -> DataFrame:
    """Equi-join with a broadcast Bloom prune on the fact side: build
    a deterministic k-hash Bloom bitset over the (already filtered)
    small side's keys, broadcast it, and drop fact rows that cannot
    match BEFORE the join shuffle — the classic 100 TB join
    reduction: the shuffle then carries only matching-plus-
    false-positive rows instead of the whole fact table.

    The bitset ships as a map<long, bool> of SET positions inside a
    1-row broadcast (≤ min(m_bits, keys·k) entries — bounded by
    ``m_bits`` regardless of build cardinality); the probe is k
    md5 + map lookups per fact row, all JVM-side expressions (no
    Python, no UDF). Bloom filters have NO false negatives, so the
    join OUTPUT is identical to the unpruned join — the prune is a
    pure shuffle-volume optimization, which is what makes it
    oracle-checkable by the plain join. Size ``m_bits`` ~ 10x the
    expected distinct build keys for a low false-positive rate
    ((1 - e^(-k·n/m))^k); an undersized filter only costs shuffle
    volume, never correctness.

    ``how`` is restricted to joins where dropping non-matching FACT
    rows is sound: 'inner', 'left_semi', and 'right' (fact side
    non-preserved). 'left'/'full' would lose unmatched fact rows.
    """
    if how not in ("inner", "left_semi", "right"):
        raise ValueError(
            f"bloom_pruned_join supports how='inner'|'left_semi'|"
            f"'right', got {how!r}: the prune drops non-matching fact "
            f"rows, which left/full outer joins must preserve"
        )
    if BLOOM_COL in fact.columns:
        raise ValueError(f"fact side already has a {BLOOM_COL} column")
    pos = small.select(
        F.explode(
            F.array(
                *[_bloom_pos(small_key, i, m_bits)
                  for i in range(k_hashes)]
            )
        ).alias("pos")
    ).distinct()
    bits = pos.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("pos"), F.lit(True)))
        ).alias(BLOOM_COL)
    )
    cond = None
    for i in range(k_hashes):
        probe = F.coalesce(
            F.element_at(
                F.col(BLOOM_COL), _bloom_pos(fact_key, i, m_bits)
            ),
            F.lit(False),
        )
        cond = probe if cond is None else (cond & probe)
    pruned = (
        fact.join(F.broadcast(bits))
        .where(cond)
        .drop(BLOOM_COL)
    )
    return pruned.join(
        small, pruned[fact_key] == small[small_key], how)
