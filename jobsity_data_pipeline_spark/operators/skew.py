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
