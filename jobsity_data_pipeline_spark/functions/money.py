"""Exact integer-unit arithmetic for 2-dp money/fraction columns.

Every money-like column in the corpus (prices, balances, discounts,
taxes, event values) is a 2-decimal quantity stored as the nearest
double, so ``round(x * 100)`` recovers the exact integer count of
1e-2 units. Summing those longs is associative and order-independent
— the float forms ``round(sum(price * (1 - disc)), 2)`` re-roll a
half-ulp landing on every testdata regeneration (the round-4
``supplier_scorecard`` escape), while the integer forms replay
bit-for-bit in any engine and any partial-aggregation order.

Rounding happens in integer space with half-up division; ``div``
truncates toward zero in Spark while DuckDB's ``//`` floors, so
operands must be non-negative (shift first when a sum can go
negative — see ``relational8.LAT_SHIFT``). The final division by a
power of ten is one float op on an exact long, identical in any
IEEE-754 engine.

Scale notes (100 TB): all of this is plain long arithmetic inside
whole-stage codegen; group sums need the 1e-4/1e-6 unit count to stay
under 2^63 — 9.2e14 dollars per group in rev_e4 units — far above any
per-group total the TPC-H shapes produce.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def cents(c: Column | str) -> Column:
    """Exact long of 1e-2 units of a 2-dp double (dollars -> cents)."""
    return F.round(_c(c) * 100, 0).cast("long")


def pct(c: Column | str) -> Column:
    """Exact long of percent points of a 2-dp fraction (0.07 -> 7)."""
    return F.round(_c(c) * 100, 0).cast("long")


def rev_e4(price: Column | str = "l_extendedprice",
           disc: Column | str = "l_discount") -> Column:
    """price * (1 - disc) as an exact long of 1e-4 dollar units."""
    return cents(price) * (100 - pct(disc))


def charge_e6(price: Column | str = "l_extendedprice",
              disc: Column | str = "l_discount",
              tax: Column | str = "l_tax") -> Column:
    """price * (1 - disc) * (1 + tax) as exact 1e-6 dollar units."""
    return rev_e4(price, disc) * (100 + pct(tax))


# DuckDB fragments kept in lockstep with the Column builders above —
# oracle SQL embeds these so both engines build identical longs.
SQL_CENTS = "CAST(round({c} * 100, 0) AS BIGINT)"
SQL_REV_E4 = (
    "(CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))"
)
SQL_CHG_E6 = (
    SQL_REV_E4 + " * (100 + CAST(round(l_tax * 100, 0) AS BIGINT))"
)
