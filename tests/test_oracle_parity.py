"""Replicates the driver's correctness gate locally: every queries()
entry with an oracle_sql() twin must match DuckDB on row count, column
names, and order-insensitive values at FULL float precision (repr) —
the round-3 escapes (HUGEINT formatting, half-ulp round divergence)
passed a 9-significant-digit compare while failing the driver's hash,
so the local gate now matches driver strength. A type audit further
asserts no oracle emits HUGEINT/DECIMAL (pandas silently converts
those to float64, breaking a stringified int hash).

Runs at sf0.001 by default (fast inner loop); set PARITY_SF_DIR to
/root/testdata/sf0.01 to mirror the driver exactly.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE, SF_SMOKE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, name):
    import os

    sf = os.environ.get("PARITY_SF_DIR", SF_SMOKE)
    sdf = QUERIES[name](spark, sf)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf)
    cur = con.execute(ORACLES[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duckdb={len(drows)}"
    )
    sn = _norm_rows(scols, srows)
    dn = _norm_rows(dcols, drows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


STAGED_QUERIES = entrymod.staged_queries()
STAGED_ORACLES = entrymod.staged_oracle_sql()


@pytest.mark.parametrize("name", sorted(STAGED_ORACLES))
def test_staged_parity(spark, name):
    """Driver-strength parity for the STAGED registry too, so a
    staged operator is hash-green BEFORE the round it registers —
    new staged waves are covered automatically via
    staged_queries()/staged_oracle_sql()."""
    import os

    sf = os.environ.get("PARITY_SF_DIR", SF_SMOKE)
    sdf = STAGED_QUERIES[name](spark, sf)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf)
    cur = con.execute(STAGED_ORACLES[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duckdb={len(drows)}"
    )
    sn = _norm_rows(scols, srows)
    dn = _norm_rows(dcols, drows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_staged_and_registered_surfaces_are_disjoint():
    assert set(STAGED_QUERIES) == set(STAGED_ORACLES)
    assert not set(STAGED_QUERIES) & set(QUERIES)


def test_no_oracle_emits_hugeint_or_decimal():
    """One-pass oracle output-type audit (the judge's r3 scan, now a
    permanent gate): HUGEINT/DECIMAL columns survive fetchall() as
    Python ints/Decimals locally but become float64 through the
    driver's pandas path, so a value-identical result still
    hash-mismatches. Every aggregate that can widen must CAST."""
    con = _duck(SF_SMOKE)
    bad = {}
    for name, sql in sorted(ORACLES.items()):
        types = [str(t).upper() for t in con.sql(sql).types]
        hits = [t for t in types if "HUGEINT" in t or "DECIMAL" in t]
        if hits:
            bad[name] = hits
    assert not bad, f"oracles emitting HUGEINT/DECIMAL columns: {bad}"


def test_every_query_has_oracle_or_is_declared():
    # round 5 closed the last rows-only key: the driver contract's
    # emb_kmeans_fit is now the fixed-round engine-exact fit whose
    # Lloyd rounds replay in SQL (kmeans.emb_kmeans_fit_exact); the
    # convergence-criterion variant stays unit-test-only.
    assert set(QUERIES) - set(ORACLES) == set()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_no_oracle_sums_raw_money_floats():
    """Round-5 permanent gate (the round-4 supplier_scorecard escape
    class): no oracle may SUM/AVG a raw 2-dp money/value double — the
    float accumulation re-rolls a half-ulp round() landing on every
    testdata regeneration. Money accumulates as exact integer units
    (functions/money.py) with integer half-up rounding, in Spark and
    oracle lockstep. corr() internals are exempt (scale-invariant,
    3-dp rounded, fed exact integer inputs)."""
    import re

    raw_agg = re.compile(
        r"(sum|avg)\s*\(\s*(l_extendedprice|l_quantity|o_totalprice|"
        r"c_acctbal|s_acctbal|ps_supplycost|p_retailprice|value)\b",
        re.I,
    )
    float_rev = re.compile(r"l_extendedprice\s*\*\s*\(\s*1", re.I)
    bad = {
        name: (
            [m.group(0) for m in raw_agg.finditer(sql)]
            + (["price*(1-disc) float product"] if float_rev.search(sql)
               else [])
        )
        for name, sql in sorted(ORACLES.items())
    }
    bad = {k: v for k, v in bad.items() if v}
    assert not bad, f"oracles accumulating raw money floats: {bad}"


def test_no_staged_oracle_emits_hugeint_or_decimal():
    """The same output-type audit over the STAGED oracle registry
    (parity-tested now, queries() registration deferred for sweep
    budget) — a staged oracle that widens to HUGEINT/DECIMAL would
    pass its local parity test today and hash-mismatch the round it
    registers, the exact r3 escape class this gate exists for. The
    round-10 staged nine registered in round 11 and are covered by
    the registered sweep; this now audits staged_oracle_sql()
    directly so every future staged wave is covered automatically."""
    staged = entrymod.staged_oracle_sql()
    assert staged  # the registry exists and is non-empty this round
    con = _duck(SF_SMOKE)
    bad = {}
    for name, sql in sorted(staged.items()):
        types = [str(t).upper() for t in con.sql(sql).types]
        hits = [t for t in types if "HUGEINT" in t or "DECIMAL" in t]
        if hits:
            bad[name] = hits
    assert not bad, f"staged oracles emitting HUGEINT/DECIMAL: {bad}"
