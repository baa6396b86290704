"""Vector math over ``array<float>`` embedding columns — JVM-side.

``zip_with`` + ``aggregate`` keep the dot products inside codegen; no
Python crosses the wire for similarity search. All math is done in
double precision (embeddings cast up first) so the DuckDB oracle —
which also unrolls to double sums — matches bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (never NaN/div0)."""
    d = dot(a, b)
    nn = norm(a) * norm(b)
    return F.when(nn > 0, d / nn).otherwise(F.lit(0.0))


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled to a fixed-width sum of products.

    Higher-order functions (zip_with/aggregate) are CodegenFallback —
    interpreted per pair, which dominates all-pairs similarity. A
    left-associated chain of GetArrayItem products stays inside
    whole-stage codegen and adds terms in the same sequential order, so
    results are bit-identical to the fold (and to DuckDB's loop).
    """
    expr = a.getItem(0) * b.getItem(0)
    for i in range(1, dim):
        expr = expr + a.getItem(i) * b.getItem(i)
    return expr


def norm_unrolled(a: Column, dim: int) -> Column:
    """L2 norm via the same unrolled codegen-friendly sum."""
    expr = a.getItem(0) * a.getItem(0)
    for i in range(1, dim):
        expr = expr + a.getItem(i) * a.getItem(i)
    return F.sqrt(expr)
