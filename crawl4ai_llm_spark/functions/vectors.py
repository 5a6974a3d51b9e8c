"""Vector math over array<float> embedding columns — JVM-side built-ins.

Dot products and norms are sequential left-folds (``aggregate`` over
``zip_with``), which makes them bit-for-bit reproducible across engines —
unlike SIMD/pairwise summation, the fold order is part of the contract.
That determinism is what lets the ANN queries be oracle-checked exactly.

For raw throughput at 100 TB the same operators have a vectorized
pandas-UDF path (numpy BLAS over Arrow batches) — see
operators/similarity.py — but the fold version stays the semantic spec.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product: exact widening float32→float64, then
    left-to-right summation."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
