"""Vector primitives over `array<float>` embedding columns.

All expressions are built-in higher-order functions (zip_with / aggregate)
— JVM-side, no Python round-trips — so similarity scans stay in
whole-stage codegen. Accumulation is a left-to-right fold in DOUBLE,
matching DuckDB's list_dot_product on DOUBLE[] for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column | None = None, norm_b: Column | None = None) -> Column:
    """Cosine similarity; pass precomputed norms to avoid recomputing per pair."""
    na = norm_a if norm_a is not None else norm(a)
    nb = norm_b if norm_b is not None else norm(b)
    return dot(a, b) / (na * nb)
