"""Vector scalar functions over array<float>/array<double> columns.

All expressed with higher-order functions (``zip_with``/``aggregate``) so
they run JVM-side inside codegen — no Python round-trip per row.  Elements
are cast to double before arithmetic so results are deterministic and
engine-comparable (float32 accumulation would not be).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric array columns (double accumulation,
    left-to-right order — matches a sequential oracle exactly)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_sq_dist(a: Column, b: Column) -> Column:
    """Squared Euclidean distance (double accumulation, left-to-right)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
