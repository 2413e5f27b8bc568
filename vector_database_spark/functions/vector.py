"""Vector math as Catalyst higher-order functions — JVM-side, codegen'd.

All distance/similarity math stays inside whole-stage codegen via
`zip_with` + `aggregate` (no Python UDFs in the hot path). Inputs may be
array<float>; accumulation is in double (the `F.lit(0.0)` zero forces
double), mirroring how the reference computes in float32 storage but
does distance tests in the caller's predicate
(MemoryVectorIndexTests.cs:209-217).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product, accumulated left-to-right in double."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean_sq(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean(a: Column | str, b: Column | str) -> Column:
    """Exact L2 distance (the tested reference metric,
    MemoryVectorIndexTests.cs:209-217)."""
    return F.sqrt(euclidean_sq(a, b))


def linf_distance(a: Column | str, b: Column | str) -> Column:
    """Chebyshev distance — the metric implied by the SQL Search's
    axis-aligned query box (DDL.sql:246-254)."""
    return F.array_max(F.zip_with(_to_double(a), _to_double(b), lambda x, y: F.abs(x - y)))


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column | str) -> Column:
    """Scale a vector to unit L2 norm (null-safe on zero vectors)."""
    ad = _to_double(a)
    n = l2_norm(ad)
    return F.when(n > 0, F.transform(ad, lambda x: x / n)).otherwise(ad)
