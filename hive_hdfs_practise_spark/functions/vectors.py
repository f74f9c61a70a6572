"""Vector math over ``array<float|double>`` embedding columns.

Everything is built from ``F.zip_with`` / ``F.aggregate`` higher-
order functions — JVM-side, no Python in the loop, no UDF
serialization. Inputs are cast to double first so Spark and the
DuckDB oracle fold in the same precision (both engines reduce the
list sequentially → bitwise-identical sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is 0 (instead of
    NULL/NaN) so downstream thresholds are total."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize(a: Column) -> Column:
    """Unit-normalize (zero vector → unchanged). Pre-normalizing
    embeddings once at ingest turns every cosine into a plain dot
    product — the 100 TB-scale pattern for repeated similarity
    scans."""
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)
