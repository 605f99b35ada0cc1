"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (JVM-side fold, no Python boundary, Arrow-free).

Everything is computed in double precision with a left-to-right fold so
results are bit-comparable with the DuckDB oracle (list_inner_product over
DOUBLE[] folds in the same order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d)


def euclidean(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.sqrt(
        F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
    )


# DuckDB twins (embedding columns arrive as FLOAT[]; cast first) ------------


def dd_vec(expr: str) -> str:
    return f"CAST({expr} AS DOUBLE[])"


def dd_cosine(a: str, b: str) -> str:
    """Manual cosine (inner products), matching the Spark fold exactly."""
    return (
        f"(list_inner_product({a}, {b}) / "
        f"(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b}))))"
    )
