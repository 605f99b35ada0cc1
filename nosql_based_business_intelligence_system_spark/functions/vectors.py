"""Vector math over ``array<float>`` embedding columns.

Two tiers, chosen per call site:
- pure Column expressions (JVM-side fold): bit-comparable with the DuckDB
  oracle (list_inner_product over DOUBLE[] folds in the same order), fine
  when evaluated once per row or on small candidate sets;
- :func:`pandas_dot`: Arrow-batched numpy matmul for per-PAIR hot paths
  (all-pairs scoring) — higher-order-function folds evaluate their lambda
  interpreted per element, and Catalyst will happily inline them into a
  nested-loop join condition; a Pandas UDF is both ~100x faster and
  *cannot* be pushed into a join condition, pinning the plan to
  join-then-score. Sum order differs from the fold at ~1e-15 relative —
  absorbed by the driver's 6-significant-digit hash rounding.
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


def pandas_dot():
    """Arrow-vectorized row-wise dot product UDF: (array, array) -> double.

    Built per call (no type hints: ``from __future__ import annotations``
    breaks pyspark's hint inference for function-local imports).
    """
    from pyspark.sql.types import DoubleType

    def _dot(a, b):
        import numpy as np
        import pandas as pd

        if len(a) == 0:
            return pd.Series([], dtype=float)
        ma = np.vstack(a.to_numpy())
        mb = np.vstack(b.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", ma, mb))

    return F.pandas_udf(_dot, DoubleType())


# DuckDB twins (embedding columns arrive as FLOAT[]; cast first) ------------


def dd_vec(expr: str) -> str:
    return f"CAST({expr} AS DOUBLE[])"


def dd_cosine(a: str, b: str) -> str:
    """Manual cosine (inner products), matching the Spark fold exactly."""
    return (
        f"(list_inner_product({a}, {b}) / "
        f"(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b}))))"
    )
