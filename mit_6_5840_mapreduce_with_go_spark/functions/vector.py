"""Vector math as native Catalyst expressions over ``array<float>``.

No Python UDFs: dot products / norms are ``F.zip_with`` + ``F.aggregate``
folds that run inside the JVM. At 100 TB the alternative (row-at-a-time
Python) is 10-100x slower; a vectorized pandas_udf variant is provided in
operators/similarity.py for the batched ANN path where Arrow transfer
amortizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
