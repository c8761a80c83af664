"""Dense-vector primitives over array<float|double> columns.

Pure ``F.aggregate``/``F.zip_with`` expressions — the embedding operators
(similarity search, near-dup) run entirely JVM-side; Python never touches a
vector. Math is forced to double precision so results are bit-comparable
with the DuckDB oracle's DOUBLE[] computations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
