"""Random-hyperplane LSH (SimHash-for-vectors) bucketing for ANN search.

``n_planes`` hyperplanes are derived deterministically from md5 (seeded by
plane and dimension index, mapped to [-7.5/8, +7.5/8]) and embedded as
LITERAL weight arrays in the plan. Each vector's bucket is the n-bit sign
signature of its dot products with the planes; ANN candidates are same-
bucket vectors (an equi-join — the LSH property that replaces the n² pair
scan at scale). Literal weights + in-row sequential folds make the bucket
assignment bit-reproducible by a SQL oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def plane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane weights in [-0.9375, 0.9375]."""
    return [
        [
            (int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) - 7.5) / 8.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _dot_literal(vec: Column, weights: list[float]) -> Column:
    w = F.array(*[F.lit(x) for x in weights])
    return F.aggregate(F.zip_with(vec, w, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)


def bucket_expr(vec: Column, weights: list[list[float]]) -> Column:
    """n-bit sign-signature bucket id for a double-array vector column."""
    bits = [
        (F.when(_dot_literal(vec, w) > 0, F.lit(1)).otherwise(F.lit(0)) * (1 << p))
        for p, w in enumerate(weights)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")


def weights_sql(weights: list[list[float]]) -> list[str]:
    """DuckDB literal list expressions mirroring the Spark literals."""
    return ["[" + ", ".join(repr(x) for x in w) + "]" for w in weights]


def rplsh_buckets(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    if dim is None:  # probe costs one tiny job; pass dim to avoid it
        dim = len(vectors.select(vec_col).first()[0])
    w = plane_weights(n_planes, dim)
    return vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        bucket_expr(F.col(vec_col).cast("array<double>"), w).alias("bucket"),
    )
