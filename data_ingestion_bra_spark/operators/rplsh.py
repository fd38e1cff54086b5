"""Random-hyperplane LSH (SimHash-for-vectors) bucketing for ANN search.

``n_planes`` hyperplanes are derived deterministically from md5 (seeded by
plane and dimension index) and embedded as LITERAL integer weight arrays in
the plan. Each vector's bucket is the n-bit sign signature of its dot
products with the planes; ANN candidates are same-bucket vectors (an
equi-join — the LSH property that replaces the n² pair scan at scale).

Determinism: vectors are quantized to BIGINT fixed-point (×1e6, see
``operators.similarity.SCALE``) and the plane weights are odd integers in
[-15, 15] (16× the nominal [-0.9375, 0.9375] reals — a positive scale factor
never changes a dot product's sign). The sign test is therefore EXACT integer
arithmetic, bit-reproducible by any SQL oracle regardless of summation order.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.similarity import quantize_expr


def plane_weights(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic pseudo-random integer hyperplane weights (odd, [-15, 15]).

    ``2 * md5_nibble - 15`` is 16× the legacy ``(nibble - 7.5) / 8`` real
    weight, preserving every hyperplane's orientation exactly.
    """
    return [
        [
            2 * int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) - 15
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _idot_literal(vec: Column, weights: list[int]) -> Column:
    """Exact integer dot of a quantized vector with literal integer weights."""
    w = F.array(*[F.lit(x).cast("bigint") for x in weights])
    return F.aggregate(
        F.zip_with(vec, w, lambda a, b: a * b), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


def bucket_expr(vec: Column, weights: list[list[int]]) -> Column:
    """n-bit sign-signature bucket id for a quantized (array<bigint>) vector."""
    bits = [
        (F.when(_idot_literal(vec, w) > 0, F.lit(1)).otherwise(F.lit(0)) * (1 << p))
        for p, w in enumerate(weights)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")


def weights_sql(weights: list[list[int]]) -> list[str]:
    """DuckDB literal BIGINT list expressions mirroring the Spark literals."""
    return ["[" + ", ".join(f"CAST({x} AS BIGINT)" for x in w) + "]" for w in weights]


def rplsh_buckets(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int,
) -> DataFrame:
    """(vid, v: array<bigint> quantized, bucket) for every input vector.

    ``dim`` is required — deriving it from the data would cost a driver
    round-trip (``first()``) per call.
    """
    w = plane_weights(n_planes, dim)
    q = quantize_expr(F.col(vec_col))
    return vectors.select(
        F.col(id_col).alias("vid"),
        q.alias("v"),
        bucket_expr(q, w).alias("bucket"),
    )
