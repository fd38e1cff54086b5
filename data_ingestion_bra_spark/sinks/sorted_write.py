"""Range-sorted parquet writes for file-level data skipping.

Parquet footers carry min/max statistics per column per file (and per row
group). If the data is range-partitioned on a frequently-filtered key
before writing, those ranges become *disjoint* — a point or range predicate
on the key then prunes all but a handful of files before any I/O happens.
At 100 TB this is the difference between scanning 400k files and scanning
3: the scan's ``PushedFilters`` get evaluated against footer stats first.

``repartitionByRange`` samples the key distribution (reservoir sampling per
partition, driver-side merge) to build balanced range bounds — skew in the
key produces uneven files with plain hash bucketing but stays balanced
here. Combine with ``sortWithinPartitions`` so row-group stats inside each
file are tight too (row-group-level skipping on top of file-level).

This is the batch analogue of Z-ordering for the single-key case; for
multi-key skipping see the interleave note in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_range_sorted(
    df: DataFrame,
    path: str,
    key: str,
    n_files: int,
    *,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-partitioned + sorted on ``key`` → disjoint
    per-file min/max stats, prunable by any key predicate."""
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode(mode)
        .parquet(path)
    )


def read_with_skipping(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet read — skipping needs nothing special at read time;
    callers just express key filters declaratively and Spark evaluates
    them against footer stats (visible as PushedFilters in the plan)."""
    return spark.read.parquet(path)


def _scale_to_bits(col, lo, hi, bits: int):
    """Affine-map a numeric column from [lo, hi] onto [0, 2^bits)."""
    from pyspark.sql import functions as F

    span = max(hi - lo, 1)
    return ((col - F.lit(lo)) * F.lit((2**bits) - 1) / F.lit(span)).cast("bigint")


def morton_code(col_a, col_b, bits: int = 16):
    """Interleave the low ``bits`` of two already-scaled integer columns —
    a pure-expression bit-interleave (runs in codegen, no UDF)."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(col_a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(col_b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i + 1)).bitwiseOR(F.shiftleft(bit_b, 2 * i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    key_a: str,
    key_b: str,
    n_files: int,
    *,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Two-key data-skipping layout: range-sort on the morton interleave of
    both keys, so EVERY file covers a small rectangle of the (key_a, key_b)
    plane — predicates on either key alone (or both) prune files, where a
    plain sort on key_a leaves key_b's per-file ranges spanning the whole
    domain. One extra stats job (global min/max per key) + the same single
    range-shuffle as ``write_range_sorted``.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(key_a).alias("a_lo"),
        F.max(key_a).alias("a_hi"),
        F.min(key_b).alias("b_lo"),
        F.max(key_b).alias("b_hi"),
    ).first()
    z = morton_code(
        _scale_to_bits(F.col(key_a), stats["a_lo"], stats["a_hi"], bits),
        _scale_to_bits(F.col(key_b), stats["b_lo"], stats["b_hi"], bits),
        bits,
    )
    (
        df.withColumn("_zorder", z)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode(mode)
        .parquet(path)
    )
