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
