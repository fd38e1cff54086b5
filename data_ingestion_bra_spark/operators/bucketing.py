"""Bucketed-table writes for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle of
both sides. Bucketing pre-partitions the data *on disk* by the join key
(hash(key) mod n_buckets, Spark's own hash partitioning), so a later join
between two tables bucketed on the same key with the same bucket count
needs NO exchange on either side — Catalyst recognizes the child output
partitionings as compatible and plans a sort-merge join straight over the
bucketed files. Pay the shuffle once at write time, amortize it over every
downstream join/aggregate on that key.

Cluster guidance: pick n_buckets so one bucket ≈ 100–500 MB per table
(e.g. 100 TB fact / 256 MB ≈ 400k buckets is too many files — bucket the
*join-relevant* tables, size n_buckets to the smaller table, and combine
with date partitioning so each partition×bucket file stays in range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table.

    Sorting within buckets lets the downstream sort-merge join skip its
    sort step too (zero-exchange, zero-sort join).
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-bucket-count tables — plans with no Exchange.

    Reads must go through the catalog (``spark.table``) so the bucketing
    metadata reaches the planner; a path-based ``read.parquet`` of the same
    files would lose it and reintroduce the shuffle.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
