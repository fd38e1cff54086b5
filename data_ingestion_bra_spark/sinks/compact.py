"""Small-file compaction — the operational sibling of the partitioned sink.

Streaming ingestion (one file per micro-batch per partition) and highly
parallel writers leave bronze partitions with thousands of small files; at
100 TB that murders scan planning (file listing) and read throughput
(per-file open cost). Compaction rewrites a partition to
``ceil(bytes / target_file_bytes)`` files via an atomic-ish staging swap.

This is the classic OPTIMIZE/compact maintenance op (Delta/Iceberg ship it
natively; plain-parquet lakes run exactly this rewrite).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def partition_data_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def count_data_files(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for fn in files if not fn.startswith(("_", ".")))
    return n


def compact_partition(
    spark: SparkSession,
    partition_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Rewrite one partition directory into ~target-sized parquet files.

    Returns a stats dict; no-op (files_after == files_before) when the
    partition is already at or below the target file count.
    """
    files_before = count_data_files(partition_dir)
    bytes_before = partition_data_bytes(partition_dir)
    n_target = max(1, -(-bytes_before // target_file_bytes))  # ceil
    if files_before <= max(n_target, min_files - 1):
        return {
            "compacted": False,
            "files_before": files_before,
            "files_after": files_before,
            "bytes": bytes_before,
        }

    df: DataFrame = spark.read.parquet(partition_dir)
    staging = partition_dir.rstrip("/") + f".__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n_target).write.mode("overwrite").parquet(staging)

    # swap: move old out, staging in, then drop old (listing-atomic enough
    # for a single-writer maintenance job; table formats do this with a
    # metadata commit instead)
    trash = partition_dir.rstrip("/") + ".__old"
    os.replace(partition_dir, trash)
    os.replace(staging, partition_dir)
    shutil.rmtree(trash)
    return {
        "compacted": True,
        "files_before": files_before,
        "files_after": count_data_files(partition_dir),
        "bytes": bytes_before,
    }
