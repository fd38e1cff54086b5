"""Key-based upsert (MERGE) into a partitioned parquet table.

Plain-parquet lakes can't mutate rows in place; the scalable merge pattern
is: (1) find which partitions the updates touch, (2) rewrite ONLY those
partitions, (3) commit via staged-write + rename swap. Partition pruning
bounds the rewrite to touched partitions — at 100 TB a merge that touches 3
of 3,000 daily partitions rewrites 0.1% of the table.

Conflict resolution: with ``version_col``, the FULL existing partition is
unioned with the updates and the max-version row per key wins (ties go to
the update, deterministically) — an update carrying an OLDER version can
never clobber a newer existing row. Without ``version_col``, updates simply
replace existing keys (classic MERGE).

Crash safety (the poor-man's commit protocol Delta/Iceberg do with
metadata): the merged partition is written to a ``.__upsert_*`` staging dir
first; the swap is two renames through a ``.__old`` trash dir. Every entry
runs recovery first: a crash mid-swap is rolled back from trash, and
orphaned staging/trash dirs from dead runs are removed — so at every
instant the partition directory holds either the complete old data or the
complete new data, never a half-replaced mix.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _recover_partition(part_dir: str) -> None:
    """Make the partition consistent after any prior crash: roll back a
    half-finished swap and delete orphaned staging/trash directories."""
    trash = part_dir + ".__old"
    if os.path.isdir(part_dir):
        if os.path.isdir(trash):
            shutil.rmtree(trash)  # swap completed; trash is stale
    elif os.path.isdir(trash):
        os.replace(trash, part_dir)  # crashed between renames: restore old
    parent, base = os.path.dirname(part_dir), os.path.basename(part_dir)
    if os.path.isdir(parent):
        for d in os.listdir(parent):
            if d.startswith(base + ".__upsert_"):
                shutil.rmtree(os.path.join(parent, d))


def upsert_partitioned(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    *,
    key: str,
    partition_key: str = "anomesdia",
    version_col: str | None = None,
) -> dict:
    """Merge ``updates`` (which must carry ``partition_key``) into the
    table; only touched partitions are rewritten, each committed atomically
    (staged write + rename swap with crash recovery on entry)."""
    touched = [r[0] for r in updates.select(partition_key).distinct().collect()]
    stats = {"partitions_rewritten": 0, "partitions_created": 0}
    for pv in touched:
        part_dir = os.path.join(table_dir, f"{partition_key}={pv}")
        _recover_partition(part_dir)
        upd = updates.filter(F.col(partition_key) == pv).drop(partition_key)
        if not os.path.isdir(part_dir):
            upd.write.parquet(part_dir)
            stats["partitions_created"] += 1
            continue
        existing = spark.read.parquet(part_dir)
        if version_col is None:
            # no version: updates replace existing keys outright
            kept = existing.join(upd.select(key), key, "left_anti")
            merged = kept.unionByName(upd)
        else:
            # latest-wins over the FULL union: an update with an older
            # version must lose to a newer existing row. Tie-break is
            # deterministic: same version → the update wins.
            merged = existing.withColumn("__src", F.lit(0)).unionByName(
                upd.withColumn("__src", F.lit(1))
            )
            w = Window.partitionBy(key).orderBy(
                F.col(version_col).desc(), F.col("__src").desc()
            )
            merged = (
                merged.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", "__src")
            )
        staging = part_dir + f".__upsert_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(staging)
        trash = part_dir + ".__old"
        os.replace(part_dir, trash)
        os.replace(staging, part_dir)
        shutil.rmtree(trash)
        stats["partitions_rewritten"] += 1
    return stats
