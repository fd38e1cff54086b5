"""Partitioned table sink — reference K1 (app/ingestao_api.py:114-130,
app/ingestao_csv.py:90-112) re-expressed for a distributed writer.

Default format is Parquet (columnar, splittable, prunable — what the
reference's own README says production should use, README.md:41,63);
``fmt="csv"`` gives byte-compatible ``;``-delimited text for reference
fidelity. ``single_file=True`` coalesces to one part-file per partition —
the reference writes exactly one file per partition; at 100 TB you leave it
False and let each task write its own part (documented deviation, SURVEY
§7.4.3).
"""

from __future__ import annotations

import os
from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def today_yyyymmdd(run_date: date | None = None) -> str:
    """Partition value. Ref: app/utils/date.py:5-6 — injectable for
    deterministic tests (SURVEY §7.4.2)."""
    return (run_date or date.today()).strftime("%Y%m%d")


def write_partitioned(
    df: DataFrame,
    base_dir: str,
    table: str,
    *,
    partition_key: str = "anomesdia",
    partition_value: str | None = None,
    fmt: str = "parquet",
    delimiter: str = ";",
    encoding: str = "UTF-8",
    mode: str = "overwrite",
    single_file: bool = False,
) -> str:
    """Write ``base_dir/table/partition_key=partition_value/...`` and return
    the partition directory path."""
    pv = partition_value or today_yyyymmdd()
    out = df.withColumn(partition_key, F.lit(pv))
    if single_file:
        out = out.coalesce(1)
    # dynamic overwrite: replace only the partition(s) present in this
    # DataFrame. Without it Spark's static overwrite truncates the whole
    # table root, so day-2 of a daily ingest would delete day-1. Set on the
    # writer (not just the session) so the guarantee holds under any
    # externally-provided SparkSession.
    writer = (
        out.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_key)
    )
    target = os.path.join(base_dir, table)
    if fmt == "parquet":
        writer.parquet(target)
    elif fmt == "csv":
        writer.options(sep=delimiter, encoding=encoding, header=True).csv(target)
    else:
        raise ValueError(f"unsupported sink format: {fmt}")
    return os.path.join(target, f"{partition_key}={pv}")
