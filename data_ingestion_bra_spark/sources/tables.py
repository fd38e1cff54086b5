"""Parquet table loaders for the driver's star-schema fixtures.

Parquet is the engine's canonical storage format (columnar, splittable,
predicate-pushdown- and column-pruning-friendly) — the reference's own README
concedes Parquet is what production would use (reference README.md:41,63).

At 100 TB these reads are partition-pruned and filter-pushed automatically by
Catalyst as long as callers express filters declaratively on the returned
DataFrames — so loaders do nothing clever: no collect, no caching policy here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # The fixture stores ts as INT64 TIMESTAMP(NANOS), which Spark's
        # vectorized Parquet reader rejects; we read nanos as long
        # (spark.sql.legacy.parquet.nanosAsLong, set in session.tune_session)
        # and truncate to microseconds — exactly what DuckDB does natively,
        # so oracle comparisons stay aligned. `div` keeps the arithmetic in
        # int64 (a double round-trip would lose precision at 1e18 ns).
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
