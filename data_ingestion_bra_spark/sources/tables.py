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
import weakref

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

#: Per-session memo of lazy PLAN handles (never data): repeated
#: ``spark.read.parquet`` of the same fixture re-lists the directory and
#: re-reads footers for schema inference on the DRIVER — measured 230-250 ms
#: per call on this box — once per load_table call, i.e. once per query per
#: bench pass (optimization guide §6: repeated listing is driver-side,
#: single-process work). A DataFrame is a lazy logical plan; memoizing the
#: handle changes nothing about execution — every action still scans the
#: parquet files — it only stops re-deriving identical metadata. Keyed by
#: (dataset path, stat signature) so any rewrite/append of the dataset
#: invalidates the entry; keyed weakly by session so a stopped session's
#: plans can never leak into a new one.
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def _stat_sig(path: str) -> tuple[int, int]:
    st = os.stat(path)
    return (st.st_mtime_ns, st.st_size)


def read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    """Plan-handle memo for non-fixture parquet datasets (e.g. the IVF index
    lists): same contract as ``load_table`` — the handle is a lazy plan,
    every action re-scans the files, and any rewrite of the dataset (new
    mtime/size, incl. atomic dir replace) misses the cache."""
    per_session = _PLAN_CACHE.setdefault(spark, {})
    key = (path, _stat_sig(path))
    cached = per_session.get(key)
    if cached is None:
        cached = spark.read.parquet(path)
        for k in [k for k in per_session if k[0] == path and k != key]:
            del per_session[k]
        per_session[key] = cached
    return cached


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    per_session = _PLAN_CACHE.setdefault(spark, {})
    key = (path, _stat_sig(path))
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(path)
    if name == "events":
        # The fixture stores ts as INT64 TIMESTAMP(NANOS), which Spark's
        # vectorized Parquet reader rejects; we read nanos as long
        # (spark.sql.legacy.parquet.nanosAsLong, set in session.tune_session)
        # and truncate to microseconds — exactly what DuckDB does natively,
        # so oracle comparisons stay aligned. `div` keeps the arithmetic in
        # int64 (a double round-trip would lose precision at 1e18 ns).
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # drop superseded signatures for the same path (rewritten dataset)
    for k in [k for k in per_session if k[0] == path and k != key]:
        del per_session[k]
    per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def spread_scan(df: DataFrame) -> DataFrame:
    """Repartition a scan-rooted relation to the session's parallelism when
    the source cannot feed every core — optimization guide §2.5 "input
    skew": one huge unsplittable file (here: single-row-group parquet
    fixtures, which Spark cannot split below row-group granularity) leaves
    every downstream narrow stage single-threaded no matter the core count.

    Scale-adaptive by construction: a warehouse-scale table scans as
    thousands of splits, the condition is false, and NO exchange is added —
    this never becomes a constant tuned for local mode. When it does fire,
    one slim round-robin exchange of the scan output buys full compute
    parallelism for everything narrow above it (filters, explodes, hashes,
    higher-order folds). Use on paths whose per-row compute dominates the
    scan itself; the partition count caps at the scheduler's task slots.

    The scan partition count is probed once per memoized plan handle (the
    probe itself costs a plan translation) and remembered on the handle.
    """
    spark = df.sparkSession
    slots = spark.sparkContext.defaultParallelism
    nparts = getattr(df, "_scan_nparts", None)
    if nparts is None:
        nparts = df.rdd.getNumPartitions()
        try:
            df._scan_nparts = nparts
        except Exception:  # pragma: no cover - foreign DataFrame subclass
            pass
    if nparts >= slots:
        return df
    spread = getattr(df, "_spread_handle", None)
    if spread is None:
        spread = df.repartition(slots)
        try:
            df._spread_handle = spread
        except Exception:  # pragma: no cover
            pass
    return spread
