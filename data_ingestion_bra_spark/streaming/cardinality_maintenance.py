"""Streaming distinct-count maintenance: a standing per-group KMV
(bottom-k) summary of an unbounded key stream, folded per micro-batch into
an ACID txlog store — the cardinality member of the engine's
mergeable-summary state tier (dedup signature store: membership;
freq_maintenance: Misra–Gries frequency; this module: distinct counts).

Unlike the MG store, the KMV fold is EXACT, not merely bound-preserving:
the bottom-k of a union equals the bottom-k of the unioned bottom-k's, so
the standing summary after any number of epochs is byte-identical to a
single-pass summary of the whole stream (asserted in tests/test_sketch.py).
State is bounded at k rows per group forever.

Per micro-batch (the same replay discipline as the freq/dedup stores):

1. build the batch's per-group bottom-k summary (operators/sketch.py),
2. read the standing summary at the latest epoch STRICTLY BEFORE this one
   (a replayed epoch must merge against the pre-batch state),
3. kmv_merge(prior ∪ batch) → the new standing summary,
4. commit it as one exactly-once txlog append keyed by ``<query>:<epoch>``.

Serving: ``current_estimates`` turns the latest standing summary into
per-group distinct-count estimates — exact below k, (k-1)·SPACE/kth above,
all BIGINT (operators/sketch.py docstring has the estimator provenance).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.sketch import (
    kmv_estimates,
    kmv_merge,
    kmv_summaries,
)
from data_ingestion_bra_spark.sinks import txlog


def _latest_prior_summary(
    spark: SparkSession, store_dir: str, group_cols: list[str], before_epoch: int
) -> DataFrame | None:
    if txlog.snapshot(store_dir).version < 0:
        return None
    rows = txlog.read_snapshot(spark, store_dir).filter(
        F.col("epoch") < F.lit(int(before_epoch))
    )
    prior = rows.agg(F.max("epoch").alias("e")).collect()[0]["e"]
    if prior is None:
        return None
    return rows.filter(F.col("epoch") == F.lit(int(prior))).select(*group_cols, "h")


def cardinality_maintenance_writer(
    store_dir: str,
    *,
    group_cols: list[str],
    key_col: str,
    k: int,
    query_id: str = "kmv",  # MUST be checkpoint-unique: txlog.checkpoint_scoped_query_id
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: fold the arriving batch's bottom-k summary into
    the standing per-group summary, exactly once per epoch. Replays merge
    against the strictly-prior state and no-op on the idempotency key —
    the same ordering argument as the freq/dedup maintenance stores."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_sum = kmv_summaries(batch_df, group_cols, key_col, k)
        prior = _latest_prior_summary(spark, store_dir, group_cols, int(epoch_id))
        merged = kmv_merge(
            batch_sum if prior is None else prior.unionByName(batch_sum),
            group_cols,
            k,
        )
        txlog.commit_append(
            merged.withColumn("epoch", F.lit(int(epoch_id))),
            store_dir,
            idempotency_key=f"{query_id}:summary:{epoch_id}",
        )

    return write_batch


def current_summary(
    spark: SparkSession, store_dir: str, group_cols: list[str], *, group_types: str = "string"
) -> DataFrame:
    """The standing summary at the latest committed epoch; a never-committed
    (or fully retired) store returns an EXPLICIT empty frame via the same
    version<0 guard the freq store uses."""
    if txlog.snapshot(store_dir).version < 0:
        cols = ", ".join(f"`{c}` {group_types}" for c in group_cols)
        return spark.createDataFrame([], f"{cols}, h bigint")
    rows = txlog.read_snapshot(spark, store_dir)
    latest = rows.agg(F.max("epoch").alias("e")).collect()[0]["e"]
    if latest is None:
        return rows.select(*group_cols, "h").limit(0)
    return rows.filter(F.col("epoch") == F.lit(int(latest))).select(*group_cols, "h")


def current_estimates(
    spark: SparkSession, store_dir: str, group_cols: list[str], k: int
) -> DataFrame:
    """Per-group distinct-count estimates from the latest standing summary."""
    return kmv_estimates(current_summary(spark, store_dir, group_cols), group_cols, k)


def retire_epochs_before(spark: SparkSession, store_dir: str, epoch: int) -> None:
    """Drop superseded standing summaries (each commit carries the FULL
    summary; only the latest epoch serves)."""
    txlog.commit_delete(
        spark,
        store_dir,
        predicate=F.col("epoch") < F.lit(int(epoch)),
        idempotency_key=f"retire:{epoch}",
    )
