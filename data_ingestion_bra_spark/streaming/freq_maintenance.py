"""Streaming heavy-hitters maintenance: a standing Misra–Gries summary of
an unbounded key stream, folded per micro-batch into an ACID txlog store.

The batch tier (operators/freq.py) answers "exact top-k of THIS corpus";
this module is its stream form, leaning on the property that makes MG the
right state: summaries are MERGEABLE (Agarwal et al., PODS 2012) — fold
per-epoch summaries into a standing one and the combined error bound is
the same N_total/(capacity+1) a single pass over the whole stream gets.
State is bounded at ``capacity`` counters FOREVER, regardless of stream
length or key cardinality.

Per micro-batch:

1. build the batch's MG summary (operators/freq.misra_gries_summaries —
   only capacity-bounded rows leave the executors),
2. read the standing summary rows of the latest PRIOR epoch from the
   txlog store (``epoch < epoch_id`` — a replayed epoch must merge
   against the pre-batch state, never against itself),
3. mg_merge(prior ∪ batch) → the new standing summary,
4. commit the new summary as one exactly-once txlog append keyed by
   ``<query>:<epoch>`` (replays no-op).

Serving: ``current_candidates`` returns the latest standing summary —
the candidate superset for any key with lifetime count above the bound;
exact counts come from one recount scan, exactly like the batch tier.

At 100 TB/day the store grows by at most ``capacity`` rows per epoch and
old epochs are droppable (each commit carries the FULL standing summary);
``retire_epochs_before`` delegates that to the txlog's row-level DELETE.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.freq import mg_merge, misra_gries_summaries
from data_ingestion_bra_spark.sinks import txlog


def _latest_prior_summary(
    spark: SparkSession, store_dir: str, key_col: str, before_epoch: int
) -> DataFrame | None:
    if txlog.snapshot(store_dir).version < 0:
        return None
    rows = txlog.read_snapshot(spark, store_dir).filter(
        F.col("epoch") < F.lit(int(before_epoch))
    )
    prior = rows.agg(F.max("epoch").alias("e")).collect()[0]["e"]
    if prior is None:
        return None
    return rows.filter(F.col("epoch") == prior).select(key_col, "mg_weight")


def freq_maintenance_writer(
    store_dir: str,
    *,
    key_col: str,
    capacity: int,
    query_id: str = "freq",  # MUST be checkpoint-unique: see txlog.checkpoint_scoped_query_id
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: fold the arriving batch's MG summary into the
    standing summary, exactly once per epoch.

    Replay safety: the prior state is read as the latest epoch STRICTLY
    BEFORE ``epoch_id``, so a replayed epoch recomputes the identical
    merge (against the pre-batch summary) and its commit no-ops on the
    idempotency key — the same ordering argument as the dedup-maintenance
    store."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_sum = misra_gries_summaries(batch_df, key_col, capacity)
        prior = _latest_prior_summary(spark, store_dir, key_col, int(epoch_id))
        merged = mg_merge(
            batch_sum if prior is None else prior.unionByName(batch_sum),
            key_col,
            capacity,
        )
        txlog.commit_append(
            merged.withColumn("epoch", F.lit(int(epoch_id))),
            store_dir,
            idempotency_key=f"{query_id}:summary:{epoch_id}",
        )

    return write_batch


def current_candidates(
    spark: SparkSession, store_dir: str, key_col: str, *, key_type: str = "string"
) -> DataFrame:
    """The standing summary at the latest committed epoch: the candidate
    superset for every key whose lifetime count exceeds
    N_total/(capacity+1).

    A never-committed (or fully retired) store returns an EXPLICIT empty
    summary frame — the same ``version < 0`` guard ``_latest_prior_summary``
    uses, not null-comparison fallout; ``key_type`` names the key column's
    Spark type for that empty schema."""
    if txlog.snapshot(store_dir).version < 0:
        return spark.createDataFrame([], f"`{key_col}` {key_type}, mg_weight bigint")
    rows = txlog.read_snapshot(spark, store_dir)
    latest = rows.agg(F.max("epoch").alias("e")).collect()[0]["e"]
    if latest is None:
        return rows.select(key_col, "mg_weight").limit(0)
    return rows.filter(F.col("epoch") == F.lit(int(latest))).select(key_col, "mg_weight")


def retire_epochs_before(spark: SparkSession, store_dir: str, epoch: int) -> None:
    """Drop superseded standing summaries (each commit carries the FULL
    summary, so only the latest epoch is ever needed for serving)."""
    txlog.commit_delete(
        spark,
        store_dir,
        predicate=F.col("epoch") < F.lit(int(epoch)),
        idempotency_key=f"retire:{epoch}",
    )
