"""Medallion hop: bronze ACID table → transform → silver ACID table,
exactly once END TO END — the composition the table format and the
streaming source exist for.

Both halves are already-verified pieces wired together:

- the SOURCE is the txlog streaming reader (``sources/txlog_stream.py``):
  offsets are bronze commit versions, recovered from the checkpoint, so a
  restarted hop never re-reads an already-processed bronze commit;
- the SINK is an idempotent txlog append (``<query_id>:<epoch>`` key —
  the published transactional-writer pattern), so a replayed epoch
  (foreachBatch is at-least-once) commits nothing twice.

The two compose into exactly-once: offset recovery bounds WHAT can
replay, the idempotency key makes any replay a no-op. The transform is
an arbitrary batch-DataFrame function (gates, dedup joins, projections —
anything the batch catalog runs), evaluated inside the epoch.

At 100 TB a silver hop costs the day's bronze commits, not the table:
per-trigger driver work is O(new log records), data reads are the added
files only, and the silver commit is KBs of JSON."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_bra_spark.sinks import txlog
from data_ingestion_bra_spark.sources.txlog_stream import TxlogStreamDataSource


def bronze_to_silver(
    spark: SparkSession,
    bronze_dir: str,
    silver_dir: str,
    *,
    checkpoint_dir: str,
    transform,
    query_id: str | None = None,
    available_now: bool = True,
    ignore_changes: bool = False,
):
    """Start the hop; returns the StreamingQuery. ``transform(df) -> df``
    runs per epoch on the new bronze rows.

    ``query_id`` defaults to a CHECKPOINT-scoped id
    (``txlog.checkpoint_scoped_query_id``): epoch numbers are only unique
    within one checkpoint lineage, so a constant id would collide a fresh
    checkpoint's epoch 0 with the old run's and silently drop the new
    batch's extra bronze rows. Same-checkpoint restarts stay idempotent;
    a fresh checkpoint is a new consumer and reprocesses (the published
    streaming-source semantics)."""
    if query_id is None:
        query_id = txlog.checkpoint_scoped_query_id("silver-hop", checkpoint_dir)
    spark.dataSource.register(TxlogStreamDataSource)
    reader = spark.readStream.format("txlog_stream").option("path", bronze_dir)
    if ignore_changes:
        reader = reader.option("ignore_changes", "true")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform(batch_df)
        txlog.commit_append(
            out,
            silver_dir,
            idempotency_key=f"{query_id}:{int(epoch_id)}",
            meta={"epoch": int(epoch_id)},
        )

    writer = (
        reader.load()
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
