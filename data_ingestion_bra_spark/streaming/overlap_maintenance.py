"""Streaming overlap forensics: maintain a standing winnowing-fingerprint
store at ingest and flag arriving documents that substantially overlap any
previously ingested document, per micro-batch.

The batch tier (``text_winnowing_overlap``) answers "which documents in
THIS corpus share fingerprinted spans"; this module is its stream form —
the plagiarism/near-quote monitor a curation pipeline runs at the front
door so provenance decisions happen BEFORE a document is admitted. Every
micro-batch:

1. winnows ONLY the batch (operators/text.py:winnowing_fingerprints — the
   SIGMOD-2003 guarantee: any shared normalized substring of length >=
   k+w-1 produces a shared selected fingerprint),
2. equi-joins the batch's (doc, fp) relation against the PERSISTED store →
   overlap flags (doc_new, doc_old, n_shared >= threshold),
3. adds within-batch overlaps (canonical orientation) so same-epoch pairs
   are not blind spots,
4. commits the flags, then the batch's fingerprints into the store — both
   exactly-once txlog appends keyed per epoch.

Exactly-once holds ACROSS epochs too, not just for epoch replays: docs
already present in the store (source re-ingest of an old doc_id in a new
epoch) are anti-joined out of the batch before any consumer sees them, so
a re-delivered doc neither duplicates store rows (which would inflate
later n_shared counts) nor flags against its own stored fingerprints.

CONTENT-IDENTITY CONTRACT: ``doc_id`` names immutable content — an
upstream UPDATE must arrive under a new doc_id (the medallion tier's CDC
path, not this monitor, owns mutation). The drop-on-redelivery rule is
only sound under that contract, so it is ENFORCED, not assumed: a
re-delivered doc_id whose fingerprint set differs from the stored set
(i.e. its text changed) is detected by a per-doc symmetric set-difference
probe against the store and, by default, raises — silently dropping it
would leave stale fingerprints standing forever while the new content is
never flagged. Pass ``on_changed_redelivery="ignore"`` only for sources
known to re-send byte-identical payloads with nondeterministic envelopes.

FLAGS COMMIT FIRST (the dedup-maintenance ordering argument): a crash
between the commits replays the epoch against a store that still excludes
the batch, so the recomputed flags are identical and no-op on the key;
store-first would make the replay join the batch against itself.

Hot fingerprints are capped at ingest (fps already in > ``hot_cap`` store
docs are dropped from the batch's JOIN side, not from the store), bounding
per-key fanout the same way the batch entry's cap does. The cumulative
invariant — streamed flags over any epoch split equal the batch-tier pairs
of the whole corpus — is pytest-pinned for the cap-free regime
(tests/test_overlap_maintenance.py).

At 100 TB the store is one row per selected fingerprint (~2/(w+1) of
normalized chars, 16 B each) and can be bucketed by fp on disk so the
corpus side of the per-epoch join never shuffles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.text import winnowing_fingerprints
from data_ingestion_bra_spark.sinks import txlog


def overlap_maintenance_writer(
    store_dir: str,
    flags_dir: str,
    *,
    query_id: str = "overlap",  # MUST be checkpoint-unique: txlog.checkpoint_scoped_query_id
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    hot_cap: int = 50,
    on_changed_redelivery: str = "error",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: flag overlaps of the arriving batch (vs store AND
    within batch, >= ``min_shared`` shared fingerprints), then fold the
    batch's fingerprints into the store — both exactly-once per epoch."""
    if on_changed_redelivery not in ("error", "ignore"):
        raise ValueError(
            "on_changed_redelivery must be 'error' or 'ignore', got "
            f"{on_changed_redelivery!r}"
        )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        store = (
            txlog.read_snapshot(spark, store_dir)
            if txlog.snapshot(store_dir).version >= 0
            else None
        )
        new_fp = (
            winnowing_fingerprints(batch_df, "doc_id", "text", k=k, window=window)
            .select("doc", "fp")
            .distinct()
        )
        if store is not None:
            # Exactly-once ACROSS epochs, not just per epoch: the txlog
            # idempotency key only dedupes EPOCH REPLAYS. If the source
            # re-delivers a doc_id in a LATER epoch (re-ingest), appending
            # its (doc, fp) rows again would double-count n_shared against
            # that doc (counts are per store row) and self-flag the doc
            # against its own stored fingerprints — silently breaking the
            # stream==batch invariant this module pins. Anti-join on doc
            # drops already-ingested docs before ANY consumer sees them.
            #
            # Dropping is only sound if the re-delivered content is THE
            # SAME content (doc_id = immutable identity, module contract).
            # Enforce it: a re-delivered doc whose fingerprint set differs
            # from the stored set changed upstream — surfacing it beats
            # keeping stale fingerprints forever and never flagging the
            # new text. Both probes are equi-joins bounded by the batch's
            # redelivered docs (batch-sized side broadcast by AQE).
            if on_changed_redelivery == "error":
                stored_docs = store.select("doc").distinct()
                redelivered = new_fp.join(stored_docs, "doc", "left_semi")
                store_of_redelivered = store.select("doc", "fp").join(
                    redelivered.select("doc").distinct(), "doc", "left_semi"
                )
                changed = (
                    redelivered.join(
                        store_of_redelivered, ["doc", "fp"], "left_anti"
                    )
                    .select("doc")
                    .unionByName(
                        store_of_redelivered.join(
                            redelivered, ["doc", "fp"], "left_anti"
                        ).select("doc")
                    )
                    .distinct()
                )
                sample = [r["doc"] for r in changed.limit(5).collect()]
                if sample:
                    raise ValueError(
                        "overlap_maintenance: re-delivered doc_id(s) with "
                        f"CHANGED content (fingerprint sets differ): "
                        f"{sample} — doc_id is an immutable content "
                        "identity; route updates through a new doc_id (or "
                        "pass on_changed_redelivery='ignore' for sources "
                        "that re-send identical payloads)"
                    )
            new_fp = new_fp.join(
                store.select("doc").distinct(), "doc", "left_anti"
            )
        new_fp = new_fp.localCheckpoint(eager=True)
        if new_fp.isEmpty():
            return
        probe = new_fp
        vs_store = None
        if store is not None:
            hot = (
                store.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("n_docs"))
                .filter(F.col("n_docs") > hot_cap)
                .select("fp")
            )
            probe = new_fp.join(F.broadcast(hot), "fp", "left_anti")
            vs_store = (
                probe.select(F.col("doc").alias("doc_new"), "fp")
                .join(store.select(F.col("doc").alias("doc_old"), "fp"), "fp")
                .groupBy("doc_new", "doc_old")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
                .filter(F.col("n_shared") >= min_shared)
            )
        a = probe.select(F.col("doc").alias("doc_new"), "fp")
        b = probe.select(F.col("doc").alias("doc_old"), "fp")
        within = (
            a.join(b, "fp")
            .filter(F.col("doc_new") > F.col("doc_old"))
            .groupBy("doc_new", "doc_old")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
        )
        flags = within if vs_store is None else vs_store.unionByName(within)
        flags = flags.withColumn("epoch", F.lit(int(epoch_id)))
        txlog.commit_append(
            flags, flags_dir, idempotency_key=f"{query_id}:flags:{epoch_id}"
        )
        txlog.commit_append(
            new_fp, store_dir, idempotency_key=f"{query_id}:store:{epoch_id}"
        )
        new_fp.unpersist()

    return write_batch
