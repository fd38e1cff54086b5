"""Streaming PQ code maintenance: the incremental leg of the compressed
ANN story (``operators/pq.py``), mirroring ``ivf_maintenance`` for the
code table.

A persisted PQ index (codebook + 4-byte codes) goes stale the same two
ways the IVF index does as vectors keep arriving: the CODE TABLE misses
the new vectors (freshness), and the CODEBOOK stops describing the
distribution (drift — quantization error grows). Both close inside
``foreachBatch``:

- **append**: each micro-batch is encoded against the FROZEN persisted
  codebook with ``pq_encode_with_err`` (broadcast codebook join +
  map-side-combinable struct-min — nothing but the batch shuffles) and
  the (vec_id, s, code) rows land as ONE ACID txlog commit keyed
  ``<query_id>:<epoch>``. foreachBatch is at-least-once — a replayed
  epoch no-ops on the already-committed key before doing ANY work, so a
  restart can never double-encode a vector (duplicated codes would make
  ADC return the same candidate twice and skew every top-k).
- **drift flag**: the batch's mean integer quantization error (the
  winning codeword's squared L2, summed over subspaces per vector) is
  compared against the codebook's own baseline (mean qerr of the corpus
  it was trained on, computed once at maintenance start). Error is a
  RATIO signal, not a difference: a batch whose mean qerr exceeds
  ``baseline * (1 + drift_threshold_pct/100)`` sets ``drift=true`` in
  the maintenance log — the retrain trigger. Mean quantization error is
  PQ's standard index-quality measure (Jégou et al. 2011 §IV tie
  distortion directly to recall).

The maintenance log is JSON-lines control-plane metadata, written AFTER
the commit publishes (data exactly-once; metadata at-most-once per epoch
— same contract as ``ivf_maintenance``, documented there). At 100 TB the
handler runs unchanged: the batch is the only thing encoded, the code
table is object-store parquet under a KB-scale commit log, and
retraining stays an offline decision driven by the drift flags.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.pq import M_SUB, pq_encode_with_err


def codebook_baseline_qerr(
    vectors: DataFrame,
    codebook: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = M_SUB,
) -> int:
    """Baseline index quality: mean PER-VECTOR quantization error (sum of
    the m subspace errors) over the corpus the codebook was trained on.
    One encode pass + one scalar agg."""
    enc = pq_encode_with_err(
        vectors, codebook, id_col=id_col, vec_col=vec_col, dim=dim, m=m
    )
    row = (
        enc.groupBy(id_col)
        .agg(F.sum("qerr").alias("vqerr"))
        .agg(F.floor(F.avg("vqerr")).cast("bigint").alias("mean_qerr"))
        .first()
    )
    return int(row["mean_qerr"])


def pq_maintenance_writer(
    codebook: DataFrame,
    codes_dir: str,
    log_path: str,
    *,
    baseline_qerr: int,
    drift_threshold_pct: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = M_SUB,
    query_id: str = "pq-maintenance",
):
    """Returns the ``foreachBatch`` handler. ``codebook`` must be the
    PERSISTED trained codebook (``pq_train``) — maintenance never
    retrains, it only measures how badly a retrain is needed.

    Exactly-once: the codes append is a txlog commit keyed
    ``<query_id>:<epoch>``; a replayed epoch no-ops before computing
    anything. The encoded batch is persisted so the stats action and the
    commit write share one encode computation."""
    from data_ingestion_bra_spark.sinks import txlog

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        key = f"{query_id}:{int(epoch_id)}"
        if txlog.committed_version(codes_dir, key) is not None:
            return  # replayed epoch: this batch's codes already committed
        if batch_df.isEmpty():
            return
        enc = pq_encode_with_err(
            batch_df, codebook, id_col=id_col, vec_col=vec_col, dim=dim, m=m
        ).persist()
        try:
            stats = (
                enc.groupBy(id_col)
                .agg(F.sum("qerr").alias("vqerr"))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.floor(F.avg("vqerr")).cast("bigint").alias("mean_qerr"),
                )
                .first()
            )
            txlog.commit_append(
                enc.select(id_col, "s", "code"),
                codes_dir,
                meta={"epoch": int(epoch_id)},
                idempotency_key=key,
            )
        finally:
            enc.unpersist()
        mean_qerr = int(stats["mean_qerr"])
        rec = {
            "epoch": int(epoch_id),
            "n_vectors": int(stats["n"]),
            "mean_qerr": mean_qerr,
            "baseline_qerr": int(baseline_qerr),
            "drift": bool(
                mean_qerr * 100 > baseline_qerr * (100 + drift_threshold_pct)
            ),
        }
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    return handle


def read_codes(spark, codes_dir: str) -> DataFrame:
    """Snapshot-isolated read of the maintained code table (txlog table,
    not a bare parquet dir — raw reads would pick up crashed writers'
    staged files)."""
    from data_ingestion_bra_spark.sinks import txlog

    return txlog.read_snapshot(spark, codes_dir)


def start_pq_maintenance(
    vectors_stream: DataFrame,
    codebook: DataFrame,
    codes_dir: str,
    *,
    checkpoint_dir: str,
    log_path: str,
    baseline_qerr: int,
    drift_threshold_pct: int = 50,
    available_now: bool = True,
    **writer_kwargs,
):
    """Start the maintenance stream over a vector source (same schema as
    the embeddings table). ``query_id`` (via writer_kwargs) defaults to a
    CHECKPOINT-scoped id — see ``txlog.checkpoint_scoped_query_id`` for
    why a constant id loses data across a checkpoint reset."""
    from data_ingestion_bra_spark.sinks import txlog

    os.makedirs(Path(log_path).parent, exist_ok=True)
    writer_kwargs.setdefault(
        "query_id",
        txlog.checkpoint_scoped_query_id("pq-maintenance", checkpoint_dir),
    )
    writer = vectors_stream.writeStream.foreachBatch(
        pq_maintenance_writer(
            codebook,
            codes_dir,
            log_path,
            baseline_qerr=baseline_qerr,
            drift_threshold_pct=drift_threshold_pct,
            **writer_kwargs,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_maintenance_log(log_path: str) -> list[dict]:
    if not os.path.exists(log_path):
        return []
    with open(log_path) as f:
        return [json.loads(line) for line in f if line.strip()]
