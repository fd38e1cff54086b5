"""Streaming IVF maintenance: stream==batch assignment equality, list
append freshness, and the drift trigger."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators import similarity
from data_ingestion_bra_spark.sources.tables import load_table
from data_ingestion_bra_spark.streaming.ivf_maintenance import (
    index_mean_sim_e4,
    read_lists,
    read_maintenance_log,
    start_ivf_maintenance,
)

SF = "/root/testdata/sf0.001"


def _stream_embeddings(spark, src_dir: str):
    schema = "vec_id bigint, embedding array<float>, label int"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


def test_stream_assignment_equals_batch(spark, tmp_path):
    """Every vector replayed through the maintenance stream must land in the
    SAME cell the batch ``assign_cells`` operator chooses — the maintenance
    path reuses the exact operator, so the persisted lists stay consistent
    with an offline rebuild."""
    emb = load_table(spark, SF, "embeddings")
    cents = similarity.kmeans_train(emb, n_centroids=8, n_iter=1)
    batch = {
        (r["vid"], r["cell"])
        for r in similarity.assign_cells(emb, cents).select("vid", "cell").collect()
    }

    src = tmp_path / "src"
    emb.repartition(3).write.parquet(str(src))
    lists_dir = tmp_path / "lists.parquet"
    log = tmp_path / "maintenance.jsonl"
    q = start_ivf_maintenance(
        _stream_embeddings(spark, str(src)),
        cents,
        str(lists_dir),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_path=str(log),
        baseline_sim_e4=0,
    )
    q.awaitTermination()

    streamed = {
        (r["vid"], r["cell"])
        for r in read_lists(spark, str(lists_dir)).select("vid", "cell").collect()
    }
    assert streamed == batch
    recs = read_maintenance_log(str(log))
    assert sum(r["n_vectors"] for r in recs) == emb.count()
    assert all(not r["drift"] for r in recs)  # baseline 0 can't drift


def test_appended_lists_serve_semdedup(spark, tmp_path):
    """The appended lists are a drop-in for the batch-built index: semdedup
    over stream-built lists equals semdedup over batch-built lists."""
    emb = load_table(spark, SF, "embeddings")
    cents = similarity.kmeans_train(emb, n_centroids=8, n_iter=1)
    src = tmp_path / "src"
    emb.repartition(2).write.parquet(str(src))
    lists_dir = tmp_path / "lists.parquet"
    q = start_ivf_maintenance(
        _stream_embeddings(spark, str(src)),
        cents,
        str(lists_dir),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_path=str(tmp_path / "log.jsonl"),
        baseline_sim_e4=0,
    )
    q.awaitTermination()
    stream_lists = read_lists(spark, str(lists_dir))
    batch_lists = similarity.assign_cells(emb, cents).select("vid", "cell", "v")

    def result(lists):
        return {
            (r["vec_id"], r["cell"], r["cent_sim_e4"], r["n_dups"], r["keep"])
            for r in similarity.semdedup_prune(cents, lists, threshold_e4=4500).collect()
        }

    assert result(stream_lists) == result(batch_lists)


def test_drift_flag_fires_on_shifted_vectors(spark, tmp_path):
    """In-distribution batches stay under the drift threshold; a shifted
    batch (orthogonalized vectors the centroids never saw) pushes mean
    centroid-sim down past it and sets the retrain flag."""
    emb = load_table(spark, SF, "embeddings")
    cents = similarity.kmeans_train(emb, n_centroids=8, n_iter=1)
    lists = similarity.assign_cells(emb, cents).select("vid", "cell", "v")
    baseline = index_mean_sim_e4(lists, cents)
    assert baseline > 0

    # batch 1: the corpus itself (in-distribution). batch 2: dimension-wise
    # REVERSED vectors — same norms, scrambled directions (out-of-dist).
    src = tmp_path / "src"
    emb.limit(100).repartition(1).write.mode("append").parquet(str(src))
    emb.limit(100).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
        "label",
    ).repartition(1).write.mode("append").parquet(str(src))

    q = start_ivf_maintenance(
        _stream_embeddings(spark, str(src)),
        cents,
        str(tmp_path / "lists.parquet"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_path=str(tmp_path / "log.jsonl"),
        baseline_sim_e4=baseline,
        drift_threshold_e4=500,
    )
    q.awaitTermination()
    recs = read_maintenance_log(str(tmp_path / "log.jsonl"))
    by_drift = {r["drift"] for r in recs}
    # both outcomes observed: the in-distribution epoch passed, the
    # shifted epoch flagged
    assert by_drift == {False, True}, recs


def test_epoch_replay_does_not_duplicate_lists(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed epoch must NOT append its
    vectors again (duplicated vids are perfect cosine-1.0 duplicates that
    flip semdedup keep decisions). The txlog idempotency key makes the
    replay a no-op — same handler invoked twice, same list contents."""
    from data_ingestion_bra_spark.streaming.ivf_maintenance import (
        ivf_maintenance_writer,
    )

    emb = load_table(spark, SF, "embeddings")
    cents = similarity.kmeans_train(emb, n_centroids=8, n_iter=1)
    lists_dir = tmp_path / "lists"
    log = tmp_path / "log.jsonl"
    handle = ivf_maintenance_writer(
        cents, str(lists_dir), str(log), baseline_sim_e4=0
    )
    batch = emb.limit(50)
    handle(batch, 7)
    once = sorted(
        (r["vid"], r["cell"]) for r in read_lists(spark, str(lists_dir)).collect()
    )
    handle(batch, 7)  # restart replays the last epoch
    twice = sorted(
        (r["vid"], r["cell"]) for r in read_lists(spark, str(lists_dir)).collect()
    )
    assert twice == once and len(once) == 50
    # the replay no-ops before staging anything: zero vacuum debris
    from data_ingestion_bra_spark.sinks import txlog

    assert txlog.vacuum(str(lists_dir), min_age_seconds=0) == []
    # metadata log: one record for the epoch (at-most-once, documented)
    assert [r["epoch"] for r in read_maintenance_log(str(log))] == [7]
