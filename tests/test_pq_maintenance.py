"""Streaming PQ code maintenance: stream==batch encode equality, ADC
serve-path equivalence, epoch-replay idempotency, and the
quantization-error drift trigger."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators import pq
from data_ingestion_bra_spark.sources.tables import load_table
from data_ingestion_bra_spark.streaming.pq_maintenance import (
    codebook_baseline_qerr,
    pq_maintenance_writer,
    read_codes,
    read_maintenance_log,
    start_pq_maintenance,
)

SF = "/root/testdata/sf0.001"


def _stream_embeddings(spark, src_dir: str):
    schema = "vec_id bigint, embedding array<float>, label int"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


def test_stream_codes_equal_batch_and_serve_adc(spark, tmp_path):
    """Every vector replayed through the maintenance stream must get the
    SAME codes the batch ``pq_encode`` operator assigns (the maintenance
    path reuses the exact operator), and ADC over the stream-built code
    table must equal ADC over batch-built codes — the maintained index is
    a drop-in for an offline rebuild."""
    emb = load_table(spark, SF, "embeddings")
    cb = pq.pq_train(emb)
    batch_codes = pq.pq_encode(emb, cb)
    expected = {
        (r["vec_id"], r["s"], r["code"]) for r in batch_codes.collect()
    }

    src = tmp_path / "src"
    emb.repartition(3).write.parquet(str(src))
    codes_dir = tmp_path / "codes"
    log = tmp_path / "maintenance.jsonl"
    q = start_pq_maintenance(
        _stream_embeddings(spark, str(src)),
        cb,
        str(codes_dir),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_path=str(log),
        baseline_qerr=1,
    )
    q.awaitTermination()

    streamed_codes = read_codes(spark, str(codes_dir))
    streamed = {
        (r["vec_id"], r["s"], r["code"]) for r in streamed_codes.collect()
    }
    assert streamed == expected
    recs = read_maintenance_log(str(log))
    assert sum(r["n_vectors"] for r in recs) == emb.count()

    # serve path: identical ADC top-k through the maintained table
    queries = emb.filter(F.col("vec_id") % 97 == 0)
    serve = lambda codes: {  # noqa: E731 - terse twin runner
        tuple(r) for r in pq.adc_topk(queries, codes, cb).collect()
    }
    assert serve(streamed_codes) == serve(batch_codes)


def test_epoch_replay_does_not_duplicate_codes(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed epoch must NOT append its
    codes again (duplicate (vec_id, s) rows would double-count every ADC
    sum). The txlog idempotency key makes the replay a no-op."""
    emb = load_table(spark, SF, "embeddings")
    cb = pq.pq_train(emb)
    codes_dir = tmp_path / "codes"
    log = tmp_path / "log.jsonl"
    handle = pq_maintenance_writer(cb, str(codes_dir), str(log), baseline_qerr=1)
    batch = emb.limit(40)
    handle(batch, 3)
    once = sorted(
        (r["vec_id"], r["s"], r["code"])
        for r in read_codes(spark, str(codes_dir)).collect()
    )
    handle(batch, 3)  # restart replays the last epoch
    twice = sorted(
        (r["vec_id"], r["s"], r["code"])
        for r in read_codes(spark, str(codes_dir)).collect()
    )
    assert twice == once and len(once) == 40 * pq.M_SUB
    # the replay no-ops before staging anything: zero vacuum debris
    from data_ingestion_bra_spark.sinks import txlog

    assert txlog.vacuum(str(codes_dir), min_age_seconds=0) == []
    assert [r["epoch"] for r in read_maintenance_log(str(log))] == [3]


def test_drift_flag_fires_on_scaled_vectors(spark, tmp_path):
    """In-distribution batches stay under the drift threshold; a batch of
    3x-scaled vectors (quantization error grows ~9x against a codebook
    trained at the original scale) trips the ratio trigger."""
    emb = load_table(spark, SF, "embeddings")
    cb = pq.pq_train(emb)
    baseline = codebook_baseline_qerr(emb, cb)
    assert baseline > 0

    src = tmp_path / "src"
    emb.limit(100).repartition(1).write.mode("append").parquet(str(src))
    emb.limit(100).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * 3).cast("float")).alias("embedding"),
        "label",
    ).repartition(1).write.mode("append").parquet(str(src))

    q = start_pq_maintenance(
        _stream_embeddings(spark, str(src)),
        cb,
        str(tmp_path / "codes"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_path=str(tmp_path / "log.jsonl"),
        baseline_qerr=baseline,
        drift_threshold_pct=50,
    )
    q.awaitTermination()
    recs = read_maintenance_log(str(tmp_path / "log.jsonl"))
    assert {r["drift"] for r in recs} == {False, True}, recs
