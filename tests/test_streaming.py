"""Structured Streaming: incremental results through a memory sink must
match the batch twins on the same data (SURVEY §7.2.7), and watermarks must
actually drop late data in append mode."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from data_ingestion_bra_spark.sources.tables import load_table
from data_ingestion_bra_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Split the events fixture into multiple parquet files so the file
    stream sees several micro-batches."""
    d = tmp_path_factory.mktemp("events_stream")
    ev = load_table(spark, SF, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    ev.repartition(4).write.mode("overwrite").parquet(str(d))
    return str(d)


def _batch_events(spark, events_dir):
    return spark.read.parquet(events_dir)


def test_streaming_tumbling_matches_batch(spark, events_dir):
    # complete mode: all windows emitted, no late-drop — must equal batch
    # exactly even though micro-batches arrive in arbitrary time order.
    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    jobs.run_to_memory_sink(
        jobs.tumbling_counts(stream), name="t_tumbling", output_mode="complete"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in jobs.tumbling_counts(_batch_events(spark, events_dir)).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_session_windows_run(spark, events_dir):
    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    jobs.run_to_memory_sink(jobs.session_counts(stream), name="t_sessions")
    rows = spark.sql("SELECT * FROM t_sessions").collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


def test_streaming_sliding_counts_total(spark, events_dir):
    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=4)
    jobs.run_to_memory_sink(
        jobs.sliding_counts(stream), name="t_sliding", output_mode="complete"
    )
    total = spark.sql("SELECT SUM(n) AS s FROM t_sliding").first()["s"]
    n_events = _batch_events(spark, events_dir).count()
    assert total == 2 * n_events  # every event lands in exactly 2 windows


def test_watermark_drops_late_data(spark, tmp_path):
    """Append mode: an event older than (max seen ts - watermark) arriving
    in a later micro-batch is dropped — bounded state, by design."""
    d = tmp_path / "late"
    d.mkdir()
    on_time = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
         (2, "2024-01-01 12:00:00", 1, "click", 1.0, "{}")],
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    late = spark.createDataFrame(
        [(3, "2024-01-01 10:05:00", 1, "click", 1.0, "{}")],  # 2h late vs 12:00 watermark base
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    def drop_file(df, name):
        staging = tmp_path / ("stage_" + name)
        df.coalesce(1).write.parquet(str(staging))
        part = next(p for p in os.listdir(staging) if p.endswith(".parquet"))
        os.replace(staging / part, d / name)

    drop_file(on_time, "b0.parquet")
    stream = spark.readStream.schema(jobs.EVENTS_SCHEMA).parquet(str(d))
    q = (
        jobs.tumbling_counts(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: on-time events; watermark → 11:50
        drop_file(late, "b1.parquet")
        q.processAllAvailable()  # batch 2: 10:05 event is behind watermark
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM t_late").collect()
    counted = sum(r["n"] for r in rows)
    # event 3 (10:05, window 10:00) is behind the 11:50 watermark → dropped;
    # the 12:00 window itself is not yet finalized → append emits only 10:00
    assert counted == 1


def test_stream_stream_join_matches_batch(spark, events_dir):
    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    joined = jobs.stream_stream_click_purchase_join(stream)
    jobs.run_to_memory_sink(joined, name="t_ssj")
    got = {
        (r["purchase_id"], str(r["c_ts"]))
        for r in spark.sql("SELECT * FROM t_ssj").collect()
    }
    batch = jobs.stream_stream_click_purchase_join(_batch_events(spark, events_dir))
    want = {(r["purchase_id"], str(r["c_ts"])) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_streaming_quality_gate_matches_batch(spark, tmp_path):
    """The Gopher gate is stateless: streaming micro-batches must keep
    exactly the docs the batch form keeps, in any file arrival order."""
    good = (
        "the quick brown foxes and their lazy dogs jumped over a fence of stone "
        * 5
    )
    docs = spark.createDataFrame(
        [(0, good), (1, "too short"), (2, good + " again"), (3, "123 456 789")],
        "doc_id bigint, text string",
    )
    d = str(tmp_path / "docs")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = jobs.read_documents_stream(spark, d, max_files_per_trigger=1)
    jobs.run_to_memory_sink(
        jobs.quality_gate_stream(stream), name="t_qgate", output_mode="append"
    )
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_qgate").collect()}
    from data_ingestion_bra_spark.operators.text import gopher_metric_cols

    want = {
        tuple(r)
        for r in spark.read.parquet(d)
        .filter(gopher_metric_cols("text")["passes_quality"] == 1)
        .collect()
    }
    # surviving rows keep ALL source columns (doc_id AND the body)
    assert spark.sql("SELECT * FROM t_qgate").columns == ["doc_id", "text"]
    assert got == want
    assert {r[0] for r in got} == {0, 2}


def test_streaming_pii_scrub_matches_batch(spark, tmp_path):
    """The PII scrub is stateless, so streaming micro-batches must produce
    exactly the batch result row-for-row regardless of file arrival order."""
    docs = spark.createDataFrame(
        [
            (0, 'fale com ana@ex.com ou (11) 91234-5678'),
            (1, "nada sensivel"),
            (2, "cpf 111.222.333-44 em contrato"),
            (3, "b@c.de e tambem d@e.fg"),
        ],
        "doc_id bigint, text string",
    )
    d = str(tmp_path / "docs")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = jobs.read_documents_stream(spark, d, max_files_per_trigger=1)
    jobs.run_to_memory_sink(jobs.pii_scrub_stream(stream), name="t_pii", output_mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_pii").collect()}
    from data_ingestion_bra_spark.operators.text import pii_scrub

    want = {tuple(r) for r in pii_scrub(spark.read.parquet(d), "doc_id", "text").collect()}
    assert got == want and len(got) == 4


def test_streaming_model_gate_matches_batch(spark, tmp_path):
    """The trained quality-model gate is stateless: streaming micro-batches
    must keep exactly the docs the batch score keeps, with all source
    columns, in any file arrival order."""
    good = (
        "the committee met on thursday morning and the members discussed a "
        "plan for the next season of work and the chair thanked everyone "
        "for the careful preparation and the honest questions that followed "
    ) * 2
    docs = spark.createDataFrame(
        [(0, good), (1, " ".join(["spark"] * 60)), (2, good + " again"),
         (3, "1 2 3 4 5 6 7 8 9")],
        "doc_id bigint, text string",
    )
    d = str(tmp_path / "docs")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = jobs.read_documents_stream(spark, d, max_files_per_trigger=1)
    jobs.run_to_memory_sink(
        jobs.model_gate_stream(stream), name="t_mgate", output_mode="append"
    )
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_mgate").collect()}
    from data_ingestion_bra_spark.operators.quality_model import quality_score_expr
    from pyspark.sql import functions as F

    want = {
        tuple(r)
        for r in spark.read.parquet(d)
        .filter(quality_score_expr(F.col("text")) >= 0)
        .collect()
    }
    assert spark.sql("SELECT * FROM t_mgate").columns == ["doc_id", "text"]
    assert got == want
    assert {r[0] for r in got} == {0, 2}


def test_streaming_perplexity_gate_matches_batch(spark, tmp_path):
    """The CCNet LM gate at ingest: stream output must equal the batch
    filter with all source columns kept; training-domain prose passes,
    OOV noise and too-short docs are cut."""
    good = (
        "all human beings are born free and equal in dignity and rights "
        "they are endowed with reason and conscience and should act towards "
        "one another in a spirit of brotherhood "
    ) * 2
    docs = spark.createDataFrame(
        [(0, good), (1, "xqzv glorp wibble zonkt frubs plimt quage dribnax"),
         (2, good + " again"), (3, "one")],
        "doc_id bigint, text string",
    )
    d = str(tmp_path / "docs")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = jobs.read_documents_stream(spark, d, max_files_per_trigger=1)
    jobs.run_to_memory_sink(
        jobs.perplexity_gate_stream(stream), name="t_lmgate", output_mode="append"
    )
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_lmgate").collect()}
    from data_ingestion_bra_spark.operators.ngram_lm import passes_lm_expr

    want = {
        tuple(r)
        for r in spark.read.parquet(d).filter(passes_lm_expr(F.col("text"))).collect()
    }
    assert spark.sql("SELECT * FROM t_lmgate").columns == ["doc_id", "text"]
    assert got == want
    assert {r[0] for r in got} == {0, 2}


def test_streaming_web_extract_matches_batch(spark, tmp_path):
    """WARC→HTML→main-text extraction is stateless: the stream must emit
    exactly the batch pipeline's front-half rows in any arrival order."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "source", "text")
        .limit(60)
    )
    d = str(tmp_path / "docs_web")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = jobs.read_documents_stream(spark, d, max_files_per_trigger=1)
    jobs.run_to_memory_sink(
        jobs.web_extract_stream(stream), name="t_webx", output_mode="append"
    )
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_webx").collect()}
    want = {
        tuple(r) for r in jobs.web_extract_stream(spark.read.parquet(d)).collect()
    }
    assert got == want and len(got) == 60
