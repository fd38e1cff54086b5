from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_bra_spark.sinks.compact import compact_partition, count_data_files
from data_ingestion_bra_spark.sources.tables import load_table
from data_ingestion_bra_spark.streaming import jobs
from data_ingestion_bra_spark.streaming.bronze_ingest import start_bronze_ingest

SF = "/root/testdata/sf0.001"


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    part = tmp_path / "tb" / "anomesdia=20240101"
    ev = load_table(spark, SF, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    ev.repartition(16).write.parquet(str(part))
    assert count_data_files(str(part)) >= 16
    before = spark.read.parquet(str(part)).count()

    stats = compact_partition(spark, str(part), target_file_bytes=64 * 1024 * 1024)
    assert stats["compacted"] is True
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1  # tiny partition → single target file

    after_df = spark.read.parquet(str(part))
    assert after_df.count() == before  # row-identical rewrite


def test_compaction_noop_when_already_compact(spark, tmp_path):
    part = tmp_path / "tb" / "anomesdia=20240101"
    spark.range(100).write.parquet(str(part))
    n = count_data_files(str(part))
    stats = compact_partition(spark, str(part), target_file_bytes=64 * 1024 * 1024, min_files=n + 1)
    assert stats["compacted"] is False


def test_bronze_ingest_checkpoint_restart_no_duplicates(spark, tmp_path):
    """Exactly-once across restarts: re-starting the query with the same
    checkpoint must process ONLY files that arrived since."""
    src = tmp_path / "src"
    src.mkdir()
    ev = load_table(spark, SF, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)

    def drop(df, name):
        staging = tmp_path / ("stage_" + name)
        df.coalesce(1).write.parquet(str(staging))
        part = next(p for p in os.listdir(staging) if p.endswith(".parquet"))
        os.replace(staging / part, src / name)

    bronze = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    drop(half1, "a.parquet")
    stream = spark.readStream.schema(jobs.EVENTS_SCHEMA).parquet(str(src))
    q1 = start_bronze_ingest(stream, bronze, "tb_events", checkpoint_dir=ckpt)
    q1.awaitTermination()

    drop(half2, "b.parquet")
    stream2 = spark.readStream.schema(jobs.EVENTS_SCHEMA).parquet(str(src))
    q2 = start_bronze_ingest(stream2, bronze, "tb_events", checkpoint_dir=ckpt)
    q2.awaitTermination()

    back = spark.read.option("basePath", bronze + "/tb_events").parquet(bronze + "/tb_events")
    assert back.count() == ev.count()  # no duplicates, nothing missed
    assert back.select("event_id").distinct().count() == ev.count()
