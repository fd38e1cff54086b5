"""Custom stateful operator (applyInPandasWithState sessionization):
sessions split on the 10-minute gap, emit on event-time timeout, and state
is removed afterward."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_bra_spark.streaming import jobs
from data_ingestion_bra_spark.streaming.stateful import sessionize


def _events_df(spark, rows):
    return (
        spark.createDataFrame(
            [(i, ts, uid, "click", v, "{}") for i, (ts, uid, v) in enumerate(rows)],
            "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def drop_file(tmp_path, d, df, name):
    staging = tmp_path / ("stage_" + name)
    df.coalesce(1).write.parquet(str(staging))
    part = next(p for p in os.listdir(staging) if p.endswith(".parquet"))
    os.replace(staging / part, d / name)


def test_sessionize_emits_on_timeout(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    batch1 = _events_df(
        spark,
        [
            ("2024-01-01 10:00:00", 1, 1.0),
            ("2024-01-01 10:05:00", 1, 2.0),  # same session (gap < 10m)
            ("2024-01-01 10:30:00", 1, 4.0),  # new session (25m gap)
        ],
    )
    # far-future event pushes the watermark past all session timeouts
    batch2 = _events_df(spark, [("2024-01-01 13:00:00", 2, 9.0)])

    drop_file(tmp_path, d, batch1, "b0.parquet")
    stream = spark.readStream.schema(jobs.EVENTS_SCHEMA).parquet(str(d))
    sessions = sessionize(stream.select("user_id", "ts", "value"))
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        drop_file(tmp_path, d, batch2, "b1.parquet")
        q.processAllAvailable()
        q.processAllAvailable()  # extra cycle lets timeouts fire post-watermark
    finally:
        q.stop()

    rows = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM t_stateful").collect()
    }
    # user 1, session 1: two events 10:00-10:05 sum 3.0
    assert rows[(1, "2024-01-01 10:00:00")] == (2, 3.0)
    # user 1, session 2: single event 10:30 sum 4.0 (emitted via timeout)
    assert rows[(1, "2024-01-01 10:30:00")] == (1, 4.0)
