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


def test_upsert_partitioned_merges_by_key(spark, tmp_path):
    from data_ingestion_bra_spark.sinks.upsert import upsert_partitioned

    table = str(tmp_path / "tb_dim")
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k bigint, v string, ver bigint"
    )
    base.write.parquet(table + "/anomesdia=20240101")
    spark.createDataFrame([(9, "z", 1)], "k bigint, v string, ver bigint").write.parquet(
        table + "/anomesdia=20240102"
    )

    updates = spark.createDataFrame(
        [(2, "B2", 2, "20240101"),   # replace existing key in partition 1
         (4, "d", 2, "20240101"),    # new key in partition 1
         (5, "e", 2, "20240103")],   # entirely new partition
        "k bigint, v string, ver bigint, anomesdia string",
    )
    stats = upsert_partitioned(spark, table, updates, key="k", version_col="ver")
    assert stats == {"partitions_rewritten": 1, "partitions_created": 1}

    back = spark.read.option("basePath", table).parquet(table)
    # partition discovery types anomesdia as int — normalize to str
    rows = {(str(r["anomesdia"]), r["k"]): r["v"] for r in back.collect()}
    assert rows[("20240101", 2)] == "B2"      # replaced
    assert rows[("20240101", 4)] == "d"       # inserted
    assert rows[("20240101", 1)] == "a"       # untouched key preserved
    assert rows[("20240102", 9)] == "z"       # untouched partition preserved
    assert rows[("20240103", 5)] == "e"       # new partition created
    assert len(rows) == 6


def test_upsert_older_version_never_clobbers_newer_row(spark, tmp_path):
    """Latest-wins means latest VERSION, not latest write: an update carrying
    an older version must lose to the newer existing row, and a same-version
    tie goes deterministically to the update."""
    from data_ingestion_bra_spark.sinks.upsert import upsert_partitioned

    table = str(tmp_path / "tb_ver")
    spark.createDataFrame(
        [(1, "new_existing", 5), (2, "old_existing", 1)], "k bigint, v string, ver bigint"
    ).write.parquet(table + "/anomesdia=20240101")
    updates = spark.createDataFrame(
        [(1, "stale_update", 3, "20240101"),  # older ver: must NOT win
         (2, "tied_update", 1, "20240101")],  # same ver: update wins
        "k bigint, v string, ver bigint, anomesdia string",
    )
    upsert_partitioned(spark, table, updates, key="k", version_col="ver")
    rows = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(table + "/anomesdia=20240101").collect()}
    assert rows[1] == ("new_existing", 5)
    assert rows[2] == ("tied_update", 1)


def test_upsert_crash_recovery_preserves_old_data(spark, tmp_path):
    """Crash injection: whatever half-finished state a dead run left behind
    (orphaned staging dir, or the partition stranded in the .__old trash dir
    between the two commit renames), the next upsert must first restore a
    complete consistent partition and then merge correctly."""
    import os
    import shutil

    from data_ingestion_bra_spark.sinks.upsert import upsert_partitioned

    table = str(tmp_path / "tb_crash")
    part = table + "/anomesdia=20240101"
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k bigint, v string, ver bigint"
    ).write.parquet(part)

    # crashed during staged write: orphan staging dir next to intact data
    shutil.copytree(part, part + ".__upsert_deadbeef")
    # crashed between the two commit renames: partition sits in trash
    os.replace(part, part + ".__old")
    assert not os.path.isdir(part)

    updates = spark.createDataFrame(
        [(2, "B2", 2, "20240101")], "k bigint, v string, ver bigint, anomesdia string"
    )
    stats = upsert_partitioned(spark, table, updates, key="k", version_col="ver")
    assert stats["partitions_rewritten"] == 1
    rows = {r["k"]: r["v"] for r in spark.read.parquet(part).collect()}
    assert rows == {1: "a", 2: "B2"}  # old row intact, update applied
    leftovers = [d for d in os.listdir(table) if ".__" in d]
    assert leftovers == []  # no staging/trash debris survives
