"""Partition retention (directory-level, no scan) and shuffle-partition
autosizing from input bytes."""

from __future__ import annotations

import os
from datetime import date

from data_ingestion_bra_spark.session import size_shuffle_partitions
from data_ingestion_bra_spark.sinks.retention import expire_partitions, list_partitions

GB = 1024**3


def _mk_partitions(tmp_path, values):
    for v in values:
        d = tmp_path / f"anomesdia={v}"
        d.mkdir(parents=True)
        (d / "part-0.parquet").write_bytes(b"x")


def test_expire_partitions_dry_run_then_delete(tmp_path):
    _mk_partitions(tmp_path, ["20240101", "20240105", "20240110", "not_a_date"])
    today = date(2024, 1, 12)

    dry = expire_partitions(str(tmp_path), keep_days=5, today=today, dry_run=True)
    assert dry == ["20240101", "20240105"]
    assert list_partitions(str(tmp_path)) == [
        "20240101", "20240105", "20240110", "not_a_date",
    ]

    gone = expire_partitions(str(tmp_path), keep_days=5, today=today, dry_run=False)
    assert gone == ["20240101", "20240105"]
    assert list_partitions(str(tmp_path)) == ["20240110", "not_a_date"]
    # unparseable partition dirs are never touched
    assert os.path.isdir(tmp_path / "anomesdia=not_a_date")


def test_expire_partitions_missing_dir_is_empty(tmp_path):
    assert expire_partitions(str(tmp_path / "nope"), keep_days=1) == []


def test_size_shuffle_partitions_clamps(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        assert size_shuffle_partitions(spark, 10 * GB) == 80
        assert spark.conf.get("spark.sql.shuffle.partitions") == "80"
        assert size_shuffle_partitions(spark, 0) == 32  # floor
        assert size_shuffle_partitions(spark, 100 * 1024**4) == 200_000  # ceiling
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
