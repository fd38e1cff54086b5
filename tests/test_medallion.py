"""Bronze→silver medallion hop (streaming/medallion.py): exactly-once
end to end across restarts, with a real gate transform in the middle."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_bra_spark.sinks import txlog
from data_ingestion_bra_spark.streaming import medallion


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _silver_rows(spark, silver):
    return {
        (r["doc_id"], r["text"])
        for r in txlog.read_snapshot(spark, silver).collect()
    }


def _gate(df):
    # a real curation gate: keep docs with >= 3 whitespace tokens
    return df.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 3)


def test_hop_applies_transform_exactly_once_across_restarts(spark, tmp_path):
    bronze, silver = str(tmp_path / "bronze"), str(tmp_path / "silver")
    cp = str(tmp_path / "cp")
    txlog.commit_append(
        _docs(spark, [(1, "a b c d"), (2, "too short")]), bronze
    )
    q = medallion.bronze_to_silver(
        spark, bronze, silver, checkpoint_dir=cp, transform=_gate
    )
    q.awaitTermination(120)
    assert _silver_rows(spark, silver) == {(1, "a b c d")}
    # new bronze commits: a restarted hop processes ONLY the delta
    txlog.commit_append(
        _docs(spark, [(3, "x y z w v"), (4, "no")]), bronze
    )
    q = medallion.bronze_to_silver(
        spark, bronze, silver, checkpoint_dir=cp, transform=_gate
    )
    q.awaitTermination(120)
    assert _silver_rows(spark, silver) == {(1, "a b c d"), (3, "x y z w v")}
    silver_versions = txlog.snapshot(silver).version
    # idle restart: no new bronze commits -> silver log unchanged
    q = medallion.bronze_to_silver(
        spark, bronze, silver, checkpoint_dir=cp, transform=_gate
    )
    q.awaitTermination(120)
    assert txlog.snapshot(silver).version == silver_versions
    assert _silver_rows(spark, silver) == {(1, "a b c d"), (3, "x y z w v")}


def test_fresh_checkpoint_never_loses_new_bronze_data(spark, tmp_path):
    # THE key-collision hazard (round-8 review finding): epoch ids
    # renumber from 0 under a fresh checkpoint, so a constant query_id
    # would see its new epoch-0 key already committed and silently DROP
    # the bronze rows added since — the checkpoint-scoped default makes a
    # fresh checkpoint a new consumer instead.
    bronze, silver = str(tmp_path / "bronze"), str(tmp_path / "silver")
    txlog.commit_append(_docs(spark, [(1, "p q r s")]), bronze)
    q = medallion.bronze_to_silver(
        spark, bronze, silver, checkpoint_dir=str(tmp_path / "cp1"),
        transform=_gate,
    )
    q.awaitTermination(120)
    assert _silver_rows(spark, silver) == {(1, "p q r s")}
    # bronze advances, then a hop with a FRESH checkpoint runs: its epoch
    # 0 covers v0..v1 — the new rows MUST land (duplicates of v0's rows
    # are the documented reprocessing trade of abandoning a checkpoint)
    txlog.commit_append(_docs(spark, [(2, "u v w x")]), bronze)
    q = medallion.bronze_to_silver(
        spark, bronze, silver, checkpoint_dir=str(tmp_path / "cp2"),
        transform=_gate,
    )
    q.awaitTermination(120)
    assert (2, "u v w x") in _silver_rows(spark, silver)
    # while a replay under the SAME checkpoint lineage stays a no-op
    n_versions = txlog.snapshot(silver).version
    q = medallion.bronze_to_silver(
        spark, bronze, silver, checkpoint_dir=str(tmp_path / "cp2"),
        transform=_gate,
    )
    q.awaitTermination(120)
    assert txlog.snapshot(silver).version == n_versions
