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


def _gold_state(spark, gold):
    return {
        (r["lang"], r["n_rows"], r["sum_nchar"])
        for r in txlog.read_snapshot(spark, gold).collect()
    }


def _docs3(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def _gate3(df):
    return df.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 3).withColumn(
        "nchar", F.length("text")
    )


def _batch_gold(spark, bronze):
    """Oracle: gold recomputed FROM SCRATCH as one batch plan over bronze."""
    full = _gate3(txlog.read_snapshot(spark, bronze))
    return {
        (r["lang"], r["n_rows"], r["sum_nchar"])
        for r in full.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("nchar").cast("bigint").alias("sum_nchar"),
        )
        .collect()
    }


def test_three_tier_medallion_replay_exactly_once(spark, tmp_path):
    """Round-8 verdict item 4: bronze→silver→gold composed end to end —
    crash/restart between and after hops, gold always equals the batch
    recomputation, and no epoch / change-feed window double-applies."""
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")
    cp = str(tmp_path / "cp")

    txlog.commit_append(
        _docs3(
            spark,
            [(1, "pt", "um dois tres quatro"), (2, "pt", "curto"),
             (3, "en", "one two three")],
        ),
        bronze,
    )
    # full pipeline: gold == batch recomputation over bronze
    r1 = medallion.bronze_to_gold(
        spark, bronze, silver, gold,
        checkpoint_dir=cp, transform=_gate3,
        key_cols=("lang",), sum_cols=("nchar",),
    )
    assert r1["refreshed"] is True
    assert _gold_state(spark, gold) == _batch_gold(spark, bronze)

    # crash BETWEEN the hops: new bronze lands, hop 1 runs, the gold
    # refresh "crashes" (never called). Re-running the composed pipeline
    # must heal: silver not double-applied, gold converges.
    txlog.commit_append(
        _docs3(spark, [(4, "en", "four five six seven"), (5, "en", "no")]),
        bronze,
    )
    q = medallion.bronze_to_silver(
        spark, bronze, silver, checkpoint_dir=cp, transform=_gate3
    )
    q.awaitTermination(120)
    silver_v_after_hop1 = txlog.snapshot(silver).version
    r2 = medallion.bronze_to_gold(
        spark, bronze, silver, gold,
        checkpoint_dir=cp, transform=_gate3,
        key_cols=("lang",), sum_cols=("nchar",),
    )
    # hop 1 re-ran but had nothing new: silver log did not advance
    assert txlog.snapshot(silver).version == silver_v_after_hop1
    assert r2["refreshed"] is True
    assert _gold_state(spark, gold) == _batch_gold(spark, bronze)

    # crash AFTER everything (pure replay): the whole pipeline no-ops
    gold_v = txlog.snapshot(gold).version
    r3 = medallion.bronze_to_gold(
        spark, bronze, silver, gold,
        checkpoint_dir=cp, transform=_gate3,
        key_cols=("lang",), sum_cols=("nchar",),
    )
    assert r3["refreshed"] is False
    assert txlog.snapshot(gold).version == gold_v
    assert txlog.snapshot(silver).version == silver_v_after_hop1

    # a third bronze wave incl. rows that change an existing gold key:
    # the incremental path must equal the from-scratch batch aggregate
    txlog.commit_append(
        _docs3(spark, [(6, "pt", "cinco seis sete oito nove")]), bronze
    )
    r4 = medallion.bronze_to_gold(
        spark, bronze, silver, gold,
        checkpoint_dir=cp, transform=_gate3,
        key_cols=("lang",), sum_cols=("nchar",),
    )
    assert r4["refreshed"] is True
    assert _gold_state(spark, gold) == _batch_gold(spark, bronze)
    # exactly-once evidence in the LOGS: every silver commit carries a
    # distinct epoch key, every gold refresh a distinct silver version
    import json as _json
    import os as _os

    def _metas(table):
        log = _os.path.join(table, txlog.LOG_DIR)
        out = []
        for f in sorted(_os.listdir(log)):
            if f.endswith(".json"):
                out.append(_json.load(open(_os.path.join(log, f))).get("meta", {}))
        return out

    silver_epochs = [m["txn"] for m in _metas(silver) if "txn" in m]
    assert len(silver_epochs) == len(set(silver_epochs))
    gold_srcs = [
        m["src_version"] for m in _metas(gold) if "src_version" in m
    ]
    assert len(gold_srcs) == len(set(gold_srcs))


def test_gdpr_erasure_across_all_three_tiers(spark, tmp_path):
    """Right-to-be-forgotten through the lakehouse: erasure is row-level
    DML at EACH tier (the streaming hop is append-only by design and
    refuses rewrites — the published ignoreChanges trade), then the gold
    aggregate self-heals through the silver change feed's delete rows.
    Asserts the subject is gone at every tier, gold equals the batch
    recomputation, and the erased rows are physically removable (vacuum
    after retention, time travel notwithstanding)."""
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")
    cp = str(tmp_path / "cp")

    txlog.commit_append(
        _docs3(
            spark,
            [
                (1, "pt", "um dois tres quatro"),
                (2, "pt", "cinco seis sete oito"),
                (3, "en", "one two three four"),
            ],
        ),
        bronze,
    )
    medallion.bronze_to_gold(
        spark, bronze, silver, gold,
        checkpoint_dir=cp, transform=_gate3,
        key_cols=("lang",), sum_cols=("nchar",),
    )

    # the erasure: DML at bronze and silver (subject doc_id = 2), then the
    # gold refresh picks up silver's delete change rows
    _, n_b = txlog.commit_delete(spark, bronze, "doc_id = 2")
    _, n_s = txlog.commit_delete(spark, silver, "doc_id = 2")
    assert (n_b, n_s) == (1, 1)
    r = medallion.silver_to_gold(
        spark, silver, gold, key_cols=("lang",), sum_cols=("nchar",)
    )
    assert r["refreshed"] is True

    # gone at every tier
    for t in (bronze, silver):
        assert (
            txlog.read_snapshot(spark, t)
            .filter(F.col("doc_id") == 2)
            .count()
            == 0
        )
    assert _gold_state(spark, gold) == _batch_gold(spark, bronze)
    # pt aggregate shrank to doc 1 only (the deletion reached gold)
    pt = [g for g in _gold_state(spark, gold) if g[0] == "pt"]
    assert pt == [("pt", 1, len("um dois tres quatro"))]

    # the NEXT streaming hop must not resurrect the subject: the delete
    # rewrote bronze files, and an append-only stream refuses rewrites —
    # so erasure pipelines run the hop with ignore_changes (the rewrite's
    # surviving rows may re-emit, the documented duplicate trade) and rely
    # on tier-local DML. Assert the SUBJECT specifically never reappears.
    txlog.commit_append(
        _docs3(spark, [(4, "en", "five six seven eight")]), bronze
    )
    q = medallion.bronze_to_silver(
        spark, bronze, silver, checkpoint_dir=cp, transform=_gate3,
        ignore_changes=True,
    )
    q.awaitTermination(120)
    assert (
        txlog.read_snapshot(spark, silver)
        .filter(F.col("doc_id") == 2)
        .count()
        == 0
    )
    # physical erasure: after retention-free vacuum, no live or dead file
    # under bronze still contains the subject's bytes
    txlog.vacuum_retention(bronze, retain_versions=1, min_age_seconds=0)
    import os as _os

    import pyarrow.parquet as _pq

    data_root = _os.path.join(bronze, "data")
    for sub, _dirs, files in _os.walk(data_root):
        for fn in files:
            if fn.endswith(".parquet"):
                t = _pq.read_table(_os.path.join(sub, fn))
                assert 2 not in set(t["doc_id"].to_pylist())
