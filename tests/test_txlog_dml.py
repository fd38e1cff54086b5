"""Row-level DML through the transaction log: copy-on-write DELETE and
MERGE/upsert, OPTIMIZE-style compaction (no logical change), change data
feed derived from commit records, and the file-level conflict rule.

Semantics target the published lakehouse behavior (Delta Lake, Armbrust
et al. VLDB 2020 §3.2): rewrites touch only files containing affected
rows, publish atomically, and concurrent appends never conflict with a
rewrite (WriteSerializable default).
"""

from __future__ import annotations

import json
import os

import pytest

from data_ingestion_bra_spark.sinks import txlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def _rows(spark, table_dir, version=None):
    return {
        (r["k"], r["v"])
        for r in txlog.read_snapshot(spark, table_dir, version).collect()
    }


def test_delete_rewrites_only_touched_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)
    txlog.commit_append(_df(spark, [(3, "c"), (4, "d")]).coalesce(1), t)
    before = set(txlog.snapshot(t).files)
    version, n = txlog.commit_delete(spark, t, "k = 3")
    assert (version, n) == (2, 1)
    assert _rows(spark, t) == {(1, "a"), (2, "b"), (4, "d")}
    # the file holding (1,2) was never rewritten — still live by reference
    after = set(txlog.snapshot(t).files)
    assert len(before & after) == 1
    # pre-delete version stays time-travelable
    assert _rows(spark, t, version=1) == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}


def test_delete_matching_nothing_commits_nothing(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]), t)
    version, n = txlog.commit_delete(spark, t, "k = 99")
    assert (version, n) == (0, 0)
    assert txlog.snapshot(t).version == 0


def test_upsert_updates_and_inserts_atomically(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)
    txlog.commit_append(_df(spark, [(3, "c")]).coalesce(1), t)
    v = txlog.commit_upsert(
        spark, t, _df(spark, [(2, "B2"), (9, "new")]), key="k"
    )
    assert v == 2
    assert _rows(spark, t) == {(1, "a"), (2, "B2"), (3, "c"), (9, "new")}
    # untouched file (3,"c") carried by reference, not rewritten
    rec = json.load(open(os.path.join(t, txlog.LOG_DIR, "%016d.json" % 2)))
    assert rec["meta"]["op"] == "upsert"
    assert len(rec["remove"]) == 1  # only the file holding k=2


def test_upsert_into_empty_key_space_is_pure_insert(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]), t)
    txlog.commit_upsert(spark, t, _df(spark, [(5, "e")]), key="k")
    rec = json.load(open(os.path.join(t, txlog.LOG_DIR, "%016d.json" % 1)))
    assert rec["remove"] == []
    assert _rows(spark, t) == {(1, "a"), (5, "e")}


def test_compact_preserves_rows_and_is_skipped_by_cdf(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for k in range(4):
        txlog.commit_append(_df(spark, [(k, f"v{k}")]).coalesce(1), t)
    assert len(txlog.snapshot(t).files) == 4
    before = _rows(spark, t)
    v = txlog.compact(spark, t, target_bytes=1 << 20)
    assert v == 4
    assert len(txlog.snapshot(t).files) == 1
    assert _rows(spark, t) == before
    # pre-compaction layout remains time-travelable
    assert len(txlog.snapshot(t, version=3).files) == 4
    assert _rows(spark, t, version=3) == before
    # data_change: false → the CDF window over the compaction alone is an
    # EMPTY typed frame (raising here crashed matview refreshes after an
    # OPTIMIZE — round-7 ADVICE), with the change-feed columns resolvable
    ch = txlog.read_changes(spark, t, 4, 4)
    assert ch.count() == 0
    assert {"_change_type", "_commit_version"} <= set(ch.columns)


def test_compact_noop_below_two_small_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]).coalesce(1), t)
    assert txlog.compact(spark, t, target_bytes=1 << 20) is None


def test_change_feed_replays_inserts_updates_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)          # v0
    txlog.commit_delete(spark, t, "k = 1")                            # v1
    txlog.commit_upsert(spark, t, _df(spark, [(2, "B2")]), key="k")   # v2
    ch = {
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in txlog.read_changes(spark, t, 0).collect()
    }
    assert ch == {
        (1, "a", "insert", 0),
        (2, "b", "insert", 0),
        (1, "a", "delete", 1),
        (2, "b", "delete", 2),   # pre-image of the update
        (2, "B2", "insert", 2),  # post-image
    }
    # windowed read: only the delete commit
    only_v1 = {
        (r["k"], r["_change_type"])
        for r in txlog.read_changes(spark, t, 1, 1).collect()
    }
    assert only_v1 == {(1, "delete")}


def test_rewrite_conflicts_with_concurrent_rewrite_of_same_file(
    spark, tmp_path, monkeypatch
):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)

    # a second writer deletes k=2 (rewriting the only file) between this
    # writer's planning and publish
    real_publish = txlog._try_publish
    fired = {"done": False}

    def racing_publish(table_dir, version, record):
        if not fired["done"] and record["meta"].get("op") == "delete" and (
            record["meta"].get("probe") == "loser"
        ):
            fired["done"] = True
            txlog.commit_delete(spark, t, "k = 2")
        return real_publish(table_dir, version, record)

    monkeypatch.setattr(txlog, "_try_publish", racing_publish)
    with pytest.raises(txlog.CommitConflict):
        txlog.commit_delete(spark, t, "k = 1", meta={"probe": "loser"})
    # the winner's delete landed; the loser's did not
    assert _rows(spark, t) == {(1, "a")}


def test_append_does_not_conflict_with_concurrent_rewrite(
    spark, tmp_path, monkeypatch
):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)

    real_publish = txlog._try_publish
    fired = {"done": False}

    def racing_publish(table_dir, version, record):
        if not fired["done"] and record["meta"].get("op") == "delete":
            fired["done"] = True
            txlog.commit_append(_df(spark, [(9, "z")]), t)  # steals a version
        return real_publish(table_dir, version, record)

    monkeypatch.setattr(txlog, "_try_publish", racing_publish)
    version, n = txlog.commit_delete(spark, t, "k = 1")  # retries past append
    assert n == 1
    assert _rows(spark, t) == {(2, "b"), (9, "z")}


def test_dml_idempotency_keys_make_replays_noops(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)
    v1, _ = txlog.commit_delete(spark, t, "k = 1", idempotency_key="d1")
    v1b, n = txlog.commit_delete(spark, t, "k = 2", idempotency_key="d1")
    assert (v1b, n) == (v1, -1)  # replay: no-op, nothing deleted
    assert _rows(spark, t) == {(2, "b")}
    v2 = txlog.commit_upsert(
        spark, t, _df(spark, [(2, "B2")]), key="k", idempotency_key="u1"
    )
    assert (
        txlog.commit_upsert(
            spark, t, _df(spark, [(2, "XX")]), key="k", idempotency_key="u1"
        )
        == v2
    )
    assert _rows(spark, t) == {(2, "B2")}


def test_zorder_compaction_tightens_log_stats_for_pruning(spark, tmp_path):
    """OPTIMIZE ZORDER: after a morton-interleave rewrite, each file's
    log-carried min/max covers a small rectangle of the (x, y) plane, so
    log-side pruning on EITHER key skips most files; the same data
    plain-compacted into equally many files prunes nothing."""
    from pyspark.sql import functions as F

    rows = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("bigint").alias("y"),
        F.col("id").alias("payload"),
    )
    # interleaved appends: every file spans the whole x domain
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    for t in (plain, zord):
        for m in range(4):
            txlog.commit_append(
                rows.filter(F.col("id") % 4 == m).coalesce(1), t
            )
    assert txlog.compact(spark, plain, n_files=4, target_bytes=1 << 30) == 4
    assert (
        txlog.compact(spark, zord, n_files=4, zorder_by=("x", "y")) == 4
    )
    # identical logical content
    want = {(r["x"], r["y"], r["payload"]) for r in rows.collect()}
    for t in (plain, zord):
        got = {
            (r["x"], r["y"], r["payload"])
            for r in txlog.read_snapshot(spark, t).collect()
        }
        assert got == want
    # narrow x-range probe: zordered files prune from the log, plain don't
    def n_scanned(t):
        snap = txlog.snapshot(t)
        return len(
            [e for e in snap.entries if txlog._stats_overlap(e, "x", 0, 7)]
        )

    assert n_scanned(plain) == 4       # every file spans x=0..63
    assert n_scanned(zord) <= 2        # rectangles: most files skipped
    # and the pruned read still returns every matching row
    pruned = (
        txlog.read_snapshot(spark, zord, prune=("x", 0, 7))
        .filter(F.col("x") <= 7)
        .count()
    )
    assert pruned == rows.filter(F.col("x") <= 7).count()


def test_schema_enforcement_and_additive_evolution(spark, tmp_path):
    """Write-path schema contract: identical schemas append freely; a new
    column needs merge_schema=True; a type change is always rejected;
    merged reads fill nulls for pre-evolution files and project to the
    log-recorded column set."""
    t = str(tmp_path / "tbl")
    txlog.commit_append_checked(_df(spark, [(1, "a")]), t)
    assert txlog.table_schema(t) == {"k": "bigint", "v": "string"}
    # same schema: fine
    txlog.commit_append_checked(_df(spark, [(2, "b")]), t)
    wide = spark.createDataFrame([(3, "c", 9.5)], "k bigint, v string, score double")
    # new column without opt-in: rejected, nothing committed
    with pytest.raises(txlog.SchemaMismatch, match="merge_schema"):
        txlog.commit_append_checked(wide, t)
    assert txlog.snapshot(t).version == 1
    # opt-in additive evolution
    txlog.commit_append_checked(wide, t, merge_schema=True)
    assert txlog.table_schema(t) == {
        "k": "bigint", "v": "string", "score": "double"
    }
    # type change: always rejected
    retyped = spark.createDataFrame([(4, 7)], "k bigint, v int")
    with pytest.raises(txlog.SchemaMismatch, match="type changes"):
        txlog.commit_append_checked(retyped, t, merge_schema=True)
    # merged read: old files surface score=NULL; column set from the log
    got = {
        (r["k"], r["v"], r["score"])
        for r in txlog.read_snapshot_merged(spark, t).collect()
    }
    assert got == {(1, "a", None), (2, "b", None), (3, "c", 9.5)}
    # missing-column append (post-evolution writer on the old schema):
    # accepted, table schema unchanged
    txlog.commit_append_checked(_df(spark, [(5, "e")]), t)
    assert txlog.table_schema(t)["score"] == "double"
    assert (
        txlog.read_snapshot_merged(spark, t).filter("k = 5").first()["score"]
        is None
    )
    # time travel reads the schema AS OF the version
    assert txlog.table_schema(t, version=1) == {"k": "bigint", "v": "string"}
    assert "score" not in txlog.read_snapshot_merged(spark, t, version=1).columns
