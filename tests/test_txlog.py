"""Transaction-log table format: snapshot isolation, time travel, atomic
partition overwrite, optimistic concurrency, crash invisibility, vacuum."""

from __future__ import annotations

import json
import os

import pytest

from data_ingestion_bra_spark.sinks import txlog


def _rows(spark, table_dir, version=None):
    return {
        (r["k"], r["v"])
        for r in txlog.read_snapshot(spark, table_dir, version).collect()
    }


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def test_append_time_travel_and_snapshot_isolation(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = txlog.commit_append(_df(spark, [(1, "a")]), t)
    v1 = txlog.commit_append(_df(spark, [(2, "b")]), t)
    assert (v0, v1) == (0, 1)
    assert _rows(spark, t) == {(1, "a"), (2, "b")}
    # time travel: version 0 still reads exactly the first commit
    assert _rows(spark, t, version=0) == {(1, "a")}
    # snapshot isolation: a resolved snapshot is immune to later commits
    snap = txlog.snapshot(t)
    txlog.commit_append(_df(spark, [(3, "c")]), t)
    assert _rows(spark, t, version=snap.version) == {(1, "a"), (2, "b")}
    assert _rows(spark, t) == {(1, "a"), (2, "b"), (3, "c")}


def test_overwrite_partition_replaces_only_its_partition(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_overwrite_partition(
        _df(spark, [(1, "day1")]), t, partition_key="d", partition_value="20240101"
    )
    txlog.commit_overwrite_partition(
        _df(spark, [(2, "day2")]), t, partition_key="d", partition_value="20240102"
    )
    # restate day1: its old file is removed, day2 untouched
    txlog.commit_overwrite_partition(
        _df(spark, [(3, "day1-restated")]), t, partition_key="d", partition_value="20240101"
    )
    assert _rows(spark, t) == {(2, "day2"), (3, "day1-restated")}
    # the pre-restatement state remains time-travelable
    assert _rows(spark, t, version=1) == {(1, "day1"), (2, "day2")}


def test_uncommitted_files_are_invisible_and_vacuumable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]), t)
    # simulate a crashed writer: data files staged but no log record
    orphan = txlog._write_data_files(_df(spark, [(99, "ghost")]), t)
    assert _rows(spark, t) == {(1, "a")}  # invisible to readers
    # retention guard: a freshly-staged subdir may belong to an in-flight
    # writer about to publish — default vacuum must NOT touch it
    assert txlog.vacuum(t) == []
    assert _rows(spark, t) == {(1, "a"), }
    deleted = txlog.vacuum(t, min_age_seconds=0)
    assert set(deleted) == {e["path"] for e in orphan}
    assert _rows(spark, t) == {(1, "a")}  # vacuum never touches live files


def test_concurrent_append_retries_to_next_version(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]), t)
    # another writer lands version 1 between our snapshot and publish:
    # pre-create the version file the next commit will try first
    os.makedirs(os.path.join(t, txlog.LOG_DIR), exist_ok=True)
    with open(txlog._log_path(t, 1), "w") as f:
        json.dump({"add": [], "remove": [], "meta": {"op": "append"}}, f)
    v = txlog.commit_append(_df(spark, [(2, "b")]), t)
    assert v == 2  # lost the race at v1, retried, landed at v2
    assert _rows(spark, t) == {(1, "a"), (2, "b")}


def _interpose(t, version, partition):
    """Land a competing commit record at ``version`` — used to simulate a
    writer winning the race BETWEEN our snapshot resolution and publish."""
    os.makedirs(os.path.join(t, txlog.LOG_DIR), exist_ok=True)
    with open(txlog._log_path(t, version), "w") as f:
        json.dump(
            {"add": [], "remove": [],
             "meta": {"op": "overwrite_partition", "partition": partition}},
            f,
        )


def test_mid_flight_same_partition_overwrite_conflicts(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "tbl")
    txlog.commit_overwrite_partition(
        _df(spark, [(1, "x")]), t, partition_key="d", partition_value="20240101"
    )
    # race simulation: the moment our writer tries to publish, a competing
    # SAME-partition commit has already taken that version slot
    real_publish = txlog._try_publish

    def racing_publish(table_dir, version, record):
        if not os.path.exists(txlog._log_path(table_dir, version)):
            _interpose(table_dir, version, "d=20240101")
        return real_publish(table_dir, version, record)

    monkeypatch.setattr(txlog, "_try_publish", racing_publish)
    with pytest.raises(txlog.CommitConflict):
        txlog.commit_overwrite_partition(
            _df(spark, [(2, "y")]), t, partition_key="d", partition_value="20240101"
        )
    monkeypatch.undo()
    # the losing writer changed nothing: day1 still reads the winner's state
    assert _rows(spark, t) == {(1, "x")}


def test_mid_flight_other_partition_overwrite_retries_through(
    spark, tmp_path, monkeypatch
):
    t = str(tmp_path / "tbl")
    txlog.commit_overwrite_partition(
        _df(spark, [(1, "x")]), t, partition_key="d", partition_value="20240101"
    )
    # the racing commit touches a DIFFERENT partition → our writer must
    # retry and land at the next version, not raise
    real_publish = txlog._try_publish
    raced = {"done": False}

    def racing_publish(table_dir, version, record):
        if not raced["done"]:
            raced["done"] = True
            _interpose(table_dir, version, "d=20991231")
        return real_publish(table_dir, version, record)

    monkeypatch.setattr(txlog, "_try_publish", racing_publish)
    v = txlog.commit_overwrite_partition(
        _df(spark, [(2, "y")]), t, partition_key="d", partition_value="20240101"
    )
    assert v == 2  # slot 1 was taken mid-flight; retried cleanly
    assert _rows(spark, t) == {(2, "y")}


def test_idempotent_append_exactly_once(spark, tmp_path):
    """Same idempotency key twice -> one commit, no duplicate rows; the
    duplicate attempt's staged files are vacuumable debris."""
    t = str(tmp_path / "tbl")
    v1 = txlog.commit_append(_df(spark, [(1, "a")]), t, idempotency_key="job:7")
    v2 = txlog.commit_append(_df(spark, [(1, "a")]), t, idempotency_key="job:7")
    assert v1 == v2 == 0
    assert _rows(spark, t) == {(1, "a")}
    assert txlog.committed_version(t, "job:7") == 0
    # different key appends normally
    v3 = txlog.commit_append(_df(spark, [(2, "b")]), t, idempotency_key="job:8")
    assert v3 == 1 and _rows(spark, t) == {(1, "a"), (2, "b")}


def test_idempotent_append_race_collapses_to_one(spark, tmp_path, monkeypatch):
    """A same-key commit landing BETWEEN our key check and publish must
    resolve to the winner's version, not a duplicate or an error."""
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]), t)
    real_publish = txlog._try_publish

    def racing_publish(table_dir, version, record):
        if not os.path.exists(txlog._log_path(table_dir, version)):
            os.makedirs(os.path.join(table_dir, txlog.LOG_DIR), exist_ok=True)
            with open(txlog._log_path(table_dir, version), "w") as f:
                json.dump(
                    {"add": [], "remove": [],
                     "meta": {"op": "append", "txn": "job:9"}},
                    f,
                )
        return real_publish(table_dir, version, record)

    monkeypatch.setattr(txlog, "_try_publish", racing_publish)
    v = txlog.commit_append(_df(spark, [(2, "b")]), t, idempotency_key="job:9")
    monkeypatch.undo()
    assert v == 1  # the interposed winner's version, OUR record never landed
    assert _rows(spark, t) == {(1, "a")}  # winner's (empty) add-set governs


def test_streaming_epoch_replay_is_exactly_once(spark, tmp_path):
    """The foreachBatch ACID writer: re-running an epoch (Spark's restart
    semantics) commits nothing new."""
    from data_ingestion_bra_spark.streaming.bronze_ingest import acid_batch_writer

    t = str(tmp_path / "bronze")
    write_batch = acid_batch_writer(t, query_id="q1")
    write_batch(_df(spark, [(1, "a"), (2, "b")]), 0)
    write_batch(_df(spark, [(3, "c")]), 1)
    write_batch(_df(spark, [(3, "c")]), 1)  # epoch replay after restart
    assert _rows(spark, t) == {(1, "a"), (2, "b"), (3, "c")}
    assert txlog.snapshot(t).version == 1  # exactly two commits
    # the replay no-ops BEFORE staging data files (key check first), so it
    # leaves zero debris — nothing for vacuum to remove
    assert txlog.vacuum(t, min_age_seconds=0) == []
    assert _rows(spark, t) == {(1, "a"), (2, "b"), (3, "c")}


def test_log_side_data_skipping(spark, tmp_path):
    """Commit records carry per-file min/max footer stats; a pruned read
    resolves its file set from the LOG (no footer reads, no listings) and
    returns the same rows as filtering the full table."""
    t = str(tmp_path / "tbl")
    # three commits with disjoint key ranges -> three skippable file sets
    txlog.commit_append(_df(spark, [(1, "a"), (5, "b")]).coalesce(1), t)
    txlog.commit_append(_df(spark, [(100, "c"), (150, "d")]).coalesce(1), t)
    txlog.commit_append(_df(spark, [(900, "e")]).coalesce(1), t)
    snap = txlog.snapshot(t)
    assert all(isinstance(e, dict) and "stats" in e for e in snap.entries)
    assert snap.entries[0]["stats"]["k"] == [1, 5]

    # prune to the middle range: exactly one file survives
    survivors = [
        e for e in snap.entries if txlog._stats_overlap(e, "k", 90, 200)
    ]
    assert len(survivors) == 1
    pruned = txlog.read_snapshot(spark, t, prune=("k", 90, 200))
    assert {r["k"] for r in pruned.collect()} == {100, 150}
    # prune that matches nothing: empty frame, schema preserved
    empty = txlog.read_snapshot(spark, t, prune=("k", 10_000, 20_000))
    assert empty.count() == 0 and empty.columns == ["k", "v"]
    # pruning is an optimization, not the filter: full read still has all
    assert _rows(spark, t) == {(1, "a"), (5, "b"), (100, "c"), (150, "d"), (900, "e")}


def test_bare_string_log_records_stay_readable(spark, tmp_path):
    """Pre-stats log records (add = plain path strings) resolve, read, and
    never prune — forward-compat for logs written before stats landed."""
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]), t)
    # rewrite record 0's add-set to the legacy bare-string form
    path0 = txlog._log_path(t, 0)
    rec = json.load(open(path0))
    rec["add"] = [txlog._entry_path(e) for e in rec["add"]]
    json.dump(rec, open(path0, "w"))
    assert _rows(spark, t) == {(1, "a")}
    # stats-free entries survive any prune (conservative keep)
    assert {r["k"] for r in txlog.read_snapshot(spark, t, prune=("k", 500, 600)).collect()} == {1}
    assert txlog.vacuum(t, min_age_seconds=0) == []


def test_delta_export_replays_every_version(spark, tmp_path):
    """The exported _delta_log must resolve the SAME live file set as the
    txlog at every version — including through a partition overwrite's
    removes — and carry protocol/metaData in commit 0 (public Delta
    protocol layout). No Delta reader ships in this container, so the test
    replays the written actions the way a reader would."""
    from data_ingestion_bra_spark.sinks import delta_export

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, p string")
    txlog.commit_append(df, t)
    txlog.commit_append(spark.createDataFrame([(3, "a")], "k bigint, p string"), t)
    txlog.commit_overwrite_partition(
        spark.createDataFrame([(9, "a")], "k bigint, p string"),
        t,
        partition_key="p",
        partition_value="a",
    )

    files = delta_export.export_delta_log(t)
    assert len(files) == 3
    for v in range(3):
        assert sorted(delta_export.replay_delta_log(t, v)) == sorted(
            txlog.snapshot(t, v).files
        ), v

    # commit 0 carries protocol + metaData with a parseable schemaString
    with open(files[0]) as f:
        actions = [json.loads(line) for line in f]
    assert actions[0]["protocol"]["minReaderVersion"] == 1
    schema = json.loads(actions[1]["metaData"]["schemaString"])
    assert [f["name"] for f in schema["fields"]] == ["k", "p"]
    assert {f["type"] for f in schema["fields"]} == {"long", "string"}
    # every add action carries real size/mtime of an existing file
    adds = [a["add"] for a in actions if "add" in a]
    assert all(a["size"] > 0 and a["modificationTime"] > 0 for a in adds)

    # regeneration after more commits never leaves stale delta commits
    txlog.commit_append(spark.createDataFrame([(4, "c")], "k bigint, p string"), t)
    files2 = delta_export.export_delta_log(t)
    assert len(files2) == 4
    assert sorted(delta_export.replay_delta_log(t)) == sorted(txlog.snapshot(t).files)


def test_bloom_prune_eq_probe_type_canonicalization(spark, tmp_path):
    """Round-8 ADVICE (medium): a numerically equal probe of a different
    Python type (int 5 vs float 5.0 vs Decimal('5')) must hash to the same
    bloom positions — a type-mismatched probe that missed the bitmap was a
    silent FALSE NEGATIVE, pruning files that do contain matching rows."""
    import decimal

    t = str(tmp_path / "tbl")
    txlog.commit_append(
        _df(spark, [(5, "a"), (7, "b")]).coalesce(1), t, bloom_cols=("k",)
    )
    entry = txlog.snapshot(t).entries[0]
    # every numerically-equal probe form hits the int-built bitmap
    assert txlog._bloom_maybe_contains(entry, "k", 5)
    assert txlog._bloom_maybe_contains(entry, "k", 5.0)
    assert txlog._bloom_maybe_contains(entry, "k", decimal.Decimal("5"))
    assert txlog._bloom_maybe_contains(entry, "k", decimal.Decimal("5.0"))
    # and the full read path keeps the file for a float probe of an int col
    kept = txlog.read_snapshot(spark, t, prune_eq=("k", 5.0))
    assert {(r["k"], r["v"]) for r in kept.collect()} == {(5, "a"), (7, "b")}
    # pruning still works: an absent value (any type form) drops the file
    assert not txlog._bloom_maybe_contains(entry, "k", 6)
    assert not txlog._bloom_maybe_contains(entry, "k", 6.0)
    assert txlog.read_snapshot(spark, t, prune_eq=("k", 6)).count() == 0

    # the mirror direction: float-valued column probed with an int
    tf = str(tmp_path / "tblf")
    fdf = spark.createDataFrame([(5.0, "a"), (2.5, "b")], "x double, v string")
    txlog.commit_append(fdf.coalesce(1), tf, bloom_cols=("x",))
    fe = txlog.snapshot(tf).entries[0]
    assert txlog._bloom_maybe_contains(fe, "x", 5)
    assert txlog._bloom_maybe_contains(fe, "x", 2.5)
    assert not txlog._bloom_maybe_contains(fe, "x", 3)
    # bool stays distinct from int 1 (Python bool-is-int quirk)
    assert txlog._bloom_canonical(True) != txlog._bloom_canonical(1)
