"""RESTORE (roll the table tip back to an earlier version as a new
metadata-only commit) and shallow CLONE (a new table referencing the
source's files in place) — the remaining published-table-format verbs
on top of ``sinks/txlog.py``."""

from __future__ import annotations

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


def _build_timeline(spark, t):
    txlog.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)  # v0
    txlog.commit_append(_df(spark, [(3, "c")]), t)  # v1
    txlog.commit_delete(spark, t, "k = 2")  # v2
    return t


def test_restore_rolls_tip_back_metadata_only(spark, tmp_path):
    t = _build_timeline(spark, str(tmp_path / "tbl"))
    assert _rows(spark, t) == {(1, "a"), (3, "c")}
    data_files_before = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(t, "data"))
        for f in fs
    }
    v = txlog.restore(t, 1)
    assert v == 3
    # tip state == v1 state, byte-for-byte the same file set
    assert _rows(spark, t) == {(1, "a"), (2, "b"), (3, "c")}
    assert set(txlog.snapshot(t).files) == set(txlog.snapshot(t, 1).files)
    # metadata-only: restore staged zero new data files
    data_files_after = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(t, "data"))
        for f in fs
    }
    assert data_files_after == data_files_before
    # history intact: every prior version still time-travels
    assert _rows(spark, t, version=2) == {(1, "a"), (3, "c")}
    assert _rows(spark, t, version=0) == {(1, "a"), (2, "b")}


def test_restore_change_feed_emits_the_undo(spark, tmp_path):
    t = _build_timeline(spark, str(tmp_path / "tbl"))
    txlog.restore(t, 1)  # undoes the v2 delete of (2, 'b')
    ch = txlog.read_changes(spark, t, 3, 3).collect()
    assert {(r["k"], r["v"], r["_change_type"]) for r in ch} == {
        (2, "b", "insert")
    }


def test_restore_is_idempotent_under_key(spark, tmp_path):
    t = _build_timeline(spark, str(tmp_path / "tbl"))
    v = txlog.restore(t, 0, idempotency_key="undo-1")
    assert txlog.restore(t, 0, idempotency_key="undo-1") == v
    assert txlog.snapshot(t).version == v


def test_restore_refuses_vacuumed_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]), t)
    txlog.commit_delete(spark, t, "k = 1")  # v1 rewrites v0's file away
    # erase v0's file manually (what a retention-bounded vacuum would do)
    import shutil

    v0_dir = os.path.dirname(os.path.join(t, txlog.snapshot(t, 0).files[0]))
    shutil.rmtree(v0_dir)
    with pytest.raises(FileNotFoundError, match="restore"):
        txlog.restore(t, 0)


def test_restore_rolls_schema_back(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append_checked(_df(spark, [(1, "a")]), t)
    evolved = spark.createDataFrame([(2, "b", 7)], "k bigint, v string, extra bigint")
    txlog.commit_append_checked(evolved, t, merge_schema=True)
    assert "extra" in txlog.table_schema(t)
    txlog.restore(t, 0)
    assert "extra" not in txlog.table_schema(t)


def test_clone_shallow_reads_source_state_without_copying(spark, tmp_path):
    src = _build_timeline(spark, str(tmp_path / "src"))
    dst = str(tmp_path / "dst")
    v = txlog.clone_shallow(src, dst)
    assert v == 0
    assert _rows(spark, dst) == _rows(spark, src)
    # zero bytes copied: the clone has no data directory of its own yet
    assert not os.path.isdir(os.path.join(dst, "data"))
    # cloning an earlier version pins that state
    dst1 = str(tmp_path / "dst1")
    txlog.clone_shallow(src, dst1, version=0)
    assert _rows(spark, dst1) == {(1, "a"), (2, "b")}


def test_clone_evolves_independently_of_source(spark, tmp_path):
    src = _build_timeline(spark, str(tmp_path / "src"))
    dst = str(tmp_path / "dst")
    txlog.clone_shallow(src, dst)
    src_state = _rows(spark, src)
    # DML on the clone: copy-on-write rewrite lands under the CLONE's data/
    txlog.commit_delete(spark, dst, "k = 1")
    txlog.commit_append(_df(spark, [(9, "z")]), dst)
    assert _rows(spark, dst) == {(3, "c"), (9, "z")}
    assert _rows(spark, src) == src_state
    # and commits on the source don't leak into the clone
    txlog.commit_append(_df(spark, [(8, "y")]), src)
    assert (8, "y") not in _rows(spark, dst)
    # vacuum on the clone never deletes source files
    deleted = txlog.vacuum(dst, min_age_seconds=0)
    assert deleted == []
    assert _rows(spark, src) == src_state | {(8, "y")}


def test_clone_target_must_be_empty(spark, tmp_path):
    src = _build_timeline(spark, str(tmp_path / "src"))
    dst = str(tmp_path / "dst")
    txlog.clone_shallow(src, dst)
    with pytest.raises(ValueError, match="not empty"):
        txlog.clone_shallow(src, dst)


def _data_files(t):
    return {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(t, "data"))
        for f in fs
        if f.endswith(".parquet")
    }


def test_vacuum_retention_drops_pre_horizon_files_only(spark, tmp_path):
    t = _build_timeline(spark, str(tmp_path / "tbl"))  # v0, v1, v2(delete)
    before = _rows(spark, t)
    n_before = len(_data_files(t))
    deleted = txlog.vacuum_retention(t, retain_versions=1, min_age_seconds=0)
    # the DELETE at v2 rewrote the touched file: its pre-image is now gone
    assert deleted, "expected the pre-rewrite file to be vacuumed"
    assert len(_data_files(t)) == n_before - len(deleted)
    # the retained tip is byte-identical
    assert _rows(spark, t) == before
    # history below the horizon is no longer restorable
    with pytest.raises(FileNotFoundError):
        txlog.restore(t, 1)
    # idempotent: a second pass deletes nothing
    assert txlog.vacuum_retention(t, retain_versions=1, min_age_seconds=0) == []


def test_vacuum_retention_keeps_the_retained_window(spark, tmp_path):
    t = _build_timeline(spark, str(tmp_path / "tbl"))
    txlog.vacuum_retention(t, retain_versions=2, min_age_seconds=0)
    # v1 is inside the window: still readable and restorable
    assert _rows(spark, t, version=1) == {(1, "a"), (2, "b"), (3, "c")}
    txlog.restore(t, 1)
    assert _rows(spark, t) == {(1, "a"), (2, "b"), (3, "c")}


def test_vacuum_retention_also_removes_crashed_writer_debris(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]), t)
    # staged-but-never-published files (crashed writer)
    _df(spark, [(9, "junk")]).write.parquet(os.path.join(t, "data", "deadbeef"))
    deleted = txlog.vacuum_retention(t, retain_versions=5, min_age_seconds=0)
    assert any("deadbeef" in f for f in deleted)
    assert _rows(spark, t) == {(1, "a")}


def test_vacuum_retention_age_guard_spares_fresh_files(spark, tmp_path):
    t = _build_timeline(spark, str(tmp_path / "tbl"))
    # everything on disk is younger than the guard: nothing deleted
    assert txlog.vacuum_retention(t, retain_versions=1, min_age_seconds=3600) == []


def test_table_stats_answers_from_the_log_alone(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a"), (5, "b")]), t)
    txlog.commit_append(_df(spark, [(9, "c")]), t)
    st = txlog.table_stats(t)
    assert st["n_rows"] == 3
    assert st["columns"]["k"] == [1, 9]
    # exactness survives DML and compaction (data_change:false keeps rows)
    txlog.commit_delete(spark, t, "k = 5")
    st2 = txlog.table_stats(t)
    assert st2["n_rows"] == 2
    assert st2["columns"]["k"] == [1, 9]
    # version-pinned stats replay history
    assert txlog.table_stats(t, version=0)["n_rows"] == 2
    # metadata-only: stats survive the data files' deletion
    import shutil

    shutil.rmtree(os.path.join(t, "data"))
    assert txlog.table_stats(t)["n_rows"] == 2


def test_table_stats_pre_rows_field_records_degrade_to_none(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]), t)
    # simulate a legacy log record whose entries lack the rows field
    import json

    p = os.path.join(t, txlog.LOG_DIR, f"{0:016d}.json")
    rec = json.load(open(p))
    for e in rec["add"]:
        del e["rows"]
    json.dump(rec, open(p, "w"))
    assert txlog.table_stats(t)["n_rows"] is None


def test_bloom_index_prunes_point_lookups_without_false_negatives(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # 8 commits of disjoint key ranges -> 8+ files, wide min/max per file
    # would still overlap nothing... so scramble: each commit holds keys
    # congruent mod 8 — every file's [min, max] spans the whole domain and
    # range pruning is useless; only the bloom can skip.
    for r in range(8):
        txlog.commit_append(
            spark.createDataFrame(
                [(k, f"v{k}") for k in range(r, 800, 8)], "k bigint, v string"
            ).coalesce(1),
            t,
            bloom_cols=("k",),
        )
    snap = txlog.snapshot(t)
    assert all("bloom" in e and "k" in e["bloom"] for e in snap.entries)
    # no false negatives: every present key's owning file survives the probe
    for k in (0, 5, 13, 794):
        kept = [
            e
            for e in snap.entries
            if txlog._bloom_maybe_contains(e, "k", k)
        ]
        got = {
            r["k"]
            for r in txlog.read_snapshot(spark, t, prune_eq=("k", k))
            .filter(f"k = {k}")
            .collect()
        }
        assert got == {k}
        # and the probe actually skipped most files (fpp ~1% at 10 bits/val)
        assert len(kept) <= 2, f"bloom kept {len(kept)}/8 files for k={k}"
    # absent key: typically every file pruned; result is an empty frame
    assert (
        txlog.read_snapshot(spark, t, prune_eq=("k", 10_000))
        .filter("k = 10000")
        .count()
        == 0
    )


def test_bloom_index_survives_compaction_rewrite(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for r in range(4):
        txlog.commit_append(
            spark.createDataFrame(
                [(k, "x") for k in range(r, 400, 4)], "k bigint, v string"
            ).coalesce(1),
            t,
            bloom_cols=("k",),
        )
    txlog.compact(spark, t, n_files=2, bloom_cols=("k",))
    snap = txlog.snapshot(t)
    assert all("bloom" in e for e in snap.entries)
    got = {
        r["k"]
        for r in txlog.read_snapshot(spark, t, prune_eq=("k", 37))
        .filter("k = 37")
        .collect()
    }
    assert got == {37}


def test_restore_refuses_commit_landed_in_read_to_publish_window(spark, tmp_path, monkeypatch):
    # a commit landing AFTER restore reads the live set but BEFORE its
    # first publish attempt must raise, not be silently undone (the
    # round-8 review's read-to-publish race)
    t = _build_timeline(spark, str(tmp_path / "tbl"))
    real_commit = txlog._commit
    racer = _df(spark, [(9, "raced")])
    fired = []

    def commit_with_race(table_dir, **kw):
        # simulate the interleaving ONCE: the racer lands between
        # restore's live_now read (already taken) and the commit loop —
        # restore the real _commit first or the racer's own append would
        # recurse through this patch
        monkeypatch.setattr(txlog, "_commit", real_commit)
        if not fired:
            fired.append(1)
            txlog.commit_append(racer, table_dir)
        return real_commit(table_dir, **kw)

    monkeypatch.setattr(txlog, "_commit", commit_with_race)
    with pytest.raises(txlog.CommitConflict, match="restoring"):
        txlog.restore(t, 0)
    # the racer's append survived untouched
    assert (9, "raced") in _rows(spark, t)


def test_vacuum_retention_removes_husk_directories(spark, tmp_path):
    t = _build_timeline(spark, str(tmp_path / "tbl"))  # v2 delete rewrote a file
    txlog.vacuum_retention(t, retain_versions=1, min_age_seconds=0)
    # no directory may survive holding only _SUCCESS/.crc markers
    data_root = os.path.join(t, "data")
    for sub in os.listdir(data_root):
        files = os.listdir(os.path.join(data_root, sub))
        assert any(n.endswith(".parquet") for n in files), f"husk dir {sub}: {files}"


def test_check_constraints_enforced_on_checked_writes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append_checked(_df(spark, [(1, "a")]), t)
    txlog.add_constraint(t, "k_positive", "k > 0")
    txlog.add_constraint(t, "v_nonempty", "length(v) > 0")
    # satisfying write passes; the constraint commits are metadata-only
    txlog.commit_append_checked(_df(spark, [(2, "b")]), t)
    assert _rows(spark, t) == {(1, "a"), (2, "b")}
    # violating write fails LOUD, names the constraint, commits nothing
    import pytest as _pytest

    with _pytest.raises(txlog.ConstraintViolation, match="k_positive \\(1 rows\\)"):
        txlog.commit_append_checked(_df(spark, [(-5, "x"), (3, "y")]), t)
    assert _rows(spark, t) == {(1, "a"), (2, "b")}
    # NULL satisfies a CHECK (the SQL-standard / published rule)
    null_row = spark.createDataFrame([(None, "z")], "k bigint, v string")
    txlog.commit_append_checked(null_row, t)
    # drop: the write that failed now lands
    txlog.drop_constraint(t, "k_positive")
    txlog.commit_append_checked(_df(spark, [(-5, "x")]), t)
    assert (-5, "x") in _rows(spark, t)
    # time-travel the constraint set itself
    assert "k_positive" in txlog.table_constraints(t, version=2)
    assert "k_positive" not in txlog.table_constraints(t)
    # duplicate names refused; unknown drops refused
    with _pytest.raises(ValueError, match="already exists"):
        txlog.add_constraint(t, "v_nonempty", "true")
    with _pytest.raises(ValueError, match="no constraint"):
        txlog.drop_constraint(t, "nope")


def test_constraint_commits_are_invisible_to_cdf_and_stream(spark, tmp_path):
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a")]), t)
    v = txlog.add_constraint(t, "k_positive", "k > 0")
    # data_change: false -> the change feed window over it is empty
    ch = txlog.read_changes(spark, t, v, v)
    assert ch.count() == 0


def test_concurrent_add_constraint_conflicts_with_inflight_checked_write(
    spark, tmp_path, monkeypatch
):
    """Round-8 ADVICE: a batch validated against the OLD constraint set
    must not publish after a concurrent ADD CONSTRAINT lands (the
    published rule: metadata changes conflict with in-flight txns). The
    checked write re-validates against the NEW set — a now-violating batch
    is rejected, a still-valid batch retries through."""
    import pytest as _pytest

    t = str(tmp_path / "tbl")
    txlog.commit_append_checked(_df(spark, [(1, "a")]), t)

    real_publish = txlog._try_publish
    state = {"landed": False}

    def constraint_lands_first(table_dir, version, record):
        # squeeze ADD CONSTRAINT in between the append's validation and
        # its first publish attempt (once; the constraint's own publish
        # goes through this shim too, guarded by the flag)
        if (
            not state["landed"]
            and record.get("meta", {}).get("op") == "append"
        ):
            state["landed"] = True
            txlog.add_constraint(t, "k_small", "k < 100")
        return real_publish(table_dir, version, record)

    monkeypatch.setattr(txlog, "_try_publish", constraint_lands_first)
    with _pytest.raises(txlog.ConstraintViolation, match="k_small"):
        txlog.commit_append_checked(_df(spark, [(500, "big")]), t)
    # nothing published: the table holds exactly the first commit's rows
    assert _rows(spark, t) == {(1, "a")}

    # same race with a batch that SATISFIES the new constraint: the write
    # re-validates and retries through to a successful commit
    state["landed"] = False
    txlog.drop_constraint(t, "k_small")
    state["landed"] = False
    monkeypatch.setattr(txlog, "_try_publish", constraint_lands_first)
    txlog.commit_append_checked(_df(spark, [(50, "ok")]), t)
    assert (50, "ok") in _rows(spark, t)
    assert "k_small" in txlog.table_constraints(t)


def test_upsert_skips_constraints_on_absent_source_columns(spark, tmp_path):
    """Round-8 ADVICE: commit_upsert validates CHECK constraints against
    the merge SOURCE; a constraint referencing a table column absent from
    the source schema used to raise AnalysisException even for valid
    merges. It is now skipped (the published behavior validates the
    post-merge image; columns a merge cannot write were already valid in
    every survivor row) while resolvable constraints stay enforced."""
    import pytest as _pytest

    t = str(tmp_path / "tbl")
    full = spark.createDataFrame(
        [(1, "a", 10)], "k bigint, v string, w bigint"
    )
    txlog.commit_append_checked(full, t)
    txlog.add_constraint(t, "w_positive", "w > 0")
    txlog.add_constraint(t, "k_positive", "k > 0")

    # source lacks w: w_positive is unresolvable on it -> skipped, merge ok
    src = spark.createDataFrame([(2, "b")], "k bigint, v string")
    txlog.commit_upsert(spark, t, src, "k")
    got = {
        (r["k"], r["v"])
        for r in txlog.read_snapshot_merged(spark, t).collect()
    }
    assert got == {(1, "a"), (2, "b")}

    # resolvable constraints still reject a violating source
    bad = spark.createDataFrame([(-1, "x")], "k bigint, v string")
    with _pytest.raises(txlog.ConstraintViolation, match="k_positive"):
        txlog.commit_upsert(spark, t, bad, "k")
