"""Incremental materialized-view maintenance: after ANY source commit
sequence (append / DELETE / MERGE), one delta-sized refresh makes the view
equal the full recompute of the current snapshot."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_bra_spark.sinks import txlog
from data_ingestion_bra_spark.sinks.matview import (
    last_applied_version,
    refresh_agg_view,
)


def _rows(spark, data):
    return spark.createDataFrame(data, ["k", "v", "grp"])


def _expected(spark, src):
    return sorted(
        map(
            tuple,
            txlog.read_snapshot(spark, src)
            .groupBy("grp")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum("v").cast("bigint").alias("sum_v"),
            )
            .collect(),
        )
    )


def _view(spark, view):
    return sorted(
        map(
            tuple,
            txlog.read_snapshot(spark, view)
            .select("grp", "n_rows", "sum_v")
            .collect(),
        )
    )


def test_incremental_refresh_tracks_source(tmp_path, spark):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")

    # v0: initial batch → first refresh aggregates the snapshot
    txlog.commit_append(_rows(spark, [(1, 10, "a"), (2, 20, "a"), (3, 5, "b")]), src)
    r1 = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert r1["refreshed"] and r1["src_version"] == 0
    assert _view(spark, view) == _expected(spark, src)

    # v1 append + v2 row-level delete → ONE delta refresh catches both
    txlog.commit_append(_rows(spark, [(4, 7, "b"), (5, 1, "c")]), src)
    txlog.commit_delete(spark, src, "k = 2")
    r2 = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert r2["refreshed"] and r2["applied_from"] == 1 and r2["src_version"] == 2
    assert _view(spark, view) == _expected(spark, src)

    # MERGE: update k=3 (b→b, v 5→50) and insert k=6
    txlog.commit_upsert(
        spark, src, _rows(spark, [(3, 50, "b"), (6, 2, "c")]), "k"
    )
    r3 = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert r3["refreshed"]
    assert _view(spark, view) == _expected(spark, src)

    # no new commits → no-op refresh
    r4 = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert not r4["refreshed"]
    assert last_applied_version(view) == 3


def test_zero_count_keys_disappear(tmp_path, spark):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    txlog.commit_append(_rows(spark, [(1, 3, "solo"), (2, 4, "keep")]), src)
    refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    txlog.commit_delete(spark, src, "grp = 'solo'")
    refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    got = _view(spark, view)
    assert got == [("keep", 1, 4)]  # 'solo' dropped at count 0


def test_crashed_refresh_recomputes_identically(tmp_path, spark):
    """A refresh that died before publishing leaves no marker; the retry
    recomputes the same deterministic state from the same window."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    txlog.commit_append(_rows(spark, [(1, 10, "a")]), src)
    refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    txlog.commit_append(_rows(spark, [(2, 30, "a")]), src)
    # two back-to-back refreshes of the same window: the second is a no-op
    a = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    b = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert a["refreshed"] and not b["refreshed"]
    assert _view(spark, view) == _expected(spark, src)


def test_stale_racer_self_heals(tmp_path, spark):
    """If a stale refresh publishes AFTER a newer one (out-of-order race),
    last_applied reads the LATEST record - not the max - so the next
    refresh re-applies the missing window and converges."""
    from data_ingestion_bra_spark.sinks.matview import (
        _VIEW_PARTITION,
        last_applied_version,
    )

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    txlog.commit_append(_rows(spark, [(1, 10, "a")]), src)          # src v0
    refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    txlog.commit_append(_rows(spark, [(2, 30, "b")]), src)          # src v1
    refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert last_applied_version(view) == 1

    # simulate the losing racer's stale overwrite landing late: state as of
    # src v0 only, tagged src_version=0
    stale = spark.createDataFrame([("a", 1, 10)], ["grp", "n_rows", "sum_v"])
    txlog.commit_overwrite_partition(
        stale,
        view,
        partition_key=_VIEW_PARTITION[0],
        partition_value=_VIEW_PARTITION[1],
        meta={"src_version": 0, "op_kind": "matview_refresh"},
    )
    assert last_applied_version(view) == 0  # latest record, not max
    r = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert r["refreshed"] and r["applied_from"] == 1
    assert _view(spark, view) == _expected(spark, src)


def test_streaming_view_maintenance_exactly_once(tmp_path, spark):
    """The foreachBatch hook composes ACID append + delta refresh: a
    replayed epoch no-ops BOTH (the view never double-counts), and after a
    stream of epochs the view equals the full aggregate of everything
    ingested."""
    from data_ingestion_bra_spark.streaming.bronze_ingest import (
        acid_batch_writer_with_view,
    )

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    w = acid_batch_writer_with_view(
        src, view, key_cols=("grp",), sum_cols=("v",), query_id="q"
    )
    b0 = _rows(spark, [(1, 10, "a"), (2, 5, "b")])
    b1 = _rows(spark, [(3, 7, "a")])
    w(b0, 0)
    w(b0, 0)  # epoch replay after a simulated restart
    w(b1, 1)
    assert _view(spark, view) == _expected(spark, src)
    got = {r["grp"]: (r["n_rows"], r["sum_v"]) for r in txlog.read_snapshot(spark, view).collect()}
    assert got == {"a": (2, 17), "b": (1, 5)}  # no double-counted epoch 0


def test_streaming_view_maintenance_end_to_end(tmp_path, spark):
    """Real foreachBatch micro-batches (file replay, 1 file per trigger):
    the view converges to the aggregate of the whole stream."""
    from data_ingestion_bra_spark.streaming import jobs
    from data_ingestion_bra_spark.streaming.bronze_ingest import (
        acid_batch_writer_with_view,
    )

    data = str(tmp_path / "in")
    _rows(
        spark, [(i, i * 2, "g" + str(i % 3)) for i in range(30)]
    ).repartition(3).write.parquet(data)
    src = str(tmp_path / "src2")
    view = str(tmp_path / "view2")
    stream = jobs.read_documents_stream(spark, data, max_files_per_trigger=1)
    q = stream.writeStream.foreachBatch(
        acid_batch_writer_with_view(
            src, view, key_cols=("grp",), sum_cols=("v",), query_id="e2e"
        )
    ).option("checkpointLocation", str(tmp_path / "ckpt")).start()
    q.processAllAvailable()
    q.stop()
    assert _view(spark, view) == _expected(spark, src)
    total = txlog.read_snapshot(spark, src).count()
    assert total == 30


def test_refresh_over_compaction_only_window_is_a_noop_that_advances(tmp_path, spark):
    """Round-7 ADVICE: a refresh window containing only non-data-changing
    commits (OPTIMIZE/compaction) used to crash refresh_agg_view via
    read_changes' 'no data-changing commits' ValueError. It must instead
    no-op the state, still advance src_version, and leave the view equal to
    the full recompute."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    for k in range(4):
        txlog.commit_append(_rows(spark, [(k, k * 10, "a")]).coalesce(1), src)
    refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert txlog.compact(spark, src, target_bytes=1 << 20) is not None
    r = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert r["refreshed"] is True
    assert last_applied_version(view) == r["src_version"]
    assert _view(spark, view) == _expected(spark, src)
    # and the NEXT refresh is a clean no-op (window fully applied)
    r2 = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert r2["refreshed"] is False


def test_losing_publish_race_returns_conflict_not_raise(tmp_path, spark, monkeypatch):
    """Round-7 ADVICE: the docstring promised the losing concurrent refresh
    degrades to a no-op, but CommitConflict propagated. Simulate losing the
    race by having the conflict checker see a concurrent commit."""
    from data_ingestion_bra_spark.sinks import matview as mv

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    txlog.commit_append(_rows(spark, [(1, 10, "a")]), src)

    def always_conflict(*a, **kw):
        raise txlog.CommitConflict("concurrent refresh won the publish race")

    monkeypatch.setattr(mv, "commit_overwrite_partition", always_conflict)
    r = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert r == {
        "refreshed": False,
        "src_version": 0,
        "applied_from": 0,
        "conflict": True,
    }
    monkeypatch.undo()
    # the retry (no concurrent writer now) succeeds and converges
    r2 = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert r2["refreshed"] is True
    assert _view(spark, view) == _expected(spark, src)


def test_lost_race_retries_and_applies_remaining_window(tmp_path, spark, monkeypatch):
    """Round-8 ADVICE: the publish-race winner may have read an OLDER
    src_version than the loser; dropping the loser's delta outright could
    leave a one-shot caller with a lagging view. refresh_agg_view now
    re-reads last_applied_version and retries once — the view converges in
    a single public call even when the first publish attempt loses."""
    from data_ingestion_bra_spark.sinks import matview as mv

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    txlog.commit_append(_rows(spark, [(1, 10, "a"), (2, 20, "b")]), src)

    real = mv.commit_overwrite_partition
    calls = {"n": 0}

    def loses_first_race(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise txlog.CommitConflict("concurrent refresh won the race")
        return real(*a, **kw)

    monkeypatch.setattr(mv, "commit_overwrite_partition", loses_first_race)
    r = refresh_agg_view(spark, src, view, key_cols=("grp",), sum_cols=("v",))
    assert r["refreshed"] is True and calls["n"] == 2
    assert _view(spark, view) == _expected(spark, src)
