"""Streaming source over the txlog (sources/txlog_stream.py): offsets are
commit versions, appends arrive exactly once across restarts, compaction
is invisible, rewrites fail loud (or pass with ignore_changes)."""

from __future__ import annotations

import pytest

from data_ingestion_bra_spark.sinks import txlog
from data_ingestion_bra_spark.sources.txlog_stream import TxlogStreamDataSource


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(TxlogStreamDataSource)
    return spark


def _drain(spark, table_dir, checkpoint, sink: list, **opts):
    reader = spark.readStream.format("txlog_stream").option("path", table_dir)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(
            lambda df, epoch: sink.extend(
                (r["k"], r["v"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_appends_arrive_exactly_once_across_restarts(registered, tmp_path):
    spark = registered
    t, cp = str(tmp_path / "tbl"), str(tmp_path / "cp")
    txlog.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)
    txlog.commit_append(_df(spark, [(3, "c")]), t)
    got: list = []
    _drain(spark, t, cp, got)
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c")]
    # new commits after the stream stopped: a RESTART from the same
    # checkpoint emits only the delta — nothing replays
    txlog.commit_append(_df(spark, [(4, "d")]), t)
    _drain(spark, t, cp, got)
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    # and an idle restart emits nothing at all
    _drain(spark, t, cp, got)
    assert len(got) == 4


def test_compaction_is_invisible_to_the_stream(registered, tmp_path):
    spark = registered
    t, cp = str(tmp_path / "tbl"), str(tmp_path / "cp")
    for k in range(4):
        txlog.commit_append(_df(spark, [(k, "x")]), t)
    got: list = []
    _drain(spark, t, cp, got)
    assert len(got) == 4
    # OPTIMIZE rewrites the layout (data_change: false) — zero new rows
    assert txlog.compact(spark, t, n_files=1) is not None
    _drain(spark, t, cp, got)
    assert len(got) == 4


def test_rewrite_commits_fail_loud_unless_ignored(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    txlog.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)
    txlog.commit_delete(spark, t, "k = 1")
    got: list = []
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception), match="ignore_changes"):
        _drain(spark, t, str(tmp_path / "cp1"), got)
    # ignore_changes: the rewrite's adds are emitted (documented duplicates)
    got2: list = []
    _drain(spark, t, str(tmp_path / "cp2"), got2, ignore_changes="true")
    assert (2, "b") in got2


def test_stream_matches_snapshot_for_append_only_tables(registered, tmp_path):
    spark = registered
    t, cp = str(tmp_path / "tbl"), str(tmp_path / "cp")
    for r in range(3):
        txlog.commit_append(
            _df(spark, [(r * 10 + i, f"v{r}") for i in range(5)]), t
        )
    got: list = []
    _drain(spark, t, cp, got)
    snap = {
        (r["k"], r["v"]) for r in txlog.read_snapshot(spark, t).collect()
    }
    assert set(got) == snap and len(got) == len(snap)


def test_schema_evolved_table_streams_with_null_fill(registered, tmp_path):
    """Round-8 ADVICE: stream schema used to come from the FIRST live file
    and read() projected every file to it — on a schema-evolved table,
    pre-evolution files crashed the batch (missing column) or newer
    columns were silently dropped. The stream schema is now the
    log-recorded (or unified) schema and each file null-fills what it
    lacks, exactly like read_snapshot_merged."""
    spark = registered
    t, cp = str(tmp_path / "tbl"), str(tmp_path / "cp")
    txlog.commit_append_checked(_df(spark, [(1, "a")]), t)  # old: k, v
    evolved = spark.createDataFrame(
        [(2, "b", 99)], "k bigint, v string, extra bigint"
    )
    txlog.commit_append_checked(evolved, t, merge_schema=True)

    got: list = []
    q = (
        spark.readStream.format("txlog_stream")
        .option("path", t)
        .load()
        .writeStream.foreachBatch(
            lambda df, epoch: got.extend(
                (r["k"], r["v"], r["extra"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the pre-evolution row arrives null-filled, the new row intact
    assert sorted(got) == [(1, "a", None), (2, "b", 99)]
