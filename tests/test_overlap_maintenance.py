"""Streaming overlap forensics (streaming/overlap_maintenance.py): the
cumulative stream==batch invariant, exactly-once epoch replay with the
flags-first ordering, and the cross-epoch quote catch."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_bra_spark.sinks import txlog
from data_ingestion_bra_spark.streaming.overlap_maintenance import (
    overlap_maintenance_writer,
)

QUOTE = "the winnowing guarantee catches this exact span"


def _corpus(spark):
    rows = [
        (1, f"first document carries {QUOTE} inside its body text"),
        (2, "completely unrelated content about something else entirely x"),
        (3, f"{QUOTE} opens the third document with different trailing words"),
        (4, f"fourth document also quotes {QUOTE} near the end here"),
        (5, "another unrelated body with nothing shared at all zzz"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _batch_pairs(spark, df, min_shared=2):
    """Batch-tier ground truth: winnowing overlap pairs over the whole
    corpus (cap-free regime)."""
    from data_ingestion_bra_spark.operators.text import winnowing_fingerprints

    fps = winnowing_fingerprints(df, "doc_id", "text").select("doc", "fp").distinct()
    a = fps.select(F.col("doc").alias("doc_new"), "fp")
    b = fps.select(F.col("doc").alias("doc_old"), "fp")
    return {
        (max(r["doc_new"], r["doc_old"]), min(r["doc_new"], r["doc_old"]), r["n"])
        for r in a.join(b, "fp")
        .filter(F.col("doc_new") > F.col("doc_old"))
        .groupBy("doc_new", "doc_old")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_shared)
        .collect()
    }


def test_stream_flags_equal_batch_pairs_any_epoch_split(spark, tmp_path):
    df = _corpus(spark)
    want = _batch_pairs(spark, df)
    assert want, "fixture must contain genuine overlaps"
    # doc 1 and doc 3/4 overlap ACROSS the epoch boundary below
    for split_name, splits in {
        "one-epoch": [[1, 2, 3, 4, 5]],
        "cross-epoch": [[1, 2], [3, 4, 5]],
        "per-doc": [[1], [2], [3], [4], [5]],
    }.items():
        store = str(tmp_path / f"store_{split_name}")
        flags_dir = str(tmp_path / f"flags_{split_name}")
        w = overlap_maintenance_writer(store, flags_dir, query_id=split_name)
        for epoch, ids in enumerate(splits):
            w(df.filter(F.col("doc_id").isin(ids)), epoch)
        got = {
            (r["doc_new"], r["doc_old"], r["n_shared"])
            for r in txlog.read_snapshot(spark, flags_dir).collect()
        }
        assert got == want, split_name


def test_cross_epoch_quote_is_caught_at_arrival(spark, tmp_path):
    """A document quoting an earlier epoch's content is flagged in ITS OWN
    epoch — the ingest-time provenance decision the store exists for."""
    df = _corpus(spark)
    store, flags_dir = str(tmp_path / "s"), str(tmp_path / "f")
    w = overlap_maintenance_writer(store, flags_dir, query_id="q")
    w(df.filter(F.col("doc_id") == 1), 0)
    assert txlog.read_snapshot(spark, flags_dir).count() == 0
    w(df.filter(F.col("doc_id") == 3), 1)
    flagged = txlog.read_snapshot(spark, flags_dir).collect()
    assert {(r["doc_new"], r["doc_old"]) for r in flagged} == {(3, 1)}
    assert all(r["epoch"] == 1 for r in flagged)


def test_epoch_replay_is_exactly_once_flags_first(spark, tmp_path):
    df = _corpus(spark)
    store, flags_dir = str(tmp_path / "s2"), str(tmp_path / "f2")
    w = overlap_maintenance_writer(store, flags_dir, query_id="r")
    w(df.filter(F.col("doc_id").isin([1, 2])), 0)
    w(df.filter(F.col("doc_id").isin([3, 4, 5])), 1)
    fv = txlog.snapshot(flags_dir).version
    sv = txlog.snapshot(store).version
    before = sorted(
        (r["doc_new"], r["doc_old"], r["n_shared"], r["epoch"])
        for r in txlog.read_snapshot(spark, flags_dir).collect()
    )
    w(df.filter(F.col("doc_id").isin([3, 4, 5])), 1)  # replay
    assert txlog.snapshot(flags_dir).version == fv
    assert txlog.snapshot(store).version == sv
    after = sorted(
        (r["doc_new"], r["doc_old"], r["n_shared"], r["epoch"])
        for r in txlog.read_snapshot(spark, flags_dir).collect()
    )
    assert after == before


def test_cross_epoch_redelivery_is_dropped(spark, tmp_path):
    """Source RE-INGEST (same doc_id arriving again in a LATER epoch — not
    an epoch replay, so the txlog idempotency key does not apply) must be
    a no-op: no duplicate store rows (which would inflate later n_shared
    counts), no self-flag of the doc against its own stored fingerprints."""
    df = _corpus(spark)
    store, flags_dir = str(tmp_path / "s3"), str(tmp_path / "f3")
    w = overlap_maintenance_writer(store, flags_dir, query_id="redeliver")
    w(df.filter(F.col("doc_id").isin([1, 2])), 0)
    store_before = sorted(
        (r["doc"], r["fp"]) for r in txlog.read_snapshot(spark, store).collect()
    )
    # doc 1 re-delivered in a NEW epoch
    w(df.filter(F.col("doc_id") == 1), 1)
    store_after = sorted(
        (r["doc"], r["fp"]) for r in txlog.read_snapshot(spark, store).collect()
    )
    assert store_after == store_before  # no duplicate (doc, fp) rows
    assert txlog.read_snapshot(spark, flags_dir).count() == 0  # no self-flag
    # a later arrival overlapping doc 1 still gets the EXACT batch-tier
    # n_shared — not a count inflated by duplicated store rows
    w(df.filter(F.col("doc_id") == 3), 2)
    want = {p for p in _batch_pairs(spark, df) if {p[0], p[1]} == {1, 3}}
    got = {
        (r["doc_new"], r["doc_old"], r["n_shared"])
        for r in txlog.read_snapshot(spark, flags_dir).collect()
    }
    assert got == want


def test_changed_redelivery_raises_not_silently_dropped(spark, tmp_path):
    """A re-delivered doc_id whose TEXT changed (upstream update) violates
    the immutable-content-identity contract: by default the writer raises
    instead of silently dropping the new fingerprints (which would leave
    the stale ones standing forever and never flag the new text)."""
    import pytest

    df = _corpus(spark)
    store, flags_dir = str(tmp_path / "s4"), str(tmp_path / "f4")
    w = overlap_maintenance_writer(store, flags_dir, query_id="chg")
    w(df.filter(F.col("doc_id").isin([1, 2])), 0)
    mutated = spark.createDataFrame(
        [(1, "entirely different replacement body for document one zzz yy")],
        "doc_id bigint, text string",
    )
    with pytest.raises(ValueError, match="CHANGED content"):
        w(mutated, 1)
    # the store must be untouched by the failed epoch
    assert txlog.read_snapshot(spark, store).filter(
        F.col("doc") == 1
    ).count() > 0
    # identical re-delivery still sails through silently (the contract's
    # legitimate case) under the default 'error' mode
    w(df.filter(F.col("doc_id") == 1), 2)
    assert txlog.read_snapshot(spark, flags_dir).count() == 0
    # and 'ignore' restores the old drop-without-looking behavior
    w2 = overlap_maintenance_writer(
        store, flags_dir, query_id="chg2", on_changed_redelivery="ignore"
    )
    w2(mutated, 3)  # no raise
    assert txlog.read_snapshot(spark, flags_dir).count() == 0


def test_incremental_catalog_entry_equals_live_store_serve_path(spark, tmp_path):
    """The oracle-twinned serve-path entry (text_winnowing_overlap_incremental)
    must equal the LIVE streaming store's vs-store flags when the standing
    corpus is epoch 0 and the batch increment is epoch 1 — same winnowing
    params, same hot-cap semantics, same threshold."""
    from data_ingestion_bra_spark.plans.llm_ops import (
        text_winnowing_overlap_incremental,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet").select("doc_id", "text")
    store, flags_dir = str(tmp_path / "s5"), str(tmp_path / "f5")
    w = overlap_maintenance_writer(
        store, flags_dir, query_id="serve", min_shared=32, hot_cap=50
    )
    w(docs.filter(F.col("doc_id") % 10 != 0), 0)  # standing corpus
    w(docs.filter(F.col("doc_id") % 10 == 0), 1)  # the increment
    live = {
        (r["doc_new"], r["doc_old"], r["n_shared"])
        for r in txlog.read_snapshot(spark, flags_dir)
        .filter(F.col("epoch") == 1)
        # the writer also emits within-batch pairs; the serve-path entry is
        # the vs-store relation only
        .filter(F.col("doc_old") % 10 != 0)
        .collect()
    }
    entry = {
        (r["doc_new"], r["doc_old"], r["n_shared"])
        for r in text_winnowing_overlap_incremental(spark, sf).collect()
    }
    assert entry == live
