"""Content-defined chunking (operators/dedup.py:cdc_chunk_fingerprints)."""

from __future__ import annotations

import pytest

from data_ingestion_bra_spark.operators.dedup import cdc_chunk_fingerprints


def _chunks(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    return cdc_chunk_fingerprints(df, "doc_id", "text", **kw).collect()


def test_chunks_partition_the_document(spark):
    text = " ".join(f"t{i}" for i in range(200))
    rows = _chunks(spark, [(1, text)])
    # chunk_nos are contiguous from 0 and token counts sum to the doc length
    nos = sorted(r["chunk_no"] for r in rows)
    assert nos == list(range(len(nos)))
    assert sum(r["n_tokens"] for r in rows) == 200
    # divisor 16 → expected ~16-token chunks; sanity: more than one chunk
    assert len(rows) > 1


def test_boundaries_survive_a_prefix_insertion(spark):
    shared = " ".join(f"s{i}" for i in range(120))
    rows = _chunks(
        spark,
        [(1, shared), (2, "INSERTED_PREFIX_TOKEN " + shared)],
    )
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc"]].add(r["fp"])
    common = fps[1] & fps[2]
    # boundaries re-synchronize after the edit: most interior chunks keep
    # their fingerprints even though every token shifted by one position —
    # exactly what fixed-offset chunking (same-size windows at fixed
    # positions) would lose completely.
    assert len(common) >= max(1, len(fps[1]) - 2)


def test_identical_docs_share_every_chunk(spark):
    text = " ".join(f"x{i}" for i in range(80))
    rows = _chunks(spark, [(1, text), (2, text)])
    by_doc = {1: set(), 2: set()}
    for r in rows:
        by_doc[r["doc"]].add((r["chunk_no"], r["fp"]))
    assert by_doc[1] == by_doc[2]


def test_rejects_degenerate_params(spark):
    with pytest.raises(ValueError):
        _chunks(spark, [(1, "a b")], window=1)
    with pytest.raises(ValueError):
        _chunks(spark, [(1, "a b")], divisor=1)
