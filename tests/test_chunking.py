"""Sliding-window chunking (operators/text.py:chunk_documents)."""

from __future__ import annotations

import pytest

from data_ingestion_bra_spark.operators.text import chunk_documents


def _chunks(spark, text, *, chunk_tokens, overlap_tokens):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = chunk_documents(
        df, chunk_tokens=chunk_tokens, overlap_tokens=overlap_tokens
    ).collect()
    return sorted((r["chunk_id"], r["start_token"], r["n_tokens"], r["chunk_text"]) for r in rows)


def test_overlap_and_short_tail(spark):
    text = " ".join(str(i) for i in range(10))  # tokens 0..9
    got = _chunks(spark, text, chunk_tokens=4, overlap_tokens=1)
    # stride 3: starts 0,3,6 cover 0..9; start 9 not needed (ceil(6/3)=2 → 3 chunks)
    assert got == [
        (0, 0, 4, "0 1 2 3"),
        (1, 3, 4, "3 4 5 6"),
        (2, 6, 4, "6 7 8 9"),
    ]
    # consecutive chunks share exactly overlap_tokens tokens
    for (_, s0, n0, _), (_, s1, _, _) in zip(got, got[1:]):
        assert s0 + n0 - s1 == 1


def test_every_token_covered_once_chunking_is_total(spark):
    text = " ".join(str(i) for i in range(23))
    got = _chunks(spark, text, chunk_tokens=8, overlap_tokens=2)
    covered = set()
    for _, s, n, _ in got:
        covered.update(range(s, s + n))
    assert covered == set(range(23))


def test_doc_shorter_than_chunk_is_one_chunk(spark):
    got = _chunks(spark, "a b c", chunk_tokens=16, overlap_tokens=4)
    assert got == [(0, 0, 3, "a b c")]


def test_exact_multiple_has_no_empty_tail(spark):
    text = " ".join(str(i) for i in range(8))
    got = _chunks(spark, text, chunk_tokens=4, overlap_tokens=0)
    assert [g[:3] for g in got] == [(0, 0, 4), (1, 4, 4)]
    assert all(g[2] > 0 for g in got)


def test_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=-1)


def test_shuffle_free_plan(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
    plan = (
        chunk_documents(df, chunk_tokens=4, overlap_tokens=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
