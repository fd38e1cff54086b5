"""Span-level contamination audit (operators/contamination.py)."""

from __future__ import annotations


def test_contamination_spans_merges_overlaps_and_separates_gaps(spark):
    from data_ingestion_bra_spark.operators.contamination import (
        contamination_spans,
        positional_shingles,
    )

    secret = "s0 s1 s2 s3"  # the benchmark 4-gram (n=4 keeps the fixture tiny)
    bench = spark.createDataFrame([(secret,)], "shingle string")
    # doc 1: secret at tokens 2..6 and again at 10..14 (two separate spans);
    # doc 2: "s0 s1 s2 s3 s0 s1 s2 s3" back-to-back → hits at 4 consecutive
    # positions + the repeat → ONE merged span; doc 3: clean.
    docs = spark.createDataFrame(
        [
            (1, "a b s0 s1 s2 s3 x y z w s0 s1 s2 s3 q"),
            (2, "p s0 s1 s2 s3 s0 s1 s2 s3 r"),
            (3, "clean text with no leak at all here ok"),
        ],
        "doc_id bigint, text string",
    )
    pos = positional_shingles(docs, "doc_id", "text", n=4)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in contamination_spans(pos, bench, n=4).collect()
    }
    assert got == {
        (1, 2, 6, 1),
        (1, 10, 14, 1),
        (2, 1, 9, 2),  # adjacent+overlapping hits merged into one maximal span
    }
