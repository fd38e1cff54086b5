"""In-engine distributed trainers (BPE merges, NB langid weights, bigram
LM weights) — each bit-identical to its pure-Python offline twin on the
same input, tie-breaks and stop rules included."""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.bpe import (
    _merge_pair_expr,
    train_bpe_distributed,
)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def _reference_train(texts, n_merges):
    from train_bpe import train

    vocab = Counter()
    for t in texts:
        vocab.update(w for w in t.split() if w)
    return train(vocab, n_merges)


def test_merge_pair_fold_is_greedy_left_to_right(spark):
    # 'aaaa' under merge (a, a): greedy non-overlapping -> [aa, aa];
    # 'aaa' -> [aa, a]  (the canonical apply_merge semantics)
    df = spark.createDataFrame([("aaaa",), ("aaa",), ("bab",)], "w string")
    got = {
        tuple(r["m"])
        for r in df.select(
            _merge_pair_expr(F.split("w", ""), "a", "a").alias("m")
        ).collect()
    }
    assert got == {("aa", "aa"), ("aa", "a"), ("b", "a", "b")}


def test_matches_reference_trainer_with_ties(spark):
    # 'ab' and 'cd' tie on count: the lexicographically smaller pair must
    # win first, in both trainers
    texts = ["ab ab cd cd", "ab cd xy"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert train_bpe_distributed(df, n_merges=6) == _reference_train(texts, 6)


def test_matches_reference_trainer_on_fixture_docs(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(60)
    )
    texts = [r["text"] for r in docs.select("text").collect()]
    got = train_bpe_distributed(docs, n_merges=24)
    assert got == _reference_train(texts, 24)
    assert len(got) == 24  # real corpus: plenty of mergeable pairs


def test_stops_when_no_pairs_remain(spark):
    # single-char words only: zero adjacent pairs from the start
    df = spark.createDataFrame([("a b c",)], "text string")
    assert train_bpe_distributed(df, n_merges=5) == []


def test_langid_nb_distributed_matches_committed_model(spark):
    # the committed weight table IS the offline trainer's output on the
    # shared corpus — retraining in-engine must reproduce it bit-for-bit
    from train_langid_nb import CORPUS

    from data_ingestion_bra_spark.operators.langid_nb import (
        load_nb_model,
        train_langid_nb_distributed,
    )

    df = spark.createDataFrame(
        [(lang, txt) for lang, txt in CORPUS.items()], "lang string, text string"
    )
    assert train_langid_nb_distributed(df) == load_nb_model()


def test_ngram_lm_distributed_matches_committed_model(spark):
    from train_langid_nb import CORPUS

    from data_ingestion_bra_spark.operators.ngram_lm import (
        load_lm,
        train_ngram_lm_distributed,
    )

    # one row per corpus: bigrams never cross document (= corpus) seams,
    # matching the offline trainer's per-corpus counting
    df = spark.createDataFrame(
        [(txt,) for _, txt in sorted(CORPUS.items())], "text string"
    )
    assert train_ngram_lm_distributed(df) == load_lm()
