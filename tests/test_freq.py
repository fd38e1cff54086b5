"""Misra-Gries heavy hitters (operators/freq.py): the mergeability
guarantee, exactness of the two-scan top-k, and the bounded-summary
contract that is the whole point at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.freq import (
    heavy_hitters_exact_topk,
    misra_gries_summaries,
)

SF = "/root/testdata/sf0.001"


def _skewed_df(spark, n_partitions=4):
    """Zipf-ish key stream: key k appears ~N/(k+1) times, plus a long tail
    of singletons — heavy keys clearly above N/(capacity+1), tail below."""
    rows = []
    for k in range(8):
        rows += [(f"hot_{k:02d}",)] * (400 // (k + 1))
    rows += [(f"tail_{i:05d}",) for i in range(3000)]
    # deterministic interleave so every partition sees both regimes
    rows.sort()
    return spark.createDataFrame(rows, "key string").repartition(n_partitions)


def test_mg_summary_guarantee_and_bound(spark):
    df = _skewed_df(spark)
    n = df.count()
    capacity = 64
    summ = misra_gries_summaries(df, "key", capacity).collect()
    n_parts = df.rdd.getNumPartitions()
    # bounded output: at most capacity rows per partition
    assert len(summ) <= capacity * n_parts
    per_key = {r["key"] for r in summ}
    exact = {r["key"]: r["n"] for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()}
    bound = n / (capacity + 1)
    missed_heavy = [k for k, c in exact.items() if c > bound and k not in per_key]
    assert missed_heavy == [], f"keys above N/(c+1)={bound:.1f} missing: {missed_heavy}"
    # the synthetic stream actually exercises the cut path: more distinct
    # keys per partition than capacity
    assert len(exact) > capacity * n_parts / 2


def test_mg_weight_is_lower_bound(spark):
    df = _skewed_df(spark, n_partitions=1)
    capacity = 32
    summ = {r["key"]: r["mg_weight"] for r in misra_gries_summaries(df, "key", capacity).collect()}
    exact = {r["key"]: r["n"] for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()}
    for k, w in summ.items():
        assert 0 < w <= exact[k], (k, w, exact[k])


def test_exact_topk_matches_full_groupby(spark):
    df = _skewed_df(spark)
    k = 8
    got = heavy_hitters_exact_topk(df, "key", k, capacity=64).collect()
    want = (
        df.groupBy("key")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(k)
        .collect()
    )
    assert [(r["key"], r["n"]) for r in got] == [(r["key"], r["n"]) for r in want]
    assert [r["rank"] for r in got] == list(range(1, k + 1))


def test_capacity_validation(spark):
    df = _skewed_df(spark)
    with pytest.raises(ValueError):
        misra_gries_summaries(df, "key", 0)


def test_catalog_entry_fixture_margin(spark):
    """The registered text_heavy_hitters entry's exactness precondition at
    the fixture: the 25th 3-gram count must clear N/(capacity+1) strictly
    (the condition the docstring claims holds at every sf)."""
    from data_ingestion_bra_spark.operators import dedup
    from data_ingestion_bra_spark.plans.registry import get_queries
    from data_ingestion_bra_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents")
    sh = dedup.doc_shingles(d, "doc_id", "text", n=3, distinct=False)
    n = sh.count()
    capacity = 16384
    got = get_queries()["text_heavy_hitters"](spark, SF).collect()
    assert len(got) == 25
    assert got[-1]["n"] > n / (capacity + 1)
    # and the output equals the plain exact top-25
    want = (
        sh.groupBy("shingle")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("shingle").asc())
        .limit(25)
        .collect()
    )
    assert [(r["shingle"], r["n"]) for r in got] == [(r["shingle"], r["n"]) for r in want]
