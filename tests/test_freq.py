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


def test_null_keys_raise_by_default(spark):
    """A frequent NULL can't survive the equality semi-join recount, so the
    summary pass refuses nullable input unless the caller opts out."""
    df = spark.createDataFrame([("a",), (None,), ("a",)], "key string")
    with pytest.raises(Exception, match="null key"):
        misra_gries_summaries(df, "key", 8).collect()
    # explicit opt-out drops nulls (documented divergence from GROUP BY);
    # summaries are per-partition, so sum weights across partitions
    got: dict = {}
    for r in misra_gries_summaries(df, "key", 8, nulls="ignore").collect():
        got[r["key"]] = got.get(r["key"], 0) + r["mg_weight"]
    assert got == {"a": 2}
    with pytest.raises(ValueError):
        misra_gries_summaries(df, "key", 8, nulls="bogus")


def test_verify_exact_guard_passes_and_trips(spark):
    df = _skewed_df(spark)
    # generous capacity: guard passes, output identical to unguarded call
    got = heavy_hitters_exact_topk(df, "key", 4, capacity=64, verify_exact=True).collect()
    want = heavy_hitters_exact_topk(df, "key", 4, capacity=64).collect()
    assert [(r["rank"], r["key"], r["n"]) for r in got] == [
        (r["rank"], r["key"], r["n"]) for r in want
    ]
    # near-uniform stream + tiny capacity: k-th count <= N/(capacity+1),
    # so the exactness bound fails and the guard must raise
    flat = spark.createDataFrame(
        [(f"k_{i % 500:03d}",) for i in range(2000)], "key string"
    ).repartition(4)
    with pytest.raises(ValueError, match="exactness bound violated"):
        heavy_hitters_exact_topk(flat, "key", 10, capacity=2, verify_exact=True)


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


# ---------------------------------------------------------------------------
# Streaming maintenance: mergeable summaries folded into a txlog store.
# ---------------------------------------------------------------------------


def _stream_corpus(spark, tmp_path, n_epochs=3, capacity=64, qid="f"):
    from data_ingestion_bra_spark.streaming.freq_maintenance import (
        freq_maintenance_writer,
    )

    store = str(tmp_path / "freq_store")
    df = _skewed_df(spark)
    w = freq_maintenance_writer(store, key_col="key", capacity=capacity, query_id=qid)
    for epoch in range(n_epochs):
        w(df.filter(F.crc32(F.col("key")) % n_epochs == epoch), epoch)
    return store, df


def test_stream_summary_bound_and_guarantee(spark, tmp_path):
    from data_ingestion_bra_spark.streaming.freq_maintenance import current_candidates

    capacity = 64
    store, df = _stream_corpus(spark, tmp_path, capacity=capacity)
    cand = current_candidates(spark, store, "key")
    rows = cand.collect()
    assert 0 < len(rows) <= capacity
    # mergeability: every key with lifetime count > N/(capacity+1) survives
    n = df.count()
    exact = {r["key"]: r["n"] for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()}
    bound = n / (capacity + 1)
    keys = {r["key"] for r in rows}
    missed = [k for k, c in exact.items() if c > bound and k not in keys]
    assert missed == [], missed
    # weights are lower bounds
    for r in rows:
        assert 0 < r["mg_weight"] <= exact[r["key"]]
    # exact recount over the corpus reproduces the batch-tier top-k
    from data_ingestion_bra_spark.operators.freq import heavy_hitters_exact_topk

    recount = (
        df.join(F.broadcast(cand.select("key")), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "key")
        .limit(8)
        .collect()
    )
    want = heavy_hitters_exact_topk(df, "key", 8, capacity=capacity).collect()
    assert [(r["key"], r["n"]) for r in recount] == [(r["key"], r["n"]) for r in want]


def test_stream_epoch_replay_is_exactly_once(spark, tmp_path):
    from data_ingestion_bra_spark.sinks import txlog
    from data_ingestion_bra_spark.streaming.freq_maintenance import (
        current_candidates,
        freq_maintenance_writer,
    )

    store = str(tmp_path / "freq_store2")
    df = _skewed_df(spark)
    w = freq_maintenance_writer(store, key_col="key", capacity=32, query_id="r")
    w(df.filter(F.col("key").startswith("hot")), 0)
    v0 = txlog.snapshot(store).version
    before = sorted(
        (r["key"], r["mg_weight"]) for r in current_candidates(spark, store, "key").collect()
    )
    w(df.filter(F.col("key").startswith("hot")), 0)  # replay
    assert txlog.snapshot(store).version == v0
    after = sorted(
        (r["key"], r["mg_weight"]) for r in current_candidates(spark, store, "key").collect()
    )
    assert after == before


def test_stream_retire_epochs(spark, tmp_path):
    from data_ingestion_bra_spark.sinks import txlog
    from data_ingestion_bra_spark.streaming.freq_maintenance import (
        current_candidates,
        retire_epochs_before,
    )

    store, df = _stream_corpus(spark, tmp_path, n_epochs=3, qid="ret")
    latest = sorted(
        (r["key"], r["mg_weight"]) for r in current_candidates(spark, store, "key").collect()
    )
    retire_epochs_before(spark, store, 2)
    kept = txlog.read_snapshot(spark, store)
    assert kept.filter(F.col("epoch") < 2).count() == 0
    after = sorted(
        (r["key"], r["mg_weight"]) for r in current_candidates(spark, store, "key").collect()
    )
    assert after == latest


def test_current_candidates_empty_store_is_explicit_empty(spark, tmp_path):
    """A never-committed store returns an empty summary frame with the
    declared schema — the explicit version<0 guard, not null-comparison
    fallout."""
    from data_ingestion_bra_spark.streaming.freq_maintenance import current_candidates

    cand = current_candidates(spark, str(tmp_path / "no_such_store"), "key")
    assert cand.columns == ["key", "mg_weight"]
    assert cand.count() == 0
    assert dict(cand.dtypes) == {"key": "string", "mg_weight": "bigint"}


def test_mg_merge_matches_single_pass_bound(spark):
    from data_ingestion_bra_spark.operators.freq import mg_merge, misra_gries_summaries

    df = _skewed_df(spark)
    capacity = 48
    # split the stream, summarize each half, merge — bound must hold
    h1 = misra_gries_summaries(df.filter(F.crc32("key") % 2 == 0), "key", capacity)
    h2 = misra_gries_summaries(df.filter(F.crc32("key") % 2 == 1), "key", capacity)
    merged = mg_merge(h1.unionByName(h2), "key", capacity)
    rows = merged.collect()
    assert len(rows) <= capacity
    exact = {r["key"]: r["n"] for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()}
    n = df.count()
    keys = {r["key"] for r in rows}
    assert [k for k, c in exact.items() if c > n / (capacity + 1) and k not in keys] == []
    for r in rows:
        assert 0 < r["mg_weight"] <= exact[r["key"]]


def test_verify_exact_guard_trips_on_short_candidate_set(spark):
    """ADVICE r10 #1: extreme skew can leave FEWER than k surviving MG
    candidates while the corpus holds >= k distinct keys — the tail row's
    count then clears the bound but true top-k members are missing. The
    guard must raise rather than certify the short result."""
    # one massive key + 10 rare keys, capacity 1: MG keeps only the hot key
    rows = [("hot",)] * 5000 + [(f"rare_{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "key string").repartition(2)
    with pytest.raises(ValueError, match="exactness bound violated"):
        heavy_hitters_exact_topk(df, "key", 5, capacity=1, verify_exact=True)


def test_verify_exact_short_result_ok_when_keys_exhausted(spark):
    """A result with fewer than k rows IS exact when those rows are the
    entire distinct key set (top-10 of 3 keys = all 3 keys) — the guard
    must certify it, not raise."""
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20
    df = spark.createDataFrame(rows, "key string").repartition(2)
    got = heavy_hitters_exact_topk(df, "key", 10, capacity=64, verify_exact=True)
    assert [(r["rank"], r["key"], r["n"]) for r in got.collect()] == [
        (1, "a", 50),
        (2, "b", 30),
        (3, "c", 20),
    ]
