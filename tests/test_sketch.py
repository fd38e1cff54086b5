"""KMV (bottom-k) distinct-count sketches (operators/sketch.py) and the
streaming cardinality store (streaming/cardinality_maintenance.py): the
estimator's error behavior, exactness below k, EXACT mergeability (the
property the streaming fold rests on), and exactly-once epoch replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.sketch import (
    KMV_SPACE,
    kmv_estimates,
    kmv_merge,
    kmv_summaries,
)


def _keyed_df(spark, groups: dict[str, int]):
    """groups: name -> number of distinct keys (each repeated twice so the
    distinct step is doing real work)."""
    rows = []
    for g, n in groups.items():
        for i in range(n):
            rows += [(g, f"{g}_user_{i}")] * 2
    return spark.createDataFrame(rows, "grp string, key string").repartition(4)


def test_exact_below_k(spark):
    df = _keyed_df(spark, {"small": 37})
    est = kmv_estimates(kmv_summaries(df, ["grp"], "key", 64), ["grp"], 64).collect()
    assert len(est) == 1
    assert est[0]["n_in_sketch"] == 37
    assert est[0]["estimate"] == 37  # the summary IS the distinct set


def test_estimator_error_band(spark):
    """Relative error concentrates at ~1/sqrt(k); assert a generous 4-sigma
    band at k=256 over a 20k-key group."""
    k, n = 256, 20000
    df = _keyed_df(spark, {"big": n})
    est = kmv_estimates(kmv_summaries(df, ["grp"], "key", k), ["grp"], k).collect()[0]
    assert est["n_in_sketch"] == k
    rel_err = abs(est["estimate"] - n) / n
    assert rel_err <= 4 / (k ** 0.5), (est["estimate"], rel_err)


def test_merge_is_exact(spark):
    """bottom-k(union) == bottom-k(union of bottom-k's) — SET equality, not
    an error bound; this is what makes the summary valid streaming state."""
    k = 32
    df = _keyed_df(spark, {"g1": 500, "g2": 10})
    h1 = kmv_summaries(df.filter(F.crc32("key") % 2 == 0), ["grp"], "key", k)
    h2 = kmv_summaries(df.filter(F.crc32("key") % 2 == 1), ["grp"], "key", k)
    merged = {
        (r["grp"], r["h"]) for r in kmv_merge(h1.unionByName(h2), ["grp"], k).collect()
    }
    single = {(r["grp"], r["h"]) for r in kmv_summaries(df, ["grp"], "key", k).collect()}
    assert merged == single


def test_hashes_are_engine_portable(spark):
    """The Spark hash equals DuckDB's ('0x'||substr(md5(x),1,12))::BIGINT —
    the identity the oracle twin rests on."""
    import duckdb

    df = spark.createDataFrame([("42",), ("abc",)], "key string")
    got = {
        r["key"]: r["h"]
        for r in df.select(
            "key",
            __import__(
                "data_ingestion_bra_spark.operators.sketch", fromlist=["kmv_hash_expr"]
            ).kmv_hash_expr("key").alias("h"),
        ).collect()
    }
    for key, h in got.items():
        want = duckdb.sql(
            f"SELECT ('0x' || substr(md5('{key}'), 1, 12))::BIGINT"
        ).fetchall()[0][0]
        assert h == want, key
        assert 0 <= h < KMV_SPACE


def test_k_validation(spark):
    df = _keyed_df(spark, {"g": 3})
    with pytest.raises(ValueError):
        kmv_summaries(df, ["grp"], "key", 1)


# ---------------------------------------------------------------------------
# Streaming maintenance
# ---------------------------------------------------------------------------


def test_stream_fold_equals_single_pass(spark, tmp_path):
    """Folding 3 epoch summaries through the txlog store yields the
    byte-identical standing summary a single pass over the whole stream
    builds — the EXACT mergeability claim, end to end — and the served
    estimates match the batch tier."""
    from data_ingestion_bra_spark.streaming.cardinality_maintenance import (
        cardinality_maintenance_writer,
        current_estimates,
        current_summary,
    )

    k = 32
    store = str(tmp_path / "kmv_store")
    df = _keyed_df(spark, {"g1": 400, "g2": 7})
    w = cardinality_maintenance_writer(
        store, group_cols=["grp"], key_col="key", k=k, query_id="t"
    )
    for epoch in range(3):
        w(df.filter(F.crc32("key") % 3 == epoch), epoch)
    standing = {
        (r["grp"], r["h"]) for r in current_summary(spark, store, ["grp"]).collect()
    }
    single = {(r["grp"], r["h"]) for r in kmv_summaries(df, ["grp"], "key", k).collect()}
    assert standing == single
    served = {
        r["grp"]: r["estimate"]
        for r in current_estimates(spark, store, ["grp"], k).collect()
    }
    batch = {
        r["grp"]: r["estimate"]
        for r in kmv_estimates(kmv_summaries(df, ["grp"], "key", k), ["grp"], k).collect()
    }
    assert served == batch
    assert served["g2"] == 7  # exact below k


def test_stream_epoch_replay_is_exactly_once(spark, tmp_path):
    from data_ingestion_bra_spark.sinks import txlog
    from data_ingestion_bra_spark.streaming.cardinality_maintenance import (
        cardinality_maintenance_writer,
        current_summary,
    )

    store = str(tmp_path / "kmv_store2")
    df = _keyed_df(spark, {"g1": 100})
    w = cardinality_maintenance_writer(
        store, group_cols=["grp"], key_col="key", k=16, query_id="r"
    )
    w(df, 0)
    v0 = txlog.snapshot(store).version
    before = sorted(
        (r["grp"], r["h"]) for r in current_summary(spark, store, ["grp"]).collect()
    )
    w(df, 0)  # replay
    assert txlog.snapshot(store).version == v0
    after = sorted(
        (r["grp"], r["h"]) for r in current_summary(spark, store, ["grp"]).collect()
    )
    assert after == before


def test_empty_store_is_explicit_empty(spark, tmp_path):
    from data_ingestion_bra_spark.streaming.cardinality_maintenance import (
        current_summary,
    )

    cand = current_summary(spark, str(tmp_path / "never_committed"), ["grp"])
    assert cand.columns == ["grp", "h"]
    assert cand.count() == 0


def test_null_keys_raise_by_default(spark):
    """ADVICE r10 #2: md5(NULL) is NULL, survives distinct, and Spark's
    Window.orderBy sorts NULLS FIRST — a null key would shadow a real
    bottom-k slot while a SQL oracle sorts NULLS LAST. Contract mirrors
    misra_gries_summaries: error by default, opt-in ignore."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    df = spark.createDataFrame(
        [("a", "u1"), ("a", None), ("b", "u2")], "g string, k string"
    )
    with pytest.raises((Py4JJavaError, PySparkException)):
        kmv_summaries(df, ["g"], "k", 4).collect()


def test_null_keys_ignored_matches_prefiltered_input(spark):
    import pytest

    rows = [("g1", f"u{i}") for i in range(20)] + [("g1", None), ("g2", None)]
    df = spark.createDataFrame(rows, "g string, k string")
    got = sorted(
        (r["g"], r["h"])
        for r in kmv_summaries(df, ["g"], "k", 8, nulls="ignore").collect()
    )
    want = sorted(
        (r["g"], r["h"])
        for r in kmv_summaries(
            df.where(F.col("k").isNotNull()), ["g"], "k", 8
        ).collect()
    )
    assert got == want
    assert all(h is not None for _, h in got)
    # all-null group vanishes entirely (never a NULL-hash summary row)
    assert {g for g, _ in got} == {"g1"}
    with pytest.raises(ValueError, match="nulls"):
        kmv_summaries(df, ["g"], "k", 8, nulls="bogus")


# --- Count-Min sketch ------------------------------------------------------


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    from data_ingestion_bra_spark.operators.sketch import (
        cms_estimates,
        cms_summaries,
    )

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 7
    df = spark.createDataFrame(rows, "k string").repartition(3)
    summ = cms_summaries(df, "k", depth=3, width=1024)
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)], "k string")
    got = {r["k"]: r["estimate"] for r in cms_estimates(summ, keys, "k").collect()}
    # 3 keys in a 1024-wide grid: no collisions, estimates are exact;
    # an absent key can only be overestimated (>= 0), never negative
    assert got["a"] == 50 and got["b"] == 30 and got["c"] == 7
    assert got["zzz"] >= 0


def test_cms_merge_equals_single_pass(spark):
    """Counting is linear: cell-wise sum of per-epoch sketches must be
    BYTE-identical to one sketch of the whole stream — the property that
    makes CMS valid standing streaming state."""
    from data_ingestion_bra_spark.operators.sketch import cms_merge, cms_summaries

    rows = [(f"k{i % 17}",) for i in range(400)]
    df = spark.createDataFrame(rows, "k string")
    whole = {
        (r["j"], r["col"]): r["cell"]
        for r in cms_summaries(df, "k", depth=3, width=64).collect()
    }
    parts = [
        cms_summaries(
            df.filter(F.crc32(F.col("k")) % 3 == i), "k", depth=3, width=64
        )
        for i in range(3)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = {(r["j"], r["col"]): r["cell"] for r in cms_merge(u).collect()}
    assert merged == whole


def test_cms_null_contract(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from data_ingestion_bra_spark.operators.sketch import cms_summaries

    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    with pytest.raises((Py4JJavaError, PySparkException)):
        cms_summaries(df, "k", depth=2, width=16).collect()
    ok = cms_summaries(df, "k", depth=2, width=16, nulls="ignore").collect()
    assert sum(r["cell"] for r in ok) == 2 * 2  # 2 non-null keys x depth 2
    with pytest.raises(ValueError, match="nulls"):
        cms_summaries(df, "k", depth=2, width=16, nulls="bogus")
    with pytest.raises(ValueError, match="depth"):
        cms_summaries(df, "k", depth=0, width=16)


def test_cms_hash_is_engine_portable(spark):
    import duckdb

    from data_ingestion_bra_spark.operators.sketch import cms_hash_expr

    keys = ["hello", "wörld", "123", "k:with:colons"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["h"]
        for r in df.select("k", cms_hash_expr("k", 2, 1024).alias("h")).collect()
    }
    for k in keys:
        want = duckdb.sql(
            f"SELECT ('0x' || substr(md5(2 || ':' || '{k}'), 1, 12))::BIGINT % 1024"
        ).fetchone()[0]
        assert got[k] == want, k


# --- Equi-width histogram quantile summaries --------------------------------


def test_histogram_merge_equals_single_pass(spark):
    from data_ingestion_bra_spark.operators.sketch import (
        histogram_merge,
        histogram_summaries,
    )

    rows = [("g", (i * 37) % 1000) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    whole = {
        (r["g"], r["bin"]): r["cnt"]
        for r in histogram_summaries(
            df, ["g"], "v", lo=0, bin_width=64, n_bins=16
        ).collect()
    }
    parts = [
        histogram_summaries(
            df.filter(F.col("v") % 3 == i), ["g"], "v", lo=0, bin_width=64, n_bins=16
        )
        for i in range(3)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = {
        (r["g"], r["bin"]): r["cnt"] for r in histogram_merge(u, ["g"]).collect()
    }
    assert merged == whole


def test_histogram_quantile_one_bin_bound(spark):
    """For every q, the exact discrete quantile lies in (est-bin_width, est]
    — the derived hard bound, checked against a brute-force sort."""
    from data_ingestion_bra_spark.operators.sketch import (
        histogram_quantiles,
        histogram_summaries,
    )

    vals = sorted(((i * 193) % 5000) for i in range(777))
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    hist = histogram_summaries(df, ["g"], "v", lo=0, bin_width=256, n_bins=32)
    qs = [1000, 5000, 9000, 9999]
    got = {
        r["q_e4"]: (r["n"], r["est_hi"])
        for r in histogram_quantiles(
            hist, ["g"], qs, lo=0, bin_width=256
        ).collect()
    }
    n = len(vals)
    for q in qs:
        target = (q * n + 9999) // 10000
        exact = vals[target - 1]
        n_got, est = got[q]
        assert n_got == n
        assert est - 256 < exact <= est, (q, exact, est)


def test_histogram_clamps_out_of_domain(spark):
    from data_ingestion_bra_spark.operators.sketch import histogram_summaries

    df = spark.createDataFrame(
        [("g", -50), ("g", 10), ("g", 99999)], "g string, v long"
    )
    got = {r["bin"]: r["cnt"] for r in histogram_summaries(
        df, ["g"], "v", lo=0, bin_width=16, n_bins=4
    ).collect()}
    assert got == {0: 2, 3: 1}  # -50 clamps to bin 0, 99999 to the top bin


# --- KMV set intersection + rendezvous sharding ------------------------------


def test_kmv_intersection_estimator_partial_overlap(spark):
    """Known ground truth: |A|=1000, |B|=1000, |A∩B|=500. The theta-region
    estimator at k=64 must land within the ~1/sqrt(k) error regime (a
    generous 4-sigma band here) and be EXACTLY 0 for disjoint sets."""
    from data_ingestion_bra_spark.operators.sketch import KMV_SPACE, kmv_summaries

    k = 64
    rows = [("A", f"u{i}") for i in range(1000)] + [
        ("B", f"u{i}") for i in range(500, 1500)
    ] + [("C", f"v{i}") for i in range(800)]
    df = spark.createDataFrame(rows, "g string, k string")
    summ = {g: None for g in ("A", "B", "C")}
    s = kmv_summaries(df, ["g"], "k", k)
    hs = {g: sorted(r["h"] for r in s.filter(F.col("g") == g).collect()) for g in summ}

    def est_inter(a, b):
        union = sorted(set(hs[a]) | set(hs[b]))[:k]
        theta = union[-1]
        c = len({h for h in hs[a] if h <= theta} & {h for h in hs[b] if h <= theta})
        return c * KMV_SPACE // theta

    e_ab = est_inter("A", "B")
    assert 500 * 0.5 <= e_ab <= 500 * 1.5, e_ab  # 4-sigma-ish band at k=64
    assert est_inter("A", "C") == 0  # disjoint key spaces


def test_rendezvous_minimal_disruption_and_balance(spark):
    """HRW growing N -> N+1: every moved id lands ON THE NEW shard, the
    moved fraction is ~1/(N+1), and the N-shard assignment is balanced."""
    from data_ingestion_bra_spark.operators.sketch import rendezvous_shard_expr

    n = 2000
    df = spark.range(n).select(F.col("id").cast("string").alias("doc"))
    a = df.select(
        rendezvous_shard_expr("doc", 8).alias("s8"),
        rendezvous_shard_expr("doc", 9).alias("s9"),
    ).collect()
    moved = [r for r in a if r["s8"] != r["s9"]]
    assert all(r["s9"] == 8 for r in moved)  # never between existing shards
    frac = len(moved) / n
    assert 0.05 <= frac <= 0.18, frac  # ~1/9 with slack
    from collections import Counter

    c = Counter(r["s8"] for r in a)
    assert len(c) == 8
    assert max(c.values()) < 2.0 * min(c.values())  # rough balance
    import pytest

    with pytest.raises(ValueError, match="n_shards"):
        rendezvous_shard_expr("doc", 0)
