"""Fellegi-Sunter record linkage (operators/linkage.py + the
linkage_customers_fellegi_sunter entry): agreement-pattern packing,
threshold validation, and ground-truth separation on the corrupted-mirror
fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.linkage import fellegi_sunter_score

SF = "/root/testdata/sf0.001"


def test_pattern_bits_and_score(spark):
    pairs = spark.createDataFrame(
        [(1, 1, "x", "x", 5, 5), (2, 3, "x", "y", 5, 9)],
        "a_key bigint, b_key bigint, s_a string, s_b string, v_a bigint, v_b bigint",
    )
    comps = [
        ("s", F.col("s_a") == F.col("s_b"), 300, -100),
        ("v", F.expr("abs(v_a - v_b) <= 2"), 200, -150),
    ]
    got = {
        r["a_key"]: (r["pattern"], r["score_e2"], r["verdict"])
        for r in fellegi_sunter_score(
            pairs, comps, match_threshold_e2=400, possible_threshold_e2=100
        ).collect()
    }
    assert got[1] == (3, 500, "match")  # both agree: bits 0b11
    assert got[2] == (0, -250, "non_match")  # both disagree
    with pytest.raises(ValueError, match="comparator"):
        fellegi_sunter_score(pairs, [], match_threshold_e2=1, possible_threshold_e2=0)
    with pytest.raises(ValueError, match="threshold"):
        fellegi_sunter_score(
            pairs, comps, match_threshold_e2=100, possible_threshold_e2=400
        )


def test_entry_ground_truth_separation(spark):
    """The corrupted-mirror fixture must separate cleanly: every true pair
    that survives blocking scores 'match'; no false pair ever does."""
    from data_ingestion_bra_spark.plans.registry import get_queries

    rows = get_queries()["linkage_customers_fellegi_sunter"](spark, SF).collect()
    true_pairs = [r for r in rows if r["is_true"] == 1]
    false_pairs = [r for r in rows if r["is_true"] == 0]
    assert true_pairs, "fixture must retain true pairs through blocking"
    assert all(r["verdict"] == "match" for r in true_pairs)
    assert not any(r["verdict"] == "match" for r in false_pairs)
    # blocking recall losses exist by design (bucket-edge drift, segment
    # scramble) and stay bounded
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert len(true_pairs) >= int(n_cust * 0.8)
