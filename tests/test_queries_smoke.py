"""Every registered query runs at sf0.001 with a stable schema; full value
parity vs DuckDB is tools/check_oracle.py's job (and the driver's)."""

from __future__ import annotations

import pytest

from data_ingestion_bra_spark.plans.registry import QUERIES, get_oracle_sql, get_queries

SF = "/root/testdata/sf0.001"

QUERY_NAMES = sorted(get_queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_runs(spark, name):
    df = get_queries()[name](spark, SF)
    rows = df.limit(5000).collect()
    assert df.columns, name
    assert isinstance(rows, list)


def test_oracle_keys_subset():
    qs, os_ = get_queries(), get_oracle_sql()
    assert set(os_) <= set(qs)
    # every registered query has an oracle twin — no self-granted exemptions
    # (even the HLL sketch is gated, via its in-query error-bound check)
    assert {n for n in qs if n not in os_} == set()


def test_registry_has_docs():
    for name, spec in QUERIES.items():
        assert spec.doc.strip(), f"{name} missing docstring"
