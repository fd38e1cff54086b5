"""Cross-engine integer-division parity pins (ADVICE r10 #3/#4).

Two hash-gated entries lean on Spark `div` matching DuckDB `//`:

- text_pmi_collocations widens its numerator to DECIMAL(38,0)/HUGEINT so
  n_pair*n_total*10000 can't wrap int64 at multi-billion-token scale —
  the widened `div` must still agree bit-for-bit with DuckDB.
- events_time_weighted_value divides a possibly-negative wsum_e4. The
  r10 advisory claimed DuckDB `//` floors while Spark `div` truncates;
  measured on this stack BOTH truncate toward zero (-7 -> -3). This test
  pins that equivalence so a DuckDB upgrade that changes `//` semantics
  breaks loudly here instead of as a silent hash mismatch.
"""

from __future__ import annotations

import duckdb


def test_pmi_widened_numerator_matches_duckdb_beyond_int64(spark):
    # n_pair * n_total * 10000 = 3e6 * 5e12 * 1e4 = 1.5e23 >> 2^63 — the
    # old BIGINT formulation wraps silently here; the widened one must not.
    cases = [
        (3_000_000, 5_000_000_000_000, 4_000_000_000, 700_000_000),
        (1, 9_000_000_000_000, 9_000_000_000_000, 1),  # max-ratio corner
        (5, 5, 5, 5),  # tiny corpus
    ]
    for n_pair, n_total, n_w1, n_w2 in cases:
        got = spark.range(1).selectExpr(
            f"CAST(CAST({n_pair} AS DECIMAL(38,0)) * {n_total} * 10000"
            f" div (CAST({n_w1} AS DECIMAL(38,0)) * {n_w2}) AS BIGINT) AS v"
        ).collect()[0]["v"]
        want = duckdb.sql(
            f"SELECT CAST(CAST({n_pair} AS HUGEINT) * {n_total} * 10000"
            f" // (CAST({n_w1} AS HUGEINT) * {n_w2}) AS BIGINT)"
        ).fetchone()[0]
        assert got == want == (n_pair * n_total * 10000) // (n_w1 * n_w2)


def test_spark_div_matches_duckdb_floordiv_on_negatives(spark):
    """Both engines truncate toward zero on integer division of signed
    BIGINTs — the assumption events_time_weighted_value's twap_e4 makes
    when wsum_e4 is negative (negative event values)."""
    cases = [(-7, 2), (7, 2), (-7, -2), (7, -2), (-1, 3), (-9, 3), (0, 5)]
    exprs = ", ".join(
        f"CAST({a} AS BIGINT) div CAST({b} AS BIGINT) AS v{i}"
        for i, (a, b) in enumerate(cases)
    )
    row = spark.range(1).selectExpr(*exprs.split(", ")).collect()[0]
    duck = duckdb.sql(
        "SELECT "
        + ", ".join(
            f"CAST({a} AS BIGINT) // CAST({b} AS BIGINT)" for a, b in cases
        )
    ).fetchone()
    for i, (a, b) in enumerate(cases):
        trunc = int(a / b) if b else None  # Python int() truncates toward 0
        assert row[f"v{i}"] == duck[i] == trunc, (a, b)


def test_twap_hash_parity_with_negative_values(spark):
    """End-to-end: the registered TWAP plan and its oracle SQL agree on a
    fixture that FORCES negative weighted sums (the advisory's scenario),
    not just on the benign testdata distribution."""
    import pandas as pd

    from data_ingestion_bra_spark.plans.registry import get_oracle_sql, get_queries

    rows = []
    # user A: values straddle zero with uneven holding times -> negative wsum
    for i, v in enumerate([-3.5, 1.25, -7.0, 2.0]):
        rows.append((f"e{i}", "A", v, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=7 * i + i * i)))
    # user B: all-negative values
    for i, v in enumerate([-1.0, -2.5, -0.25]):
        rows.append((f"f{i}", "B", v, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=11 * i)))
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "value", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # no nanos ambiguity

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(f"{d}/events.parquet", index=False)
        got = sorted(
            tuple(r) for r in get_queries()["events_time_weighted_value"](spark, d).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            tuple(r) for r in con.execute(
                get_oracle_sql()["events_time_weighted_value"]
            ).fetchall()
        )
        assert got == want
        assert any(r[-1] < 0 for r in got), "fixture must produce negative twap"
