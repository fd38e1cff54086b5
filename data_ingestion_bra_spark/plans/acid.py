"""Catalog entries for the ACID table format (``sinks/txlog.py``).

The txlog tier (put-if-absent publish, optimistic concurrency, snapshot
isolation, time travel, exactly-once streaming appends) was pytest-only in
round 6 — the one capability with no driver-visible credit. This module
gives it a registered, oracle-twinned query: commit three deterministic
versions of a table through the log, then TIME-TRAVEL read every version
and emit (version, n_rows, content_md5).

The DuckDB twin never sees the log — it replays the same deterministic
version contents straight from the source table (version ``k`` holds the
orders rows with ``o_orderkey % 3 <= k``), so a hash match proves the
snapshot-at-version resolution returns exactly the rows each commit
added and nothing from later commits.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_bra_spark.plans.registry import register
from data_ingestion_bra_spark.sinks import txlog
from data_ingestion_bra_spark.sources.tables import load_table

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent


def _demo_table_dir(sf_dir: str) -> str:
    # one demo table per scale fixture; lives beside the bench replicas
    return str(_REPO_ROOT / ".data" / "txlog_demo" / Path(sf_dir).name)


def _ensure_versions(spark: SparkSession, sf_dir: str) -> str:
    """Commit versions 0..2 (idempotently — the ``v{k}`` keys make repeat
    builder invocations no-ops, so bench medians and driver re-runs don't
    grow the log). Commit ``k`` appends the orders rows with
    ``o_orderkey % 3 == k``; snapshot@k therefore holds ``% 3 <= k``."""
    table_dir = _demo_table_dir(sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    for k in range(3):
        if txlog.committed_version(table_dir, f"v{k}") is None:
            txlog.commit_append(
                orders.filter(F.col("o_orderkey") % 3 == k),
                table_dir,
                meta={"demo_version": k},
                idempotency_key=f"v{k}",
            )
    return table_dir


@register(
    "txlog_time_travel",
    """
    SELECT g.v AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           md5(string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey))
               AS content_md5
    FROM (VALUES (0), (1), (2)) g(v)
    JOIN orders ON o_orderkey % 3 <= g.v
    GROUP BY g.v
    """,
    tags=("acid", "txlog", "time-travel", "sink"),
)
def txlog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel through the transaction log: three ACID commits land
    deterministic slices of ``orders``; the query reads snapshot@0,
    snapshot@1, and snapshot@2 AFTER all three commits exist and
    fingerprints each (sorted-key md5). Matching the oracle — which
    recomputes each version's intended contents from the raw table —
    proves log-replay snapshot resolution is exact: old versions stay
    readable and never leak rows from later commits.

    Scale shape: the log is KBs of JSON replayed driver-side (O(commits),
    zero object-store LISTs); each version's read is a plain parquet scan
    of only that snapshot's files. The md5 fingerprint is one
    sort_array(collect_list) over the demo slice — bounded by the demo
    table, not the corpus."""
    table_dir = _ensure_versions(spark, sf_dir)
    per_version = [
        txlog.read_snapshot(spark, table_dir, version=k)
        .agg(
            F.lit(k).cast("int").alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.md5(
                F.concat_ws(
                    ",",
                    # sort NUMERICALLY (bigint array), stringify after — the
                    # oracle's ORDER BY o_orderkey is numeric too
                    F.sort_array(F.collect_list("o_orderkey")).cast("array<string>"),
                )
            ).alias("content_md5"),
        )
        for k in range(3)
    ]
    out = per_version[0]
    for df in per_version[1:]:
        out = out.unionAll(df)
    return out
