"""Incremental materialized-view maintenance over the txlog change feed.

A 100 TB corpus table gets appended/merged/deleted continuously; the
aggregate tables downstream dashboards and curation policies read (per-key
counts, additive sums) must follow. Rescanning the source per refresh costs
a full corpus pass; this module maintains the aggregate INCREMENTALLY from
the transaction log's row-level change feed (``txlog.read_changes``) — the
published delta-maintenance shape for distributive aggregates (counts and
sums are self-maintainable from insert/delete deltas alone; Gupta &
Mumick, "Maintenance of Materialized Views", IEEE DE Bulletin 1995).

Cost per refresh tracks the CHANGE VOLUME, not the source size: one
partial-aggregable groupBy over the delta rows, one groupBy merge against
the (key-domain-sized) prior state, and one atomic overwrite commit of the
view. The view itself is a txlog table, so refreshes are snapshot-isolated
and carry the applied source version in commit metadata — a crashed or
replayed refresh recomputes the same deterministic state, and a concurrent
duplicate refresh loses the publish race and returns ``{"refreshed": False,
"conflict": True}`` (the winner's state is current; the next call
re-reads ``last_applied_version`` and no-ops or catches up).

Correctness contract (tested): after any sequence of source commits
(append / row-level DELETE / MERGE), ``refresh_agg_view`` brings the view
to exactly ``groupBy(keys).agg(count, sums)`` of the CURRENT source
snapshot — keys whose live row count reaches zero disappear from the view.
Sum columns must be integer-typed (additive deltas stay exact; float sums
would drift under delete/re-insert churn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_bra_spark.sinks.txlog import (
    CommitConflict,
    _read_log,
    commit_overwrite_partition,
    read_changes,
    read_snapshot,
)

_VIEW_PARTITION = ("view", "state")


def source_version(table_dir: str) -> int:
    """Latest committed version of a txlog table (-1 when empty/absent)."""
    try:
        return len(_read_log(table_dir)) - 1
    except FileNotFoundError:
        return -1


def last_applied_version(view_dir: str) -> int:
    """Source version of the view's CURRENT state (-1 before the first
    refresh). Carried in the view's own commit metadata — the view is
    self-describing; no side-channel state files.

    Deliberately the LATEST refresh record's version, not the max: if two
    racing refreshes publish out of order (a 0→2 overwrite then a stale
    0→1 overwrite), the table's current state IS the later commit's state
    — reading max() would report 2 while the state holds 1 and every
    future refresh would no-op against a permanently stale view. Reading
    the latest record makes the next refresh re-apply 2..cur and
    self-heal."""
    try:
        records = _read_log(view_dir)
    except FileNotFoundError:
        return -1
    for r in reversed(records):
        v = r.get("meta", {}).get("src_version")
        if v is not None:
            return v
    return -1


def _agg(df: DataFrame, key_cols: tuple[str, ...], sum_cols: tuple[str, ...]) -> DataFrame:
    aggs = [F.sum("_sign").cast("bigint").alias("n_rows")]
    aggs += [
        F.sum(F.col(c) * F.col("_sign")).cast("bigint").alias(f"sum_{c}")
        for c in sum_cols
    ]
    return df.groupBy(*key_cols).agg(*aggs)


def refresh_agg_view(
    spark: SparkSession,
    source_dir: str,
    view_dir: str,
    *,
    key_cols: tuple[str, ...],
    sum_cols: tuple[str, ...] = (),
    conflict_retries: int = 1,
) -> dict:
    """Bring the aggregate view up to the source's current version,
    retrying once on a lost publish race (round-8 ADVICE fix): the
    concurrent winner may have read an OLDER ``src_version`` than this
    attempt, so dropping the delta outright could leave the view lagging
    for a one-shot caller. The retry re-reads ``last_applied_version`` —
    if the winner was in fact fresher the retry no-ops (``cur == last``),
    otherwise it applies exactly the remaining window. Only after
    ``conflict_retries`` consecutive lost races does the call return
    ``{"refreshed": False, "conflict": True}``."""
    result: dict = {"refreshed": False, "conflict": True}
    for _ in range(conflict_retries + 1):
        result = _refresh_attempt(
            spark, source_dir, view_dir, key_cols=key_cols, sum_cols=sum_cols
        )
        if not result.get("conflict"):
            return result
    return result


def _refresh_attempt(
    spark: SparkSession,
    source_dir: str,
    view_dir: str,
    *,
    key_cols: tuple[str, ...],
    sum_cols: tuple[str, ...] = (),
) -> dict:
    """Bring the aggregate view up to the source's current version by
    applying only the change feed since the last refresh.

    First refresh aggregates the full current snapshot (there is no
    cheaper correct start); every later refresh reads
    ``read_changes(last+1, cur)``, signs rows (+1 insert / -1 delete),
    aggregates the delta, merges it with the prior state by one groupBy,
    drops zero-count keys, and commits the new state atomically with
    ``src_version`` in the commit metadata. Returns a summary dict.

    A window of only NON-data commits (an OPTIMIZE/compaction, a DELETE that
    matched no rows) yields an empty change feed: the refresh still commits,
    carrying the state forward unchanged but advancing ``src_version`` so
    the window never re-scans (round-7 ADVICE fix — this used to raise).
    An attempt that loses a concurrent publish race returns ``{"refreshed":
    False, "conflict": True}`` instead of raising ``CommitConflict``; the
    public ``refresh_agg_view`` re-reads ``last_applied_version`` and
    retries so a winner that read an older source version cannot leave a
    one-shot caller with a lagging view.
    """
    cur = source_version(source_dir)
    last = last_applied_version(view_dir)
    if cur < 0 or cur == last:
        return {"refreshed": False, "src_version": cur, "applied_from": None}

    if last < 0:
        base = read_snapshot(spark, source_dir, cur).withColumn("_sign", F.lit(1))
        merged = _agg(base, key_cols, sum_cols)
        applied_from = 0
    else:
        ch = read_changes(spark, source_dir, last + 1, cur)
        signed = ch.withColumn(
            "_sign",
            F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1)),
        )
        delta = _agg(signed, key_cols, sum_cols)
        prior = read_snapshot(spark, view_dir)
        val_cols = [c for c in delta.columns if c not in key_cols]
        merged = (
            prior.select(*delta.columns)
            .unionByName(delta)
            .groupBy(*key_cols)
            .agg(*[F.sum(c).cast("bigint").alias(c) for c in val_cols])
        )
        applied_from = last + 1

    new_state = merged.filter(F.col("n_rows") > 0)
    try:
        version = commit_overwrite_partition(
            new_state,
            view_dir,
            partition_key=_VIEW_PARTITION[0],
            partition_value=_VIEW_PARTITION[1],
            meta={"src_version": cur, "op_kind": "matview_refresh"},
        )
    except CommitConflict:
        # a concurrent refresh published first; its state is at least as
        # fresh as ours would have been — safe to drop this attempt (no
        # double-count is possible, the overwrite is all-or-nothing)
        return {
            "refreshed": False,
            "src_version": cur,
            "applied_from": applied_from,
            "conflict": True,
        }
    return {
        "refreshed": True,
        "src_version": cur,
        "applied_from": applied_from,
        "view_version": version,
    }
