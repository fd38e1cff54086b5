"""Incremental-ingestion operators: MERGE-style upsert and SCD2 history.

The reference's bronze pipeline rewrites a full daily snapshot per partition
(app/ingestao_api.py:124-127 — one ``anomesdia=YYYYMMDD`` directory per run);
the Spark-native engine adds the incremental surface a lakehouse actually
runs on top of that layout:

- ``merge_upsert``: Delta-``MERGE``-shaped upsert without a table format —
  changeset rows replace matching base rows by key, unmatched changeset rows
  insert. The base side NEVER shuffles: the anti-join probes a broadcast of
  just the changeset KEYS (a CDC batch is small relative to the table — the
  100 TB regime), so the plan is scan → broadcast-anti → union. With
  partitioned bases, replaced keys prune to their partitions (dynamic
  partition overwrite is the write-side twin in ``sinks/``).
- ``scd2_intervals``: slowly-changing-dimension type 2 — collapse an
  append-only change log into validity intervals per entity
  (valid_from/valid_to, is_current) via one window pass: lag to find change
  points, a running sum to number versions, one aggregation per (entity,
  version), lead to close intervals. Everything partitions by entity, so
  the whole history build is a single shuffle on the entity key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    *,
    broadcast_changes: bool = True,
    on_duplicate_keys: str = "keep_all",
) -> DataFrame:
    """Upsert ``changes`` into ``base`` on ``keys``: matched base rows are
    replaced, unmatched changeset rows are inserted. Schemas must union by
    name. ``broadcast_changes`` keeps the anti-join broadcast (CDC batches
    are small); disable it for rare full-table restatements, where a
    shuffled anti-join on a bucketed key column is the right plan.

    Duplicate keys in ``changes`` diverge from Delta ``MERGE`` (which errors
    on multiple matches): the base row is anti-joined away once but EVERY
    duplicate changeset row unions in. ``on_duplicate_keys`` makes the
    choice explicit:

    - ``"keep_all"`` (default): multi-row-per-key changesets pass through —
      right for append-shaped CDC where the caller pre-deduped or wants
      every version.
    - ``"last_wins"``: keep one row per key, the max by ``_seq`` — callers
      must supply a ``_seq`` column (a CDC sequence number / timestamp);
      resolution is one map-side-combinable ``max_by`` per key on the
      (small) changeset only, the base still never shuffles.
    - ``"error"``: raise on the first duplicate key (Delta parity). Costs
      one count over the changeset keys — an eager action, so reserve it
      for pipelines that want the guard.
    """
    if on_duplicate_keys == "last_wins":
        if "_seq" not in changes.columns:
            raise ValueError("last_wins requires a _seq column in changes")
        payload = [c for c in changes.columns if c not in keys]
        changes = (
            changes.groupBy(*keys)
            .agg(*[F.max_by(c, "_seq").alias(c) for c in payload])
            .select(*changes.columns)
        )
    elif on_duplicate_keys == "error":
        dup = (
            changes.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(f"merge_upsert: duplicate keys in changes on {list(keys)}")
    elif on_duplicate_keys != "keep_all":
        raise ValueError(f"unknown on_duplicate_keys: {on_duplicate_keys!r}")
    key_rows = changes.select(*keys).distinct()
    if broadcast_changes:
        key_rows = F.broadcast(key_rows)
    return base.join(key_rows, list(keys), "left_anti").unionByName(changes)


def scd2_intervals(
    df: DataFrame,
    entity_col: str,
    attr_col: str,
    ts_col: str,
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """SCD2 history from an event log: one row per (entity, attribute run),
    with ``valid_from`` = first event of the run, ``valid_to`` = start of
    the next run (null while current), ``n_events`` = run length and
    ``is_current`` on the open interval. ``tiebreak_col`` makes ordering
    total when timestamps can collide (use the event id)."""
    order_cols: list[Column] = [F.col(ts_col).asc()]
    if tiebreak_col:
        order_cols.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    # Null-safe change detection: plain `lag != attr` yields NULL when the
    # attribute itself is NULL, which a running SUM silently skips —
    # corrupting version numbers for any entity whose log carries NULL
    # attribute values. eqNullSafe keeps a NULL-valued run a run (NULL==NULL
    # continues it) and still opens a new run on NULL<->value transitions;
    # the explicit first-row anchor keeps version numbering at 1 even when
    # an entity's history OPENS with a NULL attribute (lag NULL eqNullSafe
    # attr NULL would otherwise read as "no change" and emit version 0).
    changed = (
        (F.row_number().over(w) == 1)
        | ~F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col))
    ).cast("bigint")
    versioned = df.select(
        F.col(entity_col).alias("entity"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("ts"),
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("version"),
    )
    runs = versioned.groupBy("entity", "version").agg(
        F.first("attr").alias("attr"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    we = Window.partitionBy("entity").orderBy(F.col("version").asc())
    return runs.select(
        "entity",
        F.col("version").cast("bigint").alias("version"),
        "attr",
        "valid_from",
        F.lead("valid_from").over(we).alias("valid_to"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.lead("valid_from").over(we).isNull().cast("bigint").alias("is_current"),
    )
