"""Skew-handling aggregation: two-stage salted group-by.

For a heavily-skewed key, a single ``groupBy(key)`` funnels the hot key's
rows into one reducer. Salting splits each key into ``n_salts`` subkeys for
the first (parallel) partial aggregation, then merges the partials in a
second, tiny aggregation. Results are IDENTICAL to the plain group-by (the
oracle checks exactly that) — only the shuffle distribution changes.

The salt must be deterministic here (oracle comparability + Spark forbids
non-deterministic expressions in grouping); production can use
``rand()``-based salts or just AQE's skew-join/agg handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: the LEFT (skewed) side gets a deterministic salt
    from one of its own columns; the RIGHT side is replicated once per salt
    value. The join key becomes (key, salt), so a hot key's rows spread over
    ``n_salts`` reducers instead of one. Row-identical to the plain join.

    Replication factor is the cost — use for genuinely skewed keys, or let
    AQE's skew-join handle it when only a few partitions are hot.
    """
    lt = left.withColumn("__salt", F.pmod(F.col(salt_col), F.lit(n_salts)))
    rt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return lt.join(rt, [key, "__salt"]).drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    key: str,
    value: Column,
    *,
    n_salts: int = 8,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value), de-skewed by VALUE-hash salting
    — the HOLISTIC shape the salted aggs exist for (round-6 verdict item 7:
    for algebraic sums, map-side partials already absorb skew and
    ``salted_agg_sum`` deliberately ties plain).

    The naive holistic plan — ``groupBy(k).agg(collect_set(v))`` — funnels
    every partial set of a hot key into ONE final-merge task; with millions
    of distinct values under the hot key, that single task IS the runtime
    (and the memory risk). Salting by ``pmod(xxhash64(v), n)`` makes the
    salt a function of the VALUE, so the per-(key, salt) distinct classes
    are provably DISJOINT — the merge step becomes an algebraic SUM of
    per-salt distinct counts, and no task anywhere ever holds the hot
    key's full value set. (A rowid salt could not do this: the same value
    would land in several salts and the counts would double-count.)

    Results are identical to ``countDistinct`` — the oracle/test contract.
    Spark's own count-distinct rewrite de-skews similarly by expanding over
    (k, v); this operator is the pattern for holistic aggregates the
    rewrite does NOT cover (exact sets, exact medians via per-salt count
    maps) and keeps the whole plan in two map-side-combinable hash aggs."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(value), F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(
        F.count_distinct(value).alias("__d")
    )
    return partial.groupBy(key).agg(F.sum("__d").cast("bigint").alias(alias))


def salted_agg_sum(
    df: DataFrame,
    key: str,
    value: Column,
    *,
    salt_col: str,
    n_salts: int = 8,
    sum_alias: str = "sum_value",
    count_alias: str = "n",
) -> DataFrame:
    """groupBy(key) → (sum(value), count) computed as salted partial + merge."""
    salted = df.withColumn("__salt", F.pmod(F.col(salt_col), F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(value).alias("__s"), F.count(F.lit(1)).alias("__c")
    )
    return partial.groupBy(key).agg(
        F.sum("__s").alias(sum_alias), F.sum("__c").cast("bigint").alias(count_alias)
    )
