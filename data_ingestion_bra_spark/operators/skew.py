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
