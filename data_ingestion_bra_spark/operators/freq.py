"""Frequent-items (heavy hitters) over unbounded key domains.

The exact ``groupBy(key).count()`` top-k is the right plan when the key
domain is bounded (a trained vocabulary, event types, domains). When the
domain is unbounded — raw tokens, URLs, n-grams over 100 TB — the shuffle
carries one row per *distinct key per map task*, and the distinct count is
the problem. The classic streaming answer is a mergeable Misra–Gries
summary (Misra & Gries 1982; mergeability per Agarwal et al., PODS 2012
"Mergeable Summaries"): each partition keeps at most ``capacity`` weighted
counters, so only ``capacity × n_partitions`` summary rows ever shuffle,
regardless of key cardinality.

Guarantee used here (and asserted in tests/test_freq.py): a key whose true
global count exceeds ``N / (capacity + 1)`` survives in at least one
partition summary. The serving plan therefore runs in two scans:

1. MG summaries per partition (mapInPandas, Arrow-batched; only bounded
   summaries leave the executors) → a small candidate key set;
2. exact recount of candidates only (broadcast semi-join + partial-agg
   groupBy), then top-k with a deterministic tie-break.

The MG candidate SET depends on partitioning and batch order, but the
final output is the *exact* top-k whenever the k-th true count clears the
``N/(capacity+1)`` bound — which is what makes the DuckDB oracle (a plain
exact top-k) replay it bit-for-bit.

Reference parity note: the reference pipeline (714-LoC pandas) has no
frequent-items surface; this is part of the LLM-data tier the task brief
asks for beyond reference coverage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _mg_summary_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType([key_field, T.StructField("mg_weight", T.LongType())])


def misra_gries_summaries(
    df: DataFrame, key_col: str, capacity: int, *, nulls: str = "error"
) -> DataFrame:
    """Per-partition Misra–Gries summaries of ``df[key_col]``.

    Returns at most ``capacity`` rows per input partition:
    ``(key_col, mg_weight)`` where ``mg_weight`` is the residual counter —
    a lower bound on the key's count within that partition, undercounting
    by at most ``N_partition / (capacity + 1)``.

    The merge step is the PODS-2012 mergeable form, vectorized per Arrow
    batch: fold the batch's value_counts into the running counters, and
    when more than ``capacity`` counters exist, subtract the
    ``(capacity+1)``-th largest counter value from all and drop the
    non-positive ones (the batched equivalent of MG's decrement-all).

    Keys must be NON-NULL: a SQL ``GROUP BY`` counts the NULL group, but a
    summary keyed on NULL cannot survive the downstream equality semi-join
    recount, so a frequent NULL would silently vanish from the top-k.
    ``nulls="error"`` (default) raises on the first null key seen;
    ``nulls="ignore"`` opts into dropping them when the caller has already
    established non-nullness (e.g. keys produced by explode()).
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if nulls not in ("error", "ignore"):
        raise ValueError("nulls must be 'error' or 'ignore'")
    key_field = df.schema[key_col]
    out_schema = _mg_summary_schema(key_field)
    raise_on_null = nulls == "error"

    def mg_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            if raise_on_null and pdf[key_col].isna().any():
                raise ValueError(
                    f"misra_gries_summaries: null key in {key_col!r}; a frequent "
                    "NULL cannot be recounted through the equality semi-join — "
                    "filter nulls (or pass nulls='ignore' to drop them)"
                )
            vc = pdf[key_col].value_counts(dropna=True)
            for key, n in vc.items():
                counters[key] = counters.get(key, 0) + int(n)
            if len(counters) > capacity:
                s = pd.Series(counters)
                # value of the (capacity+1)-th largest counter
                cut = int(s.nlargest(capacity + 1).iloc[-1])
                s = s - cut
                counters = {k: int(v) for k, v in s[s > 0].items()}
        yield pd.DataFrame(
            {key_col: list(counters.keys()), "mg_weight": list(counters.values())}
        )

    return df.select(key_col).mapInPandas(mg_fn, schema=out_schema)


def heavy_hitters_exact_topk(
    df: DataFrame,
    key_col: str,
    k: int,
    *,
    capacity: int = 4096,
    nulls: str = "error",
    verify_exact: bool = False,
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``df[key_col]`` without a
    full distinct-key shuffle.

    Scan 1 builds bounded MG summaries (``misra_gries_summaries``); the
    union of summary keys is the candidate set — at most
    ``capacity × n_partitions`` rows, broadcastable by construction.
    Scan 2 recounts candidates exactly: broadcast LEFT SEMI join (only
    candidate rows survive the scan) into a partial-aggregable groupBy.

    Output columns: ``rank`` (1-based, count desc then key asc — the
    deterministic tie-break the oracle replays), ``key_col``, ``n``.
    Exactness condition: true count of the k-th item > N/(capacity+1);
    callers pick ``capacity`` for their skew (tests assert the bound).

    ``verify_exact=True`` turns that precondition into a RUNTIME GUARD:
    the result (≤ k rows) is materialized eagerly, ``N = df.count()`` runs
    as one extra scan, and the call raises if the k-th candidate count
    fails to clear ``N/(capacity+1)`` — i.e. whenever the output could be
    a partitioning-dependent approximation rather than the exact top-k.
    A result with FEWER than k rows is certified only when those rows are
    the complete distinct key set (checked with a ``limit(n_rows+1)``-
    bounded distinct probe); if the corpus holds more distinct keys than
    the candidate set surfaced, the guard raises regardless of the tail
    count — the missing members are exactly the ones MG cancelled.
    On a corpus where the guard trips, raise ``capacity`` (shuffled volume
    stays capacity×n_partitions rows) instead of trusting the output.
    """
    from pyspark.sql.window import Window

    cand = (
        misra_gries_summaries(df, key_col, capacity, nulls=nulls)
        .select(key_col)
        .distinct()
    )
    exact = (
        df.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col(key_col).asc())
    topk = (
        exact.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("rank", key_col, "n")
    )
    if not verify_exact:
        return topk
    # Guard path: k-row materialization + one count job — both bounded.
    out = topk.localCheckpoint(eager=True)
    tail = out.orderBy(F.col("rank").desc()).limit(1).collect()
    n_rows = int(tail[0]["rank"]) if tail else 0
    if n_rows < k:
        # Fewer than k candidates survived Misra–Gries. That is exact ONLY
        # when the materialized rows are the ENTIRE distinct key set (the
        # top-k of d < k keys is all d keys); otherwise the missing members
        # were cancelled counters — their true counts are <= N/(capacity+1)
        # by the MG bound, and trusting the tail row's count would certify
        # a top-k that is provably missing true members (extreme-skew
        # corpora with few surviving counters but >= k distinct keys).
        # Probe: does ANY row carry a key outside the materialized set? A
        # broadcast left_anti + limit(1) short-circuits the scan on the
        # first witness (LocalLimit stops tasks early) and never runs a
        # distinct-key shuffle — the full-aggregate cost this operator's
        # contract exists to avoid.
        keys = df.select(key_col)
        if nulls == "ignore":
            keys = keys.filter(F.col(key_col).isNotNull())
        witness = (
            keys.join(F.broadcast(out.select(key_col)), key_col, "left_anti")
            .limit(1)
            .count()
        )
        if witness == 0:
            return out  # complete enumeration of the key set — exact
        kth = 0  # force the raise below: candidates exist that MG lost
    else:
        kth = int(tail[0]["n"])
    n_total = df.count()
    if n_total > 0 and kth * (capacity + 1) <= n_total:
        raise ValueError(
            f"heavy_hitters_exact_topk: exactness bound violated — k-th "
            f"candidate count {kth} <= N/(capacity+1) = "
            f"{n_total}/{capacity + 1}; raise capacity for this corpus"
        )
    return out


def mg_merge(summaries: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Merge any union of Misra–Gries summaries back into ONE summary of at
    most ``capacity`` counters (the PODS-2012 MERGE: sum weights per key,
    then subtract the (capacity+1)-th largest combined weight from all and
    drop the non-positive). Associative and commutative, which is what
    makes the summary a valid STREAMING state: folding per-epoch summaries
    into a standing store epoch by epoch carries the same
    total-N/(capacity+1) error bound as one pass over the whole stream.

    All work is summary-sized (inputs are capacity-bounded by
    construction); the cut decision is ONE Spark action — a
    ``capacity+1``-row sort-limit collect (bounded by contract) from which
    both the over-capacity check and the cut value are derived — so a
    streaming trigger folding epochs through here pays exactly one job."""
    s = summaries.groupBy(key_col).agg(F.sum("mg_weight").alias("mg_weight"))
    top_rows = (
        s.orderBy(F.col("mg_weight").desc(), F.col(key_col)).limit(capacity + 1).collect()
    )
    if len(top_rows) > capacity:
        cut = int(top_rows[-1]["mg_weight"])
        s = s.withColumn("mg_weight", F.col("mg_weight") - F.lit(cut)).filter(
            F.col("mg_weight") > 0
        )
    return s
