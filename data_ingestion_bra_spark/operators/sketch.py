"""K-Minimum-Values (bottom-k) distinct-count sketches — the CARDINALITY
member of the engine's mergeable-summary family (LSH signature store: set
membership; Misra–Gries: frequency; KMV: distinct counts).

A KMV summary of a key set is its k smallest deterministic hash values
(Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD 2007 — the estimator
the published DISTINCT-sampling / theta-sketch line builds on). Properties
this module leans on:

- **Exact below k**: fewer than k distinct hashes seen → the summary IS the
  distinct set, and the estimate is exact by construction.
- **Estimator**: with U_(k) the k-th smallest hash normalized to [0, 1),
  E[distinct] ≈ (k-1)/U_(k); relative error concentrates at ~1/sqrt(k).
  Everything here stays in a 2^48 integer hash space, so the estimate is
  ONE BIGINT floor division — hashable across engines, no float anywhere.
- **Mergeable**: the bottom-k of a union is the bottom-k of the union of
  bottom-k summaries — EXACTLY (not approximately), which is what makes the
  summary valid standing STREAMING state: folding per-epoch summaries into
  a store epoch by epoch yields byte-identical state to one pass over the
  whole stream (streaming/cardinality_maintenance.py builds on this).

Determinism: the hash is the first 12 hex chars of md5(key-as-string) —
the same engine-portable construction the sampling/threshold tier uses —
so Spark and the DuckDB oracle compute IDENTICAL summaries, and the
"approximate" estimate is still a bit-exact, hash-checkable value. 48-bit
space makes hash collisions negligible at any realistic group cardinality
(expected collisions ≈ n²/2^49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

#: 12 hex chars = 48-bit hash space.
KMV_SPACE = 1 << 48


def kmv_hash_expr(key) -> "F.Column":
    """Deterministic 48-bit hash of a key column: engine-portable
    md5-prefix arithmetic (DuckDB: ``('0x' || substr(md5(x),1,12))::BIGINT``
    computes the identical value)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast("bigint")


def kmv_summaries(
    df: DataFrame, group_cols: list[str], key_col: str, k: int, *, nulls: str = "error"
) -> DataFrame:
    """Per-group bottom-k summary: the k smallest distinct key hashes.

    Output: ``(*group_cols, h)`` — at most k rows per group. The distinct
    is the only wide shuffle and it keys by (group, hash); the bottom-k
    window partitions by group (per-group-sized frames).

    Keys must be NON-NULL: ``md5(NULL)`` is NULL, it survives the
    distinct, and Spark's ``Window.orderBy('h')`` sorts NULLS FIRST —
    a null key would occupy a bottom-k slot (displacing a real hash and
    biasing ``kth_hash``/``n_in_sketch``) while a SQL oracle's
    ``ROW_NUMBER ... ORDER BY h`` sorts NULLS LAST — silent divergence.
    Same contract as ``misra_gries_summaries``: ``nulls="error"``
    (default) raises at execution on the first null key (a lazy per-row
    ``raise_error`` branch — no extra scan); ``nulls="ignore"`` drops
    null keys when the caller has already established non-nullness."""
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator divides by k-1)")
    if nulls not in ("error", "ignore"):
        raise ValueError("nulls must be 'error' or 'ignore'")
    h = kmv_hash_expr(key_col)
    if nulls == "error":
        h = F.when(
            F.col(key_col).isNull(),
            F.raise_error(
                F.lit(
                    f"kmv_summaries: null key in {key_col!r} (nulls='error'); "
                    "null hashes would shadow real bottom-k slots — filter "
                    "nulls or pass nulls='ignore'"
                )
            ).cast("bigint"),
        ).otherwise(h)
        src = df
    else:
        src = df.filter(F.col(key_col).isNotNull())
    hashes = src.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*group_cols, "h")
    )


def kmv_merge(
    summaries: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Merge any union of per-group KMV summaries back into one bottom-k
    summary per group — EXACT: bottom-k of a union == bottom-k of the
    unioned bottom-k's. All work is summary-sized."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        summaries.select(*group_cols, "h")
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*group_cols, "h")
    )


def kmv_estimates(
    summaries: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Distinct-count estimates from per-group summaries: exact when the
    group holds fewer than k hashes (the summary IS the set), else the
    (k-1)·SPACE / kth-min floor division. Output:
    ``(*group_cols, n_in_sketch, kth_hash, estimate)`` — all BIGINT."""
    agg = summaries.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in_sketch"),
        F.max("h").cast("bigint").alias("kth_hash"),
    )
    return agg.withColumn(
        "estimate",
        F.when(F.col("n_in_sketch") < k, F.col("n_in_sketch"))
        .otherwise(F.expr(f"CAST(({k} - 1) * CAST({KMV_SPACE} AS BIGINT) div kth_hash AS BIGINT)"))
        .cast("bigint"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — the FREQUENCY-ESTIMATE member of the mergeable-summary
# family (Cormode & Muthukrishnan, J. Algorithms 2005). Where Misra-Gries
# answers "which keys are frequent" with a candidate set, CMS answers "how
# frequent is ANY key" from a fixed d x w integer grid:
#
# - cell(j, h_j(key)) += count for each of d independent row hashes;
# - estimate(key) = min_j cell(j, h_j(key));
# - NEVER underestimates (every cell holding the key's counts also holds
#   nonnegative collision mass), overestimates by <= N/w in expectation per
#   row — taking the min over d rows drives the overshoot probability down
#   exponentially;
# - EXACTLY mergeable: cell-wise sum (counting is linear), so per-epoch
#   sketches fold into a standing store byte-identically to one pass.
#
# Engine-portable determinism: row hash j is the md5-prefix BIGINT of
# "<j>:<key>" mod w — the same construction the KMV/sampling tiers use, so
# a SQL oracle rebuilds the ENTIRE grid bit-for-bit and the "approximate"
# estimates are hash-checkable values.
# ---------------------------------------------------------------------------


def cms_hash_expr(key, j: int, width: int) -> "F.Column":
    """Row-j CMS column index of a key: engine-portable md5-prefix
    arithmetic (DuckDB: ``('0x' || substr(md5(j || ':' || key), 1, 12))
    ::BIGINT % width``)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), c.cast("string"))), 1, 12), 16, 10
    ).cast("bigint")
    return (h % width).cast("bigint")


def cms_summaries(
    df: DataFrame, key_col: str, *, depth: int = 3, width: int = 1024,
    nulls: str = "error",
) -> DataFrame:
    """Count-Min sketch of ``df[key_col]`` as a relation: one row per
    non-empty cell, ``(j, col, cell)`` — at most depth x width rows forever,
    regardless of input size. The build is ONE partial-aggregable groupBy
    over a depth-way stack (each input row contributes depth cells);
    nothing key-shaped survives the aggregation.

    Null keys follow the family contract (``misra_gries_summaries``,
    ``kmv_summaries``): md5(NULL) is NULL, which would silently drop the
    key's mass from some rows — ``nulls='error'`` raises at execution,
    ``nulls='ignore'`` drops null keys."""
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    if nulls not in ("error", "ignore"):
        raise ValueError("nulls must be 'error' or 'ignore'")
    src = df
    if nulls == "ignore":
        src = df.filter(F.col(key_col).isNotNull())
    rows = []
    for j in range(depth):
        h = cms_hash_expr(key_col, j, width)
        if nulls == "error":
            h = F.when(
                F.col(key_col).isNull(),
                F.raise_error(
                    F.lit(
                        f"cms_summaries: null key in {key_col!r} (nulls='error')"
                    )
                ).cast("bigint"),
            ).otherwise(h)
        rows.append(src.select(F.lit(j).cast("int").alias("j"), h.alias("col")))
    stacked = rows[0]
    for r in rows[1:]:
        stacked = stacked.unionByName(r)
    return stacked.groupBy("j", "col").agg(
        F.count(F.lit(1)).cast("bigint").alias("cell")
    )


def cms_merge(summaries: DataFrame) -> DataFrame:
    """Merge any union of CMS relations (same depth/width) into one:
    cell-wise sum — EXACT, because counting is linear. All work is
    summary-sized."""
    return summaries.groupBy("j", "col").agg(
        F.sum("cell").cast("bigint").alias("cell")
    )


def cms_estimates(
    summary: DataFrame, keys: DataFrame, key_col: str, *, depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: estimate =
    min over rows j of cell(j, h_j(key)), with absent cells read as 0.
    Output: ``(key_col, estimate)`` — BIGINT, NEVER below the true count.
    The probe is a summary-sized broadcast join per row hash (d small)."""
    probes = []
    for j in range(depth):
        probes.append(
            keys.select(
                key_col,
                F.lit(j).cast("int").alias("j"),
                cms_hash_expr(key_col, j, width).alias("col"),
            )
        )
    stacked = probes[0]
    for p in probes[1:]:
        stacked = stacked.unionByName(p)
    joined = stacked.join(F.broadcast(summary), ["j", "col"], "left").select(
        key_col, F.coalesce(F.col("cell"), F.lit(0)).cast("bigint").alias("cell")
    )
    return joined.groupBy(key_col).agg(
        F.min("cell").cast("bigint").alias("estimate")
    )


# ---------------------------------------------------------------------------
# Equi-width histogram quantile summaries — the QUANTILE member of the
# mergeable-summary family (the deterministic fixed-bin alternative to
# GK/KLL: those trade determinism for adaptivity; on a bounded integer
# domain — cents, micros, day numbers, token counts — fixed bins give a
# HARD error bound of one bin width, exact cell-wise-sum mergeability
# (counting is linear, the CMS argument), and bit-reproducibility any SQL
# oracle replays). Summary size is at most n_bins rows per group forever.
# ---------------------------------------------------------------------------


def histogram_summaries(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lo: int,
    bin_width: int,
    n_bins: int,
) -> DataFrame:
    """Per-group equi-width histogram of a BIGINT value column over the
    domain ``[lo, lo + bin_width*n_bins)``: one row per non-empty bin,
    ``(*group_cols, bin, cnt)``. Out-of-domain values clamp to the edge
    bins (the summary still counts them; their bin just saturates — the
    documented behavior for a monitoring quantile). ONE partial-aggregable
    groupBy; nothing value-shaped survives it."""
    if bin_width < 1 or n_bins < 1:
        raise ValueError("bin_width and n_bins must be >= 1")
    bin_expr = F.least(
        F.greatest(
            F.expr(
                f"(CAST(`{value_col}` AS BIGINT) - CAST({int(lo)} AS BIGINT))"
                f" div {int(bin_width)}"
            ),
            F.lit(0).cast("bigint"),
        ),
        F.lit(int(n_bins - 1)).cast("bigint"),
    )
    return (
        df.select(*group_cols, bin_expr.cast("bigint").alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def histogram_merge(summaries: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge any union of per-group histograms: cell-wise sum — EXACT."""
    return summaries.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def histogram_quantiles(
    summaries: DataFrame,
    group_cols: list[str],
    qs_e4: list[int],
    *,
    lo: int,
    bin_width: int,
) -> DataFrame:
    """Quantile estimates from per-group histograms: for each q (fixed
    point, e4), the estimate is the UPPER EDGE of the first bin whose
    cumulative count reaches rank ceil(q*N/1e4) — so the true discrete
    quantile lies in ``(est - bin_width, est]``, a derived hard bound of
    one bin width. Output: ``(*group_cols, q_e4, n, est_hi)``, all BIGINT.
    All work is summary-sized (cumsum window per group over <= n_bins
    rows)."""
    w = Window.partitionBy(*group_cols).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy(*group_cols)
    cum = summaries.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wn).cast("bigint")
    )
    qdf = None
    for q in qs_e4:
        part = cum.withColumn("q_e4", F.lit(int(q)).cast("bigint"))
        qdf = part if qdf is None else qdf.unionByName(part)
    assert qdf is not None, "qs_e4 must be non-empty"
    hit = qdf.filter(
        F.col("cum") >= F.expr("CAST((q_e4 * n + 9999) div 10000 AS BIGINT)")
    )
    first = (
        hit.groupBy(*group_cols, "q_e4", "n")
        .agg(F.min("bin").alias("bin"))
        .withColumn(
            "est_hi",
            (
                F.lit(int(lo))
                + (F.col("bin") + 1) * F.lit(int(bin_width))
                - F.lit(1)
            ).cast("bigint"),
        )
    )
    return first.select(*group_cols, "q_e4", "n", "est_hi")


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar 1996,
# the assignment rule consistent hashing popularized: doc d goes to the
# shard s maximizing hash(s, d). The property that matters at 100 TB is
# MINIMAL DISRUPTION on resharding: growing N -> N+1 moves exactly the
# docs whose new-shard weight wins (expected 1/(N+1) of the corpus), and
# every moved doc lands ON THE NEW SHARD — nothing reshuffles between
# existing shards (each old shard's winner among the old set is unchanged).
# Deterministic md5-prefix weights make assignments engine-portable, so a
# SQL oracle replays every argmax and the minimal-disruption property is a
# hash-gated verdict, not a claim.
# ---------------------------------------------------------------------------


def rendezvous_shard_expr(id_col, n_shards: int) -> "F.Column":
    """Row-local HRW assignment: argmax over ``n_shards`` md5-prefix
    weights, packed as struct(w, s) and reduced with array_max (struct
    ordering breaks the impossible tie by shard id). Zero shuffles."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    cells = [
        F.struct(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{s}:"), c.cast("string"))), 1, 12
                ),
                16,
                10,
            ).cast("bigint").alias("w"),
            F.lit(s).cast("bigint").alias("s"),
        )
        for s in range(n_shards)
    ]
    return F.array_max(F.array(*cells))["s"]
