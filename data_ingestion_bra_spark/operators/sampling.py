"""Deterministic, reproducible sampling operators.

The reference has no sampling surface (SURVEY §2 — ABSENT); a 100 TB
training-data pipeline needs one constantly (eval holdouts, ablation
subsets, per-source quota draws). Spark's ``df.sample`` is seed-stable but
*partitioning-dependent*: the same seed over a different file split yields
a different sample, which breaks reproducibility across reshards and makes
an oracle comparison impossible.

These operators instead hash the *content key* (md5 of the key columns) and
keep a row iff the first 6 hex chars fall below ``rate * 16^6``. Properties
that matter at scale:

- **Deterministic under repartitioning/resharding** — depends only on key
  values, not on physical layout, executor count, or read order.
- **Embarrassingly parallel** — a narrow filter, no shuffle; pushes down to
  a scan filter after column pruning (md5 evaluates per-row in codegen).
- **Consistent subsets** — rate 0.05's sample is a strict subset of rate
  0.10's (thresholds are nested), so growing a holdout never resamples.
- **Oracle-checkable** — md5 is engine-portable (same hex in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16**6  # first 6 hex chars of md5 → 24 bits of uniform hash


def hex_threshold(rate: float) -> str:
    """Exclusive hex cutoff: keep iff md5[:6] < threshold."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"  # lexicographically above every hex digit → keep all
    return format(int(rate * _HEX_SPAN), "06x")


def _key_hash(key_cols: list[str]) -> Column:
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return F.substring(F.md5(key), 1, 6)


def deterministic_sample(df: DataFrame, key_cols: list[str], rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content hash of ``key_cols``.

    Unlike ``df.sample(rate, seed)`` the result is invariant to the physical
    split of the input — rerunning after a compaction or on a different
    cluster yields byte-identical membership.
    """
    return df.filter(_key_hash(key_cols) < F.lit(hex_threshold(rate)))


def stratified_sample(
    df: DataFrame, strata_col: str, rates: dict[str, float], key_cols: list[str]
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` made reproducible).

    ``rates`` maps stratum value → keep rate; strata not listed are dropped.
    One narrow filter — no shuffle, no per-stratum pass; the CASE threshold
    evaluates inside whole-stage codegen next to the scan.
    """
    thr: Column = F.lit("")  # empty string < any hex char → unlisted strata drop
    expr = None
    for value, rate in rates.items():
        cond = F.col(strata_col) == F.lit(value)
        expr = F.when(cond, F.lit(hex_threshold(rate))) if expr is None else expr.when(
            cond, F.lit(hex_threshold(rate))
        )
    thr = expr.otherwise(F.lit("")) if expr is not None else thr
    return df.filter(_key_hash(key_cols) < thr)
