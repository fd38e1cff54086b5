"""Probabilistic record linkage — the Fellegi–Sunter decision model
(Fellegi & Sunter, JASA 1969): candidate pairs from BLOCKING (equi-join on
coarse keys — never an all-pairs product), a per-field AGREEMENT VECTOR
from field comparators, a linkage score that sums per-field log-odds
weights (agreement adds log(m/u), disagreement adds log((1-m)/(1-u))), and
a two-threshold decision: match / possible (clerical review) / non-match.

This engine's formulation keeps the whole chain hash-exact across engines:

- weights are COMMITTED INTEGERS (centi-log-odds, the same committed-
  weights discipline as the langid/perplexity/quality-model tiers) — in
  production they come from EM over the agreement patterns; the decision
  model is identical either way;
- comparators are deterministic integer/boolean SQL expressions
  (equality, bounded Levenshtein, absolute-difference windows), so a SQL
  oracle replays the agreement vector, the score and the verdict
  bit-for-bit;
- the agreement PATTERN is emitted bit-packed alongside the score — the
  Fellegi–Sunter object of study (pattern frequencies are what EM fits).

Scale shape: candidates come from the caller's blocking equi-join; the
scorer itself is a row-local projection (zero shuffles). At 100 TB the
blocking keys bound cell sizes the usual way (add keys until the largest
cell fits; the hot-cap discipline the dedup tiers use applies verbatim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: A field comparator: (name, agreement predicate over the pair relation,
#: centi-log-odds weight if the field agrees, weight if it disagrees —
#: agree > 0 > disagree for any sane m/u).
Comparator = tuple[str, Column, int, int]


def fellegi_sunter_score(
    pairs: DataFrame,
    comparators: list[Comparator],
    *,
    match_threshold_e2: int,
    possible_threshold_e2: int,
) -> DataFrame:
    """Score a candidate-pair relation: adds ``pattern`` (bit i set iff
    comparator i agrees, i=0 the lowest bit), ``score_e2`` (sum of the
    committed centi-log-odds), and ``verdict`` ('match' / 'possible' /
    'non_match' by the two Fellegi-Sunter thresholds). Pure row-local
    column arithmetic — the plan adds no exchange."""
    if not comparators:
        raise ValueError("at least one comparator required")
    if possible_threshold_e2 > match_threshold_e2:
        raise ValueError("possible_threshold_e2 must be <= match_threshold_e2")
    pattern = F.lit(0).cast("bigint")
    score = F.lit(0).cast("bigint")
    for i, (_name, agrees, w_agree, w_disagree) in enumerate(comparators):
        bit = F.when(agrees, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        pattern = pattern + bit * F.lit(1 << i).cast("bigint")
        score = score + F.when(
            agrees, F.lit(int(w_agree))
        ).otherwise(F.lit(int(w_disagree))).cast("bigint")
    out = pairs.withColumn("pattern", pattern).withColumn("score_e2", score)
    return out.withColumn(
        "verdict",
        F.when(F.col("score_e2") >= match_threshold_e2, F.lit("match"))
        .when(F.col("score_e2") >= possible_threshold_e2, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )
