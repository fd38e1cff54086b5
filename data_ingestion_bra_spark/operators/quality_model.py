"""Model-based document quality scoring: an integer logistic regression
over the engine's per-document quality metrics — the trained tier above
the declarative Gopher rule gates, the same "rules are cheap, a fitted
model ranks the gray zone" split CCNet-style pipelines use.

The weight table (``config/quality_model_weights.json``) is FIT OFFLINE
by ``tools/train_quality_model.py`` — positives are real multilingual
prose, negatives generated degenerate text (token spam, digit noise,
punctuation soup, fragments) — and committed as integers. Scoring is a
pure Column dot product over metric expressions the engine already
defines (``gopher_metric_cols`` + ``dup_ngram_ratio_e4_expr``), so it:

- runs entirely inside whole-stage codegen, zero shuffles, zero UDFs —
  rides the scan at any corpus size;
- produces BIT-IDENTICAL integer scores in Spark and the DuckDB oracle
  (integer weights x integer features).

``score_e6 >= 0`` is the keep-gate; the raw score doubles as a ranking
signal for quality-weighted sampling.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.text import (
    dup_ngram_ratio_e4_expr,
    gopher_metric_cols,
)

DEFAULT_MODEL_PATH = (
    Path(__file__).resolve().parent.parent / "config" / "quality_model_weights.json"
)


def load_quality_model(path: str | Path | None = None) -> dict:
    with open(path or DEFAULT_MODEL_PATH, encoding="utf-8") as f:
        return json.load(f)


def quality_feature_cols(text_col: Column | str) -> dict[str, Column]:
    """The model's feature vector as named Columns — REUSES the metric
    definitions behind the rule gates (one definition per metric in the
    codebase, however many consumers)."""
    g = gopher_metric_cols(text_col)
    return {
        "n_tokens": g["n_tokens"],
        "mean_token_len_e4": g["mean_token_len_e4"],
        "alpha_token_ratio_e4": g["alpha_token_ratio_e4"],
        "stopword_hits": g["stopword_hits"],
        "dup_3gram_ratio_e4": dup_ngram_ratio_e4_expr(text_col, 3),
    }


def quality_score_expr(text_col: Column | str, *, model: dict | None = None) -> Column:
    """The integer model score as ONE reusable Column expression — for
    pipeline compositions that gate on ``score >= 0`` without carrying the
    per-feature projection."""
    model = model or load_quality_model()
    feats = quality_feature_cols(text_col)
    score = F.lit(int(model["bias"])).cast("bigint")
    for name in model["features"]:
        score = score + F.lit(int(model["weights"][name])).cast("bigint") * feats[name]
    return score


def quality_model_score(
    df: DataFrame, id_col: str, text_col: str, *, model: dict | None = None
) -> DataFrame:
    """Score every document: integer dot product of committed weights and
    metric features, plus the keep flag (``score >= 0``). Output:
    (doc_id, <features...>, score_e6, passes_model)."""
    model = model or load_quality_model()
    feats = quality_feature_cols(text_col)
    score = F.lit(int(model["bias"])).cast("bigint")
    for name in model["features"]:
        score = score + F.lit(int(model["weights"][name])).cast("bigint") * feats[name]
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(n) for n, c in feats.items()],
        score.alias("score_e6"),
        (score >= 0).cast("bigint").alias("passes_model"),
    )
