"""Property-based tests (hypothesis): the cast layer against a Python model
of the reference's pandas semantics, and algebraic invariants of the
scale-path operators (salted == plain, estimate bounds)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_ingestion_bra_spark.functions.cleaning import to_float_pt, to_int
from data_ingestion_bra_spark.operators.skew import salted_agg_sum

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def model_to_float_pt(s: str | None) -> float | None:
    """Python model of the reference's to_float_pt (casting.py:13-24):
    strip '.' (thousands), ','→'.', coerce, invalid → null."""
    if s is None:
        return None
    t = s.replace(".", "").replace(",", ".")
    try:
        return float(t)
    except ValueError:
        return None


pt_number_strings = st.one_of(
    st.just(""),
    st.text(alphabet="0123456789.,abc-", min_size=0, max_size=12),
    st.integers(-10**6, 10**6).map(lambda i: f"{i:,}".replace(",", ".")),
    st.tuples(st.integers(0, 10**5), st.integers(0, 99)).map(lambda t: f"{t[0]},{t[1]:02d}"),
)


@SET
@given(st.lists(pt_number_strings, min_size=1, max_size=20))
def test_to_float_pt_matches_python_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r[0] for r in df.select(to_float_pt(F.col("v"))).collect()]
    want = [model_to_float_pt(v) for v in values]
    for g, w, v in zip(got, want, values):
        # Spark cast parses a few forms Python float() also accepts (inf,
        # exponent) identically; NaN-vs-None normalization:
        g = None if (g != g if isinstance(g, float) else False) else g
        w = None if (w != w if isinstance(w, float) else False) else w
        assert g == w, (v, g, w)


@SET
@given(st.lists(st.one_of(st.just(None), st.text("0123456789x.", max_size=8)), min_size=1, max_size=20))
def test_to_int_null_coercion_total(spark, values):
    """to_int never throws; invalid inputs coerce to NULL (ANSI off)."""
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r[0] for r in df.select(to_int(F.col("v"))).collect()]
    assert len(got) == len(values)
    for g in got:
        assert g is None or isinstance(g, int)


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**6), st.integers(0, 10**4)),
        min_size=1,
        max_size=40,
    )
)
def test_salted_agg_equals_plain_agg(spark, rows):
    df = spark.createDataFrame([(k, rid, v) for k, (rid, v) in
                                ((k, (rid, v)) for k, rid, v in rows)],
                               "k bigint, rid bigint, v bigint")
    plain = {
        (r["k"]): (r["s"], r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    salted = {
        (r["k"]): (r["sum_value"], r["n"])
        for r in salted_agg_sum(df, "k", F.col("v"), salt_col="rid", n_salts=4).collect()
    }
    assert salted == plain


def _model_repetition(text: str, n: int) -> tuple[int, int, int]:
    """Python model of repetition_metrics' n-gram stats."""
    toks = text.strip().split()
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)] if len(toks) >= n else []
    total, distinct = len(grams), len(set(grams))
    ratio = int((total - distinct) / total * 10000.0 + 0.5) if total else 0
    return total, distinct, ratio


word = st.text(alphabet="abcxyz0", min_size=1, max_size=4)
docs = st.lists(word, min_size=1, max_size=30).map(" ".join)


@SET
@given(st.lists(docs, min_size=1, max_size=10))
def test_repetition_metrics_match_python_model(spark, texts):
    from data_ingestion_bra_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in repetition_metrics(df, "doc_id", "text").collect()}
    for i, t in enumerate(texts):
        for n, pre in ((2, "2gram"), (3, "3gram")):
            total, distinct, ratio = _model_repetition(t, n)
            r = rows[i]
            assert r[f"n_{pre}s"] == total, (t, n)
            assert r[f"n_distinct_{pre}s"] == distinct, (t, n)
            assert r[f"dup_{pre}_ratio_e4"] == ratio, (t, n)


@SET
@given(st.lists(docs, min_size=1, max_size=10))
def test_gopher_quality_flag_consistent_with_metrics(spark, texts):
    """passes_quality must equal the AND of the reported per-metric gates —
    the flag can never disagree with the metrics it's derived from."""
    from data_ingestion_bra_spark.operators import text as T

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    for r in T.gopher_quality(df, "doc_id", "text").collect():
        want = int(
            T.GOPHER_MIN_TOKENS <= r["n_tokens"] <= T.GOPHER_MAX_TOKENS
            and T.GOPHER_MIN_MEAN_LEN_E4 <= r["mean_token_len_e4"] <= T.GOPHER_MAX_MEAN_LEN_E4
            and r["alpha_token_ratio_e4"] >= T.GOPHER_MIN_ALPHA_RATIO_E4
            and r["stopword_hits"] >= T.GOPHER_MIN_STOPWORD_HITS
        )
        assert r["passes_quality"] == want
