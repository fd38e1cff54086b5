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
