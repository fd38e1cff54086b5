"""Cast-quirk parity with the reference's empirically-verified semantics
(SURVEY §1.2; reference app/utils/casting.py:5-24)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_bra_spark.functions.cleaning import (
    apply_casts,
    to_float_pt,
    to_int,
    to_str,
)


def _eval(spark, expr, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(expr(F.col("v"))).collect()]


def test_to_float_pt_quirks(spark):
    vals = ["29,45", "1.234,56", "", None, "abc", "64.9073", "0,5"]
    out = _eval(spark, to_float_pt, vals)
    # "64.9073" → 649073.0: dot is ALWAYS a thousands separator (reference
    # quirk, casting.py:20-21) — transform order preserved deliberately.
    assert out == [29.45, 1234.56, None, None, None, 649073.0, 0.5]


def test_to_int_quirks(spark):
    vals = ["3.0", "42", "x", None, ""]
    out = _eval(spark, to_int, vals)
    assert out == [3, 42, None, None, None]


def test_to_str_quirks(spark):
    vals = ['  "quoted"  ', "plain", '"half', None]
    out = _eval(spark, to_str, vals)
    # null stays null — DOCUMENTED divergence from pandas astype(str)
    # stringifying None → "None" (SURVEY §1.2 C2 decision).
    assert out == ["quoted", "plain", "half", None]


def test_apply_casts_skips_absent_columns(spark):
    df = spark.createDataFrame([("1", "a", "2,5")], "i string, s string, f string")
    out = apply_casts(
        df,
        integer_fields=["i", "missing_int"],
        string_fields=["s"],
        float_fields=["f"],
    )
    assert dict(out.dtypes) == {"i": "bigint", "s": "string", "f": "double"}
    row = out.first()
    assert (row["i"], row["s"], row["f"]) == (1, "a", 2.5)
