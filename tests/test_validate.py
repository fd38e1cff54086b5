from __future__ import annotations

import pytest

from data_ingestion_bra_spark.validate import (
    SchemaError,
    check_dtypes,
    ensure_preview_columns,
    ensure_required_columns,
    warn_extra_columns,
)


def test_required_columns_lists_all_missing(spark):
    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(SchemaError) as exc:
        ensure_required_columns(df, ["a", "b", "c"])
    assert "b" in str(exc.value) and "c" in str(exc.value)


def test_check_dtypes_collects_all_mismatches(spark):
    df = spark.createDataFrame([("1", "x", 1.5)], "i string, s string, f double")
    with pytest.raises(SchemaError) as exc:
        check_dtypes(df, integer_fields=["i"], string_fields=["s"], float_fields=["f"])
    msg = str(exc.value)
    assert "i:" in msg  # string where bigint expected
    assert "f:" not in msg  # double is correct


def test_check_dtypes_passes_when_correct(spark):
    df = spark.createDataFrame([(1, "x", 1.5)], "i bigint, s string, f double")
    check_dtypes(df, integer_fields=["i"], string_fields=["s"], float_fields=["f"])


def test_extra_columns_warn_and_keep(spark):
    df = spark.createDataFrame([(1, 2)], "a bigint, extra bigint")
    with pytest.warns(UserWarning, match="extra"):
        extras = warn_extra_columns(df, ["a"])
    assert extras == ["extra"]
    assert "extra" in df.columns


def test_preview_columns(spark):
    df = spark.createDataFrame([(1,)], "a bigint")
    ensure_preview_columns(df, ["a"])
    with pytest.raises(SchemaError):
        ensure_preview_columns(df, ["a", "nope"])
