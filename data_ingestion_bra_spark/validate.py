"""Schema validation gates — reference parity for app/utils/validate.py.

All checks are driver-side inspections of ``df.schema`` / ``df.columns``
(zero Spark jobs) — validation must not cost a cluster pass at 100 TB.

Error taxonomy mirrors the reference (SURVEY §2.9 V5): ``SchemaError`` for
declared-schema violations, collect-all-then-raise so one failure reports
every offending column (reference app/utils/validate.py:12-30).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class SchemaError(Exception):
    """Declared schema violated. Ref: app/utils/validate.py:4-5."""


class ApiError(Exception):
    """Upstream HTTP/API failure. Ref: app/ingestao_api.py:17-18."""


EXPECTED_SPARK_TYPE = {
    "integer": T.LongType(),
    "string": T.StringType(),
    "float": T.DoubleType(),
}


def ensure_required_columns(df: DataFrame, required: list[str]) -> None:
    """Raise SchemaError listing every missing declared column.

    Ref: app/utils/validate.py:7-10.
    """
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise SchemaError(f"missing required columns: {missing}")


def check_dtypes(
    df: DataFrame,
    *,
    integer_fields: list[str] | None = None,
    string_fields: list[str] | None = None,
    float_fields: list[str] | None = None,
) -> None:
    """Post-cast type assertion; aggregates all mismatches into one error.

    Ref: app/utils/validate.py:12-30.
    """
    by_name = {f.name: f.dataType for f in df.schema.fields}
    problems: list[str] = []
    for cols, kind in (
        (integer_fields, "integer"),
        (string_fields, "string"),
        (float_fields, "float"),
    ):
        want = EXPECTED_SPARK_TYPE[kind]
        for c in cols or []:
            if c not in by_name:
                continue  # missing columns are ensure_required_columns' job
            if by_name[c] != want:
                problems.append(f"{c}: expected {want.simpleString()}, got {by_name[c].simpleString()}")
    if problems:
        raise SchemaError("dtype mismatches: " + "; ".join(problems))


def warn_extra_columns(df: DataFrame, declared: list[str]) -> list[str]:
    """Columns beyond the declared schema are kept, with a warning —
    permissive-evolution policy. Ref: app/ingestao_csv.py:52-61."""
    extras = [c for c in df.columns if c not in set(declared)]
    if extras:
        warnings.warn(f"columns outside declared schema (kept): {extras}", stacklevel=2)
    return extras


def ensure_preview_columns(df: DataFrame, preview_cols: list[str]) -> None:
    """Required display columns present, else SchemaError.

    Ref: app/ingestao_csv.py:82-85.
    """
    missing = [c for c in preview_cols if c not in df.columns]
    if missing:
        raise SchemaError(f"preview columns missing: {missing}")
