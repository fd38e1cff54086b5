"""CSV source with asserted (never inferred) schema — reference S5
(app/ingestao_csv.py:38-44).

Reads every column as string with an explicit ``StructType`` — the Spark
equivalent of pandas ``dtype=str`` — then the cast layer applies the
declared types. No inference scan, BOM handled by Spark's UTF-8 reader.

``multi_line=True`` is required for quoted fields with embedded newlines
(reference posts.txt: 41 physical lines, 10 records). NOTE: multiLine
disables input splitting — each file is read by one task. Fine for
bronze-landing small files; at 100 TB keep documents in Parquet and reserve
multiLine CSV for ingest edges (SURVEY §7.4.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_bra_spark.schema import all_string_schema


def read_csv_asserted(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    *,
    sep: str = ";",
    encoding: str = "UTF-8",
    header: bool = True,
    multi_line: bool = False,
    quote: str = '"',
) -> DataFrame:
    """Read CSV with all-string schema. If ``columns`` is None, sniff the
    header for names only (one tiny driver read), still typing everything
    string."""
    if columns is None:
        first = (
            spark.read.options(sep=sep, encoding=encoding, header=False)
            .csv(path)
            .limit(1)
            .first()
        )
        columns = [str(v) for v in first]
    reader = spark.read.options(
        sep=sep,
        encoding=encoding,
        header=header,
        multiLine=multi_line,
        quote=quote,
    ).schema(all_string_schema(columns))
    return reader.csv(path)


def normalize_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Header normalization via config rename map (accents/spaces →
    snake_case). Ref: normalize_columns app/ingestao_csv.py:19-20."""
    return df.withColumnsRenamed({k: v for k, v in mapping.items() if k in df.columns})
