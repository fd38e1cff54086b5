"""Source/sink format coverage beyond parquet+csv: ORC, JSON-lines, and
codec variants — round-trip equality so a user can land the corpus in any
of the formats Spark ships natively."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_orc_roundtrip(tmp_path, spark):
    d = _docs(spark)
    p = str(tmp_path / "docs_orc")
    d.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == d.schema
    assert _sorted_rows(back) == _sorted_rows(d)


def test_orc_predicate_pushdown_plan(tmp_path, spark):
    p = str(tmp_path / "docs_orc_pd")
    _docs(spark).write.orc(p)
    q = spark.read.orc(p).filter(F.col("doc_id") < 10).select("doc_id", "lang")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan, plan


def test_jsonl_roundtrip_with_explicit_schema(tmp_path, spark):
    d = _docs(spark)
    p = str(tmp_path / "docs_jsonl")
    d.write.json(p)  # one JSON object per line (JSONL)
    back = spark.read.schema(d.schema).json(p)
    assert _sorted_rows(back) == _sorted_rows(d)


def test_parquet_zstd_roundtrip(tmp_path, spark):
    d = _docs(spark)
    p = str(tmp_path / "docs_zstd")
    d.write.option("compression", "zstd").parquet(p)
    back = spark.read.parquet(p)
    assert _sorted_rows(back) == _sorted_rows(d)
